#!/usr/bin/env python
"""Export a framework checkpoint (.msgpack) to a reference-format .pth.

The reverse of the importer: feed checkpoints trained here to the
reference's existing tooling — its run_stageN checkpoint loaders
(run_stage1.py:518-602, run_stage2.py:349-438) and offline eval scripts
read ``{'model': state_dict, 'epoch': N}`` (utils.py:689-736), which is
exactly what this writes. Stage-3 combined trees additionally carry the
head as a ``src_classifier`` entry.

Usage:
  python tools/export_torch.py runs/stage2/exp/checkpoint-best.msgpack \
      exported.pth [--patch-size 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unite_tpu.utils.torch_export import export_checkpoint  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="framework .msgpack checkpoint")
    ap.add_argument("dst", help="output .pth path")
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--in-chans", type=int, default=3)
    a = ap.parse_args()
    out = export_checkpoint(a.src, a.dst, patch_size=a.patch_size,
                            in_chans=a.in_chans)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
