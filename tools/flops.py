#!/usr/bin/env python
"""Per-model FLOP / parameter / memory-traffic table from XLA's own cost model.

TPU-native replacement for the reference's fvcore ``FlopCountAnalysis``
smoke blocks (modeling_finetune.py:439-441): instead of tracing torch
modules with a Python op-cost table, we lower the jitted forward and ask
the compiler for its cost analysis — the same numbers XLA schedules by,
including fusion effects (bytes accessed reflects the fused HLO, not the
op-by-op sum).

Usage:
  python tools/flops.py                         # table for the main models
  python tools/flops.py vit_base_patch16_224    # one model
  python tools/flops.py --frames 16 --tubelet 2 # other clip geometry
  python tools/flops.py --batch 8               # batched costs

Runs on the CPU backend (cost analysis is backend-portable at this
granularity); GFLOPs are per forward pass at the given batch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MODELS = [
    "vit_base_patch16_224",
    "adaptation_umt_base_patch16_224",
    "pretrain_umt_base_patch16_224",
    "clip_b16",
]


def model_cost(name: str, batch: int, frames: int, tubelet: int,
               input_size: int, mask_ratio: float):
    """Build `name`, jit its forward, return (params, flops, bytes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unite_tpu.utils.registry import create_model

    kwargs = {}
    size = input_size
    if name.startswith("vit_"):
        kwargs.update(all_frames=frames, tubelet_size=tubelet, num_classes=12)
        if input_size != 224:
            kwargs.update(img_size=input_size)
    elif name.startswith("clip_"):
        # clip factories pin input_resolution (224, or 336 for *_336);
        # honor --input-size by overriding it so the pos-table geometry
        # tracks the input (ADVICE r3: a mismatched size crashed mid-table)
        native = 336 if name.endswith("_336") else 224
        size = input_size if input_size != 224 else native
        if size != native:
            kwargs.update(input_resolution=size)
    else:
        kwargs.update(num_frames=frames, tubelet_size=tubelet)
        if input_size != 224:
            # these factories pin img_size=224 (as the reference's
            # registrations do) — degrade explicitly instead of crashing
            print(f"[flops] {name}: factory pins img_size=224; "
                  f"ignoring --input-size {input_size}", file=sys.stderr)
            size = 224
    model = create_model(name, **kwargs)
    x = jnp.zeros((batch, frames, size, size, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)

    args = (x,)
    if name.startswith(("adaptation_", "pretrain_umt")):
        # masked-gather models run on the visible subset; cost them at the
        # stage-1 geometry (mask_ratio of the token grid kept hidden)
        patches = frames // tubelet * (size // 16) ** 2
        n_vis = int(round(patches * (1.0 - mask_ratio)))
        vis_idx = jnp.tile(jnp.arange(n_vis)[None], (batch, 1))
        args = (x, vis_idx)

    params = model.init(rng, *args)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    from unite_tpu.utils.flops import xla_cost

    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    cost = xla_cost(fwd, params, *args) or {}
    return n_params, cost.get("flops", 0.0), cost.get("bytes accessed", 0.0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("models", nargs="*", default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--tubelet", type=int, default=1)
    ap.add_argument("--input-size", type=int, default=224)
    ap.add_argument("--mask-ratio", type=float, default=0.8,
                    help="stage-1 mask ratio used to size the visible set "
                         "for the masked-gather models")
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # env vars are ignored (CLAUDE.md)

    names = a.models or DEFAULT_MODELS
    print(f"batch={a.batch} frames={a.frames} tubelet={a.tubelet} "
          f"input={a.input_size} mask_ratio={a.mask_ratio}")
    print(f"{'model':<36} {'params(M)':>10} {'GFLOPs':>10} {'GB moved':>10}")
    for name in names:
        n_params, flops, nbytes = model_cost(
            name, a.batch, a.frames, a.tubelet, a.input_size, a.mask_ratio)
        print(f"{name:<36} {n_params / 1e6:>10.2f} {flops / 1e9:>10.2f} "
              f"{nbytes / 1e9:>10.3f}")


if __name__ == "__main__":
    main()
