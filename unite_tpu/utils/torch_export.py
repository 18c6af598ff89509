"""Export flax params / framework checkpoints back to PyTorch state dicts.

The inverse of utils/torch_import.py: a reference user can round-trip —
train here, then feed the exported ``.pth`` to their existing reference
tooling (its run_stageN loaders, offline eval scripts, the published-ckpt
format of run_stage1.py:518-602 / run_stage2.py:349-438). Key transforms
are the exact inverses of ``torch_key_to_flax``:

- ``blocks_N`` / ``clip_decoder_N`` / ``resblocks_N``  →  ``blocks.N`` ...
- LayerNorm ``scale``  →  ``weight`` (1-D, unchanged values)
- Dense ``kernel`` [in, out]  →  ``weight`` [out, in] (transpose)
- patch-embed ``kernel`` [kt*kh*kw*C, D]  →  Conv3d ``weight``
  [D, C, kt, kh, kw] (inverse of ``_patch_embed_kernel``)
- everything else (cls_token, q_bias/v_bias, gamma_1/2, learnable
  pos_embed, ...) passes through under its dotted path.

Invertibility is pinned by tests/test_torch_export.py: import(export(p))
== p bitwise, and the exported dict strict-loads into the REAL reference
``modeling_finetune.VisionTransformer`` with forward parity.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from unite_tpu.utils.torch_import import _flatten

_INDEXED = re.compile(r"^(blocks|clip_decoder|resblocks)_(\d+)$")


def _conv3d_weight(kernel: np.ndarray, patch_size: int,
                   in_chans: int) -> np.ndarray:
    """[kt*kh*kw*C, D] matmul kernel → [D, C, kt, kh, kw] Conv3d weight
    (inverse of torch_import._patch_embed_kernel)."""
    k, d = kernel.shape
    kt = k // (patch_size * patch_size * in_chans)
    if kt * patch_size * patch_size * in_chans != k:
        raise ValueError(
            f"patch-embed kernel rows {k} not divisible by "
            f"{patch_size}x{patch_size}x{in_chans}")
    w = kernel.reshape(kt, patch_size, patch_size, in_chans, d)
    return np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2))


def flax_path_to_torch(path: Tuple[str, ...], arr: np.ndarray, *,
                       patch_size: int = 16,
                       in_chans: int = 3) -> Tuple[str, np.ndarray]:
    """Map one flax (path, array) to (torch key, array)."""
    parts: list = []
    for p in path:
        m = _INDEXED.match(p)
        if m:
            parts.extend(m.groups())
        else:
            parts.append(p)
    leaf = parts[-1]
    if leaf == "scale":  # LayerNorm
        parts[-1] = "weight"
        return ".".join(parts), arr
    if leaf == "kernel":
        parts[-1] = "weight"
        if len(path) >= 3 and path[-3] == "patch_embed" and path[-2] == "proj":
            return ".".join(parts), _conv3d_weight(arr, patch_size, in_chans)
        return ".".join(parts), np.ascontiguousarray(arr.T)
    return ".".join(parts), arr  # bias and plain parameters


def flax_params_to_state(params: dict, *, patch_size: int = 16,
                         in_chans: int = 3) -> Dict[str, "object"]:
    """Nested flax param dict → flat torch state dict (torch.Tensors)."""
    import torch

    state = {}
    for path, arr in _flatten(params).items():
        key, out = flax_path_to_torch(tuple(path), np.asarray(arr, np.float32),
                                      patch_size=patch_size, in_chans=in_chans)
        # copy: jax arrays expose read-only numpy views, torch wants writable
        state[key] = torch.from_numpy(np.array(out, copy=True))
    return state


def export_checkpoint(src_path: str, dst_path: str, *, patch_size: int = 16,
                      in_chans: int = 3) -> str:
    """Convert a framework ``.msgpack`` checkpoint to a reference-format
    ``.pth``: ``{'model': state_dict, 'epoch': ...}`` — the exact payload
    shape the reference's auto_load_model / load_student_from_ckpt expect
    (utils.py:739-776). Stage-3 combined trees export the student under
    ``model`` and the head as ``src_classifier`` keys in the same file."""
    import torch

    from unite_tpu.utils import checkpoint as ck

    payload = ck.load_checkpoint(src_path)
    model = payload["model"]
    extra = {}
    if "model" in model and "classifier" in model:  # stage-3 combined tree
        extra["src_classifier"] = flax_params_to_state(
            model["classifier"], patch_size=patch_size, in_chans=in_chans)
        model = model["model"]
    out = {"model": flax_params_to_state(model, patch_size=patch_size,
                                         in_chans=in_chans),
           "epoch": payload.get("epoch", 0), **extra}
    torch.save(out, dst_path)
    return dst_path
