"""Int8 quantization for the frozen CLIP teacher's matmuls.

The stage-1 teacher is frozen and forward-only, so its four Dense matmuls
per block (qkv in_proj, out_proj, mlp_c_fc, mlp_c_proj — ~95% of teacher
FLOPs) can run int8 with:

* per-output-channel symmetric weight scales (computed once, offline, from
  the frozen fp32 weights), and
* per-token dynamic symmetric activation scales (one abs-max pass per call
  — cheap relative to the halved matmul).

This is a TPU-native analog of the reference's fp16 autocast teacher
(/root/reference/run_stage1.py:360-377 runs the frozen CLIP teacher under
``torch.cuda.amp.autocast``): same role — cheap frozen-teacher inference —
mapped to the TPU's integer path instead of CUDA fp16.

**Measured status (v5e, this round)**: int8 matmuls do NOT beat bf16
through either XLA ``dot_general`` (136 vs 118 TF/s-equiv,
tools/quant_probe.py) or a Pallas kernel (109 TOP/s vs 105 TF/s,
tools/quant_kernel_probe.py) — the advertised double-rate int8 MXU path is
not reachable from this stack, so ``quantize=True`` is OFF by default
everywhere and exists as a tested option for hardware/toolchains where the
integer path is faster.

The teacher provides soft regression targets and masking attention, not
gradients, so small quantization error perturbs the distillation target
slightly rather than corrupting training; ``tests/test_quant.py`` pins the
error bounds.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis: int = 0):
    """Symmetric per-output-channel int8 quantization of a [in, out] kernel.

    Returns (w_q int8 [in, out], scale fp32 [out]) with
    ``w ≈ w_q * scale[None, :]`` (axis is the contraction axis).
    """
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.round(w32 / jnp.expand_dims(scale, axis))
    w_q = jnp.clip(w_q, -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_dense(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None,
               out_dtype: Any = None) -> jnp.ndarray:
    """y = x @ (w_q · w_scale) + bias with per-token dynamic int8 activations.

    x: [..., in]; w_q: int8 [in, out]; w_scale: fp32 [out].
    The int8×int8→int32 contraction hits the MXU's double-rate path.
    """
    out_dtype = out_dtype or x.dtype
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    x_q = jnp.round(x32 / s_x).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * w_scale
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in for ``nn.Dense`` holding pre-quantized int8 weights.

    Param layout: ``kernel_q`` int8 [in, features], ``kernel_scale`` fp32
    [features], optional ``bias`` fp32 [features]. Real weights come from
    ``quantize_dense_params`` applied to an imported fp32 tree — ``init``
    only fixes shapes/dtypes.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w_q = self.param(
            "kernel_q", nn.initializers.zeros, (in_dim, self.features),
            jnp.int8,
        )
        w_scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        return int8_dense(x, w_q, w_scale, bias, out_dtype=self.dtype)


def quantize_dense_params(dense_params):
    """{'kernel', 'bias'?} fp32 → {'kernel_q', 'kernel_scale', 'bias'?}."""
    out = {k: v for k, v in dense_params.items() if k != "kernel"}
    w_q, scale = quantize_weight(dense_params["kernel"])
    out["kernel_q"] = w_q
    out["kernel_scale"] = scale
    return out


# Dense submodule names inside the CLIP teacher that carry ~95% of its
# FLOPs; conv1 (patch embed, <1% of FLOPs) and the tap/cls projections
# deliberately stay bf16.
CLIP_QUANT_DENSE_NAMES = ("in_proj", "out_proj", "mlp_c_fc", "mlp_c_proj")


def quantize_clip_params(params):
    """fp32/bf16 CLIP teacher param tree → int8-teacher param tree.

    Walks the tree; every submodule named in ``CLIP_QUANT_DENSE_NAMES``
    has its kernel replaced by (kernel_q, kernel_scale). Use with a
    ``CLIPVisionTransformer(quantize=True)`` module.
    """
    from collections.abc import Mapping

    def walk(name, node):
        if isinstance(node, Mapping):
            if name in CLIP_QUANT_DENSE_NAMES and "kernel" in node:
                return quantize_dense_params(dict(node))
            return {k: walk(k, v) for k, v in node.items()}
        return node

    return walk(None, params)
