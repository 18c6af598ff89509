"""Frozen CLIP visual teacher (flax), run per-frame on video.

Counterpart of /root/reference/src/models/clip.py:34-295. Behavioral parity:

* patch embedding = per-frame Conv with kernel_size=1 on time — implemented
  as the tubelet reshape+matmul PatchEmbed with ``tubelet_size=kernel_size``
  and no bias (clip.py:123-128);
* class embedding prepended per frame, 2D positional embedding, ln_pre
  (clip.py:150-152);
* residual blocks with **QuickGELU** (x * sigmoid(1.702x), clip.py:29-31) and
  a *full* qkv bias (torch MultiheadAttention), unlike the student's q/v-only
  bias;
* taps of the block outputs at ``return_index`` layers; each tap is
  ln_post'ed on the patch tokens (CLS stripped), projected to ``output_dim``
  and L2-normalized → ``[K, B, T*HW, output_dim]`` (clip.py:99-104,166-177);
* optional last-layer head-averaged CLS→patch attention probabilities
  ``[B*T, HW]`` (clip.py:95-96,181-183 — torch MHA ``need_weights=True``
  averages over heads);
* optional last-layer CLS token output (pre-ln_post) (clip.py:101-102).

The teacher is always frozen: entry code wraps calls in ``lax.stop_gradient``
and keeps its params out of the optimizer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unite_tpu.models.layers import LayerNorm, PatchEmbed
from unite_tpu.ops.attention import multi_head_attention
from unite_tpu.utils.registry import register_model

Dtype = Any


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _dense(features: int, *, quantize: bool, use_bias: bool, dtype, name: str):
    """nn.Dense, or its int8 twin when the frozen teacher is quantized."""
    if quantize:
        from unite_tpu.ops.quant import QuantDense

        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


class CLIPAttention(nn.Module):
    """Self-attention with packed qkv + full bias (torch MHA layout parity)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None
    quantize: bool = False

    @nn.compact
    def __call__(self, x, return_probs: bool = False,
                 cls_probs_only: bool = False):
        """cls_probs_only (with return_probs): return the head-averaged
        CLS-query attention ROW [B, N] instead of the full [B, N, N]
        matrix — the only piece the masking path consumes
        (reference clip.py:95-96 keeps need_weights' full matrix and the
        caller slices [:, 0, 1:]; materializing it costs ~1GB at the
        stage-1 batch). The attention OUTPUT still runs through the fused
        kernel; the CLS row is one [B, H, N] einsum + softmax."""
        from unite_tpu.ops.attention import fused_qkv_attention, use_fused_qkv

        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        qkv = _dense(
            3 * c, quantize=self.quantize, use_bias=True, dtype=self.dtype,
            name="in_proj",
        )(x)
        probs = None
        fused_ok = use_fused_qkv(n, self.use_pallas, fwd_only=True)
        if return_probs and cls_probs_only and fused_ok:
            out = fused_qkv_attention(qkv, self.num_heads, scale)
            qh = qkv[:, 0, :c].reshape(b, self.num_heads, head_dim)
            kh = qkv[:, :, c:2 * c].reshape(b, n, self.num_heads, head_dim)
            scores = jnp.einsum(
                "bhd,bnhd->bhn", qh.astype(jnp.float32),
                kh.astype(jnp.float32),
            ) * scale
            probs = jax.nn.softmax(scores, axis=-1).mean(axis=1)  # [B, N]
        elif not return_probs and fused_ok:
            # head split/merge fused into the kernel — no HBM transposes
            out = fused_qkv_attention(qkv, self.num_heads, scale)
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3))
                       for i in range(3))
            out = multi_head_attention(
                q, k, v, scale=scale, return_probs=return_probs,
                use_pallas=self.use_pallas,
            )
            if return_probs:
                out, probs = out
                probs = jnp.mean(probs, axis=1)  # head avg (torch MHA default)
                if cls_probs_only:
                    probs = probs[:, 0, :]  # CLS row [B, N]
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        out = _dense(
            c, quantize=self.quantize, use_bias=True, dtype=self.dtype,
            name="out_proj",
        )(out)
        if return_probs:
            return out, probs
        return out


class CLIPBlock(nn.Module):
    """Pre-norm residual attention block with QuickGELU MLP."""

    num_heads: int
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None
    quantize: bool = False

    @nn.compact
    def __call__(self, x, return_probs: bool = False,
                 cls_probs_only: bool = False):
        attn = CLIPAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            use_pallas=self.use_pallas, quantize=self.quantize, name="attn",
        )
        h = LayerNorm(epsilon=1e-5, name="ln_1")(x)
        probs = None
        if return_probs:
            h, probs = attn(h, return_probs=True,
                            cls_probs_only=cls_probs_only)
        else:
            h = attn(h)
        x = x + h

        h = LayerNorm(epsilon=1e-5, name="ln_2")(x)
        dim = x.shape[-1]
        h = _dense(4 * dim, quantize=self.quantize, use_bias=True,
                   dtype=self.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = _dense(dim, quantize=self.quantize, use_bias=True,
                   dtype=self.dtype, name="mlp_c_proj")(h)
        x = x + h
        if return_probs:
            return x, probs
        return x


class CLIPVisionTransformer(nn.Module):
    """CLIP visual encoder over video, folding time into the batch."""

    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    clip_norm_type: str = "l2"
    kernel_size: int = 1  # temporal kernel/stride of the patch conv
    return_attn: bool = False
    return_index: Sequence[int] = (6, 7, 8, 9, 10, 11)
    return_cls: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None
    quantize: bool = False  # int8 block matmuls (frozen teacher only)

    @nn.compact
    def __call__(self, x, vis_idx=None, cls_features: bool = False,
                 raw_taps: bool = False):
        """x: [B, T, H, W, 3] video.

        cls_features=True switches to image-encoder mode: returns ONLY the
        per-frame L2-normed projected CLS features [B*T', output_dim]
        (OpenAI ``encode_image`` semantics — ln_post(cls) @ proj — used by
        the stage-3 zero-shot teacher, utils.py:55-68). Reuses the same
        parameters; no taps/attention outputs.

        vis_idx: optional [B, N_vis_total] visible-token gather indices over
        the flattened T'*HW patch grid (masked-teacher path, clip.py:154-160);
        N_vis_total must be divisible by T'.

        raw_taps=True returns the tap stack BEFORE ln_post/proj/L2-norm
        ([K, B, T'*HW_vis, width], CLS stripped). The stage-1 engine gathers
        the ~20% visible tokens first and then applies ``project_clip_taps``
        — per-token-identical math at a fifth of the projection cost (the
        mask depends on this forward's own attention output, so the gather
        cannot happen inside this call).

        Returns (z, attn?, cls?):
          z    [K, B, T'*HW_vis, output_dim] L2-normed CLIP features
               (pre-projection width-dim taps when raw_taps)
          attn [B*T', HW] last-layer CLS→patch head-averaged probabilities
               (only when return_attn and vis_idx is None)
          cls  [B*T', width] last-layer CLS tokens (when return_cls)
        """
        b = x.shape[0]
        if x.shape[-3:-1] != (self.input_resolution, self.input_resolution):
            # loud, at trace time: a mismatched raster whose token count
            # happens to divide the configured grid would otherwise fold
            # frames into one spatial grid silently (t is derived from the
            # CONFIGURED resolution below)
            raise ValueError(
                f"teacher expects {self.input_resolution}x"
                f"{self.input_resolution} frames, got "
                f"{x.shape[-3]}x{x.shape[-2]} — resize the clip "
                f"(clip_input_resolution) or build the teacher with "
                f"input_resolution matching the input")
        x = PatchEmbed(
            embed_dim=self.width, patch_size=self.patch_size,
            tubelet_size=self.kernel_size, use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x.astype(self.dtype))  # [B, T'*HW, width]
        hw = (self.input_resolution // self.patch_size) ** 2
        t = x.shape[1] // hw
        x = x.reshape(b * t, hw, self.width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(self.width**-0.5),
            (self.width,), jnp.float32,
        )
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(self.width**-0.5),
            (hw + 1, self.width), jnp.float32,
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(x.dtype), (b * t, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(x.dtype)
        x = LayerNorm(epsilon=1e-5, name="ln_pre")(x)

        if vis_idx is not None:
            # Drop masked patch tokens (clip.py:154-160): gather over the
            # whole video's patch grid, then refold to per-frame sequences.
            cls_tok = x[:, :1]
            patches = x[:, 1:].reshape(b, t * hw, self.width)
            patches = jnp.take_along_axis(patches, vis_idx[..., None], axis=1)
            hw_vis = patches.shape[1] // t
            patches = patches.reshape(b * t, hw_vis, self.width)
            x = jnp.concatenate([cls_tok, patches], axis=1)
        else:
            hw_vis = hw

        taps = []
        attn = None
        cls_out = None
        return_index = list(self.return_index)
        for i in range(self.layers):
            want_attn = (self.return_attn and i == self.layers - 1
                         and vis_idx is None and not cls_features)
            blk = CLIPBlock(
                num_heads=self.heads, dtype=self.dtype,
                use_pallas=self.use_pallas, quantize=self.quantize,
                name=f"resblocks_{i}",
            )
            if want_attn:
                x, probs = blk(x, return_probs=True, cls_probs_only=True)
                attn = probs[:, 1:]  # CLS→patch [B*T', HW]
            else:
                x = blk(x)
            if i in return_index:
                taps.append(x)
            if (self.return_cls or cls_features) and i == self.layers - 1:
                cls_out = x[:, 0, :]

        if cls_features:
            feat = LayerNorm(epsilon=1e-5, name="ln_post")(cls_out)
            proj = self.param(
                "proj", nn.initializers.normal(self.width**-0.5),
                (self.width, self.output_dim), jnp.float32,
            )
            feat = jnp.einsum(
                "bc,cd->bd", feat, proj.astype(feat.dtype),
                preferred_element_type=jnp.float32,
            )
            return feat / jnp.linalg.norm(
                feat.astype(jnp.float32), axis=-1, keepdims=True
            )

        z = jnp.stack(taps)  # [K, B*T', 1+HW_vis, width]
        k = z.shape[0]
        z = z[:, :, 1:, :]  # strip CLS
        if raw_taps:
            z = z.reshape(k, b, t * hw_vis, self.width)
        else:
            z = LayerNorm(epsilon=1e-5, name="ln_post")(z)
            z = z.reshape(k, b, t, hw_vis, self.width).reshape(
                k, b, t * hw_vis, self.width
            )
            proj = self.param(
                "proj", nn.initializers.normal(self.width**-0.5),
                (self.width, self.output_dim), jnp.float32,
            )
            z = jnp.einsum(
                "kbnc,cd->kbnd", z, proj.astype(z.dtype),
                preferred_element_type=jnp.float32,
            )
            if self.clip_norm_type == "l2":
                z = z / jnp.linalg.norm(
                    z.astype(jnp.float32), axis=-1, keepdims=True
                )
            elif self.clip_norm_type != "none":
                raise NotImplementedError(self.clip_norm_type)
            z = z.astype(self.dtype)

        outs = [z]
        if self.return_attn:
            outs.append(attn)
        if self.return_cls:
            outs.append(cls_out)
        return outs[0] if len(outs) == 1 else tuple(outs)


def project_clip_taps(params, taps, clip_norm_type: str = "l2",
                      dtype=jnp.float32, output_dtype=None):
    """ln_post + proj + L2-norm on a (gathered) tap stack [..., N, width].

    Pure-function twin of the tail of ``CLIPVisionTransformer.__call__``
    (reference clip.py:166-177): per-token ops, so applying it AFTER the
    visible-token gather is mathematically identical to gathering the full
    projected output — at ~20% of the cost for stage-1's mask_ratio 0.8.
    ``params`` is the teacher's param dict (needs ``ln_post`` and ``proj``).
    ``dtype`` must match the teacher module's compute dtype for bit-parity
    with the fused path.
    """
    from unite_tpu.models.layers import layer_norm

    ln = params["ln_post"]
    # same LN math as the module path (torch-default eps, see LayerNorm
    # usages above) — shared helper keeps the two paths bit-identical
    y = layer_norm(taps, ln["scale"], ln["bias"], epsilon=1e-5)
    z = jnp.einsum(
        "...nc,cd->...nd", y, params["proj"].astype(y.dtype),
        preferred_element_type=jnp.float32,
    )
    if clip_norm_type == "l2":
        z = z / jnp.linalg.norm(z.astype(jnp.float32), axis=-1, keepdims=True)
    elif clip_norm_type != "none":
        raise NotImplementedError(clip_norm_type)
    return z.astype(output_dtype if output_dtype is not None else dtype)


@register_model
def clip_b16(**kwargs):
    """CLIP ViT-B/16 teacher (clip.py:234-253 geometry)."""
    return CLIPVisionTransformer(
        patch_size=16, width=768, layers=12, heads=12, output_dim=512,
        **kwargs,
    )


@register_model
def clip_l14(**kwargs):
    return CLIPVisionTransformer(
        patch_size=14, width=1024, layers=24, heads=16, output_dim=768,
        **kwargs,
    )


@register_model
def clip_l14_336(**kwargs):
    return CLIPVisionTransformer(
        input_resolution=336, patch_size=14, width=1024, layers=24, heads=16,
        output_dim=768, **kwargs,
    )
