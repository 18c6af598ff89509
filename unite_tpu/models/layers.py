"""Transformer primitives shared by all UNITE-TPU model families.

Counterparts of /root/reference/src/models/modeling_finetune.py:42-235
(DropPath, Mlp, Attention, Block, PatchEmbed, sinusoid table), redesigned
TPU-first:

* channels-last video layout [B, T, H, W, C] throughout (the reference is
  NCTHW);
* tubelet patch embedding is a reshape + one big matmul on the MXU instead
  of Conv3d (numerically identical — stride == kernel);
* attention runs through the Pallas flash kernel (ops/attention.py) with an
  XLA fallback;
* bf16 compute / fp32 params; LayerNorm statistics always in fp32;
* every stochastic op (dropout, droppath) draws from explicitly threaded
  flax RNG collections — no global RNG state.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.ops.attention import multi_head_attention

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()
trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def get_sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sin/cos positional table, [1, n_position, d_hid] fp32.

    Same formula as the reference (modeling_finetune.py:225-235):
    angle(pos, j) = pos / 10000^(2*(j//2)/d); even dims sin, odd dims cos.
    """
    pos = np.arange(n_position)[:, None]  # [N, 1]
    j = np.arange(d_hid)[None, :]  # [1, D]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None].astype(np.float32)


def layer_norm(x, scale, bias, epsilon: float):
    """fp32-statistics LayerNorm from raw params.

    The single source of the LN math: used by the ``LayerNorm`` module and
    by frozen-param paths that apply it functionally (e.g.
    ``models.clip.project_clip_taps``) — keeping them bit-identical."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * scale + bias
    return y.astype(orig_dtype)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm(x, scale, bias, self.epsilon)


class DropPath(nn.Module):
    """Per-sample stochastic depth on residual branches (timm semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def gelu_for(dtype):
    """GELU variant by compute dtype.

    Exact-erf GELU (torch nn.GELU default, modeling_finetune.py Mlp) lowers
    to a long rational polynomial on the TPU VPU — measured ~17 ms/step at
    the stage-2 workload — while tanh-GELU runs at native transcendental
    rate. Their outputs differ by <5e-4 absolute (at or below bf16
    activation rounding), so bf16 compute uses tanh; fp32 keeps exact erf
    (the golden/engine-parity tests vs the torch reference run fp32 and
    stay bit-faithful to its erf)."""
    if dtype == jnp.bfloat16:
        return lambda x: jax.nn.gelu(x, approximate=True)
    return lambda x: jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    act: Optional[Callable] = None
    drop: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform
    # separate fc2 init (defaults to kernel_init): the MLP classifier head
    # scales ONLY fc2 by init_scale (modeling_finetune.py:329-330)
    kernel_init_out: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_features or x.shape[-1]
        x = nn.Dense(
            self.hidden_features, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=self.kernel_init, name="fc1",
        )(x)
        x = (self.act or gelu_for(self.dtype))(x)
        x = nn.Dense(
            out_dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=self.kernel_init_out or self.kernel_init, name="fc2",
        )(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with the reference's q/v-only bias scheme.

    The reference (modeling_finetune.py:76-119) uses a single qkv projection
    with bias only on q and v (k bias fixed at zero). Output optionally
    includes head-averaged attention probabilities (teacher path).
    """

    num_heads: int
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_probs: bool = False):
        from unite_tpu.ops.attention import fused_qkv_attention, use_fused_qkv

        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv = nn.Dense(
            3 * c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=self.kernel_init, name="qkv",
        )(x)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (c,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (c,), jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(qkv.dtype)

        probs = None
        needs_drop = self.attn_drop > 0.0 and not deterministic
        if not return_probs and not needs_drop and use_fused_qkv(
                n, self.use_pallas, fwd_only=deterministic, dim=c):
            out = fused_qkv_attention(qkv, self.num_heads, scale)
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = (
                jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
            )  # each [B, H, N, D]
            dropout_rng = self.make_rng("dropout") if needs_drop else None
            out = multi_head_attention(
                q, k, v, scale=scale, return_probs=return_probs,
                dropout_rate=self.attn_drop, dropout_rng=dropout_rng,
                deterministic=deterministic, use_pallas=self.use_pallas,
            )
            if return_probs:
                out, probs = out
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        out = nn.Dense(
            c, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=self.kernel_init, name="proj",
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_probs:
            return out, probs
        return out


class Block(nn.Module):
    """Pre-norm transformer block with optional layer-scale gammas."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        attn_out = Attention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, dtype=self.dtype,
            kernel_init=self.kernel_init, use_pallas=self.use_pallas,
            name="attn",
        )(LayerNorm(epsilon=self.norm_eps, name="norm1")(x), deterministic)

        if self.init_values is not None and self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values),
                (dim,), jnp.float32,
            )
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values),
                (dim,), jnp.float32,
            )
        else:
            gamma_1 = gamma_2 = None

        dp = DropPath(self.drop_path, name="drop_path")
        if gamma_1 is not None:
            attn_out = attn_out * gamma_1.astype(attn_out.dtype)
        x = x + dp(attn_out, deterministic)

        mlp_out = Mlp(
            hidden_features=int(dim * self.mlp_ratio), drop=self.drop,
            dtype=self.dtype, kernel_init=self.kernel_init, name="mlp",
        )(LayerNorm(epsilon=self.norm_eps, name="norm2")(x), deterministic)
        if gamma_2 is not None:
            mlp_out = mlp_out * gamma_2.astype(mlp_out.dtype)
        x = x + dp(mlp_out, deterministic)
        return x


class PatchEmbed(nn.Module):
    """Tubelet patch embedding as reshape + matmul (MXU-friendly).

    Equivalent to the reference's Conv3d(kernel=stride=(tubelet, p, p))
    (modeling_finetune.py:153-175). Input [B, T, H, W, C]; output [B, N, D]
    with N = (T/tubelet)*(H/p)*(W/p), patch vector ordering (kt, kh, kw, c).
    """

    embed_dim: int = 768
    patch_size: int = 16
    tubelet_size: int = 2
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x, vis_idx=None):
        """vis_idx: optional [B, N_vis] patch gather indices applied to the
        raw patch VECTORS before the projection matmul — row-wise identical
        to projecting everything and gathering after, at ~20% of the
        embed cost under stage-1 masking."""
        b, t, h, w, c = x.shape
        p, ts = self.patch_size, self.tubelet_size
        assert t % ts == 0 and h % p == 0 and w % p == 0, (
            f"video dims ({t},{h},{w}) not divisible by tubelet/patch ({ts},{p})"
        )
        x = x.reshape(b, t // ts, ts, h // p, p, w // p, p, c)
        # -> [B, T', H', W', ts, ph, pw, C]
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, (t // ts) * (h // p) * (w // p), ts * p * p * c)
        if vis_idx is not None:
            x = jnp.take_along_axis(x, vis_idx[..., None], axis=1)
        x = nn.Dense(
            self.embed_dim, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=self.kernel_init, name="proj",
        )(x)
        return x


def num_patches(img_size: int, patch_size: int, num_frames: int, tubelet_size: int) -> int:
    return (img_size // patch_size) ** 2 * (num_frames // tubelet_size)


class LinearDecoder(nn.Module):
    """Linear projection + LayerNorm + optional L2-norm to CLIP space.

    Counterpart of the reference's ``Linear_Decoder``
    (modeling_adaptation.py:183-217 / modeling_pretrain_umt.py:152-186).
    """

    out_dim: int = 512
    clip_norm_type: str = "l2"
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, name="head",
        )(x)
        x = LayerNorm(epsilon=self.norm_eps, name="norm")(x)
        if self.clip_norm_type == "l2":
            x32 = x.astype(jnp.float32)
            x = (x32 / jnp.linalg.norm(x32, axis=-1, keepdims=True)).astype(x.dtype)
        elif self.clip_norm_type != "none":
            raise NotImplementedError(self.clip_norm_type)
        return x
