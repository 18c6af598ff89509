"""VideoMAE pixel-reconstruction pretraining model (legacy family).

Counterpart of /root/reference/src/models/modeling_pretrain.py:37-372
(`PretrainVisionTransformer{Encoder,Decoder}`,
`pretrain_videomae_{base,large,huge}_patch16_224`): encoder on visible
tokens only; decoder sees [visible tokens + mask tokens] each with sinusoid
pos-emb and predicts the normalized pixels of the masked patches
(`decoder_num_classes = 3 * tubelet * patch**2`, modeling_pretrain.py:134,201).

TPU-native masking: caller passes ``vis_idx`` [B, N_vis] and ``mask_idx``
[B, N_mask] (both static sizes) instead of a boolean mask; the "shuffle pos
embedding instead of unshuffling tokens" trick (modeling_pretrain.py:289-295)
is then two gathers.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unite_tpu.models.adaptation import gather_tokens
from unite_tpu.models.layers import (
    Block,
    LayerNorm,
    PatchEmbed,
    get_sinusoid_encoding_table,
    num_patches,
    trunc_normal_02,
    xavier_uniform,
)
from unite_tpu.utils.registry import register_model


class MAEEncoder(nn.Module):
    """ViT encoder over visible tokens; returns last-layer normed features."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    num_frames: int = 16
    tubelet_size: int = 2
    use_learnable_pos_emb: bool = False
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, vis_idx=None, deterministic: bool = True):
        n_patch = num_patches(
            self.img_size, self.patch_size, self.num_frames, self.tubelet_size
        )
        x = PatchEmbed(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            tubelet_size=self.tubelet_size, dtype=self.dtype,
            kernel_init=xavier_uniform, name="patch_embed",
        )(x.astype(self.dtype))
        if self.use_learnable_pos_emb:
            pos_embed = self.param(
                "pos_embed", trunc_normal_02, (1, n_patch, self.embed_dim),
                jnp.float32,
            )
        else:
            pos_embed = get_sinusoid_encoding_table(n_patch, self.embed_dim)
        x = x + jnp.asarray(pos_embed).astype(x.dtype)
        if vis_idx is not None:
            x = gather_tokens(x, vis_idx)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=float(dpr[i]), init_values=self.init_values,
                norm_eps=self.norm_eps, dtype=self.dtype,
                kernel_init=xavier_uniform, use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(x, deterministic)
        return LayerNorm(epsilon=self.norm_eps, name="norm")(x)


class MAEDecoder(nn.Module):
    """Transformer decoder predicting pixels of the trailing mask tokens."""

    num_classes: int = 1536
    embed_dim: int = 512
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, return_token_num: int, deterministic: bool = True):
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=float(dpr[i]), init_values=self.init_values,
                norm_eps=self.norm_eps, dtype=self.dtype,
                kernel_init=xavier_uniform, use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(x, deterministic)
        if return_token_num > 0:
            x = x[:, -return_token_num:]
        x = LayerNorm(epsilon=self.norm_eps, name="norm")(x)
        return nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, name="head",
        )(x)


class PretrainVideoMAE(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_num_classes: int = 1536
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_learnable_pos_emb: bool = False
    num_frames: int = 16
    tubelet_size: int = 2
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, vis_idx, mask_idx, deterministic: bool = True):
        """Returns [B, N_mask, 3*tubelet*patch**2] pixel predictions."""
        x_vis = MAEEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.encoder_embed_dim, depth=self.encoder_depth,
            num_heads=self.encoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop_rate=self.drop_rate, attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            num_frames=self.num_frames, tubelet_size=self.tubelet_size,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            norm_eps=self.norm_eps, dtype=self.dtype,
            use_pallas=self.use_pallas, name="encoder",
        )(x, vis_idx, deterministic)

        x_vis = nn.Dense(
            self.decoder_embed_dim, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=xavier_uniform,
            name="encoder_to_decoder",
        )(x_vis)

        b = x_vis.shape[0]
        n_patch = num_patches(
            self.img_size, self.patch_size, self.num_frames, self.tubelet_size
        )
        pos = jnp.asarray(
            get_sinusoid_encoding_table(n_patch, self.decoder_embed_dim)
        )
        pos = jnp.broadcast_to(pos, (b, n_patch, self.decoder_embed_dim))
        pos_vis = gather_tokens(pos, vis_idx).astype(x_vis.dtype)
        pos_mask = gather_tokens(pos, mask_idx).astype(x_vis.dtype)

        mask_token = self.param(
            "mask_token", trunc_normal_02, (1, 1, self.decoder_embed_dim),
            jnp.float32,
        )
        n_mask = mask_idx.shape[1]
        x_full = jnp.concatenate(
            [x_vis + pos_vis, mask_token.astype(x_vis.dtype) + pos_mask], axis=1
        )
        return MAEDecoder(
            num_classes=self.decoder_num_classes,
            embed_dim=self.decoder_embed_dim, depth=self.decoder_depth,
            num_heads=self.decoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop_rate=self.drop_rate, attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            norm_eps=self.norm_eps, dtype=self.dtype,
            use_pallas=self.use_pallas, name="decoder",
        )(x_full, n_mask, deterministic)


@register_model
def pretrain_videomae_base_patch16_224(**kwargs):
    return PretrainVideoMAE(
        img_size=224, patch_size=16, encoder_embed_dim=768, encoder_depth=12,
        encoder_num_heads=12, decoder_num_classes=1536, decoder_embed_dim=384,
        decoder_num_heads=6, mlp_ratio=4, qkv_bias=True, norm_eps=1e-6,
        **kwargs,
    )


@register_model
def pretrain_videomae_large_patch16_224(**kwargs):
    return PretrainVideoMAE(
        img_size=224, patch_size=16, encoder_embed_dim=1024, encoder_depth=24,
        encoder_num_heads=16, decoder_num_classes=1536, decoder_embed_dim=512,
        decoder_num_heads=8, mlp_ratio=4, qkv_bias=True, norm_eps=1e-6,
        **kwargs,
    )


@register_model
def pretrain_videomae_huge_patch16_224(**kwargs):
    return PretrainVideoMAE(
        img_size=224, patch_size=16, encoder_embed_dim=1280, encoder_depth=32,
        encoder_num_heads=16, decoder_num_classes=1536, decoder_embed_dim=640,
        decoder_num_heads=8, mlp_ratio=4, qkv_bias=True, norm_eps=1e-6,
        **kwargs,
    )
