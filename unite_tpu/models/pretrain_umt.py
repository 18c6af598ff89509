"""UMT masked-pretraining student (encoder + K CLIP-alignment decoders).

Counterpart of /root/reference/src/models/modeling_pretrain_umt.py:53-333
(`PretrainVisionTransformerEncoder`, `PretrainVisionTransformer`,
`pretrain_umt_{base,large}_patch16_224`). Differences from the adaptation
model (models/adaptation.py): no CLS-token option, no clip_only early exit,
and return layers are counted **from the top**:
``return_index = [depth - i*interval - 1 for i in range(clip_return_layer)]``
(modeling_pretrain_umt.py:74-77) — note taps are still appended in ascending
layer order during the forward pass.

Masking is TPU-native: the caller passes ``vis_idx`` [B, N_vis] (static
N_vis) instead of a boolean mask; the encoder gathers visible tokens with
``take_along_axis`` so all shapes stay static under jit.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unite_tpu.models.adaptation import gather_tokens
from unite_tpu.models.layers import (
    Block,
    LayerNorm,
    LinearDecoder,
    PatchEmbed,
    get_sinusoid_encoding_table,
    num_patches,
    trunc_normal_02,
    xavier_uniform,
)
from unite_tpu.utils.registry import register_model


def top_down_return_index(depth: int, n_layers: int, interval: int = 1):
    """[depth - i*interval - 1 for i in range(n_layers)], ascending order."""
    return tuple(sorted(depth - i * interval - 1 for i in range(n_layers)))


class PretrainEncoder(nn.Module):
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
    return_index: Sequence[int] = (11,)
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False
    # remat only blocks idx < remat_num when >= 0 (reference
    # 'use_checkpoint and idx < checkpoint_num', e.g.
    # modeling_adaptation.py:158); -1 = all blocks
    remat_num: int = -1

    @nn.compact
    def __call__(self, x, vis_idx=None, deterministic: bool = True):
        n_patch = num_patches(
            self.img_size, self.patch_size, self.num_frames, self.tubelet_size
        )
        # mask gather BEFORE the patch projection (row-wise identical,
        # ~5x less embed work+grad at mask_ratio 0.8)
        x = PatchEmbed(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            tubelet_size=self.tubelet_size, dtype=self.dtype,
            kernel_init=xavier_uniform, name="patch_embed",
        )(x.astype(self.dtype), vis_idx)
        b = x.shape[0]

        if self.use_learnable_pos_emb:
            pos_embed = self.param(
                "pos_embed", trunc_normal_02, (1, n_patch, self.embed_dim),
                jnp.float32,
            )
        else:
            pos_embed = get_sinusoid_encoding_table(n_patch, self.embed_dim)
        pos = jnp.broadcast_to(
            jnp.asarray(pos_embed).astype(x.dtype), (b, n_patch, self.embed_dim)
        )
        if vis_idx is not None:
            pos = gather_tokens(pos, vis_idx)
        x = x + pos

        return_index = list(self.return_index)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        taps = []
        remat_cls = (nn.remat(Block, static_argnums=(2,))
                     if self.remat else Block)
        for i in range(self.depth):
            block_cls = (remat_cls if self.remat_num < 0
                         or i < self.remat_num else Block)
            x = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=float(dpr[i]), init_values=self.init_values,
                norm_eps=self.norm_eps, dtype=self.dtype,
                kernel_init=xavier_uniform, use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(x, deterministic)
            if i in return_index:
                taps.append(x)

        norm = LayerNorm(epsilon=self.norm_eps, name="norm")
        # reference returns only the normed taps (modeling_pretrain_umt.py:149-152)
        return norm(jnp.stack(taps))  # [K, B, N_vis, C]


class PretrainUMT(nn.Module):
    """Encoder + per-tap linear decoders to CLIP space (wrapper model)."""

    img_size: int = 224
    patch_size: int = 16
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
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
    clip_decoder_embed_dim: int = 768
    clip_output_dim: int = 512
    clip_norm_type: str = "l2"
    clip_return_layer: int = 1
    clip_student_return_interval: int = 1
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False
    # remat only blocks idx < remat_num when >= 0 (reference
    # 'use_checkpoint and idx < checkpoint_num', e.g.
    # modeling_adaptation.py:158); -1 = all blocks
    remat_num: int = -1

    @nn.compact
    def __call__(self, x, vis_idx=None, deterministic: bool = True):
        """Returns x_clip [K, B, N_vis, clip_output_dim]."""
        return_index = top_down_return_index(
            self.encoder_depth, self.clip_return_layer,
            self.clip_student_return_interval,
        )
        x_clip_vis = PretrainEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.encoder_embed_dim, depth=self.encoder_depth,
            num_heads=self.encoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop_rate=self.drop_rate, attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            num_frames=self.num_frames, tubelet_size=self.tubelet_size,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            return_index=return_index, norm_eps=self.norm_eps,
            dtype=self.dtype, use_pallas=self.use_pallas, remat=self.remat,
            remat_num=self.remat_num,
            name="encoder",
        )(x, vis_idx, deterministic)

        n_patch = num_patches(
            self.img_size, self.patch_size, self.num_frames, self.tubelet_size
        )
        clip_pos = jnp.asarray(
            get_sinusoid_encoding_table(n_patch, self.clip_decoder_embed_dim)
        )
        clip_pos = jnp.broadcast_to(
            clip_pos, (x_clip_vis.shape[1], n_patch, self.clip_decoder_embed_dim)
        )
        if vis_idx is not None:
            clip_pos = gather_tokens(clip_pos, vis_idx)
        x_clip_full = x_clip_vis + clip_pos[None].astype(x_clip_vis.dtype)

        outs = []
        for idx in range(self.clip_return_layer):
            outs.append(
                LinearDecoder(
                    out_dim=self.clip_output_dim,
                    clip_norm_type=self.clip_norm_type,
                    norm_eps=self.norm_eps, dtype=self.dtype,
                    name=f"clip_decoder_{idx}",
                )(x_clip_full[idx])
            )
        return jnp.stack(outs)


@register_model
def pretrain_umt_base_patch16_224(**kwargs):
    return PretrainUMT(
        img_size=224, patch_size=16, encoder_embed_dim=768, encoder_depth=12,
        encoder_num_heads=12, mlp_ratio=4, qkv_bias=True, norm_eps=1e-6,
        **kwargs,
    )


@register_model
def pretrain_umt_large_patch16_224(**kwargs):
    return PretrainUMT(
        img_size=224, patch_size=16, encoder_embed_dim=1024, encoder_depth=24,
        encoder_num_heads=16, mlp_ratio=4, qkv_bias=True, norm_eps=1e-6,
        **kwargs,
    )
