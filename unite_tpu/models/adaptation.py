"""Adaptation video ViT — the stage-1/stage-3 student model.

Counterpart of /root/reference/src/models/modeling_adaptation.py:54-378
(`AdaptationVisionTransformer`, `adaptation_umt_{base,large}_patch16_224`):
a masked ViT encoder that (a) drops masked tokens before the blocks, (b) taps
K intermediate layers, and (c) projects each tap to CLIP space through a
per-layer linear decoder with added CLIP positional embeddings.

TPU-native masking: instead of boolean fancy-indexing (``x[~mask]``), the
caller passes ``vis_idx`` [B, N_vis] (static N_vis, from
ops.masking.visible_indices) and the encoder gathers with take_along_axis —
shapes stay static under jit. ``vis_idx=None`` means full visibility.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

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


def gather_tokens(x: jnp.ndarray, vis_idx: jnp.ndarray) -> jnp.ndarray:
    """x: [B, N, C], vis_idx: [B, N_vis] -> [B, N_vis, C] (order-preserving)."""
    return jnp.take_along_axis(x, vis_idx[..., None], axis=1)


class AdaptationEncoder(nn.Module):
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
    return_index: Sequence[int] = (6, 7, 8, 9, 10, 11)
    use_cls_token: bool = False
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False
    # remat only blocks idx < remat_num when >= 0 (reference
    # 'use_checkpoint and idx < checkpoint_num', e.g.
    # modeling_adaptation.py:158); -1 = all blocks
    remat_num: int = -1

    @nn.compact
    def __call__(self, x, vis_idx=None, clip_only: bool = False,
                 deterministic: bool = True):
        n_patch = num_patches(
            self.img_size, self.patch_size, self.num_frames, self.tubelet_size
        )
        embed = PatchEmbed(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            tubelet_size=self.tubelet_size, dtype=self.dtype,
            kernel_init=xavier_uniform, name="patch_embed",
        )
        # Without a CLS token the mask gather moves BEFORE the patch
        # projection (row-wise identical, ~5x less embed work+grad at
        # mask_ratio 0.8); the CLS path keeps the reference order
        # (modeling_adaptation.py:147-153).
        gather_early = vis_idx is not None and not self.use_cls_token
        x = embed(x.astype(self.dtype), vis_idx if gather_early else None)
        b = x.shape[0]

        seq = n_patch + (1 if self.use_cls_token else 0)
        if self.use_cls_token:
            cls_token = self.param(
                "cls_token", trunc_normal_02, (1, 1, self.embed_dim), jnp.float32
            )
            cls = jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, self.embed_dim))
            x = jnp.concatenate([cls, x], axis=1)

        if self.use_learnable_pos_emb:
            pos_embed = self.param(
                "pos_embed", trunc_normal_02, (1, seq, self.embed_dim), jnp.float32
            )
        else:
            pos_embed = get_sinusoid_encoding_table(seq, self.embed_dim)
        pos = jnp.broadcast_to(
            jnp.asarray(pos_embed).astype(x.dtype), (b, seq, self.embed_dim)
        )
        if gather_early:
            pos = gather_tokens(pos, vis_idx)
        x = x + pos

        # Mask gather: CLS token (if any) stays outside masking
        # (reference modeling_adaptation.py:147-153).
        if vis_idx is not None and not gather_early:
            cls_tok, patches = x[:, :1], x[:, 1:]
            x = jnp.concatenate(
                [cls_tok, gather_tokens(patches, vis_idx)], axis=1
            )

        return_index = list(self.return_index)
        max_ret = max(return_index)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        taps = []
        remat_cls = (nn.remat(Block, static_argnums=(2,))
                     if self.remat else Block)
        for i in range(self.depth):
            if clip_only and i > max_ret:
                break  # early exit (modeling_adaptation.py:165-166)
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
        x_clip_vis = norm(jnp.stack(taps))  # [K, B, N_vis(+cls), C]
        if clip_only:
            return None, x_clip_vis
        return norm(x), x_clip_vis


class AdaptationVisionTransformer(nn.Module):
    """Encoder + K CLIP-alignment linear decoders."""

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
    use_cls_token: bool = False
    num_frames: int = 16
    tubelet_size: int = 2
    clip_decoder_embed_dim: int = 768
    clip_output_dim: int = 512
    clip_norm_type: str = "l2"
    clip_return_layers: Sequence[int] = (6, 7, 8, 9, 10, 11)
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False
    # remat only blocks idx < remat_num when >= 0 (reference
    # 'use_checkpoint and idx < checkpoint_num', e.g.
    # modeling_adaptation.py:158); -1 = all blocks
    remat_num: int = -1

    @nn.compact
    def __call__(self, x, vis_idx=None, clip_only: bool = False,
                 deterministic: bool = True):
        """Returns x_clip [K,B,N_vis,512] if clip_only else (x_vis, x_clip)."""
        x_vis, x_clip_vis = AdaptationEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.encoder_embed_dim, depth=self.encoder_depth,
            num_heads=self.encoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop_rate=self.drop_rate, attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            num_frames=self.num_frames, tubelet_size=self.tubelet_size,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            return_index=tuple(self.clip_return_layers),
            use_cls_token=self.use_cls_token, norm_eps=self.norm_eps,
            dtype=self.dtype, use_pallas=self.use_pallas, remat=self.remat,
            remat_num=self.remat_num,
            name="encoder",
        )(x, vis_idx, clip_only, deterministic)

        if self.use_cls_token:
            # strip CLS from taps before CLIP alignment (reference :315-320)
            x_clip_tokens = x_clip_vis[:, :, 1:, :]
        else:
            x_clip_tokens = x_clip_vis

        n_patch = num_patches(
            self.img_size, self.patch_size, self.num_frames, self.tubelet_size
        )
        clip_pos = jnp.asarray(
            get_sinusoid_encoding_table(n_patch, self.clip_decoder_embed_dim)
        )
        clip_pos = jnp.broadcast_to(
            clip_pos, (x_clip_tokens.shape[1], n_patch, self.clip_decoder_embed_dim)
        )
        if vis_idx is not None:
            clip_pos = gather_tokens(clip_pos, vis_idx)
        x_clip_full = x_clip_tokens + clip_pos[None].astype(x_clip_tokens.dtype)

        outs = []
        for idx in range(len(self.clip_return_layers)):
            outs.append(
                LinearDecoder(
                    out_dim=self.clip_output_dim,
                    clip_norm_type=self.clip_norm_type,
                    norm_eps=self.norm_eps, dtype=self.dtype,
                    name=f"clip_decoder_{idx}",
                )(x_clip_full[idx])
            )
        x_clip = jnp.stack(outs)  # [K, B, N_vis, clip_output_dim]

        if clip_only:
            return x_clip
        return x_vis, x_clip


@register_model
def adaptation_umt_base_patch16_224(**kwargs):
    return AdaptationVisionTransformer(
        img_size=224, patch_size=16, encoder_embed_dim=768, encoder_depth=12,
        encoder_num_heads=12, mlp_ratio=4, qkv_bias=True, norm_eps=1e-6,
        **kwargs,
    )


@register_model
def adaptation_umt_large_patch16_224(**kwargs):
    return AdaptationVisionTransformer(
        img_size=224, patch_size=16, encoder_embed_dim=1024, encoder_depth=24,
        encoder_num_heads=16, mlp_ratio=4, qkv_bias=True, norm_eps=1e-6,
        **kwargs,
    )
