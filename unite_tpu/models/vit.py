"""Classification video ViT (stage-2 fine-tuning model).

Counterpart of /root/reference/src/models/modeling_finetune.py:237-419
(`VisionTransformer`, `vit_base/large_patch16_224/384`). Behavior preserved:
tubelet patch embed, fixed sinusoid (or learnable) positional embeddings,
pre-norm blocks, mean-pool + fc_norm (default) or CLS-token readout, linear
or MLP classifier head whose init is scaled by ``init_scale``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unite_tpu.models.layers import (
    Block,
    LayerNorm,
    Mlp,
    PatchEmbed,
    get_sinusoid_encoding_table,
    num_patches,
    trunc_normal_02,
)
from unite_tpu.utils.registry import register_model


def scaled_trunc_normal(scale: float, stddev: float = 0.02):
    base = nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    fc_drop_rate: float = 0.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_learnable_pos_emb: bool = False
    init_scale: float = 0.0
    all_frames: int = 16
    tubelet_size: int = 2
    use_mean_pooling: bool = True
    classifier_type: str = "linear"
    classifier_hidden_dim: int = 256
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False
    # remat only blocks idx < remat_num when >= 0 (reference
    # 'use_checkpoint and idx < checkpoint_num', e.g.
    # modeling_adaptation.py:158); -1 = all blocks
    remat_num: int = -1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, T, H, W, C] video; returns [B, num_classes] logits."""
        n_patch = num_patches(
            self.img_size, self.patch_size, self.all_frames, self.tubelet_size
        )
        x = PatchEmbed(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            tubelet_size=self.tubelet_size, dtype=self.dtype,
            kernel_init=trunc_normal_02, name="patch_embed",
        )(x.astype(self.dtype))
        b = x.shape[0]

        seq = n_patch
        if not self.use_mean_pooling:
            # CLS-token readout (reference modeling_finetune.py:283-287)
            cls_token = self.param(
                "cls_token", nn.initializers.normal(stddev=1.0),
                (1, 1, self.embed_dim), jnp.float32,
            )
            cls = jnp.broadcast_to(
                cls_token.astype(x.dtype), (b, 1, self.embed_dim)
            )
            x = jnp.concatenate([cls, x], axis=1)
            seq += 1

        if self.use_learnable_pos_emb:
            pos_embed = self.param(
                "pos_embed", trunc_normal_02, (1, seq, self.embed_dim),
                jnp.float32,
            )
        else:
            pos_embed = jnp.asarray(
                get_sinusoid_encoding_table(seq, self.embed_dim)
            )
        x = x + jnp.asarray(pos_embed).astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
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
                kernel_init=trunc_normal_02, use_pallas=self.use_pallas,
                name=f"blocks_{i}",
            )(x, deterministic)

        if self.use_mean_pooling:
            feat = LayerNorm(epsilon=self.norm_eps, name="fc_norm")(
                jnp.mean(x, axis=1)
            )
        else:
            x = LayerNorm(epsilon=self.norm_eps, name="norm")(x)
            feat = x[:, 0]

        feat = nn.Dropout(self.fc_drop_rate)(feat, deterministic=deterministic)
        if self.num_classes <= 0:
            return feat
        if self.classifier_type == "linear":
            logits = nn.Dense(
                self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                kernel_init=scaled_trunc_normal(self.init_scale), name="head",
            )(feat)
        elif self.classifier_type == "mlp":
            logits = Mlp(
                hidden_features=self.classifier_hidden_dim,
                out_features=self.num_classes,
                act=lambda v: v,  # act_layer=nn.Identity in the reference
                dtype=jnp.float32,
                kernel_init=trunc_normal_02,
                # reference scales fc2 (only) by init_scale so finetuning
                # starts from near-zero logits (modeling_finetune.py:329-330)
                kernel_init_out=scaled_trunc_normal(self.init_scale),
                name="head",
            )(feat, deterministic)
        else:
            raise NotImplementedError(self.classifier_type)
        return logits


@register_model
def vit_base_patch16_224(**kwargs):
    return VisionTransformer(
        patch_size=16, embed_dim=768, depth=12, num_heads=12, mlp_ratio=4,
        qkv_bias=True, norm_eps=1e-6, **kwargs,
    )


@register_model
def vit_base_patch16_384(**kwargs):
    return VisionTransformer(
        img_size=384, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        mlp_ratio=4, qkv_bias=True, norm_eps=1e-6, **kwargs,
    )


@register_model
def vit_large_patch16_224(**kwargs):
    return VisionTransformer(
        patch_size=16, embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4,
        qkv_bias=True, norm_eps=1e-6, **kwargs,
    )


@register_model
def vit_large_patch16_384(**kwargs):
    return VisionTransformer(
        img_size=384, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4, qkv_bias=True, norm_eps=1e-6, **kwargs,
    )
