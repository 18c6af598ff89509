"""Shape/semantics smoke tests for all model families (tiny geometries).

Mirrors the reference's __main__ smoke blocks (modeling_*.py) but as real
tests: fixed-seed init, synthetic video, masked forward, shape checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unite_tpu.ops.masking import visible_indices
from unite_tpu.utils.registry import create_model, list_models

# tiny geometry: 4 frames, 32x32, patch 16, tubelet 1 -> 4*2*2 = 16 patches
TINY = dict(img_size=32, patch_size=16)


def video(b=2, t=4, s=32):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((b, t, s, s, 3), np.float32))


def test_registry_has_all_families():
    names = list_models()
    for expect in [
        "vit_base_patch16_224", "vit_large_patch16_224",
        "adaptation_umt_base_patch16_224", "adaptation_umt_large_patch16_224",
        "pretrain_umt_base_patch16_224", "pretrain_videomae_base_patch16_224",
        "clip_b16", "clip_l14", "clip_l14_336",
    ]:
        assert expect in names, f"missing {expect}"


def make_tiny_vit(**kw):
    from unite_tpu.models.vit import VisionTransformer
    cfg = dict(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        num_classes=5, all_frames=4, tubelet_size=1, qkv_bias=True,
    )
    cfg.update(kw)
    return VisionTransformer(**cfg)


def test_vit_forward_shapes():
    m = make_tiny_vit()
    params = m.init(jax.random.PRNGKey(0), video())
    logits = m.apply(params, video())
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_vit_cls_token_readout():
    m = make_tiny_vit(use_mean_pooling=False)
    params = m.init(jax.random.PRNGKey(0), video())
    assert logits_shape(m, params) == (2, 5)
    # cls token param exists
    assert "cls_token" in params["params"]


def logits_shape(m, params):
    return tuple(m.apply(params, video()).shape)


def test_vit_feature_mode():
    m = make_tiny_vit(num_classes=0)
    params = m.init(jax.random.PRNGKey(0), video())
    feat = m.apply(params, video())
    assert feat.shape == (2, 32)


def test_adaptation_forward():
    from unite_tpu.models.adaptation import AdaptationVisionTransformer
    m = AdaptationVisionTransformer(
        img_size=32, patch_size=16, encoder_embed_dim=32, encoder_depth=4,
        encoder_num_heads=2, num_frames=4, tubelet_size=1,
        clip_decoder_embed_dim=32, clip_output_dim=24,
        clip_return_layers=(2, 3),
    )
    n = 16
    n_vis = 6
    mask = np.ones((2, n), bool)
    mask[:, :n_vis] = False
    vis_idx = visible_indices(jnp.asarray(mask), n_vis)
    params = m.init(jax.random.PRNGKey(0), video(), vis_idx)
    x_vis, x_clip = m.apply(params, video(), vis_idx)
    assert x_vis.shape == (2, n_vis, 32)
    assert x_clip.shape == (2, 2, n_vis, 24)  # [K, B, N_vis, out]
    # clip outputs are L2-normalized
    norms = np.linalg.norm(np.asarray(x_clip, np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_adaptation_clip_only_and_full():
    from unite_tpu.models.adaptation import AdaptationVisionTransformer
    m = AdaptationVisionTransformer(
        img_size=32, patch_size=16, encoder_embed_dim=32, encoder_depth=4,
        encoder_num_heads=2, num_frames=4, tubelet_size=1,
        clip_decoder_embed_dim=32, clip_output_dim=24, clip_return_layers=(1,),
    )
    params = m.init(jax.random.PRNGKey(0), video())
    x_clip = m.apply(params, video(), None, True)  # clip_only, full visibility
    assert x_clip.shape == (1, 2, 16, 24)


def test_adaptation_cls_token():
    from unite_tpu.models.adaptation import AdaptationVisionTransformer
    m = AdaptationVisionTransformer(
        img_size=32, patch_size=16, encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=2, num_frames=4, tubelet_size=1,
        clip_decoder_embed_dim=32, clip_output_dim=24,
        clip_return_layers=(1,), use_cls_token=True,
    )
    mask = np.ones((2, 16), bool)
    mask[:, :4] = False
    vis_idx = visible_indices(jnp.asarray(mask), 4)
    params = m.init(jax.random.PRNGKey(0), video(), vis_idx)
    x_vis, x_clip = m.apply(params, video(), vis_idx)
    assert x_vis.shape == (2, 5, 32)  # CLS + 4 visible
    assert x_clip.shape == (1, 2, 4, 24)  # CLS stripped from taps


def test_pretrain_umt_top_down_index():
    from unite_tpu.models.pretrain_umt import top_down_return_index
    assert top_down_return_index(12, 6, 1) == (6, 7, 8, 9, 10, 11)
    assert top_down_return_index(12, 2, 2) == (9, 11)


def test_pretrain_umt_forward():
    from unite_tpu.models.pretrain_umt import PretrainUMT
    m = PretrainUMT(
        img_size=32, patch_size=16, encoder_embed_dim=32, encoder_depth=3,
        encoder_num_heads=2, num_frames=4, tubelet_size=1,
        clip_decoder_embed_dim=32, clip_output_dim=24, clip_return_layer=2,
    )
    mask = np.ones((2, 16), bool)
    mask[:, ::4] = False
    vis_idx = visible_indices(jnp.asarray(mask), 4)
    params = m.init(jax.random.PRNGKey(0), video(), vis_idx)
    out = m.apply(params, video(), vis_idx)
    assert out.shape == (2, 2, 4, 24)


def test_pretrain_videomae_forward():
    from unite_tpu.models.pretrain_videomae import PretrainVideoMAE
    m = PretrainVideoMAE(
        img_size=32, patch_size=16, encoder_embed_dim=32, encoder_depth=2,
        encoder_num_heads=2, decoder_num_classes=3 * 1 * 16 * 16,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        num_frames=4, tubelet_size=1,
    )
    n = 16
    mask = np.zeros((2, n), bool)
    mask[:, 10:] = True  # 6 masked
    vis_idx = visible_indices(jnp.asarray(mask), 10)
    mask_idx = visible_indices(jnp.asarray(~mask), 6)
    params = m.init(jax.random.PRNGKey(0), video(), vis_idx, mask_idx)
    out = m.apply(params, video(), vis_idx, mask_idx)
    assert out.shape == (2, 6, 3 * 16 * 16)


def test_clip_teacher_forward():
    from unite_tpu.models.clip import CLIPVisionTransformer
    m = CLIPVisionTransformer(
        input_resolution=32, patch_size=16, width=32, layers=3, heads=2,
        output_dim=24, return_attn=True, return_index=(1, 2),
    )
    params = m.init(jax.random.PRNGKey(0), video())
    z, attn = m.apply(params, video())
    # [K, B, T*HW, out]: T=4 frames (kernel_size=1), HW=4
    assert z.shape == (2, 2, 16, 24)
    assert attn.shape == (8, 4)  # [B*T, HW]
    # attn rows are probabilities over CLS+patches restricted to patches
    s = np.asarray(attn).sum(-1)
    assert (s <= 1.0 + 1e-5).all()
    norms = np.linalg.norm(np.asarray(z, np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_clip_raw_taps_project_equivalence():
    """gather→project_clip_taps == project-everything→gather (the stage-1
    engine's reordering of the teacher's frozen per-token projection)."""
    from unite_tpu.models.clip import CLIPVisionTransformer, project_clip_taps

    m = CLIPVisionTransformer(
        input_resolution=32, patch_size=16, width=32, layers=3, heads=2,
        output_dim=24, return_attn=True, return_index=(1, 2),
    )
    params = m.init(jax.random.PRNGKey(0), video())["params"]
    z_full, _ = m.apply({"params": params}, video())
    raw, attn = m.apply({"params": params}, video(), raw_taps=True)
    assert raw.shape == (2, 2, 16, 32)  # [K, B, T*HW, width]
    assert attn.shape == (8, 4)

    vis_idx = jnp.array([[0, 3, 5, 9, 12, 14], [1, 2, 6, 8, 11, 15]])
    raw_vis = jnp.take_along_axis(raw, vis_idx[None, :, :, None], axis=2)
    z_vis = project_clip_taps(params, raw_vis, dtype=m.dtype)
    want = jnp.take_along_axis(z_full, vis_idx[None, :, :, None], axis=2)
    np.testing.assert_allclose(
        np.asarray(z_vis, np.float32), np.asarray(want, np.float32),
        atol=1e-5, rtol=1e-5,
    )


def test_clip_teacher_return_cls():
    from unite_tpu.models.clip import CLIPVisionTransformer
    m = CLIPVisionTransformer(
        input_resolution=32, patch_size=16, width=32, layers=2, heads=2,
        output_dim=24, return_cls=True, return_index=(1,),
    )
    params = m.init(jax.random.PRNGKey(0), video())
    z, cls = m.apply(params, video())
    assert cls.shape == (8, 32)  # [B*T, width]


def test_create_model_kwargs():
    m = create_model(
        "adaptation_umt_base_patch16_224",
        num_frames=4, tubelet_size=1, clip_return_layers=(11,),
    )
    assert m.encoder_depth == 12


def test_remat_blocks_grad():
    """use_checkpoint (remat) path: gradients flow and match non-remat."""
    from unite_tpu.models.adaptation import AdaptationVisionTransformer

    def build(remat):
        return AdaptationVisionTransformer(
            img_size=32, patch_size=16, encoder_embed_dim=32, encoder_depth=2,
            encoder_num_heads=2, num_frames=4, tubelet_size=1,
            clip_decoder_embed_dim=32, clip_output_dim=24,
            clip_return_layers=(1,), remat=remat,
        )

    v = video()
    params = build(False).init(jax.random.PRNGKey(0), v)["params"]

    def loss(m, p):
        return m.apply({"params": p}, v, None, True).astype(jnp.float32).sum()

    g0 = jax.grad(lambda p: loss(build(False), p))(params)
    g1 = jax.grad(lambda p: loss(build(True), p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_device_prefetch_propagates_errors():
    from unite_tpu.data.loader import device_prefetch

    def gen():
        yield 1
        raise RuntimeError("decode exploded")

    it = device_prefetch(gen(), lambda x: x, depth=2)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="decode exploded"):
        list(it)
