"""Int8 frozen-teacher quantization: op numerics + end-to-end teacher error.

The int8 teacher replaces the reference's fp16-autocast frozen CLIP
(run_stage1.py:360-377) on the TPU's double-rate integer MXU path; these
tests pin (a) the quantized-matmul math and (b) the tap/attention error the
stage-1 distillation targets inherit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unite_tpu.ops.quant import (
    int8_dense,
    quantize_clip_params,
    quantize_weight,
)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (32,)
    w_hat = w_q.astype(jnp.float32) * scale[None, :]
    # per-channel symmetric int8: max error is scale/2 per element
    err = np.abs(np.asarray(w - w_hat))
    assert (err <= np.asarray(scale)[None, :] * 0.5 + 1e-7).all()


def test_int8_dense_matches_fp32():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (4, 37, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 48), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(3), (48,), jnp.float32)
    w_q, scale = quantize_weight(w)
    y_q = int8_dense(x, w_q, scale, b, out_dtype=jnp.float32)
    y = x @ w + b
    # int8 weight+activation error: normalized RMS over the output rows
    # (per-element relative error is meaningless near zero crossings)
    err = np.asarray(y_q - y)
    nrmse = np.linalg.norm(err) / np.linalg.norm(np.asarray(y))
    assert nrmse < 2e-2, nrmse
    cos = np.sum(np.asarray(y_q) * np.asarray(y)) / (
        np.linalg.norm(y_q) * np.linalg.norm(y))
    assert cos > 0.999


def test_quantized_clip_teacher_close_to_fp32():
    from unite_tpu.models.clip import CLIPVisionTransformer

    kw = dict(input_resolution=32, patch_size=16, width=128, layers=3,
              heads=2, output_dim=24, return_attn=True, return_index=(1, 2),
              dtype=jnp.float32)
    teacher = CLIPVisionTransformer(**kw)
    teacher_q = CLIPVisionTransformer(quantize=True, **kw)

    video = jax.random.uniform(jax.random.PRNGKey(4), (2, 4, 32, 32, 3))
    params = teacher.init(jax.random.PRNGKey(0), video)["params"]
    params_q = quantize_clip_params(params)

    z, attn = teacher.apply({"params": params}, video)
    z_q, attn_q = teacher_q.apply({"params": params_q}, video)

    assert z_q.shape == z.shape and attn_q.shape == attn.shape
    # taps are L2-normalized: cosine similarity is the native error metric
    cos = np.sum(np.asarray(z, np.float32) * np.asarray(z_q, np.float32),
                 axis=-1)
    assert cos.min() > 0.98, cos.min()
    # attention rows: total-variation distance of the masking distribution
    tv = 0.5 * np.abs(np.asarray(attn, np.float32)
                      - np.asarray(attn_q, np.float32)).sum(-1)
    assert tv.max() < 0.05, tv.max()


def test_quantized_param_tree_structure():
    from unite_tpu.models.clip import CLIPVisionTransformer

    kw = dict(input_resolution=32, patch_size=16, width=128, layers=1,
              heads=2, output_dim=24, return_index=(0,))
    teacher = CLIPVisionTransformer(**kw)
    video = jnp.zeros((1, 2, 32, 32, 3))
    params = teacher.init(jax.random.PRNGKey(0), video)["params"]
    params_q = quantize_clip_params(params)

    blk = params_q["resblocks_0"]
    for name in ("in_proj", "out_proj"):
        assert "kernel_q" in blk["attn"][name]
        assert blk["attn"][name]["kernel_q"].dtype == jnp.int8
        assert "kernel" not in blk["attn"][name]
    for name in ("mlp_c_fc", "mlp_c_proj"):
        assert "kernel_q" in blk[name]
    # non-quantized parts untouched
    assert "kernel" in params_q["conv1"]["proj"]
    # init of the quantized module matches the converted tree's structure
    tq = CLIPVisionTransformer(quantize=True, **kw)
    ref = tq.init(jax.random.PRNGKey(0), video)["params"]
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, ref)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, params_q)
    )
