"""flax → torch export: exact inverse of the importer, reference-loadable.

Two properties:
- import(export(params)) == params bitwise for every ViT-family tree
  (torch_export.flax_path_to_torch inverts torch_import.torch_key_to_flax).
- the exported state dict STRICT-loads into the real reference
  ``modeling_finetune.VisionTransformer`` (modeling_finetune.py:237-383)
  and the torch forward matches our flax forward — so a reference user can
  take checkpoints trained here back to their existing tooling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from unite_tpu.utils import torch_export as te
from unite_tpu.utils import torch_import as ti


def _vit_params(seed=0, S=32, T=2, NC=5):
    from unite_tpu.models.vit import VisionTransformer

    m = VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=2,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, norm_eps=1e-5,
    )
    x = jnp.zeros((1, T, S, S, 3))
    return m, m.init(jax.random.PRNGKey(seed), x)["params"]


def test_export_import_roundtrip_bitwise():
    _, params = _vit_params()
    state = te.flax_params_to_state(params, patch_size=16)
    back = ti.state_to_flax_params({k: v for k, v in state.items()})
    flat_a = ti._flatten(jax.tree.map(np.asarray, params))
    flat_b = ti._flatten(back)
    assert set(map(tuple, flat_a)) == set(map(tuple, flat_b))
    for path, a in flat_a.items():
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), flat_b[path], err_msg=str(path))


def test_export_strict_loads_into_reference_vit():
    from tests.test_golden_reference import _ref_modules, _to_torch_video

    mf, _, _ = _ref_modules()
    S, T, NC = 32, 2, 5
    model, params = _vit_params(seed=3, S=S, T=T, NC=NC)
    state = te.flax_params_to_state(params, patch_size=16)

    ref = mf.VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=2,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, init_scale=1.0,
    ).eval()
    missing, unexpected = ref.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing  # full key coverage both ways

    video = np.random.default_rng(1).normal(size=(2, T, S, S, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref_logits = ref(_to_torch_video(video)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(video)))
    np.testing.assert_allclose(ours, ref_logits, atol=2e-4, rtol=1e-3)


def test_export_checkpoint_file_shape(tmp_path):
    """.msgpack → .pth payload matches the reference checkpoint format
    ({'model': state, 'epoch': N}, utils.py:689-736); stage-3 combined
    trees split into model + src_classifier."""
    from unite_tpu.utils import checkpoint as ck

    _, params = _vit_params(seed=5)
    ck.save_checkpoint(str(tmp_path), 7, jax.tree.map(np.asarray, params),
                       tags=("latest",))
    dst = te.export_checkpoint(
        str(tmp_path / "checkpoint-latest.msgpack"),
        str(tmp_path / "out.pth"), patch_size=16)
    payload = torch.load(dst, weights_only=False)
    assert payload["epoch"] == 7
    assert "patch_embed.proj.weight" in payload["model"]
    assert payload["model"]["patch_embed.proj.weight"].ndim == 5

    combined = {"model": jax.tree.map(np.asarray, params),
                "classifier": {"kernel": np.zeros((48, 5), np.float32),
                               "bias": np.zeros(5, np.float32)}}
    ck.save_checkpoint(str(tmp_path / "s3"), 2, combined, tags=("latest",))
    dst = te.export_checkpoint(
        str(tmp_path / "s3" / "checkpoint-latest.msgpack"),
        str(tmp_path / "s3.pth"), patch_size=16)
    payload = torch.load(dst, weights_only=False)
    assert "src_classifier" in payload
    assert payload["src_classifier"]["weight"].shape == (5, 48)
