"""Full three-stage pipeline chained through checkpoints (the stageN.sh
user flow): stage-1 UMT pretrain → its checkpoint initializes the stage-2
fine-tune (`--finetune`, run_stage2.py:349-438 surgery path) → stage-2's
checkpoints initialize the stage-3 student (`--student_init`) and
classifier head (`--src_classifier_init`, run_stage3.py:1196-1223).

Asserts real weight transfer, not just green runs: the stage-3 classifier
is optimizer-frozen (reference never registers it, run_stage3.py:1264), so
after stage-3 training it must still equal the stage-2 head BITWISE.
"""

import os

import numpy as np
import pytest

# registers the shared tiny models as an import side effect
from tests.test_entry_resume import _write_annotations  # noqa: F401
from unite_tpu.utils.registry import _MODEL_REGISTRY, register_model

if "vit_pipe_tiny" not in _MODEL_REGISTRY:
    from unite_tpu.models.vit import VisionTransformer

    @register_model
    def vit_pipe_tiny(**kwargs):
        # geometry-matched to adaptation_test_tiny's encoder (embed 32,
        # depth 2, heads 2, mlp_ratio 4) so every encoder leaf chains
        return VisionTransformer(
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            mlp_ratio=4, qkv_bias=True, norm_eps=1e-6, **kwargs)


def _payload(out_dir, tag="latest"):
    from unite_tpu.utils import checkpoint as ck

    return ck.load_checkpoint(os.path.join(out_dir,
                                           f"checkpoint-{tag}.msgpack"))


@pytest.mark.slow
def test_three_stage_pipeline_chains_checkpoints(tmp_path):
    from tests.test_preemption import _stage1_args
    from tests.test_entry_resume import _stage2_args
    from tests.test_stage3_zeroshot import _stage3_args
    from unite_tpu.train.run_stage1 import main as stage1
    from unite_tpu.train.run_stage2 import main as stage2
    from unite_tpu.train.run_stage3 import main as stage3

    # --- stage 1: UMT pretrain with a target stream
    a1 = _stage1_args(tmp_path, tmp_path / "s1", 1)
    stage1(a1)
    p1 = _payload(a1.output_dir)
    assert "encoder" in p1["model"]

    # --- stage 2: fine-tune initialized from the stage-1 checkpoint
    a2 = _stage2_args(tmp_path, tmp_path / "s2", 1)
    a2.model = "vit_pipe_tiny"
    a2.finetune = os.path.join(a1.output_dir, "checkpoint-latest.msgpack")
    stage2(a2)
    p2 = _payload(a2.output_dir, "best")

    # every encoder leaf of the stage-1 student must exist in the stage-2
    # tree (mlp included — geometry matched); spot-check a block param got
    # TRANSFERRED (stage-2 trained from it, so equality is not expected,
    # but the fresh-init value would differ from stage-1's too — assert the
    # import happened by rerunning the loader directly)
    from unite_tpu.train.run_stage2 import load_finetune_ckpt
    from unite_tpu.models.vit import VisionTransformer  # noqa: F811
    import jax
    import jax.numpy as jnp

    model = _MODEL_REGISTRY["vit_pipe_tiny"](
        num_classes=a2.nb_classes, all_frames=a2.num_frames,
        tubelet_size=a2.tubelet_size)
    fresh = model.init(jax.random.PRNGKey(0), jnp.zeros(
        (1, a2.num_frames, 32, 32, 3)))["params"]
    loaded = load_finetune_ckpt(a2, model, fresh)
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(p1["model"]["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]))

    # --- stage 3: student from stage-2 latest, head from stage-2 best
    a3 = _stage3_args(tmp_path, selection_strategy="conf")
    a3.output_dir = str(tmp_path / "s3")
    a3.student_init = os.path.join(a2.output_dir,
                                   "checkpoint-latest.msgpack")
    a3.src_classifier_init = os.path.join(a2.output_dir,
                                          "checkpoint-best.msgpack")
    stage3(a3)
    p3 = _payload(a3.output_dir)

    # the classifier head is optimizer-frozen in stage 3 (reference
    # run_stage3.py:1264 never registers it): after training it must equal
    # the stage-2 best head bitwise — proves both the head chaining and
    # the freeze
    np.testing.assert_array_equal(
        p3["model"]["classifier"]["kernel"],
        np.asarray(p2["model"]["head"]["kernel"]))
    np.testing.assert_array_equal(
        p3["model"]["classifier"]["bias"],
        np.asarray(p2["model"]["head"]["bias"]))

    # and the encoder DID train (not frozen)
    assert not np.array_equal(
        np.asarray(p3["model"]["model"]["encoder"]["blocks_0"]["attn"]["qkv"]
                   ["kernel"]),
        np.asarray(p2["model"]["blocks_0"]["attn"]["qkv"]["kernel"]))
