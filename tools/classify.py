#!/usr/bin/env python
"""Classify one video file with a trained checkpoint.

End-to-end single-clip inference through the production path: native
FFmpeg decode (CV2/synthetic fallbacks) → TSN sparse sampling →
resize + center crop + normalize (the validation transform,
kinetics_sparse.py:92-99 semantics) → jitted ViT forward → top-5. A quick
smoke surface for "did my fine-tune learn anything" that the reference
lacks (its smallest eval unit is a full dataset pass).

Usage:
  python tools/classify.py runs/stage2/exp/checkpoint-best.msgpack video.mp4 \
      [--nb-classes 12] [--num-frames 8] [--model vit_base_patch16_224] \
      [--synthetic]   # synthetic reader for smoke tests
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help=".msgpack checkpoint (stage-2 ViT or "
                               "stage-3 combined tree)")
    ap.add_argument("video", help="video file path")
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--nb-classes", type=int, default=12)
    ap.add_argument("--num-frames", type=int, default=8)
    ap.add_argument("--tubelet-size", type=int, default=1)
    ap.add_argument("--input-size", type=int, default=224)
    ap.add_argument("--short-side-size", type=int, default=224)
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic reader (smoke test, ignores the file)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the image pre-imports jax "
                         "with JAX_PLATFORMS=axon; env vars are ignored)")
    a = ap.parse_args()

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from unite_tpu.data.datasets import VideoClsDatasetSparse
    from unite_tpu.data.video_reader import default_reader, SyntheticVideoReader
    from unite_tpu.models.clip_text import CLASS_NAMES
    from unite_tpu.utils import checkpoint as ck
    from unite_tpu.utils.registry import create_model
    from unite_tpu.utils.torch_import import merge_params

    # one-row dataset in validation mode: TSN sparse sampling +
    # resize/center-crop/normalize, exactly the val transform
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write(f"{a.video} 0\n")
        ann = f.name
    try:
        ds = VideoClsDatasetSparse(
            anno_path=ann, mode="validation", clip_len=a.num_frames,
            crop_size=a.input_size, short_side_size=a.short_side_size,
            reader=(SyntheticVideoReader() if a.synthetic
                    else default_reader()),
        )
        clip = ds[0][0]  # (clip, label, name) in validation mode
    finally:
        os.unlink(ann)
    video = np.asarray(clip, np.float32)[None]  # [1, T, H, W, C]

    model = create_model(a.model, num_classes=a.nb_classes,
                         img_size=a.input_size, all_frames=a.num_frames,
                         tubelet_size=a.tubelet_size, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros_like(video, jnp.bfloat16))["params"]
    payload = ck.load_checkpoint(a.ckpt)
    loaded = payload["model"]
    head = None
    if "model" in loaded and "classifier" in loaded:  # stage-3 combined
        head, loaded = loaded["classifier"], loaded["model"]
        if "encoder" in loaded:
            loaded = loaded["encoder"]
    params, _, _ = merge_params(params, loaded, strict_shapes=False)
    if head is not None:
        params["head"] = {"kernel": np.asarray(head["kernel"]),
                          "bias": np.asarray(head["bias"])}

    logits = jax.jit(lambda p, v: model.apply({"params": p}, v))(
        params, jnp.asarray(video, jnp.bfloat16))
    probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))[0]
    names = CLASS_NAMES.get(a.nb_classes,
                            [f"class_{i}" for i in range(a.nb_classes)])
    top = np.argsort(probs)[::-1][:5]
    for i in top:
        print(f"{probs[i]:6.3f}  {names[i]}")


if __name__ == "__main__":
    main()
