"""On-device video normalization (uint8 input path).

The host→device link is the narrowest part of the pipeline (BASELINE.md
north star calls for fused on-device transforms; the axon tunnel measures
~33MB/s). Shipping uint8 frames is 4x smaller than fp32; this op fuses the
/255 + ImageNet mean/std normalize into the jitted step so the cast never
materializes on the host. The augmentation pipelines then run up to (and
including) the crop in uint8.
"""

from __future__ import annotations

import jax.numpy as jnp

from unite_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def normalize_videos(videos, dtype=jnp.bfloat16):
    """uint8/float [.., H, W, 3] → normalized ``dtype`` (device-side).

    Float inputs are assumed already normalized (passthrough cast), so the
    train steps accept either representation.
    """
    if videos.dtype == jnp.uint8:
        x = videos.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return x.astype(dtype)
    return videos.astype(dtype)
