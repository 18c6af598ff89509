"""UNITE-TPU: a TPU-native video domain-adaptation training framework.

A from-scratch JAX/XLA/Pallas rebuild of the UNITE three-stage unsupervised
video domain adaptation pipeline (reference: reddyav1/unite, CVPR 2024):

  * Stage 1 — UMT masked pre-training of a video ViT student against a frozen
    CLIP image teacher, with teacher-attention-guided token masking.
  * Stage 2 — supervised fine-tuning on source-domain video.
  * Stage 3 — collaborative self-training with CLIP zero-shot + student
    pseudo-labels ("MatchOrConf") and masked-committee consistency.

Design: functional core (pure jitted ``train_step(state, batch)``) under a
``jax.sharding.Mesh`` data-parallel layout, bf16 compute with fp32 state,
Pallas flash-attention kernels on the hot path, explicit PRNG threading for
every stochastic choice, and a native (C++/FFmpeg) video decode pipeline.
"""

__version__ = "0.1.0"

from unite_tpu.utils.registry import create_model, register_model  # noqa: F401
