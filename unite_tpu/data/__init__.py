"""Data layer: datasets, samplers, sharding, transforms, loaders, readers."""

from unite_tpu.data.build import (  # noqa: F401
    build_dataset,
    build_pretraining_dataset,
)
from unite_tpu.data.collate_mixup import FastCollateMixup  # noqa: F401
from unite_tpu.data.datasets import (  # noqa: F401
    VideoClsDatasetSparse,
    VideoMAEPretrainDataset,
)
from unite_tpu.data.loader import DataLoader, cycle, device_prefetch  # noqa: F401
from unite_tpu.data.sharding import ShardedSampler, repetitions_to_match  # noqa: F401
from unite_tpu.data.video_reader import (  # noqa: F401
    CV2VideoReader,
    NativeVideoReader,
    SyntheticVideoReader,
    default_reader,
)
