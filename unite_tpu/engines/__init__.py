"""Per-stage engines: jitted train/eval steps and losses."""

from unite_tpu.engines.finetune import (  # noqa: F401
    make_eval_step,
    make_finetune_train_step,
    merge,
)
from unite_tpu.engines.pretrain_umt import make_pretrain_train_step  # noqa: F401
from unite_tpu.engines.pretrain_videomae import (  # noqa: F401
    make_videomae_train_step,
)
from unite_tpu.engines.selftrain import (  # noqa: F401
    make_selftrain_eval_step,
    make_selftrain_step,
)
