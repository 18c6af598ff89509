"""Model families (counterpart of /root/reference/src/models/__init__.py:1-5).

Importing this package registers every model factory with the registry so
``create_model('<name>')`` works, mirroring the reference's reliance on timm
registration side effects.
"""

from unite_tpu.models import adaptation  # noqa: F401
from unite_tpu.models import vit  # noqa: F401

from unite_tpu.models.adaptation import (  # noqa: F401
    AdaptationVisionTransformer,
    adaptation_umt_base_patch16_224,
    adaptation_umt_large_patch16_224,
)
from unite_tpu.models.vit import (  # noqa: F401
    VisionTransformer,
    vit_base_patch16_224,
    vit_base_patch16_384,
    vit_large_patch16_224,
    vit_large_patch16_384,
)

# Optional families registered on import as well.
from unite_tpu.models import clip  # noqa: F401
from unite_tpu.models import pretrain_umt  # noqa: F401
from unite_tpu.models import pretrain_videomae  # noqa: F401
