"""Model registry: string name -> model factory.

Replaces the reference's use of timm's global model registry
(/root/reference/run_stage1.py:275 `create_model('adaptation_umt_base_patch16_224')`)
with a tiny first-party registry so configs can select models by name.
"""

from __future__ import annotations

from typing import Callable, Dict

_MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(fn: Callable) -> Callable:
    """Decorator registering ``fn`` under its function name."""
    name = fn.__name__
    if name in _MODEL_REGISTRY:
        raise ValueError(f"model {name!r} already registered")
    _MODEL_REGISTRY[name] = fn
    return fn


def create_model(name: str, **kwargs):
    """Instantiate a registered model by name (timm-style API surface)."""
    # Import model modules lazily so registration side effects run.
    import unite_tpu.models  # noqa: F401

    if name not in _MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_MODEL_REGISTRY)}"
        )
    return _MODEL_REGISTRY[name](**kwargs)


def list_models():
    import unite_tpu.models  # noqa: F401

    return sorted(_MODEL_REGISTRY)
