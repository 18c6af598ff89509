"""Analytic FLOP counting for the ViT families.

Replaces the reference's fvcore ``FlopCountAnalysis`` smoke usage
(modeling_finetune.py:439-441) with closed-form matmul counts, plus a
jaxpr-based exact counter via XLA's cost analysis when a compiled function
is available.
"""

from __future__ import annotations

from typing import Optional


def vit_block_flops(tokens: int, dim: int, mlp_ratio: float = 4.0) -> int:
    """Matmul FLOPs of one pre-norm transformer block (fwd)."""
    qkv = 2 * tokens * dim * 3 * dim
    attn = 2 * 2 * tokens * tokens * dim
    proj = 2 * tokens * dim * dim
    mlp = 2 * 2 * tokens * dim * int(dim * mlp_ratio)
    return qkv + attn + proj + mlp


def vit_flops(
    tokens: int,
    dim: int = 768,
    depth: int = 12,
    mlp_ratio: float = 4.0,
    patch_dim: int = 16 * 16 * 3,
    num_classes: int = 0,
) -> int:
    """Forward FLOPs of a full ViT on ``tokens`` tokens (one clip)."""
    total = 2 * tokens * patch_dim * dim  # patch embed
    total += depth * vit_block_flops(tokens, dim, mlp_ratio)
    if num_classes:
        total += 2 * dim * num_classes
    return total


def xla_cost(jitted_fn, *args) -> Optional[dict]:
    """XLA's full cost-analysis dict (flops, bytes accessed, ...) for the
    lowered computation, or None when the backend exposes none."""
    try:
        analysis = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return dict(analysis)
    except Exception:
        return None


def xla_cost_flops(jitted_fn, *args) -> Optional[float]:
    """Exact FLOPs from XLA's cost analysis of the lowered computation."""
    cost = xla_cost(jitted_fn, *args)
    if cost is None:
        return None
    return float(cost.get("flops", float("nan")))
