"""Train state: params + optimizer state + step + optional EMA.

Functional replacement for the reference's (model, optimizer, loss_scaler,
model_ema) quartet (run_stage2.py:587-673). No loss scaler — bf16 training
needs none (the reference's AMP GradScaler, utils.py:602-629, exists only
for fp16). EMA matches timm's ModelEma semantics used by stage 2
(run_stage2.py:587-593): ``ema = decay * ema + (1 - decay) * param`` after
each update.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx, ema_decay: Optional[float] = None):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
            ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
        )

    def apply_gradients(self, grads, ema_decay: Optional[float] = None,
                        skip_update=None):
        """One optimizer step; optionally EMA; optionally masked no-op.

        ``skip_update``: bool scalar — when True the state is returned
        unchanged except step+1 (the reference skips the optimizer step when
        the loss is non-finite only by exiting; we keep the hook for
        grad-accum boundaries instead).
        """
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if skip_update is not None:
            new_params, new_opt_state = jax.tree.map(
                lambda new, old: jnp.where(skip_update, old, new),
                (new_params, new_opt_state), (self.params, self.opt_state),
            )
        new_ema = self.ema_params
        if self.ema_params is not None and ema_decay is not None:
            # timm ModelEma updates once per OPTIMIZER step — the reference
            # gates model_ema.update(model) on the accumulation boundary
            # (engine_for_finetuning.py:109-126). Under optax.MultiSteps the
            # boundary is where mini_step wraps back to 0; on intermediate
            # micro steps params are unchanged and the EMA must NOT decay
            # toward them again (that would compound decay^update_freq).
            decay = jnp.asarray(ema_decay, jnp.float32)
            ms = _find_multisteps_state(new_opt_state)
            if ms is not None:
                decay = jnp.where(ms.mini_step == 0, decay, 1.0)
            new_ema = jax.tree.map(
                lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype),
                self.ema_params, new_params,
            )
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state,
            ema_params=new_ema,
        )


def _find_multisteps_state(opt_state):
    """Locate a MultiStepsState anywhere in the opt-state tree.

    MultiSteps need not be the outermost transform (a chain/wrapper added
    around it would hide it from an isinstance check and silently
    reintroduce per-micro-step EMA decay); a structure walk is robust to
    any nesting. Returns None when no accumulation is in play."""
    hits = [
        s for s in jax.tree.leaves(
            opt_state,
            is_leaf=lambda x: isinstance(x, optax.MultiStepsState))
        if isinstance(s, optax.MultiStepsState)
    ]
    return hits[0] if hits else None


def global_grad_norm(grads) -> jnp.ndarray:
    """L2 norm over all leaves (reference utils.py get_grad_norm_, fp32)."""
    sq = sum(
        jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads)
    )
    return jnp.sqrt(sq)


def clip_by_global_norm(grads, max_norm: Optional[float]):
    """torch clip_grad_norm_ semantics; returns (clipped, pre-clip norm)."""
    norm = global_grad_norm(grads)
    if max_norm is None:
        return grads, norm
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: (g * scale).astype(g.dtype), grads), norm
