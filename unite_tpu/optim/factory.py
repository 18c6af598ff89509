"""Optimizer factory: param groups, layer-wise LR decay, per-step schedules.

Counterpart of /root/reference/src/optim_factory.py:44-211 and the per-step
LR/WD writes in the train loops (run_stage1.py:327-338). TPU-native design:
instead of mutating param-group hyperparameters from Python each step (which
would force a host sync), the full per-step LR/WD tables live on device and
the optimizer gathers ``table[step]`` inside the jitted update — schedules
never trigger recompiles.

Group semantics preserved exactly:
* no weight decay for 1-D params, ``*bias``, and the model's skip list
  ({'pos_embed','cls_token','mask_token','clip_pos_embed'} — the reference's
  ``no_weight_decay()`` sets) (optim_factory.py:85-88);
* layer-wise LR scale ``layer_decay**(depth+1-layer_id)`` with the
  reference's name→layer-id mapping (optim_factory.py:44-73,
  run_stage2.py:616-617);
* AdamW update = ``-lr_group * (adam_dir + wd * param)`` with
  ``lr_group = lr(step) * lr_scale`` — identical to torch AdamW param
  groups; SGD-family uses torch's coupled weight decay (L2 into the gradient
  before momentum).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

DEFAULT_SKIP_LIST = ("pos_embed", "cls_token", "mask_token", "clip_pos_embed")


# ---------------------------------------------------------------------------
# Param-group metadata (flax param trees, torch-name-compatible rules)
# ---------------------------------------------------------------------------


def get_num_layer_for_vit(path: Tuple[str, ...], num_max_layer: int) -> int:
    """Flax-path port of optim_factory.py:44-62.

    path is the tuple of module names, e.g. ('blocks_3', 'attn', 'qkv',
    'kernel') or ('encoder', 'blocks_3', ...) — a leading 'encoder' is
    skipped so adaptation models decay like their bare encoder.
    """
    if path and path[0] == "encoder":
        path = path[1:]
    head = path[0] if path else ""
    if head in ("cls_token", "mask_token", "pos_embed", "class_embedding",
                "positional_embedding", "temporal_positional_embedding"):
        return 0
    if head.startswith("patch_embed") or head.startswith("conv1"):
        return 0
    if head.startswith("rel_pos_bias"):
        return num_max_layer - 1
    if head.startswith("blocks_") or head.startswith("resblocks_"):
        return int(head.split("_")[-1]) + 1
    return num_max_layer - 1


def layer_decay_scales(layer_decay: float, num_layers: int) -> list:
    """decay**(num_layers+1-i) for i in 0..num_layers+1 (run_stage2.py:616)."""
    return [layer_decay ** (num_layers + 1 - i) for i in range(num_layers + 2)]


def _path_leaves(params) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        out[path] = leaf
    return out


def _tree_like(params, value_by_path: dict):
    flat = _path_leaves(params)
    vals = {p: value_by_path[p] for p in flat}
    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = [tuple(k.key if hasattr(k, "key") else str(k) for k in kp)
             for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, [vals[p] for p in paths])


def param_group_metadata(
    params,
    weight_decay: float,
    skip_list: Sequence[str] = DEFAULT_SKIP_LIST,
    num_layers: Optional[int] = None,
    layer_decay: Optional[float] = None,
    trainable_mask=None,
):
    """Returns (wd_mask_tree, lr_scale_tree, group_names dict for logging).

    wd_mask leaf True → weight decay applies; lr_scale leaf is the float
    group scale. ``trainable_mask`` (same structure, bool) zeroes the scale
    of frozen params (requires_grad=False semantics: no update at all).
    """
    scales = None
    if layer_decay is not None and layer_decay < 1.0:
        assert num_layers is not None
        scales = layer_decay_scales(layer_decay, num_layers)

    flat = _path_leaves(params)
    train_flat = _path_leaves(trainable_mask) if trainable_mask is not None else None
    wd_by_path, scale_by_path, groups = {}, {}, {}
    for path, leaf in flat.items():
        name_last = path[-1]
        no_decay = (
            np.ndim(leaf) <= 1
            or name_last == "bias"
            or name_last in skip_list
            or (path and path[0] in skip_list)
        )
        wd_by_path[path] = not no_decay
        if scales is not None:
            layer_id = get_num_layer_for_vit(path, len(scales))
            scale = scales[layer_id]
            gname = f"layer_{layer_id}_{'no_decay' if no_decay else 'decay'}"
        else:
            scale = 1.0
            gname = "no_decay" if no_decay else "decay"
        if train_flat is not None and not bool(train_flat[path]):
            scale = 0.0
            gname = "frozen"
        scale_by_path[path] = scale
        groups.setdefault(gname, {"weight_decay": 0.0 if no_decay else weight_decay,
                                  "lr_scale": scale, "params": []})
        groups[gname]["params"].append(".".join(path))

    wd_mask = _tree_like(params, wd_by_path)
    lr_scale = _tree_like(params, scale_by_path)
    return wd_mask, lr_scale, groups


# ---------------------------------------------------------------------------
# Schedule-table optimizer
# ---------------------------------------------------------------------------


class ScheduledState(NamedTuple):
    count: jnp.ndarray
    inner: Any


ScheduleLike = Union[float, np.ndarray, jnp.ndarray, Callable[[Any], Any]]


def _as_lookup(s: ScheduleLike):
    if callable(s):
        return s
    if np.ndim(s) == 0:
        const = float(s)
        return lambda step: const
    table = jnp.asarray(s)
    last = table.shape[0] - 1
    return lambda step: table[jnp.minimum(step, last)]


def scheduled_optimizer(
    direction: optax.GradientTransformation,
    lr: ScheduleLike,
    weight_decay: ScheduleLike = 0.0,
    wd_mask=None,
    lr_scale=None,
    decoupled: bool = True,
) -> optax.GradientTransformation:
    """Wrap a direction transform with per-step lr/wd tables + group scales.

    decoupled=True → AdamW-style (wd added to the *update*, scaled by the
    group lr); decoupled=False → the caller already folded L2 into grads.
    """
    lr_fn = _as_lookup(lr)
    wd_fn = _as_lookup(weight_decay)

    def init(params):
        return ScheduledState(jnp.zeros([], jnp.int32), direction.init(params))

    def update(grads, state, params=None):
        dir_updates, inner = direction.update(grads, state.inner, params)
        lr_t = lr_fn(state.count)
        wd_t = wd_fn(state.count)

        def leaf(u, p, m, s):
            u = u.astype(jnp.float32)
            if decoupled and params is not None:
                u = u + wd_t * p.astype(jnp.float32) * m
            return (-(lr_t * s) * u).astype(p.dtype if p is not None else u.dtype)

        if params is None:
            raise ValueError("scheduled_optimizer requires params")
        mask = wd_mask if wd_mask is not None else jax.tree.map(lambda _: True, params)
        scale = lr_scale if lr_scale is not None else jax.tree.map(lambda _: 1.0, params)
        updates = jax.tree.map(
            lambda u, p, m, s: leaf(u, p, jnp.float32(m), jnp.float32(s)),
            dir_updates, params, mask, scale,
        )
        return updates, ScheduledState(state.count + 1, inner)

    return optax.GradientTransformation(init, update)


def set_schedule_count(opt_state, step: int):
    """Recursively set every ScheduledState/L2/SGD count to ``step`` —
    used when an optimizer is rebuilt mid-run (LP-FT switch) so the LR/WD
    tables continue from the global step instead of restarting."""
    import jax.numpy as _jnp

    if hasattr(opt_state, "count") and hasattr(opt_state, "inner"):
        return opt_state._replace(
            count=_jnp.asarray(step, _jnp.int32),
            inner=set_schedule_count(opt_state.inner, step),
        )
    if isinstance(opt_state, tuple) and type(opt_state) is not tuple:
        # NamedTuple without count/inner: recurse fields
        return type(opt_state)(*(set_schedule_count(v, step) for v in opt_state))
    if isinstance(opt_state, tuple):
        return tuple(set_schedule_count(v, step) for v in opt_state)
    return opt_state


def sgd_l2_direction(momentum: float = 0.9, nesterov: bool = False,
                     weight_decay: ScheduleLike = 0.0, wd_mask=None):
    """torch-SGD semantics: L2 folded into grads before the momentum buffer."""
    wd_fn = _as_lookup(weight_decay)
    trace = optax.trace(decay=momentum, nesterov=nesterov)

    class SGDState(NamedTuple):
        count: jnp.ndarray
        inner: Any

    def init(params):
        return SGDState(jnp.zeros([], jnp.int32), trace.init(params))

    def update(grads, state, params=None):
        wd_t = wd_fn(state.count)
        if params is not None and wd_mask is not None:
            grads = jax.tree.map(
                lambda g, p, m: g + wd_t * p * jnp.float32(m), grads, params, wd_mask
            )
        u, inner = trace.update(grads, state.inner, params)
        return u, SGDState(state.count + 1, inner)

    return optax.GradientTransformation(init, update)


def create_optimizer(
    opt: str,
    lr: ScheduleLike,
    params,
    weight_decay: ScheduleLike = 0.0,
    momentum: float = 0.9,
    betas: Tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    skip_list: Sequence[str] = DEFAULT_SKIP_LIST,
    num_layers: Optional[int] = None,
    layer_decay: Optional[float] = None,
    trainable_mask=None,
) -> Tuple[optax.GradientTransformation, dict]:
    """Build the full optimizer (optim_factory.py:121-211 surface).

    Returns (transform, group_names). ``opt`` accepts the reference's names;
    fused/apex aliases map to the plain implementation (XLA fuses anyway).
    """
    opt_lower = opt.lower().replace("fused", "").strip("_")
    # group-logging value only: callables (schedules) report 1.0
    wd_value = 1.0 if callable(weight_decay) else float(np.max(weight_decay))
    wd_mask, lr_scale, groups = param_group_metadata(
        params,
        weight_decay=wd_value,
        skip_list=skip_list, num_layers=num_layers, layer_decay=layer_decay,
        trainable_mask=trainable_mask,
    )
    # decay mask folds into the wd term; lr_scale folds into the update
    masked_wd = weight_decay

    adam_dirs = {
        "adamw": lambda: optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        "adam": lambda: optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        "nadam": lambda: optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                                             nesterov=True),
        "radam": lambda: optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps),
        "lamb": lambda: optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale_by_trust_ratio(),
        ),
        "adabelief": lambda: optax.scale_by_belief(b1=betas[0], b2=betas[1], eps=eps),
        "adagrad": lambda: optax.scale_by_rss(initial_accumulator_value=0.0, eps=eps),
        "adadelta": lambda: optax.contrib.scale_by_adadelta(eps=eps),
        "rmsprop": lambda: optax.scale_by_rms(decay=0.9, eps=eps),
        "lion": lambda: optax.scale_by_lion(b1=betas[0], b2=betas[1]),
    }

    if opt_lower in ("sgd", "momentum", "nesterov"):
        direction = sgd_l2_direction(
            momentum=momentum, nesterov=(opt_lower == "nesterov"),
            weight_decay=masked_wd, wd_mask=wd_mask,
        )
        tx = scheduled_optimizer(direction, lr, 0.0, wd_mask=wd_mask,
                                 lr_scale=lr_scale, decoupled=False)
    elif opt_lower in adam_dirs:
        decoupled = opt_lower != "adam"  # plain adam: L2 into grads like torch
        if not decoupled:
            base = adam_dirs[opt_lower]()
            wd_fn = _as_lookup(masked_wd)

            class L2State(NamedTuple):
                count: jnp.ndarray
                inner: Any

            def init(params):
                return L2State(jnp.zeros([], jnp.int32), base.init(params))

            def update(grads, state, params=None):
                wd_t = wd_fn(state.count)
                if params is not None:
                    grads = jax.tree.map(
                        lambda g, p, m: g + wd_t * p * jnp.float32(m),
                        grads, params, wd_mask,
                    )
                u, inner = base.update(grads, state.inner, params)
                return u, L2State(state.count + 1, inner)

            direction = optax.GradientTransformation(init, update)
            tx = scheduled_optimizer(direction, lr, 0.0, wd_mask=wd_mask,
                                     lr_scale=lr_scale, decoupled=False)
        else:
            tx = scheduled_optimizer(
                adam_dirs[opt_lower](), lr, masked_wd, wd_mask=wd_mask,
                lr_scale=lr_scale, decoupled=True,
            )
    else:
        raise ValueError(f"unsupported optimizer {opt!r}")
    return tx, groups
