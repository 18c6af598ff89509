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
    tables continue from the global step instead of restarting.

    States with an internally-coupled decay lookup but no ``inner``
    (AdamPState/SGDPState/NovoState) carry a separate ``wd_base`` offset:
    their ``count`` drives bias correction / moment bootstrap, which a
    rebuilt torch optimizer RESTARTS at zero, while the wd table index must
    continue from the global step — setting count=step there would skip
    the bias-correction warmup of the fresh moments."""
    import jax.numpy as _jnp

    if hasattr(opt_state, "wd_base") and not hasattr(opt_state, "inner"):
        return opt_state._replace(wd_base=_jnp.asarray(step, _jnp.int32))
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


def _projection(p, g, perturb, delta: float, wd_ratio: float, eps: float):
    """AdamP/SGDP tangent-space projection (Heo et al. 2021, the algorithm
    behind timm's adamp.py/sgdp.py the reference dispatches to at
    optim_factory.py:169-172).

    If the gradient is (nearly) orthogonal to a scale-invariant weight —
    channel-wise first, then layer-wise — the update is projected onto the
    tangent space of the weight-norm sphere and the effective weight decay
    is multiplied by ``wd_ratio``. Returns (projected_update, wd_ratio_t).
    """
    if p.ndim < 2:
        return perturb, jnp.float32(1.0)

    def try_view(shape2d):
        gv = g.reshape(shape2d).astype(jnp.float32)
        pv = p.reshape(shape2d).astype(jnp.float32)
        uv = perturb.reshape(shape2d).astype(jnp.float32)
        cos = jnp.abs((gv * pv).sum(1)) / (
            jnp.linalg.norm(gv, axis=1) * jnp.linalg.norm(pv, axis=1) + eps)
        ok = cos.max() < delta / np.sqrt(gv.shape[1])
        pn = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        proj = (uv - pn * (pn * uv).sum(1, keepdims=True)).reshape(p.shape)
        return ok, proj.astype(perturb.dtype)

    ok_c, proj_c = try_view((p.shape[0], -1))
    ok_l, proj_l = try_view((1, -1))
    out = jnp.where(ok_c, proj_c, jnp.where(ok_l, proj_l, perturb))
    ratio = jnp.where(ok_c | ok_l, jnp.float32(wd_ratio), jnp.float32(1.0))
    return out, ratio


def adamp_direction(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    weight_decay: ScheduleLike = 0.0, wd_mask=None,
                    delta: float = 0.1, wd_ratio: float = 0.01,
                    nesterov: bool = True):
    """AdamP: Adam step + norm-growth-limiting projection. The reference
    builds it with wd_ratio=0.01, nesterov=True (optim_factory.py:169).
    Weight decay is the AdamP multiplicative form p*(1-lr*wd*ratio),
    expressed additively (exactly equal) so it rides the generic
    ``scheduled_optimizer(decoupled=False)`` wrapper."""
    wd_fn = _as_lookup(weight_decay)

    class AdamPState(NamedTuple):
        count: jnp.ndarray
        m: Any
        v: Any
        wd_base: jnp.ndarray  # LP-FT wd-table offset (set_schedule_count)

    def init(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return AdamPState(jnp.zeros([], jnp.int32), z(), z(),
                          jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        assert params is not None
        t = state.count + 1
        bias1 = 1 - b1 ** t.astype(jnp.float32)
        bias2 = 1 - b2 ** t.astype(jnp.float32)
        wd_t = wd_fn(state.wd_base + state.count)
        mask = (wd_mask if wd_mask is not None
                else jax.tree.map(lambda _: True, params))

        def leaf(g, p, m, v, msk):
            g = g.astype(jnp.float32)
            pf = p.astype(jnp.float32)
            m_n = b1 * m + (1 - b1) * g
            v_n = b2 * v + (1 - b2) * g * g
            denom = jnp.sqrt(v_n / bias2) + eps
            num = (b1 * m_n + (1 - b1) * g) if nesterov else m_n
            perturb = num / denom / bias1
            perturb, ratio = _projection(pf, g, perturb, delta, wd_ratio, eps)
            u = perturb + wd_t * ratio * pf * jnp.float32(msk)
            return u, m_n, v_n

        out = jax.tree.map(leaf, grads, params, state.m, state.v, mask)
        u = jax.tree.map(lambda o: o[0], out,
                         is_leaf=lambda x: isinstance(x, tuple))
        m = jax.tree.map(lambda o: o[1], out,
                         is_leaf=lambda x: isinstance(x, tuple))
        v = jax.tree.map(lambda o: o[2], out,
                         is_leaf=lambda x: isinstance(x, tuple))
        return u, AdamPState(t, m, v, state.wd_base)

    return optax.GradientTransformation(init, update)


def sgdp_direction(momentum: float = 0.9, weight_decay: ScheduleLike = 0.0,
                   wd_mask=None, delta: float = 0.1, wd_ratio: float = 0.1,
                   nesterov: bool = True, eps: float = 1e-8):
    """SGDP (projection SGD) — reference optim_factory.py:171-172."""
    wd_fn = _as_lookup(weight_decay)

    class SGDPState(NamedTuple):
        count: jnp.ndarray
        buf: Any
        wd_base: jnp.ndarray  # LP-FT wd-table offset (set_schedule_count)

    def init(params):
        return SGDPState(jnp.zeros([], jnp.int32),
                         jax.tree.map(jnp.zeros_like, params),
                         jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        assert params is not None
        wd_t = wd_fn(state.wd_base + state.count)
        mask = (wd_mask if wd_mask is not None
                else jax.tree.map(lambda _: True, params))

        def leaf(g, p, buf, msk):
            g = g.astype(jnp.float32)
            pf = p.astype(jnp.float32)
            buf_n = momentum * buf + g
            d_p = g + momentum * buf_n if nesterov else buf_n
            d_p, ratio = _projection(pf, g, d_p, delta, wd_ratio, eps)
            # timm sgdp.py decay: p *= 1 - lr*wd*ratio/(1-momentum) — the
            # 1/(1-momentum) compensates the momentum-amplified step scale
            u = d_p + wd_t * ratio / (1.0 - momentum) * pf * jnp.float32(msk)
            return u, buf_n

        out = jax.tree.map(leaf, grads, params, state.buf, mask)
        u = jax.tree.map(lambda o: o[0], out,
                         is_leaf=lambda x: isinstance(x, tuple))
        buf = jax.tree.map(lambda o: o[1], out,
                           is_leaf=lambda x: isinstance(x, tuple))
        return u, SGDPState(state.count + 1, buf, state.wd_base)

    return optax.GradientTransformation(init, update)


def novograd_direction(b1: float = 0.95, b2: float = 0.98, eps: float = 1e-8,
                       weight_decay: ScheduleLike = 0.0, wd_mask=None,
                       grad_averaging: bool = False):
    """NovoGrad (layer-wise second moment; Ginsburg et al. 2019) — the
    reference's novograd/nvnovograd/fusednovograd types
    (optim_factory.py:185-202). One fp32 scalar v per tensor:
    v_0=||g||^2, v_t=b2*v+(1-b2)*||g||^2; m_t=b1*m + (g/(sqrt(v)+eps)
    + wd*p); update = m_t."""
    wd_fn = _as_lookup(weight_decay)

    class NovoState(NamedTuple):
        count: jnp.ndarray
        m: Any
        v: Any
        wd_base: jnp.ndarray  # LP-FT wd-table offset (set_schedule_count)

    def init(params):
        return NovoState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(lambda _: jnp.zeros([], jnp.float32), params),
            jnp.zeros([], jnp.int32),
        )

    def update(grads, state, params=None):
        assert params is not None
        wd_t = wd_fn(state.wd_base + state.count)
        first = state.count == 0
        mask = (wd_mask if wd_mask is not None
                else jax.tree.map(lambda _: True, params))

        def leaf(g, p, m, v, msk):
            g = g.astype(jnp.float32)
            norm = (g * g).sum()
            v_n = jnp.where(first, norm, b2 * v + (1 - b2) * norm)
            gp = g / (jnp.sqrt(v_n) + eps)
            gp = gp + wd_t * p.astype(jnp.float32) * jnp.float32(msk)
            if grad_averaging:
                gp = gp * (1 - b1)
            m_n = b1 * m + gp
            return m_n, m_n, v_n

        out = jax.tree.map(leaf, grads, params, state.m, state.v, mask)
        u = jax.tree.map(lambda o: o[0], out,
                         is_leaf=lambda x: isinstance(x, tuple))
        m = jax.tree.map(lambda o: o[1], out,
                         is_leaf=lambda x: isinstance(x, tuple))
        v = jax.tree.map(lambda o: o[2], out,
                         is_leaf=lambda x: isinstance(x, tuple))
        return u, NovoState(state.count + 1, m, v, state.wd_base)

    return optax.GradientTransformation(init, update)


def lookahead(inner: optax.GradientTransformation, k: int = 6,
              alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (``lookahead_<opt>`` prefix,
    optim_factory.py:207-209; timm defaults k=6, alpha=0.5): keep slow
    weights in the optimizer state; every k fast steps pull them toward the
    fast weights and reset the fast weights to the slow ones. Expressed as
    a pure optax transform — the emitted update already lands the params on
    the synced value, so TrainState.apply stays a plain add."""

    class LookaheadState(NamedTuple):
        count: jnp.ndarray
        slow: Any
        inner: Any

    def init(params):
        return LookaheadState(jnp.zeros([], jnp.int32),
                              jax.tree.map(jnp.array, params),
                              inner.init(params))

    def update(grads, state, params=None):
        assert params is not None
        u, inner_s = inner.update(grads, state.inner, params)
        t = state.count + 1
        sync = (t % k) == 0

        def leaf(p, du, s):
            fast = p.astype(jnp.float32) + du.astype(jnp.float32)
            slow_n = jnp.where(sync, s + alpha * (fast - s), s)
            u_final = jnp.where(sync, slow_n - p.astype(jnp.float32),
                                du.astype(jnp.float32))
            return u_final.astype(du.dtype), slow_n

        out = jax.tree.map(leaf, params, u, state.slow)
        u2 = jax.tree.map(lambda o: o[0], out,
                          is_leaf=lambda x: isinstance(x, tuple))
        slow = jax.tree.map(lambda o: o[1], out,
                            is_leaf=lambda x: isinstance(x, tuple))
        return u2, LookaheadState(t, slow, inner_s)

    return optax.GradientTransformation(init, update)


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


def _l2_direction(base: optax.GradientTransformation,
                  weight_decay: ScheduleLike, wd_mask):
    """Fold torch-style L2 (wd into the gradient) in front of ``base``."""
    wd_fn = _as_lookup(weight_decay)

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

    return optax.GradientTransformation(init, update)


SUPPORTED_OPTS = (
    "adamw adam nadam radam lamb adabelief adagrad adadelta rmsprop "
    "rmsproptf lion sgd momentum nesterov adamp sgdp adafactor novograd "
    "nvnovograd (+ fused* aliases, lookahead_* prefix)"
)


def create_optimizer(
    opt: str,
    lr: ScheduleLike,
    params,
    weight_decay: ScheduleLike = 0.0,
    momentum: float = 0.9,
    betas: Optional[Tuple[float, float]] = None,
    eps: float = 1e-8,
    skip_list: Sequence[str] = DEFAULT_SKIP_LIST,
    num_layers: Optional[int] = None,
    layer_decay: Optional[float] = None,
    trainable_mask=None,
    mu_dtype=None,
) -> Tuple[optax.GradientTransformation, dict]:
    """Build the full optimizer (optim_factory.py:121-211 surface).

    Returns (transform, group_names). ``opt`` accepts the reference's names;
    fused/apex aliases map to the plain implementation (XLA fuses anyway);
    a ``lookahead_`` prefix wraps the base optimizer (optim_factory.py:
    207-209). ``adahessian`` raises: it needs a second backward pass for
    the Hutchinson Hessian-diagonal estimate, which is not expressible as
    a gradient transformation (and no reference config uses it — see
    docs/MIGRATION.md).

    ``mu_dtype``: storage dtype for the first moment of the adam family
    (``--mu_dtype bfloat16``). The optimizer update is HBM-bound — the
    measured 3.0 ms of a ViT-B stage-2 step is pure m/v traffic
    (tools/stage2_probe.py) — and a bf16 first moment claws back ~0.6 ms
    (+0.7% step). Off by default: fp32 state is the reference-parity
    contract.
    """
    opt_lower = opt.lower().replace("fused", "").strip("_")
    use_lookahead = opt_lower.startswith("lookahead_")
    if use_lookahead:
        opt_lower = opt_lower.split("_", 1)[1]
    if opt_lower == "adahessian":
        raise NotImplementedError(
            "adahessian needs a second-order (Hutchinson) backward pass and "
            "is not supported on the TPU build; pick one of: "
            + SUPPORTED_OPTS)
    if betas is None:
        # reference semantics (optim_factory.py:146-147): betas enter
        # opt_args only when --opt_betas is set, else each optimizer's own
        # default applies — (0.95, 0.98) for timm NovoGrad/NvNovoGrad,
        # (0.9, 0.999) for the torch adam family
        betas = ((0.95, 0.98) if opt_lower in ("novograd", "nvnovograd")
                 else (0.9, 0.999))
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

    # directions where wd is DECOUPLED AdamW-style (wd added to the update)
    adam_dirs = {
        "adamw": lambda: optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                                             mu_dtype=mu_dtype),
        "radam": lambda: optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps),
        "lamb": lambda: optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                                mu_dtype=mu_dtype),
            optax.scale_by_trust_ratio(),
        ),
        "adabelief": lambda: optax.scale_by_belief(b1=betas[0], b2=betas[1], eps=eps),
        "lion": lambda: optax.scale_by_lion(b1=betas[0], b2=betas[1]),
        # Adafactor: factored second moment (optax.scale_by_factored_rms);
        # wd decoupled like timm's Adafactor (optim_factory.py:176-179).
        # timm's relative-step/update-clipping extras are intentionally not
        # reproduced (docs/MIGRATION.md) — the explicit-lr path is the one
        # the reference can reach (args.lr is always set).
        "adafactor": lambda: optax.scale_by_factored_rms(),
    }
    # directions where wd is COUPLED torch-style (L2 into the gradient);
    # torch RMSprop: eps OUTSIDE sqrt, v starts at 0; timm RMSpropTF: eps
    # inside sqrt, v starts at 1 (optim_factory.py:181-184). Both take the
    # reference's alpha=0.9 + momentum-buffer chain.
    l2_dirs = {
        "adam": lambda: optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        # timm nadam.py / torch Adadelta & Adagrad fold L2 into the gradient
        # BEFORE the moment statistics (coupled), unlike AdamW-style decay
        "nadam": lambda: optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps,
                                             nesterov=True, mu_dtype=mu_dtype),
        "adadelta": lambda: optax.scale_by_adadelta(eps=eps),
        "adagrad": lambda: optax.scale_by_rss(initial_accumulator_value=0.0,
                                              eps=eps),
        "rmsprop": lambda: optax.chain(
            optax.scale_by_rms(decay=0.9, eps=eps, eps_in_sqrt=False),
            optax.trace(decay=momentum)),
        "rmsproptf": lambda: optax.chain(
            optax.scale_by_rms(decay=0.9, eps=eps, initial_scale=1.0,
                               eps_in_sqrt=True),
            optax.trace(decay=momentum)),
    }

    if opt_lower in ("sgd", "momentum", "nesterov"):
        # reference 'sgd' == nesterov SGD (optim_factory.py:153-159);
        # only 'momentum' is the plain heavy-ball variant
        direction = sgd_l2_direction(
            momentum=momentum, nesterov=(opt_lower != "momentum" and momentum > 0),
            weight_decay=masked_wd, wd_mask=wd_mask,
        )
        tx_dir, decoupled = direction, False
    elif opt_lower == "adamp":
        tx_dir = adamp_direction(b1=betas[0], b2=betas[1], eps=eps,
                                 weight_decay=masked_wd, wd_mask=wd_mask)
        decoupled = False  # wd folded inside (projection-modulated)
    elif opt_lower == "sgdp":
        tx_dir = sgdp_direction(momentum=momentum, weight_decay=masked_wd,
                                wd_mask=wd_mask, eps=eps)
        decoupled = False
    elif opt_lower in ("novograd", "nvnovograd"):
        # betas=None already resolved to the canonical (0.95, 0.98) above;
        # an explicit --opt_betas overrides, as in the reference
        tx_dir = novograd_direction(b1=betas[0], b2=betas[1], eps=eps,
                                    weight_decay=masked_wd, wd_mask=wd_mask)
        decoupled = False
    elif opt_lower in l2_dirs:
        tx_dir = _l2_direction(l2_dirs[opt_lower](), masked_wd, wd_mask)
        decoupled = False
    elif opt_lower in adam_dirs:
        tx_dir, decoupled = adam_dirs[opt_lower](), True
    else:
        raise ValueError(
            f"unsupported optimizer {opt!r}; supported: {SUPPORTED_OPTS}")

    tx = scheduled_optimizer(tx_dir, lr, masked_wd, wd_mask=wd_mask,
                             lr_scale=lr_scale,
                             decoupled=decoupled)
    if use_lookahead:
        # wrap the FULL scheduled optimizer: lookahead operates on the final
        # (lr-scaled) updates, and its sync step emits `slow - p` directly
        tx = lookahead(tx)
    return tx, groups
