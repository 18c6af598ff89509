"""Device mesh, sharding helpers, and the data-parallel step wrapper.

TPU-native replacement for the reference's DDP/NCCL layer
(/root/reference/src/utils.py:510-551 init_distributed_mode + implicit DDP
allreduce): one JAX process per host drives all local chips; the train step
is jitted with explicit NamedShardings over a ``Mesh(('data',))`` so GSPMD
emits the gradient psum over ICI (DCN across slices). DDP's grad-*mean*
semantics fall out of the mean-over-global-batch loss.

The mesh is 1-D data-parallel by default (the reference's only strategy —
SURVEY §2.3) but every helper takes an axis-names tuple so wider meshes
(('data','model')) compose when models grow.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Device mesh; on multi-slice pods the device order is made
    slice-hierarchical (see ``hybrid_device_array``) so 'data' collectives
    decompose into intra-slice ICI phases + one inter-slice DCN phase, and
    any minor axis ('model') stays inside a slice's ICI domain."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) > 1:
        arr = hybrid_device_array(devices, tuple(shape))
    else:
        arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def hybrid_device_array(devices, shape: Sequence[int],
                        slice_of=None) -> np.ndarray:
    """Order ``devices`` into ``shape`` hierarchically across pod slices.

    Multi-slice pods (jax.Device.slice_index) have two interconnect tiers:
    ICI within a slice, DCN between slices (the scaling-book recipe / what
    mesh_utils.create_hybrid_device_mesh produces for a DCN-major data
    axis). This packs each slice's devices contiguously and stacks slices
    along the LEADING (data) axis — so minor axes (e.g. 'model' groups)
    never straddle a slice boundary, and the data axis is slice-major,
    which XLA's collective passes decompose into per-slice reduce-scatter
    over ICI + a small inter-slice exchange over DCN + per-slice
    all-gather, instead of a flat ring across the slow tier.

    Requires: equal slice sizes, shape[0] divisible by the slice count,
    and the per-slice device count equal to the minor-axes product times
    shape[0]//num_slices. ``slice_of`` overrides the grouping key (tests).
    """
    slice_of = slice_of or (lambda d: getattr(d, "slice_index", 0))
    groups: dict = {}
    for d in devices:
        groups.setdefault(slice_of(d), []).append(d)
    sizes = {len(v) for v in groups.values()}
    if len(sizes) != 1:
        raise ValueError(f"unequal slice sizes: "
                         f"{ {k: len(v) for k, v in groups.items()} }")
    n_slices = len(groups)
    shape = tuple(shape)
    if shape[0] % n_slices:
        raise ValueError(
            f"leading (data) mesh dim {shape[0]} not divisible by the "
            f"slice count {n_slices}")
    per_slice_shape = (shape[0] // n_slices,) + shape[1:]
    stacked = np.stack([
        np.asarray(groups[s], dtype=object).reshape(per_slice_shape)
        for s in sorted(groups)
    ])  # [n_slices, data/slices, *minor]
    return stacked.reshape(shape)


def model_axis_size(mesh: Optional[Mesh], axis: str = "model") -> int:
    """Tensor-parallel ways of a mesh (1 for the default 1-D data mesh)."""
    if mesh is None or axis not in mesh.axis_names:
        return 1
    return int(mesh.shape[axis])


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data",
                replicated_keys: Sequence[str] = ("classwise_thresholds",)):
    """Device-put a host batch with the leading dim sharded over ``axis``.

    The global batch must be divisible by the axis size (the reference's
    sampler pads per-rank shards to equal length, datasets/distributed.py:
    133-147 — our data layer does the same per host).

    Top-level entries named in ``replicated_keys`` (non-batch side tables,
    e.g. stage 3's per-class thresholds [nb_classes]) are replicated
    instead of sharded.
    """

    def put(x, force_replicate=False):
        x = np.asarray(x)
        if x.ndim == 0 or force_replicate:
            return jax.device_put(x, replicated(mesh))
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        if jax.process_count() > 1:
            # multi-host: ``x`` is this PROCESS's shard (the per-host
            # sampler feeds each host distinct data, reference
            # datasets/distributed.py:133-147); assemble the global array
            # from the per-process locals instead of device_put-ing a
            # pretend-global value
            return jax.make_array_from_process_local_data(sharding, x)
        assert x.shape[0] % mesh.shape[axis] == 0, (
            f"batch dim {x.shape[0]} not divisible by {axis}={mesh.shape[axis]}"
        )
        return jax.device_put(x, sharding)

    if isinstance(batch, dict):
        return {k: (put(v, k in replicated_keys) if not isinstance(v, dict)
                    else jax.tree.map(put, v))
                for k, v in batch.items()}
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def cast_videos_bf16(batch: dict) -> dict:
    """Cast float32 video tensors (ndim>=4) to bf16 on the HOST before the
    device_put — halves H2D bytes on the narrow link (~33MB/s through the
    axon tunnel); the engines' ``normalize_videos`` accepts bf16 directly."""
    import ml_dtypes

    def cast(x):
        x = np.asarray(x)
        if x.dtype == np.float32 and x.ndim >= 4:
            return x.astype(ml_dtypes.bfloat16)
        return x

    return {k: cast(v) for k, v in batch.items()}


def data_parallel_jit(fn, mesh: Mesh, state_argnums=(0,), batch_argnums=(1,),
                      donate_state: bool = True, axis: str = "data",
                      static_argnums=(), state_shardings=None):
    """jit ``fn(state, batch, ...)`` with params replicated and batches
    sharded on ``axis``; gradient collectives are emitted by GSPMD.

    IMPORTANT: pass the state through ``replicate(state, mesh)`` before the
    first call. A host-resident state compiles once with unspecified input
    sharding and then AGAIN when the first returned (NamedSharding) state is
    fed back — a double compile that costs minutes at ViT-B scale.
    """
    import inspect

    n_known = len(inspect.signature(fn).parameters)
    in_shardings = []
    for i in range(n_known):
        if i in static_argnums:
            # static args are removed from jit's dynamic positional tuple
            # before in_shardings is matched — including an entry for them
            # makes the lengths disagree and the first call raises
            continue
        if i == state_argnums[0] and state_shardings is not None:
            in_shardings.append(state_shardings)  # e.g. ZeRO-1 layout
        elif i in state_argnums:
            in_shardings.append(replicated(mesh))
        elif i in batch_argnums:
            # inherit per-leaf placement from shard_batch (batch dims on
            # 'data', side tables like classwise_thresholds replicated)
            in_shardings.append(None)
        else:
            in_shardings.append(replicated(mesh))
    out_shardings = None
    if state_shardings is not None:
        # fn returns (state, metrics): pin the state's output layout so the
        # fed-back state keeps the declared (e.g. ZeRO-1) sharding
        out_shardings = (state_shardings, replicated(mesh))
    return jax.jit(
        fn,
        in_shardings=tuple(in_shardings),
        out_shardings=out_shardings,
        donate_argnums=tuple(state_argnums) if donate_state else (),
        static_argnums=static_argnums,
    )


def _zero1_leaf_spec(mesh: Mesh, axis: str):
    """The ZeRO-1 moment rule: shard a leaf over ``axis`` along its largest
    divisible dim, else replicate. ONE implementation shared by
    zero1_sharding_tree and tensor_parallel_sharding_tree so --zero1 alone
    and --tp --zero1 can never drift apart."""
    n = mesh.shape[axis]

    def leaf(x):
        shape = np.shape(x)
        for dim, size in enumerate(shape):
            if size % n == 0 and size >= n:
                spec = [None] * len(shape)
                spec[dim] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return leaf


def zero1_sharding_tree(state, mesh: Mesh, axis: str = "data"):
    """ZeRO-1-style sharding layout: params replicated, optimizer moments
    sharded over ``axis`` along their first divisible dimension.

    The reference only ever ran an (unused) DeepSpeed ZeRO path
    (run_stage2.py:258-282); here optimizer-state sharding is a layout
    annotation — GSPMD inserts the reduce-scatter/all-gather pair around the
    elementwise update. Returns a pytree of NamedShardings matching
    ``state`` for use as jit in_shardings / device_put layout.
    """
    opt_leaf = _zero1_leaf_spec(mesh, axis)

    def rep(_):
        return NamedSharding(mesh, P())

    return state.replace(
        step=rep(state.step),
        params=jax.tree.map(rep, state.params),
        opt_state=jax.tree.map(opt_leaf, state.opt_state),
        ema_params=(jax.tree.map(rep, state.ema_params)
                    if state.ema_params is not None else None),
    )


def shard_state_zero1(state, mesh: Mesh, axis: str = "data"):
    """device_put the train state with the ZeRO-1 layout."""
    layout = zero1_sharding_tree(state, mesh, axis)
    return jax.device_put(state, layout)


def fsdp_sharding_tree(state, mesh: Mesh, axis: str = "data"):
    """ZeRO-3/FSDP-style layout: params, EMA AND optimizer moments all
    shard over ``axis`` along their first divisible dim (the same rule
    as ZeRO-1's moments, _zero1_leaf_spec). GSPMD then materializes each
    param by all-gather at its use sites inside the step and keeps the
    gradient reduction as a reduce-scatter into the shard — the
    torch-FSDP/ZeRO-3 communication pattern, expressed purely as a layout
    annotation (no wrapper module, no hand-written collectives). Per-chip
    state memory drops ~axis-ways (ViT-L fp32 p+m+v ≈ 3.6 GB → ~0.45 GB
    at 8 ways), buying batch/sequence headroom; the trade is one
    all-gather per param per step vs ZeRO-1's none.

    Beyond-reference capability (SURVEY §2.3: the reference is DDP-only;
    its DeepSpeed path is dead code). Trajectory parity vs replicated DDP
    is pinned by the multichip dryrun (stage2+fsdp) and
    tests/test_tensor_parallel.py.
    """
    leaf = _zero1_leaf_spec(mesh, axis)

    def rep(_):
        return NamedSharding(mesh, P())

    return state.replace(
        step=rep(state.step),
        params=jax.tree.map(leaf, state.params),
        opt_state=jax.tree.map(leaf, state.opt_state),
        ema_params=(jax.tree.map(leaf, state.ema_params)
                    if state.ema_params is not None else None),
    )


# Megatron-style tensor-parallel param layout for the transformer stack:
# column-parallel input projections (qkv, mlp fc1 — output dim sharded) and
# row-parallel output projections (attn proj, mlp fc2 — input dim sharded).
# GSPMD derives the activation shardings and inserts the one all-reduce per
# block half (after proj / after fc2) that the pattern requires; biases and
# everything else (LN, pos-emb, patch-embed, heads, decoders) replicate.
# The rules key on the trailing param-path names, which `models/layers.py`
# pins one-to-one to the reference's torch names (blocks_i/attn/qkv/kernel).
_TP_COLUMN = {("attn", "qkv", "kernel"), ("mlp", "fc1", "kernel")}
_TP_ROW = {("attn", "proj", "kernel"), ("mlp", "fc2", "kernel")}


def _path_names(path) -> list:
    names = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            names.append(str(k.key))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            names.append(k.name)
        elif isinstance(k, jax.tree_util.FlattenedIndexKey):
            names.append(str(k.key))
    return names


def tensor_parallel_sharding_tree(state, mesh: Mesh, axis: str = "model",
                                  zero1_axis: Optional[str] = None):
    """Sharding layout for tensor parallelism over the ``axis`` mesh axis.

    Params, EMA and optimizer moments of the four per-block projection
    kernels shard per `_TP_COLUMN`/`_TP_ROW`; everything else replicates
    (or, for optimizer moments with ``zero1_axis``, falls back to the
    ZeRO-1 rule so --tp and --zero1 compose). Dims not divisible by the
    axis size silently replicate — correctness never depends on the
    annotation, only memory/compute placement does.

    The reference has no model parallelism at all (SURVEY §2.3: DDP only);
    this is a beyond-parity option for wide students (ViT-L/H video). Note
    the models must run with ``use_pallas=False`` under tp>1: Pallas calls
    have no GSPMD partitioning rule, so XLA would all-gather their operands
    per block; the einsum attention partitions cleanly over heads instead.
    """
    tp = int(mesh.shape[axis])

    def tp_spec(path, x, fallback):
        names = tuple(_path_names(path)[-3:])
        shape = np.shape(x)
        if len(shape) == 2:
            if names in _TP_COLUMN and shape[1] % tp == 0:
                return NamedSharding(mesh, P(None, axis))
            if names in _TP_ROW and shape[0] % tp == 0:
                return NamedSharding(mesh, P(axis, None))
        return fallback(x)

    def rep(_):
        return NamedSharding(mesh, P())

    # ZeRO-1 fallback for unmatched moments (shared rule, see _zero1_leaf_spec)
    z1 = _zero1_leaf_spec(mesh, zero1_axis) if zero1_axis is not None else rep

    tmap = jax.tree_util.tree_map_with_path
    return state.replace(
        step=rep(state.step),
        params=tmap(lambda p, x: tp_spec(p, x, rep), state.params),
        opt_state=tmap(lambda p, x: tp_spec(p, x, z1), state.opt_state),
        ema_params=(tmap(lambda p, x: tp_spec(p, x, rep), state.ema_params)
                    if state.ema_params is not None else None),
    )


def state_layout(state, mesh: Mesh, tp: int = 1, zero1: bool = False,
                 fsdp: bool = False):
    """The entries' one-stop layout: None (fully replicated), the ZeRO-1
    tree, the FSDP (ZeRO-3) tree, or the tensor-parallel tree (with ZeRO-1
    moments when both are requested). Pass the result to
    ``data_parallel_jit(state_shardings=...)`` and
    ``jax.device_put(state, ...)``."""
    if tp > 1:
        # fsdp composes with tp as 2-D sharding in principle, but the TP
        # rules already shard the big kernels over 'model'; adding 'data'
        # sharding of the remainder is ZeRO-1's job — keep the matrix simple
        if fsdp:
            print("[mesh] --fsdp with --tp: params/EMA stay sharded by the "
                  "TP rules only; full-state data-axis sharding downgrades "
                  "to ZeRO-1 moment sharding (expect TP-level, not "
                  "world-level, per-chip state memory)", flush=True)
        return tensor_parallel_sharding_tree(
            state, mesh, zero1_axis="data" if (zero1 or fsdp) else None)
    if fsdp:
        return fsdp_sharding_tree(state, mesh)
    if zero1:
        return zero1_sharding_tree(state, mesh)
    return None


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous shard of the global batch (multihost input)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
