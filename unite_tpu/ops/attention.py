"""Multi-head attention ops: Pallas TPU flash attention + XLA fallback.

The hot kernels of the whole framework (reference hot loops: student ViT
Block x12 over 314-1568 tokens fwd+bwd, frozen CLIP teacher Block x12 over
197 tokens fwd-only — /root/reference/src/models/modeling_finetune.py:100-119
and clip.py:48-53). Design is TPU-first:

* one fused Pallas kernel per pass, blocked over queries (keys/values for a
  single (batch, head) fit comfortably in VMEM at these sequence lengths, so
  the kernel is a single-sweep flash attention with a full-row softmax in
  fp32 and bf16 MXU matmuls);
* backward is two Pallas kernels (dQ blocked over queries; dK/dV blocked over
  keys) using the stored row logsumexp — the standard flash-attention
  recomputation split. (A single fused dQ/dK/dV kernel with an accumulated
  dQ block was tried and measured SLOWER on v5e — 41.6-43.7 vs 36.2 ms at
  the 1568-token workload — the revisited accumulator block serializes the
  pipeline; don't re-try.);
* k/v stay UNPADDED everywhere (blocks equal to the array dims — Mosaic
  masks the physical tile padding in dots and reductions); only the query
  side pads to a 128 multiple for a legal lse lane block, and the dkv key
  block is a multiple-of-8 divisor of S (112 for 1568/784) so keys need no
  pad either;
* an XLA einsum fallback runs on CPU (tests) and whenever full
  attention-prob output or dropout is requested. The teacher's last layer
  (head-averaged CLS->patch probabilities, clip.py:95-96) does NOT hit it
  on TPU: models/clip.py computes the CLS row with one [B,H,N] einsum
  alongside the fused kernel instead of materializing [B,H,N,N].
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = int(os.environ.get("UNITE_FLASH_BQ", "128"))
DEFAULT_BLOCK_K = int(os.environ.get("UNITE_FLASH_BK", "128"))
NEG_INF = -1e30
# The flash kernels fold the softmax scale into a base-2 exponent:
# exp(s*scale - m*scale) == exp2(s*c - m*c) with c = scale*log2(e). This
# drops the separate s*scale pass over the fp32 score tile and uses the
# VPU's native exp2. The stored row stats are therefore BASE-2 logsumexp of
# the SCALED scores (lse2 = m*c + log2(sum exp2((s-m)*c))); every consumer
# in this file uses the same convention.
INV_LN2 = 1.4426950408889634  # log2(e)
# Pallas interpret mode: emulates every kernel in this file on CPU so the
# pytest suite can cover kernel MATH without a TPU (Mosaic layout/VMEM
# legality is still only checked by an on-chip run — bench.py --check).
# Tests monkeypatch this module global; the env var covers ad-hoc runs.
_INTERPRET = os.environ.get("UNITE_PALLAS_INTERPRET", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference implementation (CPU fallback, prob output, dropout)
# ---------------------------------------------------------------------------


def attention_xla(q, k, v, *, scale=None, return_probs=False, dropout_rate=0.0,
                  dropout_rng=None, deterministic=True):
    """Plain attention. q,k,v: [B, H, S, D]. Softmax in fp32."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    probs_out = probs
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    if return_probs:
        return out, probs_out
    return out


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------


def _flash_gb(s_pad: int, bq: int) -> int:
    """(batch·head) rows per program: multi-row programs amortize launch
    overhead (same lesson as the fused-qkv kernels). Scanned on v5e at the
    1568-token stage-2 workload: gb=4 beats 1/2/3 for fwd AND both bwd
    kernels (62.7 → 65.1 clips/s) and the ~3.4MB score tiles still fit.

    UNITE_FLASH_GB (like UNITE_FLASH_BQ/BK and UNITE_FUSED{,_BWD}_GB) is a
    trace-time-only tuning knob: it is read when the kernel is traced and
    baked into the jitted code, and an override bypasses the VMEM-fit
    heuristic (too-large values overflow scoped VMEM at compile time)."""
    env = int(os.environ.get("UNITE_FLASH_GB", "0"))
    return env or max(1, min(4, (6 * 1024 * 1024) // (bq * s_pad * 4)))


def _flash_qblock(s: int, block_q: int):
    """Query blocking for the flash kernels: prefer a multiple-of-8 divisor
    of S (e.g. 1568 → 224, 784 → 112) so the query side needs NO padding at
    all — no pad copies, no output slices, no garbage rows. The row-stats
    (lse) array is stored SUBLANE-major [BH, S, 8], which only constrains
    the q block to a multiple of 8, not 128. Falls back to padding S up to
    a 128 multiple when no usable divisor exists (e.g. 577 → 640).

    The 224 floor is the measured v5e sweet spot; an explicit
    UNITE_FLASH_BQ override wins in BOTH directions (without this a
    below-224 override — e.g. to shrink VMEM at a new length — was
    silently ignored). The env VALUE is read here at trace time (not the
    import-time ``block_q`` default) so setting it after import behaves
    the same as setting it before."""
    env = os.environ.get("UNITE_FLASH_BQ")
    bq_eff = int(env) if env else block_q  # effective knob value
    bq = _divisor_block(s, bq_eff if env else max(bq_eff, 224))
    if bq >= 64:
        return s, bq
    m = max(bq_eff, 128)  # pad fallback keeps the RAW knob (577 → 640/128)
    s_pad = _round_up(s, m)
    bq = _divisor_block(s_pad, m)
    if bq == 0:
        # a non-multiple-of-8 block_q override (e.g. UNITE_FLASH_BQ=130 →
        # s_pad=650) can leave s_pad with no legal divisor; re-pad with the
        # block rounded up to a 128 multiple instead of a zero-size grid
        m = _round_up(m, 128)
        s_pad = _round_up(s, m)
        bq = _divisor_block(s_pad, m)
    return s_pad, bq


def _flash_kblock_target(block_k: int) -> int:
    # 160 floor measured on v5e; an explicit UNITE_FLASH_BK override wins
    # in both directions and is read at trace time (see _flash_qblock).
    env = os.environ.get("UNITE_FLASH_BK")
    return int(env) if env else max(block_k, 160)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    # Block shapes: q [GB, BQ, D]; k,v [GB, S, D] with S the LOGICAL length
    # — blocks equal the array dims and Mosaic masks the physical tile
    # padding in dots and reductions itself (the fused-qkv lesson: no
    # jnp.pad HBM round trip, no -inf column pass); o [GB, BQ, D];
    # lse [GB, BQ, 8] — row stats sublane-major (queries on sublanes),
    # broadcast over 8 lanes to fill a legal tile.
    # Same VPU-lean softmax as the fused kernels: exp2 writes bf16, the
    # row-sum denominator rides the MXU, 1/l folds into the output.
    q = q_ref[...]  # [GB, BQ, D]
    k = k_ref[...]  # [GB, S, D]
    v = v_ref[...]
    c = scale * INV_LN2

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [GB, BQ, S] fp32, RAW (scale folded into the exp2 below)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m) * c).astype(v.dtype)  # bf16 for the MXU dots
    pv, l = _pv_and_rowsum(p, v)  # one dot: PV + MXU row sums
    lse = m * c + jnp.log2(l)  # [GB, BQ, 1] base-2 scaled lse
    lse_ref[...] = jnp.broadcast_to(lse, lse_ref.shape)
    o_ref[...] = (pv * (1.0 / l)).astype(o_ref.dtype)


def _flash_fwd(q, k, v, scale, block_q):
    # No padding in the common case (bq an exact divisor of S); otherwise
    # query-side-only padding. k/v stay UNPADDED always. Padded query rows
    # are zeros → finite outputs, sliced off by the callers.
    b, h, s, d = q.shape
    s_padq, bq = _flash_qblock(s, block_q)
    bh = b * h
    gb = _flash_gb(_round_up(s, 128), bq)
    bh_pad = _round_up(bh, gb)

    def prep(x, pad_s):
        x = x.reshape(bh, s, d)
        if bh_pad != bh or (pad_s and s_padq != s):
            x = jnp.pad(x, [(0, bh_pad - bh),
                            (0, s_padq - s if pad_s else 0), (0, 0)])
        return x

    qp = prep(q, True)
    kp, vp = prep(k, False), prep(v, False)

    grid = (bh_pad // gb, s_padq // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        interpret=_INTERPRET,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bq, 8), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh_pad, s_padq, d), q.dtype),
            jax.ShapeDtypeStruct((bh_pad, s_padq, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh_pad * s_padq * s * d,
            bytes_accessed=3 * bh_pad * s * d * q.dtype.itemsize,
            transcendentals=bh_pad * s_padq * s,
        ),
    )(qp, kp, vp)
    return out[:bh], lse[:bh], (s_padq, bq)


# ---------------------------------------------------------------------------
# Pallas backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, *,
                   scale):
    # Consumes the forward's saved base-2 row stats: p_norm = exp2(s*c -
    # lse2) is already NORMALIZED, so there is no max reduce, no row-sum
    # dot and no divide here — one exp2 pass over the score tile. delta =
    # rowsum(do * o) still computes in-kernel ([GB, BQ, D] blocks are
    # sublane-major over queries, matching the score tile).
    # lse arrives sublane-major [GB, BQ, 8]: a rank-preserving lane slice
    # broadcasts it straight against s.
    # q/o/do blocks [GB, BQ, D]; k,v [GB, S, D] UNPADDED (blocks equal
    # array dims — Mosaic masks tile padding, no -inf pass). Dots take
    # bf16 operands for full MXU rate; the DOT accumulates exactly in
    # fp32, but computed fp32 intermediates (ds) round to bf16 first —
    # covered by bench.py --check grad parity.
    q = q_ref[...]   # [GB, BQ, D]
    k = k_ref[...]   # [GB, S, D]
    v = v_ref[...]
    o = o_ref[...].astype(jnp.float32)
    do = do_ref[...]
    do32 = do.astype(jnp.float32)
    delta = jnp.sum(do32 * o, axis=-1, keepdims=True)  # [GB, BQ, 1]
    lse = lse_ref[:, :, 0:1]  # [GB, BQ, 1]
    c = scale * INV_LN2

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # RAW scores
    p = jnp.exp2(s * c - lse)  # [GB, BQ, S] fp32, normalized probs

    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[...] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale):
    # k,v blocks [GB, BK, D] (key-side padded only if BK doesn't divide S);
    # q, do FULL UNPADDED [GB, S, D]; lse/delta [GB, 1, S] lane-major row
    # stats (one cheap XLA relayout outside, queries on lanes to broadcast
    # against the transposed score tile). No masking needed: zero-padded
    # KEY rows only produce garbage dk/dv rows that are sliced off outside.
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    lse = lse_ref[...]       # [GB, 1, S] per-query row stats
    delta = delta_ref[...]   # [GB, 1, S]

    # scores transposed: [GB, BK, S] = k @ q^T, RAW (scale folded into exp2
    # against the base-2 scaled lse)
    st = jax.lax.dot_general(
        k, q, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    pt = jnp.exp2(st * (scale * INV_LN2) - lse).astype(q.dtype)  # P^T, bf16

    dv = jax.lax.dot_general(
        pt, do, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dpt [GB, BK, S] = v @ do^T
    dpt = jax.lax.dot_general(
        v, do, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dst = (pt.astype(jnp.float32) * (dpt - delta) * scale).astype(q.dtype)
    dk = jax.lax.dot_general(
        dst, q, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _divisor_block(s: int, target: int) -> int:
    """Largest multiple-of-8 divisor of ``s`` that is ≤ ``target`` (legal
    unpadded sublane block), or 0 if none exists (then the caller pads).
    E.g. 1568 → 112, 784 → 112, 640 → 128."""
    best = 0
    for b in range(8, min(target, s) + 1, 8):
        if s % b == 0:
            best = b
    return best


def _flash_bwd(res, g, scale, block_q, block_k):
    # Residuals: q,k,v UNPADDED [BH, S, D]; out [BH, S_padq, D];
    # lse [BH, S_padq, 8] (sublane-major row stats; S_padq == S in the
    # common exact-divisor case, so everything below is pad/slice-free).
    q, k, v, out, lse, s = res
    bh, s_padq, d = out.shape
    do_p = g  # [BH, S_padq, D] (query-side padded by the vjp glue)
    do = do_p[:, :s] if s_padq != s else do_p
    out_l = out[:, :s] if s_padq != s else out
    delta = jnp.sum(do.astype(jnp.float32) * out_l.astype(jnp.float32),
                    axis=-1)
    delta_lane = delta.reshape(bh, 1, s)
    lse_lane = lse[:, :s, 0].reshape(bh, 1, s)

    _, bq = _flash_qblock(s, block_q)
    # key block: a multiple-of-8 divisor of s keeps k/v unpadded; when none
    # exists, pad keys (padded key rows only yield garbage dk/dv rows that
    # are sliced off — no masking needed either way)
    bk = _divisor_block(s, _flash_kblock_target(block_k))
    gb = _flash_gb(_round_up(s, 128), max(bq, bk or block_k))
    bh_pad = _round_up(bh, gb)
    if bh_pad != bh:
        bpad = [(0, bh_pad - bh), (0, 0), (0, 0)]
        q, k, v, out, do_p, do = (
            jnp.pad(x, bpad) for x in (q, k, v, out, do_p, do))
        lse = jnp.pad(lse, bpad)
        lse_lane = jnp.pad(lse_lane, bpad)
        delta_lane = jnp.pad(delta_lane, bpad)
    qp = jnp.pad(q, [(0, 0), (0, s_padq - s), (0, 0)]) if s_padq != s else q
    s_padk = s
    kb, vb = k, v
    if bk == 0:
        bk = min(block_k, _round_up(s, 128))
        s_padk = _round_up(s, bk)
        kpad = [(0, 0), (0, s_padk - s), (0, 0)]
        kb, vb = jnp.pad(k, kpad), jnp.pad(v, kpad)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        interpret=_INTERPRET,
        grid=(bh_pad // gb, s_padq // bq),
        in_specs=[
            pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bq, 8), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_pad, s_padq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh_pad * s_padq * s * d,
            bytes_accessed=4 * bh_pad * s * d * q.dtype.itemsize,
            transcendentals=bh_pad * s_padq * s,
        ),
    )(qp, k, v, out, do_p, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        interpret=_INTERPRET,
        grid=(bh_pad // gb, s_padk // bk),
        in_specs=[
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 1, s), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 1, s), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh_pad, s_padk, d), q.dtype),
            jax.ShapeDtypeStruct((bh_pad, s_padk, d), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh_pad * s_padk * s * d,
            bytes_accessed=4 * bh_pad * s * d * q.dtype.itemsize,
            transcendentals=bh_pad * s_padk * s,
        ),
    )(q, kb, vb, do, lse_lane, delta_lane)
    dk = dk[:bh, :s] if s_padk != s else dk[:bh]
    dv = dv[:bh, :s] if s_padk != s else dv[:bh]
    return dq[:bh], dk, dv


# ---------------------------------------------------------------------------
# Grouped short-sequence kernels
#
# At the workloads' short lengths (teacher 197, masked student ~314 tokens)
# a per-(batch·head) grid drowns in program-launch overhead (e.g. student:
# 576 programs of ~6 MFLOP each) and XLA's unfused attention is HBM-bound on
# fp32 score materialization. These kernels process G (batch·head) rows per
# program with the FULL sequence resident in VMEM: one batched MXU matmul
# per stage, one program per G rows, and a single fused backward computing
# dQ, dK and dV together (all intermediates stay in VMEM).
# ---------------------------------------------------------------------------

GROUPED_MAX_SEQ = 512


def _grouped_group(s_pad: int) -> int:
    # fwd holds ~2 [G, S, S] fp32 tiles; keep them within ~8MB of VMEM
    if s_pad <= 256:
        return 16
    if s_pad <= 384:
        return 8
    return 4


def _grouped_group_bwd(s_pad: int) -> int:
    # bwd holds ~3-4 [G, S, S] fp32 tiles (s/p, dp, ds) — smaller groups
    if s_pad <= 256:
        return 4
    if s_pad <= 384:
        return 4
    return 2


def _grouped_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len):
    # VPU-lean softmax: the scale folds into the base-2 exponent (one fma +
    # exp2 pass instead of a separate s*scale pass), the 1/l normalization
    # moves to the OUTPUT ([G,S,D]); dots take bf16 operands (4x the
    # fp32-upcast MXU rate; the dot accumulates in fp32, but the fp32 exp2
    # output is rounded to bf16 before the PV dot).
    q = q_ref[...]  # [G, S, D]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, S, S] RAW
    s_pad = k.shape[1]
    if seq_len < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < seq_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m) * (scale * INV_LN2))
    l = jnp.sum(p, axis=-1)[..., None]  # [G, S, 1]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _grouped_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                        *, scale, seq_len):
    # bf16-operand dots with fp32 accumulation throughout (see fwd note)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # RAW (scale folds into the exp2)
    s_pad = k.shape[1]
    if seq_len < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < seq_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * (scale * INV_LN2))  # unnormalized probs [G, S, S]
    inv_l = 1.0 / jnp.sum(e, axis=-1)[..., None]  # [G, S, 1]

    # dv = (e/l)^T @ do == e^T @ (do/l broadcast over query rows)
    ec = e.astype(q.dtype)
    do_l = (do.astype(jnp.float32) * inv_l).astype(q.dtype)
    dv = jax.lax.dot_general(
        ec, do_l, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dp = do @ v^T ; ds = p * (dp - delta); fold 1/l into the [G,S,D] side
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, S, S]
    delta = jnp.sum(e * dp, axis=-1)[..., None] * inv_l  # rowsum(p·dp)
    ds = e * (dp - delta)  # == ds/scale * l  (scale, 1/l deferred)
    dq = jax.lax.dot_general(
        ds.astype(q.dtype), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (scale * inv_l)
    dk = jax.lax.dot_general(
        (ds * inv_l).astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _grouped_pad(q, k, v, g: int):
    b, h, s, d = q.shape
    s_pad = _round_up(s, 128)
    bh = b * h
    bh_pad = _round_up(bh, g)
    def prep(x):
        x = x.reshape(bh, s, d)
        return jnp.pad(x, [(0, bh_pad - bh), (0, s_pad - s), (0, 0)])
    return prep(q), prep(k), prep(v), (bh, bh_pad, s_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _grouped_attention(q, k, v, scale):
    out, _ = _grouped_attention_fwd(q, k, v, scale)
    return out


def _grouped_attention_fwd(q, k, v, scale):
    b, h, s, d = q.shape
    g = _grouped_group(_round_up(s, 128))
    qp, kp, vp, (bh, bh_pad, s_pad) = _grouped_pad(q, k, v, g)
    spec = pl.BlockSpec((g, s_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_grouped_fwd_kernel, scale=scale, seq_len=s),
        interpret=_INTERPRET,
        grid=(bh_pad // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh_pad, s_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh_pad * s_pad * s_pad * d,
            bytes_accessed=4 * bh_pad * s_pad * d * q.dtype.itemsize,
            transcendentals=bh_pad * s_pad * s_pad,
        ),
    )(qp, kp, vp)
    out = out[:bh, :s].reshape(b, h, s, d)
    return out, (q, k, v)


def _grouped_attention_bwd(scale, res, gout):
    q, k, v = res
    b, h, s, d = q.shape
    g = _grouped_group_bwd(_round_up(s, 128))
    qp, kp, vp, (bh, bh_pad, s_pad) = _grouped_pad(q, k, v, g)
    gp = _grouped_pad(gout, gout, gout, g)[0]
    spec = pl.BlockSpec((g, s_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_grouped_bwd_kernel, scale=scale, seq_len=s),
        interpret=_INTERPRET,
        grid=(bh_pad // g,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((bh_pad, s_pad, d), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=11 * bh_pad * s_pad * s_pad * d,
            bytes_accessed=7 * bh_pad * s_pad * d * q.dtype.itemsize,
            transcendentals=bh_pad * s_pad * s_pad,
        ),
    )(qp, kp, vp, gp)

    def unpad(x):
        return x[:bh, :s].reshape(b, h, s, d)

    return unpad(dq), unpad(dk), unpad(dv)


_grouped_attention.defvjp(_grouped_attention_fwd, _grouped_attention_bwd)


# ---------------------------------------------------------------------------
# Fused-qkv attention: consumes the qkv projection's NATURAL [B, S, 3·H·D]
# layout and emits [B, S, H·D] ready for the output projection. The head
# split/merge transposes happen on VMEM values inside the kernel (VREG
# shuffles) instead of HBM round-trips — at teacher scale those transposes
# cost more than the attention math itself (~1.5ms/layer of pure copies).
# Forward = pallas kernel; backward = VJP of the unfused XLA reference
# (correctness by construction; the teacher is forward-only).
# ---------------------------------------------------------------------------

FUSED_QKV_MAX_SEQ = 384       # training cap (pallas bwd VMEM bound)
FUSED_QKV_FWD_MAX_SEQ = 512   # forward-only cap (Mosaic keeps all
                              # unrolled per-head tiles live; longer
                              # sequences use the blocked flash kernels)


def _qkv_attention_reference(qkv, heads: int, scale: float,
                             use_pallas: bool = False):
    b, s, thd = qkv.shape
    d = thd // (3 * heads)
    x = qkv.reshape(b, s, 3, heads, d)
    q, k, v = (jnp.transpose(x[:, :, i], (0, 2, 1, 3)) for i in range(3))
    if use_pallas:
        out = multi_head_attention(q, k, v, scale=scale, use_pallas=True)
    else:
        out = attention_xla(q, k, v, scale=scale)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, s, heads * d)


# VPU-lean softmax: keep the per-row max subtraction (dropping it NaNs
# whole rows whose logits all underflow exp, and silently flattens rows
# with several logits past any fixed clamp — a training-time attention
# entropy collapse would corrupt gradients without an error), but write
# exp's output directly as bf16 and move the row-sum denominator onto the
# otherwise-idle MXU as p @ ones. The SAME bf16 p feeds both the numerator
# (p @ v) and the denominator, so their rounding cancels to first order.


def _row_sums(p, out_dtype=jnp.float32):
    """Row sums of [GB, S, Sk] via an MXU dot with ones → [GB, S, 1].

    The ones operand carries the batch dim — Mosaic lowers batched dots
    directly but rejects the batch-collapsing reshape an unbatched RHS
    would need."""
    ones = jnp.ones((p.shape[0], p.shape[2], 128), p.dtype)
    l = jax.lax.dot_general(
        p, ones, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=out_dtype,
    )
    return l[:, :, :1]


# Fold threshold: at/below the fused-qkv forward cap (512 tokens) the
# per-head ones-concat costs as much as the saved MXU passes — measured
# flat-to-worse at 197/314 (see _pv_and_rowsum); above it the fold is the
# clear winner (1568: -24%).
_PV_FOLD_MIN_SEQ = FUSED_QKV_FWD_MAX_SEQ


def _pv_and_rowsum(p, v):
    """One MXU dot for BOTH the PV product and the softmax row sums.

    The MXU emits output lanes in 128-wide passes, so with head dim
    D = 64 a separate row-sum dot (``p @ ones``, 128 lanes) costs as many
    MXU passes as the PV dot itself. Padding v's lanes up to the next 128
    multiple WITH ONES makes a single dot emit PV in lanes [:D] and the
    row sum in every padded lane — the PV+rowsum stage halves. Measured
    v5e (us/layer fwd, best-of-5 x100): packed 1568 goes 1267 → 950-980
    (-24%); at short sequences the [Sk, 128] ones-concat copy per head
    cancels the saved passes (teacher 197: 1424 → 1461-1465, student 314:
    504 → 493-515), so callers below the fold threshold keep the two-dot
    form bit-for-bit.

    p [GB, Sq, Sk] bf16, v [GB, Sk, D] → (pv fp32 [GB, Sq, D] UNNORMALIZED,
    l fp32 [GB, Sq, 1]). Tile-padded p columns/v rows are masked by Mosaic
    in the dot as usual; the ones pad lanes are real lanes of a real
    operand and sum exactly the columns the PV dot contracts. When D is
    already a lane multiple the fold buys nothing (the ones would add a
    whole extra pass) — fall back to the two-dot form."""
    gb, sk, d = v.shape
    pad = -d % 128
    if pad == 0 or sk <= _PV_FOLD_MIN_SEQ:
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return pv, _row_sums(p)
    va = jnp.concatenate([v, jnp.ones((gb, sk, pad), v.dtype)], axis=-1)
    ov = jax.lax.dot_general(
        p, va, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return ov[:, :, :d], ov[:, :, d:d + 1]


def _fused_qkv_kernel(q_ref, k_ref, v_ref, o_ref, *, heads, scale):
    # q/k/v_ref [GB, S, H·D] — three lane-blocked views of the SAME qkv
    # array, so only the needed lanes are DMA'd. S is the LOGICAL sequence
    # length (197/314): blocks equal the array dim and Mosaic masks the
    # physically padded sublanes/lanes itself — no explicit jnp.pad HBM
    # round-trip outside, no in-kernel -inf column masking. Per-head
    # rank-preserving lane slices + leading-batch-dim MXU matmuls; several
    # batch rows per program amortize the program-launch overhead.
    # All dots take bf16 operands (fp32 MXU runs at quarter rate;
    # bf16×bf16→fp32-accum is exact for the dot itself, though fp32
    # intermediates rounded to bf16 beforehand — the exp output here — do
    # lose mantissa); the softmax scale folds into the max/exp maps in fp32.
    xq, xk, xv = q_ref[...], k_ref[...], v_ref[...]
    d = xq.shape[2] // heads
    bdims = (((2,), (2,)), ((0,), (0,)))  # contract D, batch over dim 0
    for h in range(heads):
        q = xq[:, :, h * d : (h + 1) * d]
        k = xk[:, :, h * d : (h + 1) * d]
        v = xv[:, :, h * d : (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, bdims, preferred_element_type=jnp.float32
        )  # [GB, S, S] fp32 RAW (scale folds into the exp2)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * (scale * INV_LN2)).astype(v.dtype)
        pv, l = _pv_and_rowsum(p, v)  # one dot: PV + MXU row sums
        o = pv * (1.0 / l)  # [GB, S, D]
        o_ref[:, :, h * d : (h + 1) * d] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv, heads, scale):
    """qkv [B, S, 3·H·D] (natural Dense layout) → output [B, S, H·D]."""
    return _fused_qkv_fwd(qkv, heads, scale)[0]


def _fused_qkv_fwd(qkv, heads, scale):
    b, s, thd = qkv.shape
    d = thd // (3 * heads)
    hd = heads * d
    if hd % 128 == 0 and _on_tpu() and (s > FUSED_QKV_FWD_MAX_SEQ
                                        and _packed_flash_ok(s)):
        # long sequences with an exact-divisor q block: packed blocked
        # flash — no layout transposes in either direction
        out, lse = _packed_flash_fwd(qkv, heads, scale)
        return out, (qkv, out, lse)
    if s > FUSED_QKV_FWD_MAX_SEQ or hd % 128 != 0 or not _on_tpu():
        # graceful degradation for direct callers: blocked flash kernels.
        # hd must be a multiple of 128 — the per-head lane-sliced BlockSpecs
        # block the last dim in units of H·D lanes (Mosaic constraint).
        return _qkv_attention_reference(qkv, heads, scale,
                                        use_pallas=_on_tpu()), (qkv, None,
                                                                None)
    # batch rows per program: amortize launch overhead; scanned on v5e
    # (tools/kernel_probe.py): teacher 197 wants gb=4 (1554us vs 1855 at
    # gb=1), student 314-320 is flat between gb=2 and 4 (558 vs 554us) but
    # gb=4 overflows the 16MB scoped VMEM once the double-buffered qkv
    # views are counted — the 1MB score-tile heuristic lands on 4 and 2.
    # (a 1.5MB budget — student gb=3 — overflows scoped VMEM in-step; the
    # 1MB budget's gb=2/4 split is the measured optimum). The budget was
    # calibrated at ViT-B width (thd=2304); the double-buffered [GB, S, 3HD]
    # views grow linearly with the model width, so scale it down for wider
    # models (ViT-L thd=3072 overflowed scoped VMEM at the B-width gb).
    s_sub, s_lane = _round_up(s, 8), _round_up(s, 128)
    budget = (1024 * 1024 * 2304) // thd
    gb = int(os.environ.get("UNITE_FUSED_GB", "0")) or max(
        1, min(4, budget // (s_sub * s_lane * 4)))
    b_pad = _round_up(b, gb)
    qkvp = (jnp.pad(qkv, [(0, b_pad - b), (0, 0), (0, 0)])
            if b_pad != b else qkv)

    # three lane-blocked views of the same array (block units of H·D lanes;
    # the sequence dim equals the array dim — legal block per Mosaic rules)
    q_spec = pl.BlockSpec((gb, s, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((gb, s, hd), lambda i: (i, 0, 1),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((gb, s, hd), lambda i: (i, 0, 2),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_qkv_kernel, heads=heads, scale=scale),
        interpret=_INTERPRET,
        grid=(b_pad // gb,),
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=pl.BlockSpec((gb, s, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * heads * s_lane * s_sub * d,
            bytes_accessed=b_pad * s * (thd + hd) * qkv.dtype.itemsize,
            transcendentals=b_pad * heads * s_sub * s_lane,
        ),
    )(qkvp, qkvp, qkvp)
    return out[:b] if b_pad != b else out, (qkv, None, None)


def _fused_qkv_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, heads, scale):
    """Fused backward in the same lane-slice layout: recomputes the softmax
    per head and writes dq/dk/dv into the dqkv lane slices — the student's
    attention backward without any HBM transposes. S is the logical length
    (Mosaic masks the tile padding); GB batch rows per program (leading
    batch dims) amortize the program-launch overhead."""
    x = qkv_ref[...]       # [GB, S, 3·H·D]
    do_all = do_ref[...]   # [GB, S, H·D]
    d = x.shape[2] // (3 * heads)
    hd = heads * d
    for h in range(heads):
        q = x[:, :, h * d : (h + 1) * d]
        k = x[:, :, hd + h * d : hd + (h + 1) * d]
        v = x[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d]
        do = do_all[:, :, h * d : (h + 1) * d]

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [GB, S(q), S(k)] fp32 RAW (bf16 operands; scale in the exp2)
        # same VPU-lean recompute as fwd: max-sub + exp2 to bf16, MXU sums
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * (scale * INV_LN2)).astype(x.dtype)
        inv_l = 1.0 / _row_sums(p)  # [GB, S(q), 1] fp32

        # dv = (p/l)^T @ do  ==  p^T @ (do·inv_l)
        do_l = (do.astype(jnp.float32) * inv_l).astype(x.dtype)  # small map
        dv = jax.lax.dot_general(
            p, do_l, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [GB, S(k), D]
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [GB, S(q), S(k)] fp32
        # delta = rowsum(p_norm·dp) = inv_l · rowsum(p·dp); the product is
        # one map pass, its row sum rides the MXU
        t = p.astype(jnp.float32) * dp  # [GB, S, S] map pass
        delta2 = _row_sums(t) * (inv_l * inv_l)  # = delta · inv_l, [GB,S,1]
        # ds2 = full ds/scale in one map: ds = p_norm·(dp − delta) =
        # t·inv_l − p·(delta·inv_l); the scale applies on the [GB,S,D] side
        ds2 = (t * inv_l - p.astype(jnp.float32) * delta2).astype(x.dtype)
        dq = jax.lax.dot_general(
            ds2, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            ds2, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dqkv_ref[:, :, h * d : (h + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, hd + h * d : hd + (h + 1) * d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d] = \
            dv.astype(dqkv_ref.dtype)


def _fused_qkv_bwd(heads, scale, res, g):
    qkv, out, lse = res
    b, s, thd = qkv.shape
    if lse is not None:
        # packed blocked flash backward (the fwd saved its row stats)
        return (_packed_flash_bwd(qkv, out, lse, g, heads, scale),)
    # mid-length bwd (the full-sequence pallas bwd is VMEM-bound),
    # non-128-multiple head widths, or non-TPU platforms: unfused VJP
    if s > FUSED_QKV_MAX_SEQ or (thd // 3) % 128 != 0 or not _on_tpu():
        _, vjp = jax.vjp(lambda t: _qkv_attention_reference(t, heads, scale),
                         qkv)
        return vjp(g)
    # gb=2 measured fastest end-to-end at the 320-token student shape
    # (248.6 vs 246.0 clips/s) and still fits VMEM with the bwd's ~3 live
    # [GB, S', S'] fp32 tiles + double-buffered [GB, S, 3HD] views;
    # gb=3 overflows the 16MB scoped budget — cap at 2. As in the forward,
    # the 1MB score budget holds at ViT-B width (thd=2304) and scales down
    # for wider models (ViT-L's [2, 320, 3072] views overflowed by 5.2MB).
    s_sub, s_lane = _round_up(s, 8), _round_up(s, 128)
    budget = (1024 * 1024 * 2304) // thd
    gb = int(os.environ.get("UNITE_FUSED_BWD_GB", "0")) or max(
        1, min(2, budget // (s_sub * s_lane * 4)))
    if not os.environ.get("UNITE_FUSED_BWD_GB") and b > 64 and gb > 1:
        # empirical: gb=2 fits scoped VMEM at b<=64 but overflows at b=80
        # (21.4M vs the 16M cap — Mosaic's buffering depth grows with the
        # grid count); gb=1 compiles and costs ~1% end-to-end there
        gb = 1
    b_pad = _round_up(b, gb)
    qkvp = qkv
    gp = g
    if b_pad != b:
        bpad = [(0, b_pad - b), (0, 0), (0, 0)]
        qkvp = jnp.pad(qkvp, bpad)
        gp = jnp.pad(gp, bpad)
    dqkv = pl.pallas_call(
        functools.partial(_fused_qkv_bwd_kernel, heads=heads, scale=scale),
        interpret=_INTERPRET,
        grid=(b_pad // gb,),
        in_specs=[
            pl.BlockSpec((gb, s, thd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, thd // 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, s, thd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s, thd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=11 * b_pad * (thd // 3) * s_sub * s_lane,
            bytes_accessed=2 * b_pad * s * thd * qkv.dtype.itemsize,
            transcendentals=b_pad * (thd // (3 * 64)) * s_sub * s_lane,
        ),
    )(qkvp, gp)
    return (dqkv[:b] if b_pad != b else dqkv,)


fused_qkv_attention.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


# ---------------------------------------------------------------------------
# Packed long-sequence kernels: the blocked flash kernels re-expressed in
# the qkv-packed [B, S, 3·H·D] layout (lane-blocked views of one array,
# per-head rank-preserving lane slices). Beyond FUSED_QKV_FWD_MAX_SEQ the
# transpose-based path spends ~9ms/step (stage-2 profile) on pure layout
# copies ([B,S,H,D] ↔ [B,H,S,D] for q/k/v/out, forward AND backward);
# these kernels read the qkv Dense output and write the dqkv cotangent
# directly, so no transpose ever materializes. Requires an exact-divisor
# query block (s_pad == s, e.g. 1568/224, 784/112): padded KEY rows would
# receive softmax mass in this layout (k/v views come from the same padded
# array), so non-divisor lengths stay on the transpose path.
# ---------------------------------------------------------------------------


# The packed kernels hold the full-length k/v (or q/do) views double-
# buffered plus the per-head score tiles; that legitimately exceeds the
# conservative 16MB default scoped-vmem cap while fitting v5e's physical
# VMEM comfortably.
_PACKED_VMEM_LIMIT = 100 * 1024 * 1024


def _packed_flash_ok(seq: int) -> bool:
    return _flash_qblock(seq, DEFAULT_BLOCK_Q)[0] == seq


def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, heads, scale):
    # q_ref [GB, BQ, HD]; k/v_ref [GB, S, HD] (lane-blocked views of the
    # same qkv array); o [GB, BQ, HD]; lse [GB, heads, BQ, 8] sublane-major
    # per-head row stats. Same softmax structure as _fwd_kernel.
    xq = q_ref[...]
    xk = k_ref[...]
    xv = v_ref[...]
    d = xq.shape[2] // heads
    c = scale * INV_LN2
    bdims = (((2,), (2,)), ((0,), (0,)))
    for h in range(heads):
        q = xq[:, :, h * d:(h + 1) * d]
        k = xk[:, :, h * d:(h + 1) * d]
        v = xv[:, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            q, k, bdims, preferred_element_type=jnp.float32)  # [GB, BQ, S]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * c).astype(v.dtype)
        pv, l = _pv_and_rowsum(p, v)  # one dot: PV + MXU row sums
        lse_ref[:, h] = jnp.broadcast_to(m * c + jnp.log2(l),
                                         lse_ref.shape[:1] + lse_ref.shape[2:])
        o_ref[:, :, h * d:(h + 1) * d] = (pv * (1.0 / l)).astype(o_ref.dtype)


def _packed_flash_fwd(qkv, heads, scale, block_q=DEFAULT_BLOCK_Q):
    b, s, thd = qkv.shape
    hd = thd // 3
    _, bq = _flash_qblock(s, block_q)
    # gb=2 fwd measured 2.10 vs 2.32 ms/layer at 1568 (gb=2 HURTS the bwd
    # kernels — they stay at 1); softmax variants are a dead end here: the
    # kernels sit near the K=64 MXU bound (bf16-arg exp2 and even dropping
    # max-sub entirely measured <1% — the VPU is not the bottleneck).
    gb = int(os.environ.get("UNITE_PFLASH_GB", "0")) or 2
    b_pad = _round_up(b, gb)
    x = jnp.pad(qkv, [(0, b_pad - b), (0, 0), (0, 0)]) if b_pad != b else qkv
    out, lse = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, heads=heads, scale=scale),
        interpret=_INTERPRET,
        grid=(b_pad // gb, s // bq),
        in_specs=[
            pl.BlockSpec((gb, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, hd), lambda i, j: (i, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, hd), lambda i, j: (i, 0, 2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, heads, bq, 8), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, s, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b_pad, heads, s, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * heads * s * s * (hd // heads),
            bytes_accessed=b_pad * s * (thd + hd) * qkv.dtype.itemsize,
            transcendentals=b_pad * heads * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PACKED_VMEM_LIMIT),
    )(x, x, x)
    if b_pad != b:
        out, lse = out[:b], lse[:b]
    return out, lse


def _packed_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref, *,
                      heads, scale):
    # Same structure as _bwd_dq_kernel per head: normalized probs straight
    # from the saved base-2 lse, delta recomputed from the o/do blocks.
    xq = q_ref[...]      # [GB, BQ, HD]
    xk = k_ref[...]      # [GB, S, HD]
    xv = v_ref[...]
    xdo = do_ref[...]    # [GB, BQ, HD]
    xo = o_ref[...]
    d = xq.shape[2] // heads
    c = scale * INV_LN2
    bdims = (((2,), (2,)), ((0,), (0,)))
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q, k, v = xq[:, :, sl], xk[:, :, sl], xv[:, :, sl]
        do = xdo[:, :, sl]
        o = xo[:, :, sl].astype(jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
        lse = lse_ref[:, h][:, :, 0:1]  # [GB, BQ, 1]
        s = jax.lax.dot_general(q, k, bdims,
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(s * c - lse)  # normalized, fp32
        dp = jax.lax.dot_general(do, v, bdims,
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)


def _packed_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dk_ref, dv_ref, *, heads, scale):
    # Same structure as _bwd_dkv_kernel per head; lse/delta arrive
    # lane-major [GB, heads, 1, S]. (An in-kernel delta via a ones-dot was
    # tried and made this kernel 0.18ms/layer SLOWER than the one XLA
    # multiply-reduce pass it replaced — don't re-try.)
    xq = q_ref[...]      # [GB, S, HD]
    xk = k_ref[...]      # [GB, BK, HD]
    xv = v_ref[...]
    xdo = do_ref[...]    # [GB, S, HD]
    d = xk.shape[2] // heads
    c = scale * INV_LN2
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q, k, v = xq[:, :, sl], xk[:, :, sl], xv[:, :, sl]
        do = xdo[:, :, sl]
        lse = lse_ref[:, h]      # [GB, 1, S]
        delta = delta_ref[:, h]  # [GB, 1, S]
        st = jax.lax.dot_general(
            k, q, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [GB, BK, S]
        pt = jnp.exp2(st * c - lse).astype(q.dtype)
        dv = jax.lax.dot_general(
            pt, do, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(
            v, do, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dst = (pt.astype(jnp.float32) * (dpt - delta) * scale).astype(q.dtype)
        dk = jax.lax.dot_general(
            dst, q, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _packed_flash_bwd(qkv, out, lse, g, heads, scale,
                      block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K):
    b, s, thd = qkv.shape
    hd = thd // 3
    d = hd // heads
    _, bq = _flash_qblock(s, block_q)
    bk = _divisor_block(s, _flash_kblock_target(block_k)) or s
    # separate knob from the forward's UNITE_PFLASH_GB: the optima CONFLICT
    # (fwd wins at gb=2, both bwd kernels regress above 1)
    gb = int(os.environ.get("UNITE_PFLASH_BWD_GB", "0")) or 1
    b_pad = _round_up(b, gb)
    # per-head row stats, lane-major for the dkv kernel: delta [B, heads, S]
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, s, heads, d).sum(-1)
    delta_lane = jnp.transpose(delta, (0, 2, 1))[:, :, None, :]
    lse_lane = jnp.swapaxes(lse[..., 0:1], 2, 3)  # [B, heads, 1, S]
    if b_pad != b:
        pad3 = [(0, b_pad - b), (0, 0), (0, 0)]
        qkv, out, g = (jnp.pad(t, pad3) for t in (qkv, out, g))
        pad4 = [(0, b_pad - b), (0, 0), (0, 0), (0, 0)]
        lse, delta_lane, lse_lane = (
            jnp.pad(t, pad4) for t in (lse, delta_lane, lse_lane))

    dq = pl.pallas_call(
        functools.partial(_packed_dq_kernel, heads=heads, scale=scale),
        interpret=_INTERPRET,
        grid=(b_pad // gb, s // bq),
        in_specs=[
            pl.BlockSpec((gb, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, hd), lambda i, j: (i, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, hd), lambda i, j: (i, 0, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bq, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, heads, bq, 8), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, bq, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * b_pad * heads * s * s * d,
            bytes_accessed=2 * b_pad * s * thd * qkv.dtype.itemsize,
            transcendentals=b_pad * heads * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PACKED_VMEM_LIMIT),
    )(qkv, qkv, qkv, g, out, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_packed_dkv_kernel, heads=heads, scale=scale),
        interpret=_INTERPRET,
        grid=(b_pad // gb, s // bk),
        in_specs=[
            pl.BlockSpec((gb, s, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bk, hd), lambda i, j: (i, j, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bk, hd), lambda i, j: (i, j, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, heads, 1, s), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, heads, 1, s), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, bk, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, bk, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, s, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b_pad, s, hd), qkv.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * b_pad * heads * s * s * d,
            bytes_accessed=2 * b_pad * s * thd * qkv.dtype.itemsize,
            transcendentals=b_pad * heads * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PACKED_VMEM_LIMIT),
    )(qkv, qkv, qkv, g, lse_lane, delta_lane)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv[:b] if b_pad != b else dqkv


def use_fused_qkv(seq: int, use_pallas=None, fwd_only: bool = False,
                  dim: Optional[int] = None) -> bool:
    if use_pallas is None:
        use_pallas = _on_tpu()
    cap = FUSED_QKV_FWD_MAX_SEQ if fwd_only else FUSED_QKV_MAX_SEQ
    dim_ok = dim is None or dim % 128 == 0  # lane-sliced BlockSpec constraint
    seq_ok = seq <= cap or (seq > FUSED_QKV_FWD_MAX_SEQ
                            and _packed_flash_ok(seq))
    return bool(use_pallas) and seq_ok and dim_ok


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, scale, block_q, block_k):
    out, _, (s_padq, _) = _flash_fwd(q, k, v, scale, block_q)
    b, h, s, d = q.shape
    o = out.reshape(b, h, s_padq, d)
    return o[:, :, :s, :] if s_padq != s else o


def _flash_attention_fwd(q, k, v, scale, block_q, block_k):
    b, h, s, d = q.shape
    out, lse, (s_padq, _) = _flash_fwd(q, k, v, scale, block_q)
    # residuals stay UNPADDED [BH, S, D] (no pad copies saved to HBM);
    # out/lse keep the fwd's query-side padding (none in the exact-divisor
    # case) for the dq grid
    res = (q.reshape(b * h, s, d), k.reshape(b * h, s, d),
           v.reshape(b * h, s, d), out, lse, s)
    o = out.reshape(b, h, s_padq, d)
    return (o[:, :, :s, :] if s_padq != s else o), (res, (b, h, s, d))


def _flash_attention_bwd(scale, block_q, block_k, carry, g):
    res, (b, h, s, d) = carry
    s_padq = res[3].shape[1]
    gp = (jnp.pad(g, [(0, 0), (0, 0), (0, s_padq - s), (0, 0)])
          if s_padq != s else g)
    gp = gp.reshape(b * h, s_padq, d)
    dq, dk, dv = _flash_bwd(res, gp, scale, block_q, block_k)
    dq = dq.reshape(b, h, s_padq, d)[:, :, :s, :]
    dk = dk.reshape(b, h, s, d)
    dv = dv.reshape(b, h, s, d)
    return dq, dk, dv


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# Dispatch measured on v5e (bf16, head_dim 64): the grouped full-sequence
# kernels cover short lengths (≤ GROUPED_MAX_SEQ — teacher 197, masked
# student ~314), the blocked flash kernels take over beyond that (1568:
# 1.5-1.7x over XLA fwd+bwd). Pass use_pallas explicitly to override.


def multi_head_attention(
    q, k, v, *, scale=None, return_probs=False, dropout_rate=0.0,
    dropout_rng=None, deterministic=True, use_pallas=None,
    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
):
    """Dispatch: Pallas flash attention on TPU, XLA elsewhere.

    q, k, v: [B, H, S, D] (self-attention, no causal mask — ViT).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    needs_xla = (
        return_probs
        or (dropout_rate > 0.0 and not deterministic)
    )
    if use_pallas is None:
        use_pallas = _on_tpu()
    if needs_xla or not use_pallas:
        return attention_xla(
            q, k, v, scale=scale, return_probs=return_probs,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
    if q.shape[2] <= GROUPED_MAX_SEQ:
        return _grouped_attention(q, k, v, scale)
    return _flash_attention(q, k, v, scale, block_q, block_k)
