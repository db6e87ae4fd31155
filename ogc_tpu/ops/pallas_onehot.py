"""One-hot-matmul row gather/scatter: neighborhood grouping on the MXU.

The repo's measured row wall (BENCHLOG r4): XLA gathers cost ~7.1 ns/row
FLAT in row width and consumer fusion, scatter-adds ~11-18 ns/row — both
LATENCY-bound engines, while the MXU idles at 1-2% during the train step.
VERDICT r4 #1 asked for the untried structural move: trade the binding
resource (random-row issue rate) for the idle one (systolic matmul).

For a source cloud small enough to sit in VMEM (N <= ~2-4k — every SAPIEN
surface, all FPS-downsampled interior levels of the kitti models), the
gather

    out[b, e, :] = src[b, idx[b, e], :]

is exactly

    out_T[b] = src_T[b] @ onehot(idx[b])        # (C, N) @ (N, E)

with onehot built on the fly in VMEM by an iota compare (never touching
HBM) and the product running on the MXU.  Per-edge cost scales as
N / (compare throughput) instead of the fixed per-row gather latency, so
small clouds win large factors (measured on-chip: tools/bench_group_onehot
.py).  The backward is the SAME structure transposed (a deterministic
scatter-add on the MXU):

    grad_T[b] = cot_T[b] @ onehot(idx[b]).T     # (C, E) @ (E, N)

Exactness: each one-hot column has exactly one 1.0; with
Precision.HIGHEST the product 1.0 * x and a sum over zeros reproduce x
BITWISE (the f32 operand is split exactly into bf16 limbs and each pass
contributes one exact term), so the forward is bit-equal to the XLA
gather for f32 and bf16 sources (pinned by tests/test_onehot_group.py).
The backward accumulates f32 in a fixed sequential tile order —
deterministic, like every other scatter in this framework (reference:
atomicAdd, pointnet2/src/group_points_gpu.cu:8-45).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Edge-tile lanes.  VMEM cost per tile ~ N * _ET * 4 bytes for the one-hot
# plus the (C, N) source; _et_for() shrinks the tile for tall sources.
_ET = 512


def _et_for(n_pad: int) -> int:
    et = (6 * 2 ** 20) // (4 * n_pad)
    return int(max(128, min(1024, (et // 128) * 128)))


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather_kernel(src_ref, idx_ref, out_ref):
    """out (C, ET) = src (C, N) @ onehot(idx) (N, ET)."""
    n = src_ref.shape[1]
    et = idx_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, et), 0)
    oh = (iota == idx_ref[0:1, :]).astype(src_ref.dtype)
    out_ref[:, :] = jax.lax.dot_general(
        src_ref[:, :], oh, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=out_ref.dtype,
    )


def _scatter_kernel(cot_ref, idx_ref, out_ref):
    """out (C, N) += cot (C, ET) @ onehot(idx).T (ET, N), accumulated
    across the edge-tile grid dimension (sequential revisits)."""
    t = pl.program_id(1)

    n = out_ref.shape[1]
    et = idx_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (et, n), 1)
    oh = (iota == idx_ref[0, :][:, None]).astype(cot_ref.dtype)
    acc = jax.lax.dot_general(
        cot_ref[:, :], oh, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=out_ref.dtype,
    )

    @pl.when(t == 0)
    def _init():
        out_ref[:, :] = acc

    @pl.when(t != 0)
    def _acc():
        out_ref[:, :] = out_ref[:, :] + acc


# pl is imported lazily (pallas pulls in Mosaic); module-level name for the
# kernel bodies above.
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl
    return pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_rows_t(src_t: Array, idx: Array, et: int) -> Array:
    """(B, C, N) x (B, E) -> (B, C, E); E and N pre-padded."""
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    B, C, N = src_t.shape
    E = idx.shape[1]
    nt = E // et
    return pl.pallas_call(
        _gather_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((None, C, N), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((None, 1, et), lambda b, t: (b, 0, t)),
        ],
        out_specs=pl.BlockSpec((None, C, et), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((B, C, E), src_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2 ** 20),
        interpret=_interpret(),
    )(src_t, idx[:, None, :])


@functools.partial(jax.jit, static_argnums=(2, 3))
def _scatter_rows_t(cot_t: Array, idx: Array, n: int, et: int) -> Array:
    """(B, C, E) x (B, E) -> (B, C, n) scatter-add; E, n pre-padded."""
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    B, C, E = cot_t.shape
    nt = E // et
    return pl.pallas_call(
        _scatter_kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((None, C, et), lambda b, t: (b, 0, t)),
            pl.BlockSpec((None, 1, et), lambda b, t: (b, 0, t)),
        ],
        out_specs=pl.BlockSpec((None, C, n), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, n), cot_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2 ** 20),
        interpret=_interpret(),
    )(cot_t, idx[:, None, :])


def gather_rows_onehot(src: Array, flat_idx: Array) -> Array:
    """Row gather via one-hot matmul: (B, N, C) x (B, E) -> (B, E, C).

    Bit-equal to jnp.take_along_axis for f32/bf16 sources (one-hot columns
    select exactly; HIGHEST-precision limb splits are exact).  Indices must
    be in [0, N) (clamp semantics are the caller's job, as for _flat_take).
    """
    B, N, C = src.shape
    E = flat_idx.shape[1]
    n_pad = _pad_to(N, 128)
    et = _et_for(n_pad)
    e_pad = _pad_to(E, et)
    src_t = jnp.swapaxes(src, 1, 2)
    if n_pad != N:
        src_t = jnp.pad(src_t, ((0, 0), (0, 0), (0, n_pad - N)))
    idx = flat_idx.astype(jnp.int32)
    if e_pad != E:
        idx = jnp.pad(idx, ((0, 0), (0, e_pad - E)))
    out_t = _gather_rows_t(src_t, idx, et)
    return jnp.swapaxes(out_t[:, :, :E], 1, 2)


def scatter_add_rows_onehot(flat_idx: Array, cot: Array, n: int) -> Array:
    """Deterministic row scatter-add via one-hot matmul (the gather's
    transpose): (B, E) x (B, E, C) -> (B, n, C)."""
    B, E, C = cot.shape
    n_pad = _pad_to(n, 128)
    et = _et_for(n_pad)
    e_pad = _pad_to(E, et)
    cot_t = jnp.swapaxes(cot, 1, 2)
    idx = flat_idx.astype(jnp.int32)
    if e_pad != E:
        # Pad edges scatter ZERO into row 0 — exact.
        cot_t = jnp.pad(cot_t, ((0, 0), (0, 0), (0, e_pad - E)))
        idx = jnp.pad(idx, ((0, 0), (0, e_pad - E)))
    out_t = _scatter_rows_t(cot_t, idx, n_pad, et)
    return jnp.swapaxes(out_t[:, :, :n], 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def group_onehot(points: Array, idx: Array, n_src: int) -> Array:
    """ops.group via one-hot matmuls: (B, N, C) x (B, M, S) -> (B, M, S, C)
    with both the gather AND its backward scatter-add on the MXU.

    n_src must equal points.shape[1] (static; part of the VJP closure).
    Dispatch gate: onehot_path_applicable().
    """
    B, M, S = idx.shape
    out = gather_rows_onehot(points, idx.reshape(B, M * S))
    return out.reshape(B, M, S, points.shape[-1])


def _group_onehot_fwd(points, idx, n_src):
    return group_onehot(points, idx, n_src), (
        idx, jnp.zeros((0,), points.dtype))


def _group_onehot_bwd(n_src, res, g):
    idx, proto = res
    B, M, S = idx.shape
    C = g.shape[-1]
    d = scatter_add_rows_onehot(
        idx.reshape(B, M * S).astype(jnp.int32),
        g.reshape(B, M * S, C).astype(jnp.float32), n_src,
    ).astype(proto.dtype)
    return d, np.zeros(idx.shape, dtype=jax.dtypes.float0)


group_onehot.defvjp(_group_onehot_fwd, _group_onehot_bwd)


# ---------------------------------------------------------------------------
# Block-sparse one-hot grouping: large sources, Morton-coherent tables
# ---------------------------------------------------------------------------
#
# At N ~ 8192 the full-width one-hot pays N compares per edge — breakeven
# with the gather wall.  But on a Morton-SORTED cloud the smooth-loss
# tables touch few DISTINCT cb-sized index blocks per query tile
# (tools/probe_edge_locality.py: mean 11-19, p95 <= 26, max 27 at
# cb=128/qt=256 over uniform and street geometries — where any FIXED
# band would need W=2048+ to cover the ball table's z-order excursions).
# So: per query tile, list the candidate blocks actually present (exact,
# computed from the table itself), loop them in the kernel with a
# dynamic trip count, and one-hot-matmul against each 128-wide block.
# Capacity overflow (count > _BS_CAP) falls back to the plain gather
# path via lax.cond — results are ALWAYS exact, locality only buys
# speed.

_BS_CB = 128      # candidate block width (lanes)
_BS_QT = 256      # query rows per tile
_BS_CAP = 32      # candidate-list capacity (probe max 27)
_BS_ECH = 512     # edge chunk (matmul n)


def _bs_gather_kernel(c_dim, cap, order_ref, count_ref, idx_ref, src_ref,
                      out_ref):
    """out (C, qtS) = sum over candidate blocks of src_blk @ onehot."""
    cb = _BS_CB
    qts = idx_ref.shape[1]
    cnt = count_ref[0, 0]

    def chunk_body(c, _):
        idx_row = idx_ref[:, pl.ds(c * _BS_ECH, _BS_ECH)]  # (1, ECH)

        def block_body(j, acc):
            base = order_ref[0, j] * cb
            src_blk = src_ref[:, pl.ds(base, cb)]  # (C, cb)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (cb, _BS_ECH), 0)
            oh = (iota == (idx_row - base)).astype(src_ref.dtype)
            return acc + jax.lax.dot_general(
                src_blk, oh, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        acc0 = jnp.zeros((c_dim, _BS_ECH), jnp.float32)
        acc = jax.lax.fori_loop(0, cnt, block_body, acc0)
        out_ref[:, pl.ds(c * _BS_ECH, _BS_ECH)] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, qts // _BS_ECH, chunk_body, 0)


def _bs_scatter_kernel(c_dim, cap, order_ref, count_ref, idx_ref, cot_ref,
                       out_ref):
    """grad (C, N) += cot_chunk @ onehot.T per candidate block,
    accumulated across query tiles (sequential grid revisits)."""
    cb = _BS_CB
    qts = idx_ref.shape[1]
    cnt = count_ref[0, 0]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    def chunk_body(c, _):
        idx_row = idx_ref[:, pl.ds(c * _BS_ECH, _BS_ECH)]  # (1, ECH)
        cot_c = cot_ref[:, pl.ds(c * _BS_ECH, _BS_ECH)]    # (C, ECH)

        def block_body(j, _):
            base = order_ref[0, j] * cb
            # Same (cb, ECH) one-hot orientation as the gather kernel (no
            # (ECH, 1) relayout); contract both operands on their ECH dim.
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (cb, _BS_ECH), 0)
            oh = (iota == (idx_row - base)).astype(cot_ref.dtype)
            upd = jax.lax.dot_general(
                cot_c, oh, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (C, cb)
            out_ref[:, pl.ds(base, cb)] = (
                out_ref[:, pl.ds(base, cb)] + upd.astype(out_ref.dtype))
            return 0

        jax.lax.fori_loop(0, cnt, block_body, 0)
        return 0

    jax.lax.fori_loop(0, qts // _BS_ECH, chunk_body, 0)


def _bs_prologue(idx: Array, n_pad: int):
    """Per-tile candidate-block lists from the table itself (exact).

    :param idx: (B, M, S) int32; M padded to _BS_QT by the caller.
    :return: order (B, nt, CAP) int32 present-block ids (ascending,
        garbage past count), count (B, nt, 1) clamped to CAP,
        overflow () bool.
    """
    B, M, S = idx.shape
    nb = n_pad // _BS_CB
    nt = M // _BS_QT
    blk = (idx // _BS_CB).reshape(B, nt, _BS_QT * S)
    iota_b = jnp.arange(nb, dtype=jnp.int32)
    # (B, nt, qtS, nb) compare fused into the any-reduce (never
    # materialized at full rank by XLA's reduce fusion).
    presence = jnp.any(
        blk[..., None] == iota_b[None, None, None, :], axis=2)
    count = jnp.sum(presence, axis=-1, dtype=jnp.int32)  # (B, nt)
    key = jnp.where(presence, iota_b, nb + iota_b)
    order = jnp.sort(key, axis=-1)[..., :_BS_CAP] % nb
    if order.shape[-1] < _BS_CAP:  # nb < CAP: pad (count caps the loop)
        order = jnp.pad(
            order, ((0, 0), (0, 0), (0, _BS_CAP - order.shape[-1])))
    overflow = jnp.any(count > _BS_CAP)
    return (order.astype(jnp.int32),
            jnp.minimum(count, _BS_CAP)[..., None], overflow)


@functools.partial(jax.jit, static_argnums=(4,))
def _bs_gather_call(src_t, idx_flat, order, count, et_dummy=None):
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    B, C, N = src_t.shape
    nt = order.shape[1]
    qts = idx_flat.shape[1] // nt
    kern = functools.partial(_bs_gather_kernel, C, _BS_CAP)
    # Per-tile SMEM/VMEM rows ride a flattened (B*nt, 1, X) leading dim:
    # Mosaic requires the block's last two dims be 8/128-divisible OR
    # equal to the array dims — a (1, X) block over a (nt, X) array is
    # neither (the r3 pruned kernels hit the same rule).
    return pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((None, 1, _BS_CAP),
                         lambda b, t: (b * nt + t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 1), lambda b, t: (b * nt + t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, qts), lambda b, t: (b * nt + t, 0, 0)),
            pl.BlockSpec((None, C, N), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, C, qts), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((B, C, nt * qts), src_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=_interpret(),
    )(order.reshape(B * nt, 1, _BS_CAP), count.reshape(B * nt, 1, 1),
      idx_flat.reshape(B * nt, 1, qts), src_t)


@functools.partial(jax.jit, static_argnums=(4,))
def _bs_scatter_call(cot_t, idx_flat, order, count, n: int):
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    B, C, E = cot_t.shape
    nt = order.shape[1]
    qts = E // nt
    kern = functools.partial(_bs_scatter_kernel, C, _BS_CAP)
    return pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((None, 1, _BS_CAP),
                         lambda b, t: (b * nt + t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 1), lambda b, t: (b * nt + t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, qts), lambda b, t: (b * nt + t, 0, 0)),
            pl.BlockSpec((None, C, qts), lambda b, t: (b, 0, t)),
        ],
        out_specs=pl.BlockSpec((None, C, n), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=_interpret(),
    )(order.reshape(B * nt, 1, _BS_CAP), count.reshape(B * nt, 1, 1),
      idx_flat.reshape(B * nt, 1, qts), cot_t)


def _bs_pad(idx: Array):
    """Pad (B, M, S): M to _BS_QT and S to even (so each tile's edge
    count divides _BS_ECH).  Pad entries reference row 0 — their outputs
    are sliced off (fwd) / carry zero cotangent (bwd)."""
    B, M, S = idx.shape
    m_pad = _pad_to(M, _BS_QT)
    s_pad = _pad_to(S, 2)
    idx_p = idx
    if m_pad != M or s_pad != S:
        idx_p = jnp.pad(idx, ((0, 0), (0, m_pad - M), (0, s_pad - S)))
    return idx_p.astype(jnp.int32), m_pad, s_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def group_blocksparse(points: Array, idx: Array, n_src: int) -> Array:
    """ops.group via the adaptive block-sparse one-hot kernel.

    Exact for ANY index table (overflowing tiles route the whole call to
    the plain gather path via lax.cond); FAST when the table is
    Morton-coherent (smooth-loss tables on a sorted cloud).  Forward
    gather and backward scatter-add both run on the MXU; the backward
    accumulates f32 in a fixed sequential order (deterministic).
    """
    out, _ = _group_bs_fwd(points, idx, n_src)
    return out


def _group_bs_fwd(points, idx, n_src):
    from ogc_tpu.ops import core as _core

    B, M, S = idx.shape
    N, C = points.shape[1], points.shape[2]
    idx_p, m_pad, s_pad = _bs_pad(idx)
    n_pad = _pad_to(N, _BS_CB)
    order, count, overflow = _bs_prologue(idx_p, n_pad)

    def mxu(args):
        pts, idxp = args
        src_t = jnp.swapaxes(pts, 1, 2)
        if n_pad != N:
            src_t = jnp.pad(src_t, ((0, 0), (0, 0), (0, n_pad - N)))
        out_t = _bs_gather_call(
            src_t, idxp.reshape(B, m_pad * s_pad), order, count)
        return jnp.swapaxes(out_t, 1, 2).reshape(
            B, m_pad, s_pad, C)[:, :M, :S]

    def fallback(args):
        pts, idxp = args
        return _core._group_plain(pts, idxp)[:, :M, :S]

    out = jax.lax.cond(overflow, fallback, mxu, (points, idx_p))
    return out, (idx_p, order, count, overflow,
                 jnp.zeros((0,), points.dtype))


def _group_bs_bwd(n_src, res, g):
    idx_p, order, count, overflow, proto = res
    B, m_pad, s_pad = idx_p.shape
    C = g.shape[-1]
    M, S = g.shape[1], g.shape[2]
    n_pad = _pad_to(n_src, _BS_CB)
    if m_pad != M or s_pad != S:
        g = jnp.pad(g, ((0, 0), (0, m_pad - M), (0, s_pad - S), (0, 0)))
    g = g.astype(jnp.float32)

    def mxu(args):
        gg, idxp = args
        cot_t = jnp.swapaxes(gg.reshape(B, m_pad * s_pad, C), 1, 2)
        grad_t = _bs_scatter_call(
            cot_t, idxp.reshape(B, m_pad * s_pad), order, count, n_pad)
        return jnp.swapaxes(grad_t, 1, 2)[:, :n_src]

    def fallback(args):
        gg, idxp = args
        flat = idxp.reshape(B, m_pad * s_pad)
        return jnp.zeros((B, n_src, C), jnp.float32).at[
            jnp.arange(B)[:, None], flat].add(
                gg.reshape(B, m_pad * s_pad, C))

    d = jax.lax.cond(overflow, fallback, mxu, (g, idx_p))
    return d.astype(proto.dtype), np.zeros(
        (B, M, S), dtype=jax.dtypes.float0)


group_blocksparse.defvjp(_group_bs_fwd, _group_bs_bwd)


def onehot_path_applicable(n_src: int, n_rows: int, c: int) -> bool:
    """Static routing gate for the one-hot group path.

    Cost model (on-chip A/B, tools/bench_group_onehot.py): per-edge cost
    ~ n_pad * (compare + MAC) against the flat ~7.1 ns/row gather + ~11-18
    ns/row scatter wall, so small sources win big and the advantage dies
    somewhere past n ~ 2-4k.  The env switch OGC_GROUP_ONEHOT=off|auto|all
    overrides (all = any VMEM-feasible shape, for sweeps).
    """
    import os

    from ogc_tpu.ops.core import pallas_available

    # "auto" enables the calibrated gate below, "all" any VMEM-feasible
    # shape (sweeps).  Gate calibrated by the CORRECTED fwd+bwd A/B
    # (tools/bench_group_onehot.py, r5 rerun with the nonlinear value —
    # the first-run fwd+bwd arms were loop-hoisted and discarded):
    # N512/C10 fwd 1.14x fb 1.81x; N1024/C16 fb 1.56x; N2048/C10 fb
    # 1.01x (wash); N2048/C64 0.56x, N512/C131 0.92x fwd (washes/losses)
    # -> win region is small sources AND narrow channels.
    # DEFAULT "auto" since r5 session 2: the step-level flow-train arm
    # measured 60.7 -> 53.4 ms/batch (1.14x, 527 -> 599 scenes/s) with
    # the calibrated gate; the kernels are exact (tests pin gather
    # equality and deterministic scatter).  OGC_GROUP_ONEHOT=off
    # restores the XLA row gather/scatter everywhere.
    mode = os.environ.get("OGC_GROUP_ONEHOT", "auto")
    if mode == "off" or not pallas_available():
        return False
    n_pad = _pad_to(n_src, 128)
    feasible = (
        c <= 256
        # (C, N) source + (N, ET) one-hot must sit in VMEM together.
        and 4 * n_pad * (_et_for(n_pad) + c) <= 12 * 2 ** 20
        and n_rows >= 1024
    )
    if mode == "all":
        return feasible
    return feasible and n_pad <= 1024 and c <= 16
