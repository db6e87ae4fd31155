"""Flash-style KNN: fully fused distance + selection in one Pallas kernel.

The XLA approximate path costs ~10 ms at (B=8, 4096q x 8192c, k=32):
5.7 ms materializing the (B, N, M) f32 distance matrix to HBM + 4.1 ms
approx top-k reading it back — and ANY per-row XLA top-k/gather stage has
a ~4-6 ms floor at these row counts (measured; see BENCHLOG).  This kernel
never leaves VMEM:

  for each query tile (QT queries on lanes):
    loop candidate tiles (TM candidates on sublanes):
      d2 = (q - p)^2 summed over xyz       # VPU direct form, no transposes
      block-min over sublane groups of blk # candidate thinning, ~C(k,2)/G
      pack key = (d2_bits & ~mask) | candidate_idx   # int32, order = (d2, idx)
    k iterative extractions: next = min{key > last}  # keys unique -> exact
                                                     # k-smallest, no scatter

Packing truncates idx_bits (=ceil log2 M) mantissa bits from d2, so
returned distances carry ~2^-(23-idx_bits) relative error (~1e-3 at
M=8192) and selection order within that band resolves by lower index —
the reference's tie rule.  The true nearest always survives block-min, so
the QueryAndGroup radius clamp's `nearest` is the global argmin.

This backs ops.knn's DEFAULT approximate mode; exact=True keeps full
reference semantics (pointnet2/src/interpolate_gpu.cu:9-57).
Distances are non-differentiable (losses differentiate through gathered
neighbors, never through knn's dist output).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_QT = 512    # query tile (sublanes)
_TM = 1024   # candidate tile per inner step (sublanes); 2048 overflows
             # scoped VMEM at blk=4 (d2 + iota + where temporaries)

# Key-extraction scheme (see _bitonic_smallest): "iter" = k sequential
# masked-min passes (~3*k*G element-ops); "bitonic" = partial bitonic sort
# along sublanes (~(log^2 kb + 2*log(G/kb)*(1 + log kb)) passes — ~4x fewer
# ops at k=32, G=2048).  Read at import (trace-time static, like
# OGC_PALLAS_POOL): set before process start for A/B runs.
_EXTRACT_ENV = os.environ.get("OGC_PALLAS_KNN_EXTRACT", "iter")

# d2 scheme: "vpu" = direct (p - q)^2 broadcast form (8 VPU ops/pair);
# "mxu" = |p|^2 + |q|^2 - 2 p.q with the cross term on the (otherwise
# idle) MXU via a K=3 dot_general at Precision.HIGHEST — ~3 VPU ops/pair.
# Numerics: the expanded form carries ~|p||q|*eps_f32 absolute error
# (catastrophic cancellation near zero), ~5e-4 m^2 at 30 m scene scale —
# larger than the packed-key truncation for sub-decimeter neighbors, so
# in-band ordering near exact ties can differ from the reference rule.
# Approximate mode only (exact mode never enters this kernel); default
# stays "vpu" pending the on-chip A/B (tools/bench_knn_extract.py).
_D2_ENV = os.environ.get("OGC_PALLAS_KNN_D2", "vpu")


_BALL_INVALID = 2**30  # sentinel key: no in-radius point in the block


def _ce_stage(v: Array, size: int, st: int) -> Array:
    """One bitonic compare-exchange stage along the sublane (row) dim.

    Pairs row i with row i+st inside every 2*st-row group; the sort
    direction alternates per `size`-row block (the standard bitonic
    network indexing).  Everything is sublane-group reshapes + elementwise
    min/max/select — the lane (query) dim is untouched, so the whole stage
    is full-width VPU work."""
    R, Q = v.shape
    outer = R // (2 * st)
    v3 = v.reshape(outer, 2 * st, Q)
    a = v3[:, :st]
    b = v3[:, st:]
    mn = jnp.minimum(a, b)
    mx = jnp.maximum(a, b)
    period = size // (2 * st)  # outer groups per direction flip
    if period >= outer:        # single block: ascending everywhere
        lo, hi = mn, mx
    else:
        i0 = jax.lax.broadcasted_iota(jnp.int32, (outer, st, Q), 0)
        asc = ((i0 // period) & 1) == 0
        lo = jnp.where(asc, mn, mx)
        hi = jnp.where(asc, mx, mn)
    return jnp.concatenate([lo, hi], axis=1).reshape(R, Q)


def _bitonic_smallest(keys: Array, k: int) -> Array:
    """Exact k smallest keys of every column, ascending — partial bitonic
    sort along the sublane dim.  `keys` is (G, Q) int32 with G a power of
    two and next_pow2(k) <= G; duplicates sort stably by value (exactness
    for KNN needs unique keys, which the packed (d2|idx) encoding gives).

    Cost model vs the iterative extraction (k passes of mask+min over all
    G rows, ~3*k*G element-ops): sort kb-blocks with alternating
    directions (log kb (log kb+1)/2 passes over G rows), then repeatedly
    halve — elementwise min of adjacent (ascending, descending) kb-block
    pairs keeps the kb smallest as a bitonic sequence (one pass), bitonic
    merge re-sorts (log kb passes over the surviving rows).  Total
    ~ (15 + 2*(1+5)) * G ~= 27*G element-ops at k=32 vs 96*G iterative."""
    G, Q = keys.shape
    kb = max(2, 1 << (k - 1).bit_length())
    assert G & (G - 1) == 0 and kb <= G, (G, kb)
    v = keys
    size = 2
    while size <= kb:          # sort kb-row blocks, directions alternating
        st = size // 2
        while st >= 1:
            v = _ce_stage(v, size, st)
            st //= 2
        size *= 2
    rows = G
    while rows > kb:
        # Adjacent blocks are (ascending, descending) = one bitonic 2*kb
        # sequence; its elementwise half-min is the kb smallest, bitonic.
        v4 = v.reshape(rows // (2 * kb), 2, kb, Q)
        v = jnp.minimum(v4[:, 0], v4[:, 1]).reshape(rows // 2, Q)
        rows //= 2
        # Bitonic merge back to sorted; alternate directions while more
        # levels remain, plain ascending on the last.
        size = kb if rows > kb else 2 * kb
        st = kb // 2
        while st >= 1:
            v = _ce_stage(v, size, st)
            st //= 2
    return v[:k]


def _extract_mode(g_total: int, k: int, extract: str | None) -> str:
    """Resolve the extraction scheme for a kernel instance.  Falls back to
    the iterative path when the (padded) key-row count cannot host the
    bitonic network."""
    mode = _EXTRACT_ENV if extract is None else extract
    if mode == "bitonic":
        g_pad = 1 << max(1, (g_total - 1).bit_length())
        if max(2, 1 << (k - 1).bit_length()) <= g_pad:
            return "bitonic"
    return "iter"


def _knn_kernel(k, blk, idx_bits, n_mtiles, ball_r2, extract, d2_mode,
                g_total, q_ref, p_ref, dist_ref, idx_ref, keys_scr):
    """q_ref (1, 3, QT); p_ref (1, Mp, 3); outs (1, k, QT) — candidates on
    SUBLANES (Mosaic supports sublane-group reshapes/reductions; lane-dim
    splits are 'unsupported shape cast').

    Two key modes:
      ball_r2 is None — KNN: key = (d2_bits & ~mask) | argmin-in-block.
      ball_r2 set     — ball query: key = lowest in-radius (d2 < r^2)
        candidate index in the block, _BALL_INVALID if none.  The k
        extractions then yield the nsample lowest-index in-radius points
        (the reference's index-order filling, ball_query_gpu.cu:9-45)."""
    qx = q_ref[0, 0:1, :]            # (1, QT) rows
    qy = q_ref[0, 1:2, :]
    qz = q_ref[0, 2:3, :]
    mask_low = jnp.int32((1 << idx_bits) - 1)
    if d2_mode == "mxu":
        q3 = q_ref[0, :, :]          # (3, QT)
        qn = qx * qx + qy * qy + qz * qz    # (1, QT)

    def mstep(mt, _):
        sl = pl.ds(mt * _TM, _TM)
        p = p_ref[0, sl, :]          # (TM, 3)
        if d2_mode == "mxu":
            # Expanded form: the cross term rides the idle MXU (K=3 f32
            # HIGHEST dot); VPU only adds norms + clamps.  See _D2_ENV for
            # the numerics caveat.
            pn = jnp.sum(p * p, axis=1, keepdims=True)      # (TM, 1)
            dot = jax.lax.dot_general(
                p, q3, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                               # (TM, QT)
            d2 = jnp.maximum(pn + qn - 2.0 * dot, 0.0)
        else:
            px = p[:, 0:1]           # (TM, 1) columns
            py = p[:, 1:2]
            pz = p[:, 2:3]
            dx = px - qx             # (TM, QT)
            dy = py - qy
            dz = pz - qz
            d2 = dx * dx + dy * dy + dz * dz

        g = _TM // blk
        if blk == 1:
            # Exact mode (no thinning): every candidate keeps its own key —
            # skip the singleton-group reshape/reduce entirely.
            ids1 = (
                jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + mt * _TM
            )
            if ball_r2 is None:
                keys = (
                    pltpu.bitcast(d2, jnp.int32) & ~mask_low
                ) | ids1
            else:
                keys = jnp.where(d2 < ball_r2, ids1,
                                 jnp.int32(_BALL_INVALID))
            keys_scr[pl.ds(mt * g, g), :] = keys
            return 0
        d3 = d2.reshape(g, blk, d2.shape[1])
        ids = (
            jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + mt * _TM
        ).reshape(g, blk, d2.shape[1])
        if ball_r2 is None:
            vmin = jnp.min(d3, axis=1)   # (g, QT)
            amin = jnp.min(
                jnp.where(d3 == vmin[:, None, :], ids,
                          jnp.int32(_BALL_INVALID)), axis=1
            )                            # (g, QT)
            keys = (pltpu.bitcast(vmin, jnp.int32) & ~mask_low) | amin
        else:
            keys = jnp.min(
                jnp.where(d3 < ball_r2, ids, jnp.int32(_BALL_INVALID)),
                axis=1,
            )
        keys_scr[pl.ds(mt * g, g), :] = keys
        return 0

    jax.lax.fori_loop(0, n_mtiles, mstep, 0)

    def emit(i, nxt):
        """Write extraction i from a (1, QT) packed-key row."""
        if ball_r2 is None:
            idx_ref[0, i, :] = (nxt & mask_low)[0]
            d2_sel = pltpu.bitcast(nxt & ~mask_low, jnp.float32)
            dist_ref[0, i, :] = jnp.sqrt(jnp.maximum(d2_sel, 0.0))[0]
        else:
            idx_ref[0, i, :] = nxt[0]
            dist_ref[0, i, :] = jnp.zeros_like(nxt[0], jnp.float32)

    g_pad = keys_scr.shape[0]
    if extract == "bitonic":
        if g_pad > g_total:
            # Scratch pad rows (added to reach a power of two) sort last.
            keys_scr[pl.ds(g_total, g_pad - g_total), :] = jnp.full(
                (g_pad - g_total, keys_scr.shape[1]), jnp.int32(2**31 - 1)
            )
        topk = _bitonic_smallest(keys_scr[:, :], k)        # (k, QT)
        for i in range(k):
            emit(i, topk[i:i + 1, :])
        return

    keys = keys_scr[pl.ds(0, g_total), :]                  # (G_total, QT)
    last = jnp.full((1, keys.shape[1]), jnp.int32(-(2**31)))
    big = jnp.int32(2**31 - 1)
    for i in range(k):
        # Keys are unique (idx bits differ), so "min over keys > last"
        # walks the exact sorted order without any scatter/removal.
        nxt = jnp.min(jnp.where(keys <= last, big, keys), axis=0,
                      keepdims=True)                       # (1, QT)
        emit(i, nxt)
        last = nxt


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _knn_pallas(query_t: Array, points: Array, k: int, blk: int,
                interpret: bool = False,
                ball_r2: float | None = None,
                extract: str = "iter",
                d2_mode: str = "vpu",
                qt: int = _QT) -> Tuple[Array, Array]:
    """:param query_t: (B, 3, Np) — Np multiple of `qt`.
    :param points: (B, Mp, 3) — Mp multiple of _TM.
    :param qt: query-tile width (lanes).  _QT default; exact ball mode
        (blk=1) shrinks it so the un-thinned (Mp, qt) key scratch stays
        inside the ~16 MB VMEM budget.
    :return: (dist (B, k, Np) f32, idx (B, k, Np) int32) — note the
    transposed (k, N) layout; the wrapper swaps axes (cheap in XLA)."""
    B, _, Np = query_t.shape
    Mp = points.shape[1]
    g_total = Mp // blk
    # Bitonic extraction sorts over a power-of-two row count; the scratch
    # pad rows are filled with INT32_MAX in-kernel.
    g_pad = (
        1 << max(1, (g_total - 1).bit_length())
        if extract == "bitonic" else g_total
    )
    idx_bits = max(1, (Mp - 1).bit_length())
    kernel = functools.partial(
        _knn_kernel, k, blk, idx_bits, Mp // _TM, ball_r2, extract, d2_mode,
        g_total,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.int32),
        ),
        grid=(B, Np // qt),
        in_specs=[
            pl.BlockSpec((1, 3, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 3), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((g_pad, qt), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),  # see _knn_exact_pallas
        interpret=interpret,
    )(query_t, points)


# ---------------------------------------------------------------------------
# Exact KNN: no thinning, no packed-key truncation
# ---------------------------------------------------------------------------

_QT_EXACT = 128  # exact modes keep an un-thinned (Mp, qt) scratch resident;
                 # 128 lanes (one vreg) holds it at 4 MB for Mp=8192

# Exact-kernel emission scheme: "lex" = lexicographic (d2, idx) eligibility
# test per round (~12 VPU ops/element); "removal" = destructively mark the
# previous round's winner +inf in the VMEM d2 scratch, reducing each round
# to a plain min scan (~8 ops/element + one store).  On-chip A/B
# (tools/bench_knn_exact.py, 2026-08-19): removal 1.11x/1.13x at
# k=16/32 @ 8192x8192, 0.98x at k=3 (3-NN), indices bit-equal everywhere —
# so "auto" picks removal for k >= 8 and lex below.  Env overrides for
# A/B re-runs.
_EXACT_EMIT_ENV = os.environ.get("OGC_PALLAS_EXACT_EMIT", "auto")


def _resolve_exact_emit(mode: str, k: int) -> str:
    if mode == "auto":
        return "removal" if k >= 8 else "lex"
    return mode


def _fill_d2_scratch(d2_mode, n_mtiles, q_ref, p_ref, d2_scr):
    """Fill the (Mp, qt) d2 scratch, direct or expanded form.

    "vpu": the reference's own arithmetic — per-coordinate f32
    (p - q)^2 sums (interpolate_gpu.cu:15-18); bit-faithful.
    "mxu": expanded form |p|^2 - 2 p.q + |q|^2 with the cross term on
    the MXU (K=3 f32 HIGHEST dot).  NOT bit-faithful: carries
    ~eps_f32 * (|p| + |q|)^2 absolute error from cancellation at scene
    scale — callers must certify selections against that band
    (knn_exact_mxu_certified) or accept approximate results.  Built for
    VERDICT r4 #4 (the certified-MXU exact arm)."""
    qx = q_ref[0, 0:1, :]
    qy = q_ref[0, 1:2, :]
    qz = q_ref[0, 2:3, :]
    if d2_mode == "mxu":
        q3 = q_ref[0, :, :]                                  # (3, qt)
        qn = qx * qx + qy * qy + qz * qz                     # (1, qt)

    def mstep(mt, _):
        sl = pl.ds(mt * _TM, _TM)
        p = p_ref[0, sl, :]
        if d2_mode == "mxu":
            pn = jnp.sum(p * p, axis=1, keepdims=True)       # (TM, 1)
            dot = jax.lax.dot_general(
                p, q3, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                # (TM, qt)
            d2_scr[sl, :] = jnp.maximum(pn + qn - 2.0 * dot, 0.0)
        else:
            dx = p[:, 0:1] - qx
            dy = p[:, 1:2] - qy
            dz = p[:, 2:3] - qz
            d2_scr[sl, :] = dx * dx + dy * dy + dz * dz
        return 0

    jax.lax.fori_loop(0, n_mtiles, mstep, 0)


def _knn_exact_kernel(k, n_mtiles, d2_mode, q_ref, p_ref, dist_ref, idx_ref,
                      d2_scr):
    """Exact KNN: full-precision f32 d2 + (d2, idx) lexicographic k-round
    extraction.  No block-min thinning and no packed-key mantissa
    truncation — bit-faithful to the reference semantics
    (pointnet2/src/interpolate_gpu.cu:9-57): ascending d2, ties toward the
    lower candidate index, d2 in the reference's direct per-coordinate f32
    form (the XLA exact path's MXU expansion differs by ~|p||q|*eps).

    Why this beats lax.top_k for exact selection: XLA's top_k lowers to a
    full variadic sort (~log^2(M)/2 ~= 91 compare-exchange stages over M
    rows at M=8192, each moving a (f32, i32) pair), while k-round masked
    min extraction is ~8*k*M element-ops — ~20x fewer at k=16 — and the
    (B, N, M) distance matrix never exists in HBM.  Measured: the exact
    XLA path costs parity-mode bench ~20x fast mode (BENCHLOG r3).

    q_ref (1, 3, qt); p_ref (1, Mp, 3); outs (1, k, qt);
    d2_scr (Mp, qt) f32.  Extraction reduces tile-by-tile (TM rows at a
    time) with a lexicographic running minimum, so peak temporaries stay
    at (TM, qt) regardless of Mp.
    """
    _fill_d2_scratch(d2_mode, n_mtiles, q_ref, p_ref, d2_scr)

    qt = q_ref.shape[2]
    inf = jnp.float32(jnp.inf)
    imax = jnp.int32(2**31 - 1)
    last_d = jnp.full((1, qt), jnp.float32(-1.0))  # d2 >= 0
    last_i = jnp.full((1, qt), jnp.int32(-1))
    for i in range(k):
        def tile(mt, carry, last_d=last_d, last_i=last_i):
            rd, ri = carry
            d2 = d2_scr[pl.ds(mt * _TM, _TM), :]
            ids = (
                jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + mt * _TM
            )
            # Eligible = strictly after (last_d, last_i) in (d2, idx)
            # lexicographic order; (d2, idx) pairs are unique, so k rounds
            # walk the exact sorted prefix with no scatter/removal.
            elig = (d2 > last_d) | ((d2 == last_d) & (ids > last_i))
            nd = jnp.min(jnp.where(elig, d2, inf), axis=0, keepdims=True)
            ni = jnp.min(
                jnp.where(elig & (d2 == nd), ids, imax),
                axis=0, keepdims=True,
            )
            better = (nd < rd) | ((nd == rd) & (ni < ri))
            return (jnp.where(better, nd, rd), jnp.where(better, ni, ri))

        nd, ni = jax.lax.fori_loop(
            0, n_mtiles, tile,
            (jnp.full((1, qt), inf), jnp.full((1, qt), imax)),
        )
        dist_ref[0, i, :] = jnp.sqrt(jnp.maximum(nd, 0.0))[0]
        idx_ref[0, i, :] = ni[0]
        last_d, last_i = nd, ni


def _knn_exact_kernel_removal(k, n_mtiles, d2_mode, q_ref, p_ref, dist_ref,
                              idx_ref, d2_scr):
    """Exact KNN with destructive winner removal: identical contract to
    _knn_exact_kernel (ascending d2, ties to the lower index — reference
    interpolate_gpu.cu:30-46), cheaper emission loop.

    Instead of the lexicographic (d2 > last) | (d2 == last & idx > last)
    eligibility test (~12 VPU ops/element/round), each round after the
    first overwrites the PREVIOUS winner's d2 with +inf in the VMEM
    scratch — candidate ids are globally unique, so exactly one element is
    removed per round and every round reduces to a plain min scan (~8
    ops/element + one scratch store).  Ties still resolve to the lower
    index: removed elements carry +inf and the per-round index pick is
    min(ids | d2 == round_min).
    """
    _fill_d2_scratch(d2_mode, n_mtiles, q_ref, p_ref, d2_scr)

    qt = q_ref.shape[2]
    inf = jnp.float32(jnp.inf)
    imax = jnp.int32(2**31 - 1)
    tile_shape = (_TM, qt)
    last_i = jnp.full((1, qt), jnp.int32(-1))
    for i in range(k):
        def tile(mt, carry, last_i=last_i, remove=(i > 0)):
            rd, ri = carry
            sl = pl.ds(mt * _TM, _TM)
            d2 = d2_scr[sl, :]
            ids = jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0)
            if remove:
                # last_i is global; shift to tile-local space on the (1, qt)
                # scalar row rather than adding mt*_TM per element.
                d2 = jnp.where(ids == (last_i - mt * _TM), inf, d2)
                d2_scr[sl, :] = d2
            nd = jnp.min(d2, axis=0, keepdims=True)
            # d2 == nd always has >= 1 match in-tile (nd is this tile's
            # min and at most k < _TM elements are ever removed), so the
            # local argmin is always valid and shifts to global space on
            # the (1, qt) row.
            ni = jnp.min(jnp.where(d2 == nd, ids, imax),
                         axis=0, keepdims=True) + mt * _TM
            better = (nd < rd) | ((nd == rd) & (ni < ri))
            return (jnp.where(better, nd, rd), jnp.where(better, ni, ri))

        nd, ni = jax.lax.fori_loop(
            0, n_mtiles, tile,
            (jnp.full((1, qt), inf), jnp.full((1, qt), imax)),
        )
        dist_ref[0, i, :] = jnp.sqrt(jnp.maximum(nd, 0.0))[0]
        idx_ref[0, i, :] = ni[0]
        last_i = ni


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _knn_exact_pallas(query_t: Array, points: Array, k: int,
                      interpret: bool = False,
                      emit: str = "lex",
                      qt: int = _QT_EXACT,
                      d2_mode: str = "vpu") -> Tuple[Array, Array]:
    B, _, Np = query_t.shape
    Mp = points.shape[1]
    kfn = (_knn_exact_kernel_removal if emit == "removal"
           else _knn_exact_kernel)
    kernel = functools.partial(kfn, k, Mp // _TM, d2_mode)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.int32),
        ),
        grid=(B, Np // qt),
        in_specs=[
            pl.BlockSpec((1, 3, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 3), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((Mp, qt), jnp.float32)],
        # The (Mp, qt) scratch + tile temporaries sit within ~100 KB of
        # the default 16 MB scoped-vmem budget at qt=256/Mp=8192; layout
        # copies around the call can tip it over (r4: the f32 eval fold
        # did).  Raise the limit rather than shrinking qt (qt=128 is
        # 1.13-1.41x slower, tools/bench_exact_qt.py).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(query_t, points)


def _exact_qt(mp: int, n: int) -> int:
    """Query-tile width for the exact kernel: wider tiles amortize
    per-grid-step overhead, but the un-thinned (Mp, qt) f32 scratch must
    stay within VMEM (~16 MB, minus in/out blocks).  OGC_PALLAS_EXACT_QT
    overrides for A/B sweeps.

    Default: qt=256 whenever the scratch fits a 12 MB budget, else 128.
    On-chip sweep (tools/bench_exact_qt.py, 2026-08-20): 256 is
    1.13-1.41x over 128 at every parity hot shape (knn 8192x8192 k16
    26.19->18.61 ms; 3-NN 5.21->4.62; k64 cross 23.52->17.14; ball k64
    42.22->34.89), indices bit-equal; 512 adds nothing where it fits
    (4.62->4.62 at Mp=2048) and busts the budget at Mp=8192."""
    env = os.environ.get("OGC_PALLAS_EXACT_QT")
    if env:
        return int(env)
    # Queries pad up to a qt multiple: a 256-wide tile would DOUBLE the
    # work for small-query calls (segnet SA3 groups 128 centroids).
    if n < 256 or mp * 256 * 4 > 12 * 2**20:
        return _QT_EXACT
    return 256


def knn_exact(
    k: int, query: Array, points: Array, interpret: bool = False,
    emit: str | None = None, d2_mode: str = "vpu",
) -> Tuple[Array, Array]:
    """EXACT k-nearest-neighbors via the fused Pallas kernel.

    Same contract as ops.knn's exact mode — ascending distance, ties
    toward the lower index (reference interpolate_gpu.cu:30-46) — but
    ~an order of magnitude faster than the XLA materialize+top_k path at
    the model's hot shapes (see _knn_exact_kernel).  Requires k <= M.

    :param query: (B, N, 3); :param points: (B, M, 3).
    :return: (dist (B, N, k) sqrt-distances f32, idx (B, N, k) int32).
    """
    B, N, _ = query.shape
    M = points.shape[1]
    assert k <= M, (k, M)
    mp = -(-M // _TM) * _TM
    qt = _exact_qt(mp, N)
    np_ = -(-N // qt) * qt
    p = points.astype(jnp.float32)
    if mp != M:
        # Far-away pads: d2 ~ 1e12 >> any real scene distance, and k <= M
        # real candidates exist, so pads are never selected.
        p = jnp.pad(p, ((0, 0), (0, mp - M), (0, 0)), constant_values=1e6)
    q_t = jnp.swapaxes(query, 1, 2).astype(jnp.float32)
    if np_ != N:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, np_ - N)))
    dist, idx = _knn_exact_pallas(
        q_t, p, k, interpret,
        _resolve_exact_emit(_EXACT_EMIT_ENV if emit is None else emit, k),
        qt, d2_mode)
    return (
        jnp.swapaxes(dist, 1, 2)[:, :N],
        jnp.swapaxes(idx, 1, 2)[:, :N],
    )


# ---------------------------------------------------------------------------
# Certified-MXU exact KNN (VERDICT r4 #4 arm)
# ---------------------------------------------------------------------------

_F32_EPS = 2.0 ** -24  # f32 unit roundoff (half ulp at 1.0)


def _expanded_band(query: Array, points: Array) -> Array:
    """Rigorous per-batch bound on |d2_expanded - d2_direct| for f32
    HIGHEST arithmetic.

    Expanded form: d2e = fl(|p|^2) + fl(|q|^2) - 2 fl(p.q), each term a
    3-element f32 reduction (<= 2 rounding steps, magnitude <= |x|^2),
    the dot at Precision.HIGHEST (>= f32-accurate, error <= 3 eps
    |p||q|), plus 2 rounding steps on the combine (magnitude
    <= (|p|+|q|)^2).  Direct form's own error is <= ~3 eps * d2 —
    relative, absorbed below.  Total <= 8 eps (|p|+|q|)^2
    <= 16 eps (max|p|^2 + max|q|^2).  The cancellation problem in one
    number: at 30 m scene scale this is ~2e-3 m^2 ABSOLUTE, vs
    sub-decimeter neighbor d2 of ~1e-2 m^2 (BENCHLOG r2 'documented
    cancellation band')."""
    np2 = jnp.max(jnp.sum(jnp.square(points.astype(jnp.float32)), -1), 1)
    nq2 = jnp.max(jnp.sum(jnp.square(query.astype(jnp.float32)), -1), 1)
    return jnp.float32(16.0 * _F32_EPS) * (np2 + nq2)         # (B,)


def _mxu_certified_core(k: int, query: Array, points: Array, extra: int,
                        interpret: bool = False):
    """Expanded-form (MXU-fill) k+extra selection, direct-form
    re-resolution, and the exactness certificate.

    Returns (dist (B,N,k), idx (B,N,k), cert_ok (B,N) bool).  Where
    cert_ok is True the (dist, idx) rows PROVABLY equal the direct-form
    exact kernel's output (reference order: ascending d2, ties to the
    lower index, interpolate_gpu.cu:30-46) up to the repo-wide 1-ulp
    FMA-contraction contract on d2 recomputation.  Where False, an
    unexamined candidate could lie inside the error band and the caller
    must fall back."""
    B, N, _ = query.shape
    M = points.shape[1]
    ke = min(M, k + extra)
    dist_e, idx_e = knn_exact(ke, query, points, interpret=interpret,
                              d2_mode="mxu")
    p32 = points.astype(jnp.float32)
    q32 = query.astype(jnp.float32)
    # Direct-form d2 of the examined candidates (reference arithmetic;
    # XLA FMA contraction may differ by <= 1 ulp — the same contract the
    # FPS kernel documents).
    cand = jnp.take_along_axis(
        p32, idx_e.reshape(B, N * ke, 1), axis=1, mode="clip",
    ).reshape(B, N, ke, 3)
    d = cand - q32[:, :, None, :]
    d2d = (d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]) \
        + d[..., 2] * d[..., 2]                               # (B, N, ke)
    d2_sorted, idx_sorted = jax.lax.sort(
        (d2d, idx_e), dimension=-1, num_keys=2)
    d2_top = d2_sorted[..., :k]
    idx_top = idx_sorted[..., :k]
    if ke == M:
        cert_ok = jnp.ones((B, N), bool)      # every candidate examined
    else:
        band = _expanded_band(query, points)[:, None]         # (B, 1)
        # Any unexamined candidate has d2e >= the ke-th selected d2e;
        # its true (direct) d2 >= that - band.  The kernel emits
        # sqrt(d2e); squaring back loses <= ~2 ulp relative.
        d2e_last = jnp.square(dist_e[..., ke - 1]) * (1.0 - 4 * _F32_EPS)
        # Strict > also covers d2-tie index flips: unexamined d2 is then
        # STRICTLY above the selected k-th, so no tie can occur.
        cert_ok = (d2e_last - band) > d2_top[..., k - 1]
    return jnp.sqrt(jnp.maximum(d2_top, 0.0)), idx_top, cert_ok


def knn_exact_mxu_certified(
    k: int, query: Array, points: Array, extra: int = 4,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """EXACT KNN with the distance fill on the MXU and a per-query
    exactness certificate (VERDICT r4 #4: 'expanded-form d2 on the MXU,
    knife-edge band re-resolved in direct form').

    Structure: the exact kernel selects k+extra candidates by
    EXPANDED-form d2 (cross term on the MXU, _fill_d2_scratch "mxu");
    the k+extra survivors are re-resolved in the reference's direct
    per-coordinate f32 form in XLA and the top-k re-selected under the
    reference order.  A rigorous error band (_expanded_band) certifies
    per query that no unexamined candidate can enter the true top-k;
    the rare uncertified queries fall back to the bit-faithful
    direct-form kernel for the whole call (lax.cond — the fallback
    executes only when triggered).

    Same contract as knn_exact.  Cost structure and the on-chip verdict:
    tools/bench_exact_mxu_cert.py + BENCHLOG r5 closure.
    """
    dist, idx, cert_ok = _mxu_certified_core(
        k, query, points, extra, interpret)

    def fallback(_):
        return knn_exact(k, query, points, interpret=interpret)

    return jax.lax.cond(
        jnp.all(cert_ok), lambda arg: arg, fallback, (dist, idx))


def ball_query_exact(
    radius: float, nsample: int, xyz: Array, new_xyz: Array,
    interpret: bool = False,
) -> Array:
    """EXACT ball query via the fused kernel: blk=1 disables thinning, so
    every in-radius candidate keeps its own index key and the k extractions
    return the `nsample` LOWEST in-radius indices — the reference's
    index-order filling (ball_query_gpu.cu:9-45) exactly.  Ball keys carry
    no distance bits, so (unlike KNN) the packed representation loses
    nothing and the standard kernel serves exact mode as-is; only the
    query tile shrinks to keep the un-thinned (Mp, qt) scratch in VMEM.

    d2 is the direct per-coordinate f32 form — the reference kernel's own
    arithmetic (the XLA exact path's MXU expansion may flip membership of
    points within ~1e-6*scale^2 of the radius).

    :return: candidate keys (B, N, nsample) int32, ascending, invalid
        entries >= _BALL_INVALID (callers apply _fill_balls padding).
    """
    B, N, _ = new_xyz.shape
    M = xyz.shape[1]
    assert nsample <= M, (nsample, M)
    mp = -(-M // _TM) * _TM
    qt = _exact_qt(mp, N)
    np_ = -(-N // qt) * qt
    p = xyz.astype(jnp.float32)
    if mp != M:
        p = jnp.pad(p, ((0, 0), (0, mp - M), (0, 0)), constant_values=1e6)
    q_t = jnp.swapaxes(new_xyz, 1, 2).astype(jnp.float32)
    if np_ != N:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, np_ - N)))
    _, idx = _knn_pallas(
        q_t, p, nsample, 1, interpret,
        ball_r2=float(radius) * float(radius),
        extract="iter", qt=qt,
    )
    return jnp.swapaxes(idx, 1, 2)[:, :N]


# ---------------------------------------------------------------------------
# Bound-pruned EXACT KNN / ball query: provably-safe candidate-block pruning
# ---------------------------------------------------------------------------

_CB_EXACT = int(os.environ.get("OGC_PRUNE_CB", "128"))
# candidate block for the bound-pruned exact kernels: smaller blocks give
# tighter AABBs (fewer survivors) but a finer append loop; must divide
# _TM.  OGC_PRUNE_CB / OGC_PRUNE_QT override for on-chip sweeps.
_PRUNE_QT_ENV = os.environ.get("OGC_PRUNE_QT")

def _theta_inflate(m_points: int) -> float:
    """Relative inflation covering every representation error between the
    flash pre-pass's reported k-th distance and the true k-th d2:
    packed-key mantissa truncation (<= 2^-(23-idx_bits) relative, see
    module docstring) plus the sqrt->square round trip (~2 ulp).
    2^(idx_bits-22) DOUBLES the truncation bound, absorbing the round
    trip; the 2^-8 floor keeps the historical margin at idx_bits < 14.
    Derived from the flash pass's actual padded point count (ADVICE r4:
    a fixed 1 + 2^-8 was only provably safe for idx_bits <= 14 — at
    32768+ points theta could UNDERESTIMATE the true k-th d2 and pruning
    would silently drop true neighbors).  Applied multiplicatively, so
    theta >= true k-th d2 PROVABLY and block pruning stays exact at any
    supported M."""
    mp_flash = -(-m_points // _TM) * _TM
    idx_bits = max(1, (mp_flash - 1).bit_length())
    return 1.0 + max(2.0 ** -8, 2.0 ** (idx_bits - 22))


def _knn_exact_pruned_kernel(k, cb, order_ref, count_ref,
                             q_ref, p_ref, pid_ref, dist_ref, idx_ref,
                             d2_scr, id_scr):
    """Exact KNN over the tile's SURVIVING candidate blocks only.

    order_ref (1, nbq, nbp) SMEM: per-tile candidate-block ids, survivors
    first in ascending lower-bound order; count_ref (1, 1, nbq) SMEM: number
    of surviving blocks.  Phase 1 compacts the survivors' d2 (direct
    per-coordinate f32 form — bit-equal to _knn_exact_kernel) and ORIGINAL
    point ids into VMEM scratch; phase 2 is the removal-exact extraction
    (ascending d2, ties toward the lower original index — reference
    interpolate_gpu.cu:30-46) over the dynamic-length compacted region.
    Safety of the pruning is established by the caller: every pruned block
    has AABB lower bound STRICTLY above an upper bound on the tile's k-th
    distance, so no pruned candidate can enter any top-k."""
    qi = pl.program_id(1)
    cnt = count_ref[0, 0, qi]
    qx = q_ref[0, 0:1, :]
    qy = q_ref[0, 1:2, :]
    qz = q_ref[0, 2:3, :]

    qt = q_ref.shape[2]
    inf = jnp.float32(jnp.inf)
    imax = jnp.int32(2**31 - 1)

    def append(j, _):
        bid = order_ref[0, qi, j]
        sl_src = pl.ds(bid * cb, cb)
        p = p_ref[0, sl_src, :]
        dx = p[:, 0:1] - qx
        dy = p[:, 1:2] - qy
        dz = p[:, 2:3] - qz
        sl_dst = pl.ds(j * cb, cb)
        d2_scr[sl_dst, :] = dx * dx + dy * dy + dz * dz
        id_scr[sl_dst, :] = pid_ref[0, sl_src, :]
        return 0

    jax.lax.fori_loop(0, cnt, append, 0)

    # Extraction runs over COARSE _TM-row tiles (the unpruned kernel's
    # granularity — fine cb-row dynamic loops measured ~3x slower than
    # static-tiled extraction on-chip): pad the compacted region to a _TM
    # multiple with +inf/imax sentinels, then loop ceil(cnt*cb/_TM) tiles.
    blocks_per_tile = _TM // cb
    n_et = (cnt + blocks_per_tile - 1) // blocks_per_tile

    def fill(j, _):
        sl = pl.ds((cnt + j) * cb, cb)
        d2_scr[sl, :] = jnp.full((cb, qt), inf)
        id_scr[sl, :] = jnp.full((cb, 1), imax)
        return 0

    jax.lax.fori_loop(0, n_et * blocks_per_tile - cnt, fill, 0)

    last_i = jnp.full((1, qt), jnp.int32(-1))
    for i in range(k):
        def tile(t, carry, last_i=last_i, remove=(i > 0)):
            rd, ri = carry
            sl = pl.ds(t * _TM, _TM)
            d2 = d2_scr[sl, :]
            ids = jnp.broadcast_to(id_scr[sl, :], d2.shape)
            if remove:
                d2 = jnp.where(ids == last_i, inf, d2)
                d2_scr[sl, :] = d2
            nd = jnp.min(d2, axis=0, keepdims=True)
            ni = jnp.min(jnp.where(d2 == nd, ids, imax),
                         axis=0, keepdims=True)
            better = (nd < rd) | ((nd == rd) & (ni < ri))
            return (jnp.where(better, nd, rd), jnp.where(better, ni, ri))

        nd, ni = jax.lax.fori_loop(
            0, n_et, tile,
            (jnp.full((1, qt), inf), jnp.full((1, qt), imax)),
        )
        dist_ref[0, i, :] = jnp.sqrt(jnp.maximum(nd, 0.0))[0]
        idx_ref[0, i, :] = ni[0]
        last_i = ni


def _ball_exact_pruned_kernel(ns, cb, r2, order_ref, count_ref, q_ref,
                              p_ref, pid_ref, idx_ref, key_scr):
    """Exact ball query over surviving blocks: compacted keys are the
    ORIGINAL index for strictly-in-radius candidates (_BALL_INVALID
    otherwise), and ns ascending-key extractions yield the reference's
    index-order ball filling (ball_query_gpu.cu:9-45).  Pruning is static:
    a block survives iff its AABB lower bound < r^2."""
    qi = pl.program_id(1)
    cnt = count_ref[0, 0, qi]
    qx = q_ref[0, 0:1, :]
    qy = q_ref[0, 1:2, :]
    qz = q_ref[0, 2:3, :]

    qt = q_ref.shape[2]
    big = jnp.int32(2**31 - 1)

    def append(j, _):
        bid = order_ref[0, qi, j]
        sl_src = pl.ds(bid * cb, cb)
        p = p_ref[0, sl_src, :]
        dx = p[:, 0:1] - qx
        dy = p[:, 1:2] - qy
        dz = p[:, 2:3] - qz
        d2 = dx * dx + dy * dy + dz * dz
        ids = jnp.broadcast_to(pid_ref[0, sl_src, :], d2.shape)
        key_scr[pl.ds(j * cb, cb), :] = jnp.where(
            d2 < r2, ids, jnp.int32(_BALL_INVALID))
        return 0

    jax.lax.fori_loop(0, cnt, append, 0)

    # Coarse-tile extraction over the padded compacted region (see
    # _knn_exact_pruned_kernel): INT32_MAX pad keys are >= _BALL_INVALID,
    # so they behave as always-invalid candidates.
    blocks_per_tile = _TM // cb
    n_et = (cnt + blocks_per_tile - 1) // blocks_per_tile

    def fill(j, _):
        key_scr[pl.ds((cnt + j) * cb, cb), :] = jnp.full((cb, qt), big)
        return 0

    jax.lax.fori_loop(0, n_et * blocks_per_tile - cnt, fill, 0)

    last = jnp.full((1, qt), jnp.int32(-(2**31)))
    for i in range(ns):
        def tile(t, carry, last=last):
            r = carry
            keys = key_scr[pl.ds(t * _TM, _TM), :]
            nxt = jnp.min(jnp.where(keys <= last, big, keys), axis=0,
                          keepdims=True)
            return jnp.minimum(r, nxt)

        nxt = jax.lax.fori_loop(
            0, n_et, tile, jnp.full((1, qt), big))
        # Empty tail (no surviving block / exhausted balls) emits
        # INT32_MAX >= _BALL_INVALID — callers' _fill_balls handles it.
        idx_ref[0, i, :] = nxt[0]
        last = nxt


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _exact_pruned_pallas(q_t, p, pid, order, count, k, cb, qt,
                         interpret=False):
    B, _, Np = q_t.shape
    Mp = p.shape[1]
    nbq, nbp = order.shape[1], order.shape[2]
    count = count.reshape(B, 1, nbq)  # SMEM blocks need 3-D layout
    kernel = functools.partial(_knn_exact_pruned_kernel, k, cb)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.int32),
        ),
        grid=(B, Np // qt),
        in_specs=[
            pl.BlockSpec((1, nbq, nbp), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nbq), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 3), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 1), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            # rounded UP to a _TM multiple: the in-kernel pad fill may
            # extend the compacted region to the next extraction tile
            pltpu.VMEM((-(-Mp // _TM) * _TM, qt), jnp.float32),
            pltpu.VMEM((-(-Mp // _TM) * _TM, 1), jnp.int32),
        ],
        # The default 16 MB scoped-vmem budget is within ~100 KB of this
        # kernel's scratch + tile temporaries at qt=256/Mp=8192; embedded
        # in a train step (jvp context) it tips over.  Raise the limit
        # rather than shrinking qt (qt=128 measured 1.13-1.41x slower).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=interpret,
    )(order, count, q_t, p, pid)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _ball_pruned_pallas(q_t, p, pid, order, count, ns, cb, r2, qt,
                        interpret=False):
    B, _, Np = q_t.shape
    Mp = p.shape[1]
    nbq, nbp = order.shape[1], order.shape[2]
    count = count.reshape(B, 1, nbq)  # SMEM blocks need 3-D layout
    kernel = functools.partial(_ball_exact_pruned_kernel, ns, cb, r2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, ns, Np), jnp.int32),
        grid=(B, Np // qt),
        in_specs=[
            pl.BlockSpec((1, nbq, nbp), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nbq), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 3), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 1), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ns, qt), lambda b, q: (b, 0, q),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((-(-Mp // _TM) * _TM, qt), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 2**20),  # see _exact_pruned_pallas
        interpret=interpret,
    )(order, count, q_t, p, pid)


def _pruned_prologue(query, points, cb, qt):
    """Shared Morton-sort + AABB machinery for the pruned-exact paths.

    Returns (q_t (B,3,np_) sorted-padded queries, p_s (B,mp,3) sorted-
    padded points, pid (B,mp,1) original ids (pads at 2^30), q_s
    (B,np_,3) sorted-padded queries channels-last (flash pre-pass input),
    lb2 (B,nbq,nbp) exact AABB-pair lower bounds, qperm_inv (B,N)
    unsort map)."""
    B, N, _ = query.shape
    M = points.shape[1]
    mp = -(-M // cb) * cb
    np_ = -(-N // qt) * qt

    pperm = jnp.argsort(morton_codes(points), axis=-1).astype(jnp.int32)
    p_s = jnp.take_along_axis(
        points.astype(jnp.float32), pperm[..., None], axis=1, mode="clip")
    pid = pperm
    if mp != M:
        # Pads: far away (never selected while >= k real candidates exist)
        # and with huge ids (lose every tie).
        p_s = jnp.pad(p_s, ((0, 0), (0, mp - M), (0, 0)),
                      constant_values=1e6)
        pid = jnp.pad(pid, ((0, 0), (0, mp - M)),
                      constant_values=2**30)

    qperm = jnp.argsort(morton_codes(query), axis=-1).astype(jnp.int32)
    q_s = jnp.take_along_axis(
        query.astype(jnp.float32), qperm[..., None], axis=1, mode="clip")
    if np_ != N:
        # Repeat the LAST sorted query: pad rows stay scene-scale so the
        # per-tile theta max is never poisoned by synthetic far points.
        q_s = jnp.concatenate(
            [q_s, jnp.broadcast_to(q_s[:, -1:], (B, np_ - N, 3))], axis=1)

    nbp = mp // cb
    nbq = np_ // qt
    pvalid = jnp.arange(mp) < M
    p_lo, p_hi = _block_aabb(p_s, pvalid, nbp, cb)
    q_lo, q_hi = _block_aabb(q_s, jnp.ones((np_,), bool), nbq, qt)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            q_lo[:, :, None, :] - p_hi[:, None, :, :],
            p_lo[:, None, :, :] - q_hi[:, :, None, :],
        ),
    )
    lb2 = jnp.sum(gap * gap, axis=-1)              # (B, nbq, nbp)

    inv = jnp.zeros_like(qperm).at[
        jnp.arange(B)[:, None], qperm
    ].set(jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N)))
    return (jnp.swapaxes(q_s, 1, 2), p_s, pid[..., None], q_s,
            lb2, inv)


def _survivor_order(lb2, theta_tile):
    """Compacted survivor block list + count per query tile.

    survive = lb2 <= theta (knn; theta already covers the strict-better
    requirement: pruned blocks have lb2 > theta >= k-th d2, so every
    pruned candidate is STRICTLY worse than the k-th).  Survivors sort
    first in ascending-lb2 order; count = number surviving."""
    survive = lb2 <= theta_tile[..., None]
    keyed = jnp.where(survive, lb2, jnp.inf)
    order = jnp.argsort(keyed, axis=-1).astype(jnp.int32)
    count = jnp.sum(survive, axis=-1).astype(jnp.int32)
    return order, count


def knn_exact_pruned(
    k: int, query: Array, points: Array, cb: int = None,
    qt: int = None, interpret: bool = False,
) -> Tuple[Array, Array]:
    """EXACT KNN with provably-safe Morton-block AABB pruning.

    Same contract as knn_exact (ascending d2, ties toward the lower index,
    d2 in the reference's direct per-coordinate f32 form —
    interpolate_gpu.cu:30-46), bit-equal on-chip.  Measured 0.73-1.01x at
    the model's fwd shapes (survivor fractions are geometry-pinned at
    35-88%, BENCHLOG r4) — kept OPT-IN (OGC_PALLAS_EXACT_PRUNE=knn) for
    sparser workloads; the ball variant below wins and ships as default.
    Mechanism: a flash (approximate) pre-pass yields a per-query upper bound
    theta on the true k-th d2 (a thinned subset's k-th distance can only
    overestimate; _theta_inflate covers its packed-key truncation), each
    Morton-coherent query tile takes theta_tile = max over its queries,
    and every candidate block whose exact AABB lower bound exceeds
    theta_tile is skipped — such a block's candidates are all STRICTLY
    worse than any query's k-th neighbor.  The exact removal-extraction
    then runs over only the surviving blocks (dynamic count per tile).
    Worst case (nothing prunable) degrades to ~knn_exact + the flash
    pre-pass.  Fully deterministic; results bit-equal to knn_exact.
    """
    B, N, _ = query.shape
    M = points.shape[1]
    assert k <= M, (k, M)
    cb = cb or _CB_EXACT
    mp = -(-M // cb) * cb
    if qt is None:
        qt = int(_PRUNE_QT_ENV) if _PRUNE_QT_ENV else _exact_qt(mp, N)
    q_t, p_s, pid, q_s, lb2, inv = _pruned_prologue(query, points, cb, qt)
    np_ = q_t.shape[2]

    # Flash pre-pass on the SORTED queries (so theta rides tiles directly)
    # against ORIGINAL-order points (Morton-sorted candidates would
    # collide in the flash thinning groups and loosen theta).  High recall
    # target -> small thinning blocks -> tight theta.
    fd, _ = knn_blockmin(k, q_s, points, recall_target=0.98,
                         interpret=interpret)
    theta = (fd[..., k - 1].astype(jnp.float32) ** 2) * _theta_inflate(M)
    theta_tile = jnp.max(theta.reshape(B, np_ // qt, qt), axis=-1)
    order, count = _survivor_order(lb2, theta_tile)

    dist, idx = _exact_pruned_pallas(
        q_t, p_s, pid, order, count, k, cb, qt, interpret)
    dist = jnp.swapaxes(dist, 1, 2)[:, :N]
    idx = jnp.swapaxes(idx, 1, 2)[:, :N]
    dist = jnp.take_along_axis(dist, inv[..., None], axis=1, mode="clip")
    idx = jnp.take_along_axis(idx, inv[..., None], axis=1, mode="clip")
    return dist, idx


def ball_query_exact_pruned(
    radius: float, nsample: int, xyz: Array, new_xyz: Array,
    cb: int = None, qt: int = None, interpret: bool = False,
) -> Array:
    """EXACT ball query with static AABB pruning: a block whose lower
    bound to the query tile is >= r^2 cannot contain a strictly-in-radius
    point (d2 < r^2 is the reference's membership test,
    ball_query_gpu.cu:9-45).  Extraction emits the nsample LOWEST original
    in-radius indices over surviving blocks only.  Same output contract as
    ball_query_exact (invalid entries >= _BALL_INVALID)."""
    B, N, _ = new_xyz.shape
    M = xyz.shape[1]
    assert nsample <= M, (nsample, M)
    cb = cb or _CB_EXACT
    mp = -(-M // cb) * cb
    if qt is None:
        qt = int(_PRUNE_QT_ENV) if _PRUNE_QT_ENV else _exact_qt(mp, N)
    q_t, p_s, pid, _, lb2, inv = _pruned_prologue(new_xyz, xyz, cb, qt)

    r2 = float(radius) * float(radius)
    survive = lb2 < r2
    keyed = jnp.where(survive, lb2, jnp.inf)
    order = jnp.argsort(keyed, axis=-1).astype(jnp.int32)
    count = jnp.sum(survive, axis=-1).astype(jnp.int32)

    idx = _ball_pruned_pallas(
        q_t, p_s, pid, order, count, nsample, cb, r2, qt, interpret)
    idx = jnp.swapaxes(idx, 1, 2)[:, :N]
    return jnp.take_along_axis(idx, inv[..., None], axis=1, mode="clip")


# ---------------------------------------------------------------------------
# Candidate-pruned KNN: Morton-block AABB bounds + per-tile candidate blocks
# ---------------------------------------------------------------------------

_CB = 128   # candidate block: consecutive Morton-sorted points per AABB
_PQT = 128  # pruned-kernel query tile (small => tight query AABBs; the
            # bound is vacuous when a tile spans a large fraction of the
            # scene, so tiles stay at one vreg of lanes)


def _expand_bits10(v: Array) -> Array:
    """Spread the low 10 bits of v to every 3rd bit (3-D Morton interleave)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_codes(pc: Array) -> Array:
    """30-bit Morton (z-order) codes of (B, N, 3) points, quantized to the
    per-batch-element AABB.  Consecutive points in code order are spatially
    coherent — the blocking basis for candidate pruning."""
    lo = jnp.min(pc, axis=1, keepdims=True)
    hi = jnp.max(pc, axis=1, keepdims=True)
    u = (pc - lo) / jnp.maximum(hi - lo, 1e-6) * 1023.0
    u = jnp.clip(u, 0.0, 1023.0).astype(jnp.int32)
    return (
        (_expand_bits10(u[..., 0]) << 2)
        | (_expand_bits10(u[..., 1]) << 1)
        | _expand_bits10(u[..., 2])
    )


def _knn_pruned_kernel(k, blk, idx_bits, n_cand, cb, cand_ref, q_ref, p_ref,
                       perm_ref, dist_ref, idx_ref, keys_scr):
    """Pruned variant of _knn_kernel: instead of sweeping every candidate
    tile, loop only the `n_cand` Morton blocks pre-selected for this query
    tile (cand_ref, SMEM scalars), dynamic-slicing each from the sorted
    cloud.  Keys carry the ORIGINAL point index (perm_ref payload), so
    outputs need no remap gather and in-band ties resolve by lower original
    index — the reference tie rule (interpolate_gpu.cu:30-46).

    cand_ref holds the WHOLE (n_tiles, n_cand) candidate table for this
    batch element (Mosaic requires the last two block dims to span the
    array or be 8/128-multiples — a (1, 1, n_cand) block does not lower);
    the kernel picks its tile's row by program_id."""
    qi = pl.program_id(1)
    qx = q_ref[0, 0:1, :]            # (1, QT) rows
    qy = q_ref[0, 1:2, :]
    qz = q_ref[0, 2:3, :]
    mask_low = jnp.int32((1 << idx_bits) - 1)

    def _block_d2_ids(bid):
        sl = pl.ds(bid * cb, cb)
        p = p_ref[0, sl, :]          # (cb, 3)
        ids = perm_ref[0, sl, :]     # (cb, 1) original indices
        px = p[:, 0:1]
        py = p[:, 1:2]
        pz = p[:, 2:3]
        dx = px - qx                 # (cb, QT)
        dy = py - qy
        dz = pz - qz
        return dx * dx + dy * dy + dz * dz, ids

    # Thinning must decorrelate from Morton coherence: a thinning group
    # takes the SAME within-block position from `blk` DIFFERENT candidate
    # blocks (distant regions), so two true neighbors (consecutive sorted
    # positions) almost never share a group.  Grouping consecutive sorted
    # positions instead collides maximally — a coherent run of true
    # neighbors thins to one survivor (measured recall collapse
    # 0.97 -> ~0.5 at blk=4); the flash kernel gets away with it only
    # because its input order is FPS/random.  blk == 1 packs every
    # candidate as its own key (no thinning).
    def cstep(ch, _):
        d2, ids = _block_d2_ids(cand_ref[0, qi, ch * blk])
        if blk == 1:
            keys = (pltpu.bitcast(d2, jnp.int32) & ~mask_low) | ids
        else:
            vmin = d2
            amin = jnp.broadcast_to(ids, d2.shape)
            for i in range(1, blk):
                d2i, idsi = _block_d2_ids(cand_ref[0, qi, ch * blk + i])
                idsb = jnp.broadcast_to(idsi, d2.shape)
                # Ties keep the LOWER ORIGINAL index (the documented
                # contract) — candidate-block order is bound/centroid
                # order, not index order.
                take = (d2i < vmin) | ((d2i == vmin) & (idsb < amin))
                amin = jnp.where(take, idsb, amin)
                vmin = jnp.where(take, d2i, vmin)
            keys = (pltpu.bitcast(vmin, jnp.int32) & ~mask_low) | amin
        keys_scr[pl.ds(ch * cb, cb), :] = keys
        return 0

    jax.lax.fori_loop(0, n_cand // blk, cstep, 0)

    keys = keys_scr[:, :]            # (n_cand * g, QT)
    last = jnp.full((1, keys.shape[1]), jnp.int32(-(2**31)))
    big = jnp.int32(2**31 - 1)
    for i in range(k):
        nxt = jnp.min(jnp.where(keys <= last, big, keys), axis=0,
                      keepdims=True)                       # (1, QT)
        idx_ref[0, i, :] = (nxt & mask_low)[0]
        d2_sel = pltpu.bitcast(nxt & ~mask_low, jnp.float32)
        dist_ref[0, i, :] = jnp.sqrt(jnp.maximum(d2_sel, 0.0))[0]
        last = nxt


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _knn_pruned_pallas(q_t: Array, p: Array, perm: Array, cand: Array,
                       k: int, blk: int, cb: int, qt: int,
                       interpret: bool = False) -> Tuple[Array, Array]:
    """:param q_t: (B, 3, Np) Morton-sorted queries, Np multiple of qt.
    :param p: (B, Mp, 3) Morton-sorted points (pads at 1e6).
    :param perm: (B, Mp, 1) int32 original index of each sorted point.
    :param cand: (B, Np//qt, n_cand) int32 candidate block ids."""
    B, _, Np = q_t.shape
    Mp = p.shape[1]
    n_cand = cand.shape[-1]
    idx_bits = max(1, (Mp - 1).bit_length())
    kernel = functools.partial(
        _knn_pruned_kernel, k, blk, idx_bits, n_cand, cb
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.int32),
        ),
        grid=(B, Np // qt),
        in_specs=[
            pl.BlockSpec((1, Np // qt, n_cand), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 3), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 1), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, qt), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n_cand * cb // blk, qt), jnp.int32)],
        interpret=interpret,
    )(cand, q_t, p, perm)


def _block_aabb(x: Array, valid: Array, nb: int, cb: int):
    """Per-block AABB over Morton-sorted (B, nb*cb, 3) points, pad-masked."""
    big = jnp.float32(1e9)
    xb = x.reshape(x.shape[0], nb, cb, 3)
    vb = valid.reshape(1, nb, cb, 1)
    lo = jnp.min(jnp.where(vb, xb, big), axis=2)    # (B, nb, 3)
    hi = jnp.max(jnp.where(vb, xb, -big), axis=2)
    return lo, hi


def knn_pruned(
    k: int,
    query: Array,
    points: Array,
    n_cand_blocks: int | None = None,
    recall_target: float = 0.95,
    blk: int | None = None,
    cb: int = _CB,
    qt: int = _PQT,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Candidate-pruned approximate KNN (Morton-block AABB bounds).

    Both clouds are Morton-sorted; the candidate cloud is cut into blocks
    of _CB consecutive sorted points (spatially coherent), each query tile
    of _PQT sorted queries selects its `n_cand_blocks` nearest candidate
    blocks by exact AABB-pair lower bound, and the fused kernel runs the
    flash-KNN distance + block-min + k-extraction over ONLY those
    candidates — cutting distance work ~Mp/(n_cand * _CB) vs knn_blockmin.

    Recall characteristics: a true neighbor is missed when its whole block
    is pruned (query-tile AABB bound too loose — unlike the flash kernel,
    top-1 exactness is NOT guaranteed) or by block-min thinning (same bound
    as knn_blockmin).  Adaptive per-tile block selection by geometric lower
    bound is what makes this viable where a fixed Morton window was not;
    quality-gated by tests + the ablation harness.

    :return: (dist (B, N, k) sqrt f32, idx (B, N, k) int32), ascending,
        in-band ties toward lower ORIGINAL index.
    """
    B, N, _ = query.shape
    M = points.shape[1]
    nbp = -(-M // cb)
    if n_cand_blocks is None:
        # Target candidate pool: enough for recall headroom at the model's
        # densities — ~M/3 but never fewer than 8k points' worth.
        n_cand_blocks = max(2, -(-max(8 * k, M // 3) // cb))
    n_cand_blocks = min(n_cand_blocks, nbp)
    if blk is None:
        # Cross-block thinning (see kernel comment) keeps the recall cost
        # near the random-collision model ~ (k-1)*blk/(2*n_cand*cb).
        blk = 2 if n_cand_blocks * cb >= 16 * k else 1
    # The kernel consumes candidate blocks in chunks of `blk`: round the
    # request UP (never down — callers calibrate recall against it),
    # shrinking blk when the round-up would exceed the block count.
    while blk > 1 and -(-n_cand_blocks // blk) * blk > nbp:
        blk //= 2
    n_cand_blocks = -(-n_cand_blocks // blk) * blk
    if n_cand_blocks >= nbp:
        return knn_blockmin(k, query, points, recall_target=recall_target,
                            interpret=interpret)
    # Real candidates even if the pad-tail block is selected.
    assert n_cand_blocks * cb - (cb - 1) >= k, (n_cand_blocks, cb, k)

    # Morton-sort both clouds.
    qperm = jnp.argsort(morton_codes(query), axis=-1)
    pperm = jnp.argsort(morton_codes(points), axis=-1).astype(jnp.int32)
    q_s = jnp.take_along_axis(query, qperm[..., None], axis=1, mode="clip")
    p_s = jnp.take_along_axis(points, pperm[..., None], axis=1, mode="clip")

    mp = nbp * cb
    np_ = -(-N // qt) * qt
    p_s = p_s.astype(jnp.float32)
    if mp != M:
        p_s = jnp.pad(p_s, ((0, 0), (0, mp - M), (0, 0)),
                      constant_values=1e6)
        pperm = jnp.pad(pperm, ((0, 0), (0, mp - M)),
                        constant_values=(1 << max(1, (mp - 1).bit_length())) - 1)
    q_sp = q_s.astype(jnp.float32)
    if np_ != N:
        q_sp = jnp.pad(q_sp, ((0, 0), (0, np_ - N, ), (0, 0)),
                       constant_values=1e6)

    # Pad-masked per-block AABBs and exact AABB-pair lower bounds.
    pvalid = (jnp.arange(mp) < M)
    qvalid = (jnp.arange(np_) < N)
    p_lo, p_hi = _block_aabb(p_s, pvalid, nbp, cb)
    nbq = np_ // qt
    q_lo, q_hi = _block_aabb(q_sp, qvalid, nbq, qt)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            q_lo[:, :, None, :] - p_hi[:, None, :, :],
            p_lo[:, None, :, :] - q_hi[:, :, None, :],
        ),
    )
    lb2 = jnp.sum(gap * gap, axis=-1)              # (B, nbq, nbp)
    # Overlapping blocks all bound to exactly 0 — break those ties by
    # centroid distance (an expected-proximity proxy), scaled down so true
    # lower-bound ordering still dominates where bounds are informative.
    c2c = jnp.sum(
        ((q_lo + q_hi)[:, :, None, :] - (p_lo + p_hi)[:, None, :, :]) ** 2,
        axis=-1,
    )
    _, cand = jax.lax.top_k(-(lb2 + 1e-3 * c2c), n_cand_blocks)
    cand = cand.astype(jnp.int32)

    q_t = jnp.swapaxes(q_sp, 1, 2)
    dist, idx = _knn_pruned_pallas(q_t, p_s, pperm[..., None], cand, k, blk,
                                   cb, qt, interpret)
    dist = jnp.swapaxes(dist, 1, 2)[:, :N]         # sorted-query order
    idx = jnp.swapaxes(idx, 1, 2)[:, :N]
    # Un-sort back to the caller's query order.
    inv = jnp.zeros_like(qperm).at[
        jnp.arange(B)[:, None], qperm
    ].set(jnp.broadcast_to(jnp.arange(N), (B, N)))
    dist = jnp.take_along_axis(dist, inv[..., None], axis=1, mode="clip")
    idx = jnp.take_along_axis(idx, inv[..., None], axis=1, mode="clip")
    return dist, idx


def pick_block(m: int, k: int, recall_target: float = 0.95) -> int:
    """Largest block size keeping expected recall >= target:
    E[missed]/k ~ (k-1) / (2 * M/blk)  =>  blk <= 2 M (1-r) / (k-1)."""
    if k <= 1:
        return 32  # top-1 always survives block-min
    cap = int(2 * m * (1.0 - recall_target) / (k - 1))
    for blk in (32, 16, 8, 4):
        if blk <= cap:
            return blk
    return 4


def knn_blockmin(
    k: int,
    query: Array,
    points: Array,
    recall_target: float = 0.95,
    blk: int | None = None,
    interpret: bool = False,
    extract: str | None = None,
    d2_mode: str | None = None,
) -> Tuple[Array, Array]:
    """Approximate KNN via the fused Pallas kernel (see module docstring).

    :param query: (B, N, 3); :param points: (B, M, 3).
    :return: (dist (B, N, k) sqrt-distances f32, idx (B, N, k) int32),
        ascending, ties toward lower index.
    """
    B, N, _ = query.shape
    M = points.shape[1]
    if blk is None:
        blk = pick_block(M, k, recall_target)
    while blk > 4 and -(-M // blk) < k:
        blk //= 2  # need >= k real block winners
    assert -(-M // blk) >= k, (M, blk, k)

    mp = -(-M // _TM) * _TM
    np_ = -(-N // _QT) * _QT
    p = points.astype(jnp.float32)
    if mp != M:
        # Far-away pads: never selected while >= k real blocks exist.
        p = jnp.pad(p, ((0, 0), (0, mp - M), (0, 0)), constant_values=1e6)
    q_t = jnp.swapaxes(query, 1, 2).astype(jnp.float32)
    if np_ != N:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, np_ - N)))

    dist, idx = _knn_pallas(q_t, p, k, blk, interpret,
                            extract=_extract_mode(mp // blk, k, extract),
                            d2_mode=d2_mode or _D2_ENV)
    dist = jnp.swapaxes(dist, 1, 2)[:, :N]
    idx = jnp.swapaxes(idx, 1, 2)[:, :N]
    return dist, idx


def ball_query_blockmin(
    radius: float,
    nsample: int,
    xyz: Array,
    new_xyz: Array,
    recall_target: float = 0.95,
    blk: int | None = None,
    interpret: bool = False,
    extract: str | None = None,
    d2_mode: str | None = None,
) -> Array:
    """Ball query via the fused kernel's ball mode (see _knn_kernel).

    :param xyz: (B, M, 3) points; :param new_xyz: (B, N, 3) centers.
    :return: candidate keys (B, N, nsample) int32, ascending by index —
        in-radius candidate indices, >= _BALL_INVALID past the in-radius
        count.  Callers apply the reference padding (first-point repeat /
        zero rows) — ops.core.ball_query does.

    Deviation (approximate mode only): block-min thinning keeps ONE
    in-radius index per `blk` candidates, so crowded balls are filled with
    a block-STRATIFIED subsample instead of the reference's first
    `nsample` consecutive indices (extreme case: all-inside returns
    0, blk, 2*blk, ...).  The first slot is always the true lowest
    in-radius index, every member is genuinely in radius, and point order
    after FPS downsampling is spatially random — so for the smoothness
    losses (the only consumers) this is statistically equivalent sampling
    of the ball.  Eval CLIs default to exact=True which bypasses this
    path entirely; the exact-vs-approx ablation quantifies the end-to-end
    effect.
    """
    B, N, _ = new_xyz.shape
    M = xyz.shape[1]
    if blk is None:
        blk = pick_block(M, nsample, recall_target)
    while blk > 4 and -(-M // blk) < nsample:
        blk //= 2
    assert -(-M // blk) >= nsample, (M, blk, nsample)

    mp = -(-M // _TM) * _TM
    np_ = -(-N // _QT) * _QT
    p = xyz.astype(jnp.float32)
    if mp != M:
        p = jnp.pad(p, ((0, 0), (0, mp - M), (0, 0)), constant_values=1e6)
    q_t = jnp.swapaxes(new_xyz, 1, 2).astype(jnp.float32)
    if np_ != N:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, np_ - N)))

    _, idx = _knn_pallas(
        q_t, p, nsample, blk, interpret,
        ball_r2=float(radius) * float(radius),
        extract=_extract_mode(mp // blk, nsample, extract),
        d2_mode=d2_mode or _D2_ENV,
    )
    return jnp.swapaxes(idx, 1, 2)[:, :N]
