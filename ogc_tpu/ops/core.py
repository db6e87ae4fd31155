"""TPU-native point-cloud primitives.

These are the XLA-level equivalents of the reference's `pointnet2_cuda`
extension (reference: pointnet2/pointnet2.py, pointnet2/src/*.cu).  They are
designed channels-LAST — features are (B, N, C) with C on the TPU lane
dimension — which is the natural layout for the MXU/VPU, unlike the
channels-first (B, C, N) CUDA layout of the reference.

Semantic parity notes (each op reproduces the reference's tie-breaking and
padding quirks, which downstream losses/models depend on):

* `furthest_point_sample` — greedy FPS seeded at index 0, ties resolved to the
  lowest index (reference: pointnet2/src/sampling_gpu.cu:93-253, seed at
  :113-115, strict `>` update at :136-137).
* `knn` — brute-force k-nearest-neighbors returning *sqrt* distances and
  indices ordered ascending with ties broken by lower index (reference:
  pointnet2/src/interpolate_gpu.cu:9-57; sqrt applied in
  pointnet2/pointnet2.py:103).
* `ball_query` — first `nsample` in-radius (strict `d2 < r2`) points in index
  order, padded with the first in-radius point, all-zeros if the ball is empty
  (reference: pointnet2/src/ball_query_gpu.cu:9-45).
* `query_and_group` — KNN + radius clamp: out-of-radius neighbors are replaced
  by the nearest neighbor's index (reference: pointnet2/pointnet2.py:281-301).

Gradients come from JAX autodiff: `gather`/`group`/`three_interpolate` are
`jnp.take_along_axis` compositions whose VJPs are XLA scatter-adds —
deterministic, unlike the reference's atomicAdd backward kernels
(sampling_gpu.cu:62, group_points_gpu.cu:24).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


Array = jax.Array

# Remat-policy tag for index outputs (knn / ball_query /
# furthest_point_sample).  Neighbor selection is DISCONTINUOUS in the
# coordinates: under jax.checkpoint the backward-pass recompute may fuse the
# distance computation differently, flip a near-tie neighbor, and route
# gradients through a different gather pattern than the primal forward
# (observed: loss bit-equal, gradient tree 99% mismatched under full remat
# of the flow model).  Tagging the indices lets the trainers' remat
# policies pin them as saved residuals — int32 indices are a rounding
# error next to the activations remat exists to free.  A no-op without an
# active checkpoint policy.
NEIGHBOR_IDX_CHECKPOINT_NAME = "neighbor_idx"


def _tag_idx(idx: Array) -> Array:
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(idx, NEIGHBOR_IDX_CHECKPOINT_NAME)

# Query-chunk size for brute-force neighbor searches.  Bounds the materialized
# (chunk, M) distance tile so 8192x8192 problems stay well inside VMEM-friendly
# working sets; XLA pipelines the sequential chunks.
_DEFAULT_CHUNK = 4096

# Neighbor searches default to the TPU-native approximate top-k
# (jax.lax.approx_max_k, the PartialReduce unit): measured 9-11x faster than
# exact top_k at 8192 points with >=0.95 recall.  The missing neighbors are
# interchangeable with marginally-farther ones for max-pooled SA features and
# smoothness losses; the true nearest neighbor (used by the radius clamp and
# 1-NN ops) survives the final exact aggregation.  Pass exact=True for
# bitwise reference semantics (oracle tests, parity checks).  On CPU the
# approximate path lowers to an exact computation.
_EXACT_DEFAULT = os.environ.get("OGC_EXACT_NEIGHBORS", "") in ("1", "on")
# (env opt-in so subprocess-driven parity runs — tools/protocol_sapien.py
# — can pin exact search without touching the CLI surface.)
# Recall targets: large-k SA grouping tolerates more misses than the k=3
# interpolation stencil.
_RECALL_LARGE_K = 0.95
_RECALL_SMALL_K = 0.99

# Exact neighbor searches dispatch to the fused Pallas exact kernels
# (pallas_knn.knn_exact / ball_query_exact) on a single TPU; "off" restores
# the XLA materialize+top_k paths.  Read at import (trace-time static, like
# OGC_PALLAS_KNN_EXTRACT): set before process start for A/B runs.
_PALLAS_EXACT_ENV = os.environ.get("OGC_PALLAS_KNN_EXACT", "on")

# Bound-pruned exact kernels (pallas_knn.knn_exact_pruned /
# ball_query_exact_pruned): Morton-block AABB pruning with a provable
# theta bound — bit-equal results, several-fold faster at scene scale
# (on-chip A/B: BENCHLOG r4).  "off" restores the unpruned exact kernels.
_PALLAS_EXACT_PRUNE_ENV = os.environ.get("OGC_PALLAS_EXACT_PRUNE", "on")
# Pruning pays a flash pre-pass + Morton sort; below these sizes the
# unpruned kernel's full scan is already cheap (A/B-calibrated gates).
_PRUNE_MIN_M = 4096
_PRUNE_MIN_N = 1024

# Certified-MXU exact KNN (VERDICT r4 #4 arm): "mxu_cert" routes exact
# dispatch through pallas_knn.knn_exact_mxu_certified (expanded-form d2
# on the MXU, k+extra direct-form re-resolution, per-query exactness
# certificate with bit-faithful fallback).  Opt-in for end-to-end parity
# A/Bs (tools/bench_exact_mxu_cert.py drives the decision); default off.
_PALLAS_EXACT_D2_ENV = os.environ.get("OGC_PALLAS_EXACT_D2", "vpu")


def set_exact_neighbors(exact: bool) -> None:
    """Globally toggle exact neighbor search (default False = approximate)."""
    global _EXACT_DEFAULT
    _EXACT_DEFAULT = exact


def exact_neighbors() -> bool:
    """Current exact-mode default.  NOTE: like the ops' `exact=None`
    resolution, callers branching on this inside a jitted function bake in
    the value at first trace (jit caches on the traced graph) — fine for
    mode-per-program use, wrong for toggling under one jitted callable."""
    return _EXACT_DEFAULT


def square_distance(a: Array, b: Array) -> Array:
    """Pairwise squared L2 distances.

    :param a: (..., N, 3)
    :param b: (..., M, 3)
    :return: (..., N, M) squared distances.

    Computed with the direct (diff ** 2) form rather than the |a|^2 - 2ab + |b|^2
    expansion when N*M is small enough; the expansion (one MXU matmul) is used
    for large problems.  The direct form is numerically exact, matching the
    reference CUDA kernels which accumulate coordinate differences.
    """
    # The matmul expansion maps onto the MXU and is the right choice for the
    # large (8192^2) problems; its worst-case numerical error (~1e-6 on unit
    # scale) is below every radius threshold used by the models.
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    # HIGHEST precision: full-f32 MXU passes.  The TPU default (bf16) loses
    # ~1e-2 on unit-scale distances, which breaks neighbor ordering parity.
    inner = jnp.einsum(
        "...nd,...md->...nm",
        a,
        b,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d2 = a2 - 2.0 * inner + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


def _exact_square_distance(a: Array, b: Array) -> Array:
    """Exact (non-MXU) squared distances; used where bitwise tie behavior of
    the reference's per-coordinate accumulation matters (small N only)."""
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


# ---------------------------------------------------------------------------
# Furthest point sampling
# ---------------------------------------------------------------------------


def furthest_point_sample(xyz: Array, npoint: int) -> Array:
    """Iterative furthest point sampling.

    :param xyz: (B, N, 3) float array.
    :param npoint: number of points to sample (static).
    :return: (B, npoint) int32 indices.

    Reference: pointnet2/src/sampling_gpu.cu:93-253.  Deterministic — always
    seeds index 0 and breaks ties toward the lower index.

    Dispatch: on TPU a Pallas kernel keeps the coordinates and the running
    min-distance buffer resident in VMEM across all greedy steps (measured
    1.25-10.6x faster than the XLA fori_loop, growing with N); CPU and
    VMEM-exceeding shapes use the XLA loop.  Both paths break exact d2
    ties toward the lower index (the reference's strict `>` update;
    in-kernel explicit first-max-wins — Mosaic's argmax lowering does not
    guarantee it).  Residual cross-path divergence: the XLA loop's fused
    d2 FMA-contracts while the kernel's does not, so candidates whose
    min-d2 differ by <= 1 ulp can select in either order (measured ~1e-4
    of steps on continuous random clouds; grid-quantized clouds are
    bit-identical).  Each path is individually deterministic.
    """
    xyz = jax.lax.stop_gradient(xyz)  # search oracle (see ops.knn)
    B, N, _ = xyz.shape
    # 4 VMEM-resident (B, N) f32 buffers; stay well under the ~16 MB VMEM.
    # N must be lane-aligned (Mosaic requires 128-multiples for the (B, N)
    # vector ops in the kernel).  Batches whose B*N exceeds the VMEM budget
    # are processed in sequential batch chunks (fleet batch sizes like
    # B=128 x N=8192 stay on the kernel instead of silently falling back
    # to the 10-16x slower XLA loop).
    # N >= 256: at N == 128 (a single lane tile) Mosaic fails to legalize
    # the kernel's argmax lowering ("unrealized_conversion_cast
    # vector<8x128xf32> -> i32", hit by the flow encoder's 128-point level
    # in the on-TPU training smoke); the XLA loop is fast at such sizes.
    if pallas_available() and N % 128 == 0 and N >= 256:
        from ogc_tpu.ops.pallas_kernels import fps_pallas_chunked

        return _tag_idx(fps_pallas_chunked(xyz, npoint))
    return _tag_idx(_furthest_point_sample_xla(xyz, npoint))


@functools.partial(jax.jit, static_argnums=(1,))
def _furthest_point_sample_xla(xyz: Array, npoint: int) -> Array:
    """XLA fori_loop FPS (reference semantics; see furthest_point_sample)."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(i, state):
        min_d2, idxs, last = state
        # (B, 3) coordinates of the most recently selected point.
        last_xyz = jnp.take_along_axis(
            xyz, last[:, None, None], axis=1, mode="clip"
        )
        d2 = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # (B, N)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)  # first max wins
        idxs = idxs.at[:, i].set(nxt)
        return min_d2, idxs, nxt

    idxs0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    init = (
        jnp.full((B, N), 1e10, dtype=jnp.float32),
        idxs0,
        jnp.zeros((B,), dtype=jnp.int32),
    )
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, init)
    return idxs


def in_manual_spmd() -> bool:
    """Trace-time: are we inside a shard_map (manual SPMD) region?  There
    every array is the per-device local shard, so single-device reasoning
    (flat-take gathers, Mosaic kernels) applies again.  Detected via the
    trace's named-axis environment, which shard_map binds and nested jits
    inherit; plain GSPMD jit leaves it empty."""
    try:
        from jax._src import core as _core

        return bool(_core.nonempty_axis_env())
    except Exception:  # private API moved — fail toward the safe path
        return False


def manual_data_axis():
    """(axis_name, size) of the data-parallel mesh axis when tracing inside
    a shard_map that binds it, else None.  Lets batch-statistics layers
    (SchedulableBatchNorm) pmean their moments so manual-SPMD training
    matches GSPMD's global-batch statistics exactly.  The framework's
    meshes are all 1-D over parallel.mesh.DATA_AXIS ("data")."""
    try:
        from jax._src import core as _core

        sizes = dict(_core.get_axis_env().axis_sizes)
    except Exception:
        return None
    return ("data", int(sizes["data"])) if "data" in sizes else None


_BN_LOCAL_STATS = [False]


class bn_local_stats:
    """Trace-time context: inside it, SchedulableBatchNorm layers in a
    manual-SPMD region normalize with PER-DEVICE local batch statistics and
    skip their in-layer pmeans (torch DataParallel semantics — the reference
    under nn.DataParallel computes per-replica BatchNorm stats, it never
    syncs them).  The trainer then syncs the running-statistics pytree with
    ONE fused all-reduce per step (lax.pmean over the whole tree lowers to a
    single tuple-operand all-reduce) instead of 2 latency-bound collectives
    per BatchNorm application (~200/step through the FlowStep3D unroll).

    Entered INSIDE the traced step function so every (re)trace resolves the
    flag from its own body — not an ambient module-global read (CLAUDE.md
    jit-cache quirk).  Running-variance deviation vs global-stat sync: the
    per-step pmean of the devices' linear updates misses the between-shard
    mean-spread term E[(mu_i - mu)^2] (~var/B_local), an eval-only effect
    bounded well below BN epsilon at production batch sizes."""

    def __init__(self, enable: bool = True):
        self.enable = enable

    def __enter__(self):
        _BN_LOCAL_STATS.append(self.enable)
        return self

    def __exit__(self, *exc):
        _BN_LOCAL_STATS.pop()
        return False


def bn_local_stats_active() -> bool:
    return _BN_LOCAL_STATS[-1]


def pallas_available() -> bool:
    """True when Mosaic kernels can lower: TPU backend AND either a
    single-device process or a fully-manual shard_map region.  jax's
    tpu_custom_call raises "Mosaic kernels cannot be automatically
    partitioned. Please wrap the call in a shard_map." under multi-device
    GSPMD lowering (jax/_src/tpu_custom_call.py) but lowers fine when all
    mesh axes are manual — which is how dp_eval_fwd's serving path keeps
    the kernels on a mesh.  Outside shard_map, multi-chip falls back to
    the XLA paths, which GSPMD shards.  Device count is fixed per process
    — the trace-time read is stable."""
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or in_manual_spmd()


# ---------------------------------------------------------------------------
# Gather / group
# ---------------------------------------------------------------------------


def _flat_take(points: Array, flat_idx: Array) -> Array:
    """Row gather by per-batch index: (B, N, C) x (B, K) -> (B, K, C).

    Two lowerings, selected at trace time (OGC_GATHER_TAKE=flat|batched|auto):

    - "flat": one global take over the flattened (B*N, C) source with
      batch-offset indices.  Measured ~1.7x faster than per-batch
      take_along_axis on a SINGLE TPU chip (gather cost is per-row,
      independent of row width).  But flattening merges the batch axis the
      mesh shards on, so under data parallelism GSPMD must all-gather the
      ENTIRE feature table to every device before each gather (HLO-audited:
      30 all-gathers per sharded train step) — defeating DP scaling.
    - "batched": take_along_axis keeps the batch axis, so gathers stay
      shard-local on a mesh.
    - "auto" (default): batched when the process sees >1 device, flat on a
      single chip.  Device count is fixed per process, so the trace-time
      read is stable.

    mode="clip" matters in both: jnp.take's default fill mode lowers to
    gather + select_n over the FULL gathered tensor (an extra (rows, C)
    read+write per gather — profiled at ~1.5 ms per 0.5M x 131 f32 call,
    one per grouped op).  Neighbor indices here are in-bounds by
    construction, so clipping is a no-op semantically.
    """
    import os

    # Experimental (OGC_GATHER_F32=on): gather bf16 tables as f32 — the r4
    # microbench measured bf16 rows ~30% slower per row than f32 (9.25 vs
    # 7.17 ns, width-independent), so paying one table-sized cast per S
    # gathered rows could win.  A/B: tools/bench_gather_dtype.py.
    cast_back = None
    if (os.environ.get("OGC_GATHER_F32") == "on"
            and points.dtype == jnp.bfloat16):
        cast_back = points.dtype
        points = points.astype(jnp.float32)

    def _out(x):
        return x.astype(cast_back) if cast_back is not None else x

    mode = os.environ.get("OGC_GATHER_TAKE", "auto")
    if mode == "auto":
        # Inside shard_map the arrays are per-device local — flat-take's
        # batch-folding is harmless there and keeps its 1.7x.
        single = jax.device_count() == 1 or in_manual_spmd()
        mode = "flat" if single else "batched"
    if mode == "batched":
        return _out(jnp.take_along_axis(
            points, flat_idx.astype(jnp.int32)[..., None], axis=1,
            mode="clip",
        ))
    B, N, C = points.shape
    offs = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    gi = (flat_idx.astype(jnp.int32) + offs).reshape(-1)
    out = jnp.take(points.reshape(B * N, C), gi, axis=0, mode="clip")
    return _out(out.reshape(B, flat_idx.shape[1], C))


def gather(points: Array, idx: Array) -> Array:
    """Gather points by index along the N axis.

    :param points: (B, N, C).
    :param idx: (B, M) integer indices.
    :return: (B, M, C).

    Channels-last analogue of the reference's `gather_operation`
    (pointnet2/pointnet2.py:45-78); backward is an XLA scatter-add.
    """
    return _flat_take(points, idx)


def group(points: Array, idx: Array,
          scatter_kernel_bwd: bool = False) -> Array:
    """Gather neighborhoods of points.

    :param points: (B, N, C).
    :param idx: (B, M, S) integer indices into N.
    :param scatter_kernel_bwd: route the backward scatter-add through the
        Pallas VMEM-accumulator kernel (ops/pallas_scatter.py).  OPT-IN:
        measured 1.7x faster than XLA's scatter for the smoothness losses'
        near-uniform full-cloud neighbor tables (FPS-shuffled point order),
        but SLOWER than XLA on the models' spatially clustered gather
        backwards (bench_train A/B: base step 306 -> 356 ms when routed
        blanketly) — callers enable it where their index distribution
        matches.  OGC_PALLAS_SCATTER=off/narrow/all overrides for
        experiments.
    :return: (B, M, S, C).

    Channels-last analogue of `grouping_operation`
    (pointnet2/pointnet2.py:190-230, src/group_points_gpu.cu).
    """
    import os

    from ogc_tpu.ops.pallas_scatter import scatter_path_applicable

    B, M, S = idx.shape
    N, C = points.shape[-2], points.shape[-1]
    from ogc_tpu.ops.pallas_onehot import onehot_path_applicable

    if onehot_path_applicable(N, M * S, C):
        # One-hot-matmul path (r5): gather AND backward scatter as MXU
        # matmuls — beats the flat ~7.1 ns/row gather wall for small
        # sources (ops/pallas_onehot.py; on-chip A/B in
        # tools/bench_group_onehot.py).  OGC_GROUP_ONEHOT gates.
        from ogc_tpu.ops.pallas_onehot import group_onehot

        return group_onehot(points, idx, N)
    mode = os.environ.get("OGC_PALLAS_SCATTER", "")
    route = scatter_kernel_bwd or mode in ("all", "narrow")
    if route and scatter_path_applicable(N, M * S, C):
        return _group_fast_bwd(points, idx, N)
    return _group_plain(points, idx)


def _group_plain(points: Array, idx: Array) -> Array:
    B, M, S = idx.shape
    out = _flat_take(points, idx.reshape(B, M * S))
    return out.reshape(B, M, S, points.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _group_fast_bwd(points: Array, idx: Array, n_dest: int) -> Array:
    return _group_plain(points, idx)


def _group_fast_fwd(points, idx, n_dest):
    return _group_plain(points, idx), (
        idx, jnp.zeros((0,), points.dtype)
    )


def _group_fast_rev(n_dest, res, g):
    import numpy as np

    from ogc_tpu.ops.pallas_scatter import scatter_add_rows

    idx, proto = res
    B, M, S = idx.shape
    C = g.shape[-1]
    d_points = scatter_add_rows(
        idx.reshape(B, M * S).astype(jnp.int32),
        g.reshape(B, M * S, C), n_dest,
    ).astype(proto.dtype)
    return d_points, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_group_fast_bwd.defvjp(_group_fast_fwd, _group_fast_rev)


# ---------------------------------------------------------------------------
# KNN / three_nn
# ---------------------------------------------------------------------------


def _pad_k(neg: Array, idx: Array, k: int) -> Tuple[Array, Array]:
    k_eff = neg.shape[-1]
    if k_eff < k:  # degenerate k > M: pad with the farthest neighbor
        neg = jnp.concatenate([neg] + [neg[..., -1:]] * (k - k_eff), axis=-1)
        idx = jnp.concatenate([idx] + [idx[..., -1:]] * (k - k_eff), axis=-1)
    return neg, idx


def _knn_chunk(
    query: Array, points: Array, k: int, exact: bool, recall: float
) -> Tuple[Array, Array]:
    """Brute-force KNN for one query chunk: (B, n, 3) x (B, M, 3)."""
    d2 = square_distance(query, points)  # (B, n, M)
    M = points.shape[-2]
    k_eff = min(k, M)
    if exact:
        # top_k on negated distances: sorted ascending by distance, ties
        # broken by lower index (lax.top_k is stable), matching the
        # reference's insertion sort (interpolate_gpu.cu:30-46).
        neg, idx = jax.lax.top_k(-d2, k_eff)
    else:
        neg, idx = jax.lax.approx_max_k(-d2, k_eff, recall_target=recall)
    neg, idx = _pad_k(neg, idx, k)
    return -neg, idx.astype(jnp.int32)


def knn(
    k: int,
    query: Array,
    points: Array,
    chunk: int = _DEFAULT_CHUNK,
    exact: Optional[bool] = None,
    recall_target: Optional[float] = None,
) -> Tuple[Array, Array]:
    """k-nearest-neighbors of `query` in `points`.

    :param k: number of neighbors (static).
    :param query: (B, N, 3).
    :param points: (B, M, 3).
    :param exact: force exact (True) or approximate (False) search; None uses
        the module default (approximate on TPU — see _EXACT_DEFAULT above).
    :return: (dist, idx) — (B, N, k) sqrt-distances and int32 indices,
        ascending by distance, ties toward lower index.

    Reference: pointnet2/pointnet2.py:81-109 (sqrt at :103),
    src/interpolate_gpu.cu:9-57.  Queries are processed in chunks so the
    transient (B, chunk, M) distance tile stays memory-bounded at N=M=8192.

    The None defaults MUST resolve outside the jitted body: a jit caches by
    the static argument VALUES, so resolving `exact=None` inside would pin
    whatever _EXACT_DEFAULT was at first trace and silently ignore later
    set_exact_neighbors() flips (found by the exact-vs-approx ablation
    producing four identical cells).
    """
    if exact is None:
        exact = _EXACT_DEFAULT
    if recall_target is None:
        recall_target = _RECALL_LARGE_K if k >= 8 else _RECALL_SMALL_K
    # Searches are non-differentiable ORACLES, like the reference's CUDA
    # ops (no backward registered on knn/three_nn — indices are ints and
    # their dist outputs never carry grad in the reference stack).
    # Cutting tangents here also keeps param-dependent inputs (warped
    # clouds in the flow refinement loop, chamfer) out of the Pallas
    # kernels, which have no JVP rule (tools/bench_train_flow.py at 8192
    # pts crashed exactly there; sub-1024 clouds take the XLA path and
    # masked it).  Value consumers (group/gather of features/positions)
    # keep full gradients — only the SEARCH is constant.
    query = jax.lax.stop_gradient(query)
    points = jax.lax.stop_gradient(points)
    dist, idx = _knn_jit(k, query, points, chunk, exact, recall_target)
    return dist, _tag_idx(idx)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _knn_jit(
    k: int,
    query: Array,
    points: Array,
    chunk: int,
    exact: bool,
    recall_target: float,
) -> Tuple[Array, Array]:
    B, N, _ = query.shape
    M = points.shape[-2]
    if (
        not exact
        and pallas_available()
        and M >= 1024
        and -(-M // 4) >= k  # enough block winners even at blk=4
    ):
        # Fused Pallas kernel: distance tiles + block-min thinning +
        # in-VMEM k-extraction; never materializes the (B, N, M) matrix.
        # Measured 2.8-3.8x over the XLA materialize+approx_max_k path at
        # the model's hot shapes with >= target recall (BENCHLOG r2).
        from ogc_tpu.ops.pallas_knn import knn_blockmin

        return knn_blockmin(k, query, points, recall_target=recall_target)
    if (
        exact
        and _PALLAS_EXACT_ENV != "off"
        and pallas_available()
        and 1024 <= M <= 16384  # (M, 128) f32 scratch must fit VMEM
        and M >= k
    ):
        # Exact fused kernel: same reference semantics as the XLA path
        # below (ascending d2, ties to the lower index) but k-round
        # masked-min extraction instead of lax.top_k's full variadic sort,
        # and no (B, N, M) HBM tile — the XLA exact path made parity-mode
        # bench ~20x slower than fast mode (BENCHLOG r3).  d2 uses the
        # reference CUDA's direct per-coordinate form, so in-band tie
        # order is MORE reference-faithful than square_distance's MXU
        # expansion.  OGC_PALLAS_KNN_EXACT=off restores the XLA path.
        from ogc_tpu.ops.pallas_knn import (
            knn_exact, knn_exact_mxu_certified, knn_exact_pruned,
        )

        if _PALLAS_EXACT_D2_ENV == "mxu_cert" and M > k + 4:
            return knn_exact_mxu_certified(k, query, points)
        if (
            _PALLAS_EXACT_PRUNE_ENV == "knn"  # opt-in pending the r4
            # (cb, qt) sweep: first on-chip A/B measured 0.69-1.01x for
            # the knn shapes (BENCHLOG r4) — ball pruning wins, knn does
            # not yet.  tools/bench_prune_sweep.py drives the decision.
            and M >= _PRUNE_MIN_M
            and N >= _PRUNE_MIN_N
        ):
            # Bound-pruned variant: bit-equal, skips provably-irrelevant
            # Morton blocks (pallas_knn.knn_exact_pruned).
            return knn_exact_pruned(k, query, points)
        return knn_exact(k, query, points)
    if N <= chunk:
        d2, idx = _knn_chunk(query, points, k, exact, recall_target)
        return jnp.sqrt(d2), idx

    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    q = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
    q = q.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

    def one(qc):
        return _knn_chunk(qc, points, k, exact, recall_target)

    d2, idx = jax.lax.map(one, q)  # (n_chunks, B, chunk, k)
    d2 = d2.transpose(1, 0, 2, 3).reshape(B, n_chunks * chunk, k)[:, :N]
    idx = idx.transpose(1, 0, 2, 3).reshape(B, n_chunks * chunk, k)[:, :N]
    return jnp.sqrt(d2), idx


def three_nn(
    unknown: Array, known: Array, exact: Optional[bool] = None
) -> Tuple[Array, Array]:
    """Three nearest neighbors (KNN with k=3).

    Reference: pointnet2/pointnet2.py:112-140, src/interpolate_gpu.cu:81-146.
    """
    return knn(3, unknown, known, exact=exact)


def three_interpolate(features: Array, idx: Array, weight: Array) -> Array:
    """Weighted interpolation from 3 nearest neighbors.

    :param features: (B, M, C) source features.
    :param idx: (B, N, 3) neighbor indices.
    :param weight: (B, N, 3) interpolation weights.
    :return: (B, N, C).

    Channels-last analogue of `three_interpolate`
    (pointnet2/pointnet2.py:143-187); backward is a scatter-add via autodiff.
    """
    grouped = group(features, idx)  # (B, N, 3, C)
    return jnp.sum(grouped * weight[..., None], axis=2)


def interpolate_weights(
    unknown: Array, known: Array, eps: float = 1e-8
) -> Tuple[Array, Array]:
    """Inverse-distance weights over the 3 nearest neighbors.

    Mirrors the composite used by the reference FP module
    (utils/pointnet2_util.py:98-101) and `upsample_feat`
    (utils/data_util.py:21-38).
    """
    dist, idx = three_nn(unknown, known)
    recip = 1.0 / (dist + eps)
    # Tagged like the indices: near-coincident points make 1/dist span
    # ~8 decades, so recompute fp noise in dist swings the normalized
    # weights O(1) (see FlowFPModule.weights).
    weight = _tag_idx(recip / jnp.sum(recip, axis=-1, keepdims=True))
    return idx, weight


def upsample_feat(pc: Array, pc_sub: Array, feat_sub: Array) -> Array:
    """Upsample per-point features from a subsampled cloud to the full cloud.

    :param pc: (B, N, 3); :param pc_sub: (B, M, 3); :param feat_sub: (B, M, C).
    :return: (B, N, C).  Reference: utils/data_util.py:21-38.
    """
    idx, weight = interpolate_weights(pc, pc_sub)
    return three_interpolate(feat_sub, idx, weight)


# ---------------------------------------------------------------------------
# Ball query
# ---------------------------------------------------------------------------


def ball_query(
    radius: float, nsample: int, xyz: Array, new_xyz: Array,
    exact: Optional[bool] = None, chunk: int = 2048,
) -> Array:
    """Fixed-size in-radius neighbor lists.

    :param radius: ball radius (static).
    :param nsample: max neighbors per ball (static).
    :param xyz: (B, N, 3) points.
    :param new_xyz: (B, M, 3) ball centers.
    :return: (B, M, nsample) int32 indices.

    Parity with pointnet2/src/ball_query_gpu.cu:9-45: strictly-inside points
    (d2 < r2) taken in ascending index order; if fewer than `nsample`, the
    remaining slots repeat the FIRST in-radius point; if the ball is empty the
    row is all zeros.

    Centers are processed in chunks: the transient distance tile is
    (B, chunk, N), never (B, M, N) — at 8192^2 the full tile is 2.1 GB/frame
    and OOMs the fused train step (smooth loss, ball_q_k=64).

    `exact=None` resolves here, OUTSIDE the jit (see knn: resolving inside
    pins the first trace's mode in the jit cache).
    """
    if exact is None:
        exact = _EXACT_DEFAULT
    # Search oracle: non-differentiable inputs (see ops.knn).
    xyz = jax.lax.stop_gradient(xyz)
    new_xyz = jax.lax.stop_gradient(new_xyz)
    return _tag_idx(
        _ball_query_jit(radius, nsample, xyz, new_xyz, exact, chunk)
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _ball_query_jit(
    radius: float, nsample: int, xyz: Array, new_xyz: Array,
    exact: bool, chunk: int,
) -> Array:
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    if (
        not exact
        and pallas_available()
        and N >= 1024
        and -(-N // 4) >= nsample
    ):
        # Fused kernel, ball mode: per-block lowest in-radius index +
        # in-VMEM extraction — no (B, M, N) distance tile at all
        # (the ball_query op alone measured 35 ms/frame in the smooth
        # loss before this, BENCHLOG r2).
        from ogc_tpu.ops.pallas_knn import ball_query_blockmin

        cand = ball_query_blockmin(radius, nsample, xyz, new_xyz)
        return _fill_balls(cand, nsample)
    if (
        exact
        and _PALLAS_EXACT_ENV != "off"
        and pallas_available()
        and 1024 <= N <= 16384  # (N, 128) i32 key scratch must fit VMEM
        and N >= nsample
    ):
        # Exact fused kernel: blk=1 keeps every in-radius index (ball keys
        # are pure indices — no truncation), so this is the reference's
        # index-order filling exactly, without the (B, M, N) tile +
        # full-sort top_k of the XLA path below.  See
        # pallas_knn.ball_query_exact; OGC_PALLAS_KNN_EXACT=off restores
        # the XLA path.
        from ogc_tpu.ops.pallas_knn import (
            ball_query_exact, ball_query_exact_pruned,
        )

        if (
            _PALLAS_EXACT_PRUNE_ENV != "off"
            and N >= _PRUNE_MIN_M
            and M >= _PRUNE_MIN_M
        ):
            # Static-radius AABB pruning, bit-equal: 1.37-1.84x on-chip at
            # the (8192 centers x 8192 points, ns=64, r=2) smooth-loss
            # shape; ~1.0-1.25x at 2048 centers, hence the M (centers)
            # gate (BENCHLOG r4 A/B).  BOTH sides are deliberately gated
            # at 4096 (not knn's _PRUNE_MIN_N=1024 for the points side):
            # ball pruning's only win was measured at 8192 x 8192, and a
            # small point cloud means few Morton blocks to skip — the
            # prologue (sort + AABBs) would be pure overhead.
            cand = ball_query_exact_pruned(radius, nsample, xyz, new_xyz)
        else:
            cand = ball_query_exact(radius, nsample, xyz, new_xyz)
        return _fill_balls(cand, nsample)
    if M > chunk:
        n_chunks = -(-M // chunk)
        pad = n_chunks * chunk - M
        c = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
        c = c.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
        idx = jax.lax.map(
            lambda cc: _ball_query_jit(radius, nsample, xyz, cc, exact, chunk), c
        )
        return idx.transpose(1, 0, 2, 3).reshape(B, n_chunks * chunk, -1)[:, :M]
    d2 = square_distance(new_xyz, xyz)  # (B, M, N)
    inside = d2 < radius * radius

    point_ids = jnp.arange(N, dtype=jnp.int32)
    # Key: in-radius points keep their index, outside points are pushed past N
    # so that top_k(-key) yields in-radius indices in ascending order first.
    key = jnp.where(inside, point_ids, N + point_ids)
    k_eff = min(nsample, N)
    if exact:
        neg_key, _ = jax.lax.top_k(-key.astype(jnp.int32), k_eff)
    else:
        # Keys are indices (< 2N << 2^24): exactly representable in f32, so
        # the approximate reduction only affects WHICH in-radius points fill
        # the ball (still biased to low indices), not their validity.
        neg_key, _ = jax.lax.approx_max_k(
            -key.astype(jnp.float32), k_eff, recall_target=_RECALL_LARGE_K
        )
        neg_key = neg_key.astype(jnp.int32)
    cand = -neg_key  # (B, M, k_eff) ascending keys
    if k_eff < nsample:  # fewer points than slots: pad with invalid sentinel
        cand = jnp.pad(cand, ((0, 0), (0, 0), (0, nsample - k_eff)),
                       constant_values=2 * N)
    return _fill_balls(cand, nsample, n_valid_below=N)


def _fill_balls(cand: Array, nsample: int,
                n_valid_below: Optional[int] = None) -> Array:
    """Reference ball padding: slots beyond the in-radius count repeat the
    FIRST in-radius index; empty balls are all zeros
    (ball_query_gpu.cu:34-43).  `cand` is ascending with invalid entries
    strictly larger than every valid index."""
    if n_valid_below is None:
        from ogc_tpu.ops.pallas_knn import _BALL_INVALID

        n_valid_below = _BALL_INVALID
    is_valid = cand < n_valid_below
    count = jnp.sum(is_valid, axis=-1, keepdims=True)  # (B, M, 1)
    first = cand[..., :1]  # first in-radius key (or N+... if empty)

    slot = jnp.arange(nsample, dtype=jnp.int32)
    idx = jnp.where(slot < count, cand, first)
    # Empty ball: zeros (reference leaves the zero-initialized buffer).
    idx = jnp.where(count > 0, idx, 0)
    return idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Composite grouping (the form the models actually use)
# ---------------------------------------------------------------------------


def query_and_group(
    radius: Optional[float],
    nsample: int,
    xyz: Array,
    new_xyz: Array,
    features: Optional[Array] = None,
    use_xyz: bool = True,
) -> Tuple[Array, Array]:
    """KNN-grouping with radius clamp, relative coordinates, feature concat.

    :param xyz: (B, N, 3); :param new_xyz: (B, M, 3) centroids.
    :param features: optional (B, N, C).
    :return: (new_features (B, M, nsample, 3+C or C), grouped_xyz (B, M, nsample, 3)).

    Reference: `QueryAndGroup` (pointnet2/pointnet2.py:263-301).  NOTE the
    reference does NOT use ball_query here: it takes the `nsample` nearest
    neighbors and replaces any neighbor farther than `radius` by the nearest
    neighbor's index (:284-286).
    """
    dist, idx = knn(nsample, new_xyz, xyz)
    if radius is not None:
        nearest = idx[..., :1]
        # Tag the POST-clamp indices: the clamp is a fresh discontinuous
        # selection (dist fp-noise at the radius boundary flips it), so a
        # remat policy that pins only knn's output would still let the
        # backward recompute a different routing here.
        idx = _tag_idx(jnp.where(dist > radius, nearest, idx))
    return group_with_idx(xyz, new_xyz, idx, features, use_xyz)


def group_with_idx(
    xyz: Array,
    new_xyz: Array,
    idx: Array,
    features: Optional[Array] = None,
    use_xyz: bool = True,
) -> Tuple[Array, Array]:
    """query_and_group with precomputed neighbor indices.

    Lets callers share one KNN table across modules that group the SAME
    cloud with the same (or prefix-sliced) neighborhood size — e.g. the
    FlowStep3D GRU gates, regressors, and flow convs all group the fixed
    1/4-resolution cloud every refinement iteration.

    xyz and features are gathered in ONE fused row-gather (gather cost on TPU
    is per row, independent of row width).
    """
    if features is not None:
        g = group(jnp.concatenate([xyz, features], axis=-1), idx)
        grouped_xyz = g[..., :3] - new_xyz[:, :, None, :]
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz, g[..., 3:]], axis=-1)
        else:
            new_features = g[..., 3:]
    else:
        grouped_xyz = group(xyz, idx) - new_xyz[:, :, None, :]
        new_features = grouped_xyz
    return new_features, grouped_xyz


def group_all(
    xyz: Array, features: Optional[Array] = None, use_xyz: bool = True
) -> Tuple[Array, Array]:
    """Group the whole cloud into a single neighborhood.

    Reference: `GroupAll` (pointnet2/pointnet2.py:304-326).
    :return: (new_features (B, 1, N, 3+C or C), grouped_xyz (B, 1, N, 3)).
    """
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_feats = features[:, None, :, :]
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        else:
            new_features = grouped_feats
    else:
        new_features = grouped_xyz
    return new_features, grouped_xyz
