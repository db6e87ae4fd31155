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
    return feasible and n_pad <= 2048
