"""Fused row-group pooling for grouped point features.

The SA/grouping modules produce neighbor features as flat rows
(B*M*S, C) — the natural output layout of both the gather and the MXU
matmul that feed them.  XLA's pooling chain (affine + relu + reduce over
S) assigns the reduce a transposed tile layout, forcing a full-bandwidth
layout copy of the grouped tensor per stage (~0.3-1.0 ms each at KITTI
shapes, traced r2).  This kernel consumes the rows IN PLACE: one pass of

    out[g] = reduce_s f(x[g*S + s] * scale + add[g])     f = relu | id

over each fixed-size group of S consecutive rows, where `scale` folds the
eval-mode BatchNorm multiplier (or 1) and `add` carries the BN shift
and/or the per-group center term of the source-projected grouping
(nn/flowstep3d.py fold path).  Exact math — not an approximation; used
where no gradient is required (eval forwards).

Reference semantics: max/avg pool over the neighbor (nsample) axis of the
grouped features, utils/flowstep3d_util.py:117-137 / pointnet2_util.py:40-46.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def pool_neighbors(x: Array, mean: bool = False,
                   differentiable: bool = True,
                   scale: Array | None = None,
                   add: Array | None = None,
                   relu: bool = False) -> Array:
    """Reduce grouped features (B, M, S, C) over the neighbor axis S,
    optionally fused with a preceding per-channel/per-group affine + ReLU:

        out[b, m] = reduce_s act(x[b, m, s] * scale + add[b, m])

    `scale`: (C,) per-channel multiplier (eval BatchNorm k) or None.
    `add`: (C,) broadcast (eval BatchNorm shift) or (B, M, C) per-group
    (the center term of the source-projected grouping) or None.

    With differentiable=False on a TPU backend (eval forwards), routes
    through the rowgroup kernel, which consumes the grouped rows in their
    native (B*M*S, C) layout — XLA's reduce assigns a transposed tile
    layout and forces a full-bandwidth copy of the grouped tensor per SA
    stage (traced r2) — and folds the affine/ReLU so the post-norm tensor
    is never materialized.  Exact math.  Training (autodiff needs a VJP),
    CPU, and unsupported shapes keep the jnp chain.

    OGC_PALLAS_POOL=on enables the kernel (A/B experiments; read at
    trace time, set before process start like OGC_PALLAS_SCATTER).
    DEFAULT OFF: the on-chip A/B (2026-08-18, BENCHLOG "Rowgroup pool
    kernel") measured the kernel a net ~23% regression on the full
    forward bench (72.6 vs 94.6 scenes/s) despite the saved layout
    copies — the per-group grid serializes work the XLA chain overlaps.
    Numerics are validated on-chip (tpu_e2e_smoke --mode pool_kernel);
    the kernel stays available for shapes/future toolchains where the
    copy dominates.
    """
    import os

    from ogc_tpu.ops.core import pallas_available

    b, m, s, c = x.shape
    mode = os.environ.get("OGC_PALLAS_POOL", "off")
    on_tpu = pallas_available()  # single-device TPU; multi-chip SPMD
    # cannot lower Mosaic calls (see pallas_available)
    if (
        not differentiable
        and mode != "off"
        # "interpret": route through the kernel in interpret mode on any
        # backend — lets the CPU suite exercise the REAL model->kernel glue
        # (row-major group reshapes, add layout, dtypes), not just the
        # fallback.  Test-only; read at trace time.
        and (on_tpu or mode == "interpret")
        and supported(b * m, s, c)
    ):
        sc = (jnp.ones((c,), jnp.float32) if scale is None
              else scale.astype(jnp.float32))
        if add is None:
            ad = jnp.zeros((1, c), x.dtype)
        elif add.ndim == 1:
            ad = add.reshape(1, c).astype(x.dtype)
        else:
            ad = add.reshape(b * m, c).astype(x.dtype)
        out = rowgroup_pool(
            x.reshape(b * m * s, c), sc, ad, s, relu=relu, mean=mean,
            interpret=not on_tpu,
        )
        return out.reshape(b, m, c)
    y = x
    if scale is not None:
        y = y * scale.astype(y.dtype)
    if add is not None:
        ad = add if add.ndim == 1 else add[:, :, None, :]
        y = y + ad.astype(y.dtype)
    if relu:
        y = jnp.maximum(y, 0.0)
    if mean:
        # Accumulate in f32 (matches the kernel; bf16 mean over S=4..32
        # neighbors loses ~1e-2 relative), round once to the input dtype.
        return jnp.mean(y.astype(jnp.float32), axis=2).astype(y.dtype)
    return jnp.max(y, axis=2)


def _pool_kernel(s, g, relu, mean, x_ref, scale_ref, add_ref, out_ref):
    """One block: x (G*S, C) rows, add (G, C), out (G, C)."""
    x = x_ref[...].astype(jnp.float32)
    x = x * scale_ref[...].astype(jnp.float32)  # (1, C) broadcast
    x = x.reshape(g, s, x.shape[-1])  # sublane-group split
    x = x + add_ref[...].astype(jnp.float32)[:, None, :]
    if relu:
        x = jnp.maximum(x, 0.0)
    out = jnp.mean(x, axis=1) if mean else jnp.max(x, axis=1)
    out_ref[...] = out.astype(out_ref.dtype)


def _pick_g(n_groups: int, s: int) -> int:
    """Largest per-block group count G with G*S <= 1024 rows, G | n_groups
    and G a multiple of 8 (Mosaic block specs need the add/out blocks
    8-sublane aligned unless they span the whole array)."""
    g = max(8, (1024 // max(s, 1)) // 8 * 8)
    while g > 8 and n_groups % g:
        g -= 8
    return g


def supported(n_groups: int, s: int, c: int) -> bool:
    """Shapes the kernel handles: power-of-two S (the sublane-group
    reshape), 8-aligned group blocks, bounded VMEM."""
    if s & (s - 1) or s < 2:
        return False
    g = _pick_g(n_groups, s)
    if n_groups % g or g % 8:
        return False
    # f32 working block: g*s rows x lane-padded c.
    c_pad = -(-c // 128) * 128
    return c >= 8 and g * s * c_pad * 4 <= 4 * 2**20


@functools.partial(
    jax.jit, static_argnames=("s", "relu", "mean", "interpret", "out_dtype")
)
def rowgroup_pool(
    x: Array,
    scale: Array,
    add: Array,
    s: int,
    relu: bool = True,
    mean: bool = False,
    interpret: bool = False,
    out_dtype=None,
) -> Array:
    """Pool flat neighbor rows by fixed-size groups.

    :param x: (R, C) rows, R = n_groups * s, group-major (row r belongs to
        group r // s).
    :param scale: (C,) per-channel multiplier (BN fold; pass ones for none).
    :param add: (n_groups, C) per-group additive term (BN shift minus the
        projected center, fold path) — or (1, C) broadcast.
    :param s: rows per group (the neighbor count).
    :return: (n_groups, C) pooled output, dtype = out_dtype or x.dtype.
    """
    r, c = x.shape
    assert r % s == 0, (r, s)
    n_groups = r // s
    assert add.shape[0] in (1, n_groups), (add.shape, n_groups)
    g = _pick_g(n_groups, s)
    assert n_groups % g == 0 and (g * s) % 8 == 0, (n_groups, g, s)
    out_dtype = out_dtype or x.dtype
    kernel = functools.partial(
        _pool_kernel, s, g, relu, mean
    )
    # A (1, C) add keeps its own whole-array block (the kernel broadcasts)
    # — materializing an (n_groups, C) broadcast would stream an extra
    # output-sized HBM buffer through every call.
    add_spec = (
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if add.shape[0] == 1
        else pl.BlockSpec((g, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_groups, c), out_dtype),
        grid=(n_groups // g,),
        in_specs=[
            pl.BlockSpec((g * s, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            add_spec,
        ],
        out_specs=pl.BlockSpec((g, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, scale.reshape(1, c), add)
