"""Pallas TPU kernels for the hot point-cloud primitives.

Furthest point sampling is inherently sequential (npoint greedy steps,
reference pointnet2/src/sampling_gpu.cu:93-253); the XLA fori_loop version
pays per-step HLO loop overhead.  This kernel keeps the per-point running
min-distance buffer and the coordinates resident in VMEM across all steps and
processes the whole batch per step, so each iteration is a handful of fused
VPU passes over (B, N).

Bitwise-compatible with ops.core.furthest_point_sample: seeds index 0,
ties resolve to the lowest index (jnp.argmax first-occurrence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint, x_ref, y_ref, z_ref, out_ref, mind_ref):
    # out_ref is (npoint, B): the dynamic per-step store lands on the sublane
    # dimension (Mosaic cannot do dynamic stores on the 128-lane dim).
    B, N = x_ref.shape
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    mind_ref[:] = jnp.full((B, N), 1e10, dtype=jnp.float32)
    out_ref[0, :] = jnp.zeros((B,), dtype=jnp.int32)

    def body(i, last):
        # Coordinates of the last selected point per batch row (one-hot
        # masked sums; avoids unsupported dynamic gathers).
        sel = (col == last[:, None]).astype(jnp.float32)
        xl = jnp.sum(x * sel, axis=1)
        yl = jnp.sum(y * sel, axis=1)
        zl = jnp.sum(z * sel, axis=1)
        d2 = (
            (x - xl[:, None]) ** 2
            + (y - yl[:, None]) ** 2
            + (z - zl[:, None]) ** 2
        )
        mind = jnp.minimum(mind_ref[:], d2)
        mind_ref[:] = mind
        # Explicit first-max-wins: Mosaic's lane-dim argmax lowering does
        # NOT guarantee the lowest index on exact d2 ties (caught on-chip
        # at (8, 2048)->512: two candidates with bit-equal min-d2, kernel
        # picked the higher index, diverging from the XLA loop and the
        # reference's strict `>` update).  min-index-among-maxima is
        # lowering-independent.
        m = jnp.max(mind, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(mind == m, col, jnp.int32(N)), axis=1
        ).astype(jnp.int32)
        out_ref[i, :] = nxt
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((B,), dtype=jnp.int32))


#: Max B*N elements held as 4 VMEM-resident (B, N) f32 buffers; 1e6 puts
#: the kernel body also makes ~3 (B, N) temporaries (one-hot select, d2,
#: min), all counted against the 16 MB scoped stack - measured 20.46M at
#: B*N=880k, so the budget is ~400k.
_VMEM_ELEMS = 400_000


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_pallas_chunked(
    xyz: jax.Array, npoint: int, interpret: bool = False
) -> jax.Array:
    """FPS at any batch size: sequential kernel launches over batch chunks.

    The kernel keeps 4 (B, N) f32 buffers VMEM-resident, which bounds a
    single launch to B*N <= ~0.9e6; fleet batches (e.g. B=128, N=8192) are
    split into ceil(B / chunk) launches.  Bitwise identical to the
    single-launch kernel (batches are independent).
    """
    B, N, _ = xyz.shape
    chunk = max(1, _VMEM_ELEMS // N)
    if B <= chunk:
        return furthest_point_sample_pallas(xyz, npoint, interpret)
    outs = [
        furthest_point_sample_pallas(
            xyz[i : min(i + chunk, B)], npoint, interpret
        )
        for i in range(0, B, chunk)
    ]
    return jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(
    xyz: jax.Array, npoint: int, interpret: bool = False
) -> jax.Array:
    """FPS via the Pallas kernel.  :param xyz: (B, N, 3) -> (B, npoint) int32."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out.T
