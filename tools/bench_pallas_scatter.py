"""Pallas attempt at the exact-gradient smooth-loss scatter floor (VERDICT
r1 #5).

The smooth-loss backward is d_mask[b, idx[b,n,s], :] += g[b,n,s,:] with
N=8192 destinations, S=32/64 neighbors, K=10 channels — XLA's scatter-add
runs it at ~14 ns/row (BENCHLOG r2/r3).  The untried design: keep the whole
(N, K) accumulator resident in VMEM (320 KB), stream (rows, K) gradient
tiles + index tiles in, accumulate per-row inside the kernel, write HBM
once.  This trades HBM read-modify-write per row for Mosaic per-row dynamic
VMEM updates.

Run on the TPU:  python tools/bench_pallas_scatter.py
Compares rows/s of the kernel vs jnp .at[].add on the smooth-loss shapes,
and prints the one-hot-MXU alternative's analytic cost for the record.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def scatter_accumulate_pallas(idx, g, n_dest):
    """d[b, idx[b, r], :] += g[b, r, :] with a VMEM-resident accumulator.

    :param idx: (B, R) int32 destination rows; :param g: (B, R, K) f32.
    :return: (B, n_dest, K) f32.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = idx.shape
    K = g.shape[-1]
    TILE = 2048  # rows streamed per grid step

    def kernel(idx_ref, g_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(r, _):
            d = idx_ref[r]
            out_ref[d, :] = out_ref[d, :] + g_ref[r, :]
            return 0

        jax.lax.fori_loop(0, TILE, body, 0)

    n_tiles = R // TILE
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            # 1-D so the (8, 128) block-tiling rule sees a single
            # 128-divisible dim (a squeezed batch dim is rejected in SMEM).
            pl.BlockSpec((TILE,), lambda b, t: (b * n_tiles + t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, TILE, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n_dest, K), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_dest, K), jnp.float32),
    )(idx.reshape(B * R), g)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from bench import make_timed

    B, N = 8, 8192
    rng = np.random.RandomState(0)
    for S, K in ((32, 10), (64, 10), (32, 64), (32, 131), (4, 64)):
        R = N * S
        idx = jnp.asarray(rng.randint(0, N, size=(B, R)).astype(np.int32))
        g = jnp.asarray(rng.randn(B, R, K).astype(np.float32))

        def xla_scatter(idx, g):
            out = jnp.zeros((B, N, K), jnp.float32)
            return out.at[
                jnp.arange(B, dtype=jnp.int32)[:, None], idx
            ].add(g)

        t_x = make_timed(xla_scatter, reps=5)(idx, g)
        rows = B * R
        print(f"S={S} K={K}: XLA scatter {t_x*1e3:8.2f} ms "
              f"({t_x/rows*1e9:.1f} ns/row)", flush=True)

        try:
            scatter_accumulate_pallas(idx, g, N)  # surface lowering errors
            t_p = make_timed(
                lambda i, gg: scatter_accumulate_pallas(i, gg, N), reps=5
            )(idx, g)
            # correctness spot check
            a = np.asarray(scatter_accumulate_pallas(idx, g, N))
            b = np.asarray(xla_scatter(idx, g))
            err = np.abs(a - b).max()
            print(f"S={S} K={K}: Pallas VMEM-acc {t_p*1e3:8.2f} ms "
                  f"({t_p/rows*1e9:.1f} ns/row)  max_err={err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"S={S} K={K}: Pallas VMEM-acc FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # One-hot MXU alternative, analytic (for BENCHLOG):
    # FLOPs = N * rows * K_padded(128) * 2 -> at bf16 ~200 TFLOP/s;
    # one-hot build = rows * N VPU compares at ~1e12/s.
    rows_total = B * N * (32 + 64) * 2  # both smooth terms, 2 frames
    mxu_s = N * rows_total * 128 * 2 / 200e12
    vpu_s = rows_total * N / 1e12
    print(f"one-hot-MXU alternative (analytic, all smooth terms both "
          f"frames): MXU {mxu_s*1e3:.0f} ms + one-hot build "
          f"{vpu_s*1e3:.0f} ms  (K=10 of 128 lanes useful)", flush=True)


if __name__ == "__main__":
    main()
