"""Does index locality change the TPU gather row rate?

The flow refinement loop is bound by neighbor-row gathers (~6 ms/iter at
~1.8 ns/row).  Rows are fetched from HBM by random index; HBM transactions
are >= 256 B while a 32-ch bf16 row is 64 B, so scattered indices may waste
3-4x of the burst.  If gathers run materially faster when neighbor indices
are spatially clustered, a Morton-order permutation of the 1/4-res cloud
(one sort in the prefix; the pipeline is permutation-equivariant) would cut
the per-iteration floor.

Measures gather((B*N, C) source, (B*N*S) flat indices) with:
  - random indices (uniform)
  - window indices (neighbors within +-W rows of the query, the
    post-Morton-sort pattern)
  - sorted-contiguous (best case: idx = row block)
Run ON TPU: python tools/bench_gather_locality.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, reps=20):
    import jax
    import jax.numpy as jnp

    def repeated(*a):
        def body(carry, _):
            out = jnp.sum(fn(*a[:-1], a[-1] + carry.astype(a[-1].dtype)))
            return out.astype(jnp.float32) * 0, None

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return final

    jitted = jax.jit(repeated)
    float(jitted(*args))
    float(jitted(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        float(jitted(*args))
    return (time.perf_counter() - t0) / (5 * reps)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    rng = np.random.RandomState(0)
    B, N, S, C = 8, 2048, 32, 128
    rows = B * N * S

    src = jnp.asarray(rng.rand(B * N, C).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def gather(s, idx):
        return jnp.take(s, idx, axis=0, mode="clip")

    # Base (query -> own row) index grid.
    base = np.repeat(np.arange(B * N), S)

    idx_rand = rng.randint(0, B * N, size=rows).astype(np.int32)
    for W in (8192, 512, 64):
        off = rng.randint(-W, W + 1, size=rows)
        idx_win = np.clip(base + off, 0, B * N - 1).astype(np.int32)
        t = timed(gather, src, jnp.asarray(idx_win))
        print(f"window +-{W:5d}: {t*1e3:7.3f} ms  "
              f"{rows/t/1e6:7.1f} Mrows/s")
    idx_seq = base.astype(np.int32)
    for name, idx in (("random", idx_rand), ("self-seq", idx_seq)):
        t = timed(gather, src, jnp.asarray(idx))
        print(f"{name:>13s}: {t*1e3:7.3f} ms  {rows/t/1e6:7.1f} Mrows/s")

    # Same with C=32 (the sa1 re-encode width).
    C2 = 32
    src2 = src[:, :C2]
    for W in (8192, 64):
        off = rng.randint(-W, W + 1, size=rows)
        idx_win = np.clip(base + off, 0, B * N - 1).astype(np.int32)
        t = timed(gather, src2, jnp.asarray(idx_win))
        print(f"C=32 window +-{W:5d}: {t*1e3:7.3f} ms  "
              f"{rows/t/1e6:7.1f} Mrows/s")
    t = timed(gather, src2, jnp.asarray(idx_rand))
    print(f"C=32       random: {t*1e3:7.3f} ms  {rows/t/1e6:7.1f} Mrows/s")


if __name__ == "__main__":
    main()
