"""On-chip A/B: exact neighbor search — XLA materialize+top_k path vs the
fused Pallas exact kernels (pallas_knn.knn_exact / ball_query_exact).

The eval CLIs default to exact neighbors (metric parity with the
reference), so this is the path a user benchmarking "reference semantics"
actually runs: bench.py r3 measured parity mode at 4.6 scenes/s vs 94
fast — almost entirely lax.top_k's full variadic sort over 8192-wide
rows.  Arms cover the model's hot exact shapes (flow cross/self-KNN,
3-NN interpolation, SA ball query).  Also asserts index equality between
the two paths on the random clouds (ulp-level d2 form differences can in
principle flip near-ties; random uniform clouds have none).

Run ON TPU, one process at a time:  python tools/bench_knn_exact.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

WARMUP = 2
ITERS = 5


from bench import make_timed as _make_timed  # canonical timer


def make_timed(fn, reps=8):
    return _make_timed(fn, reps=reps, warmup=WARMUP, iters=ITERS)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu.ops import core
    from ogc_tpu.ops.pallas_knn import ball_query_exact, knn_exact

    # Route the XLA arms around the kernel dispatch (process-local; the
    # kernel arms call pallas_knn directly, so there is no jit-cache
    # collision between the two).
    core._PALLAS_EXACT_ENV = "off"

    rng = np.random.RandomState(0)
    results = []

    def clouds(n, m, b=8):
        # 0.25-grid quantized coordinates: every pairwise d2 is then exactly
        # representable in f32 whichever way it is computed (direct
        # per-coordinate vs MXU expansion), so the XLA-vs-kernel index
        # equality below is meaningful — continuous clouds would flip
        # membership/order for the ~tens of pairs per 67M that land within
        # one ulp of a decision boundary.  Ties (equal d2) break toward the
        # lower index in both paths.
        q = jnp.asarray(np.round(120 * rng.rand(b, n, 3)).astype(np.float32)
                        / 4.0)
        p = jnp.asarray(np.round(120 * rng.rand(b, m, 3)).astype(np.float32)
                        / 4.0)
        return q, p

    # --- KNN arms ---------------------------------------------------------
    # (2048, 8192, 64) is the segnet SA1 QueryAndGroup shape — the parity
    # seg forward's dominant exact search (models/segnet.py kitti arch).
    # r4 census note (BENCHLOG): the 8192x8192 shapes are LOSS-side;
    # the parity forward's exact searches are the SA1/prefix/iter shapes
    # appended below (tools/shape_census.py).
    for n, m, k in [(8192, 8192, 16), (8192, 8192, 32), (8192, 2048, 3),
                    (2048, 8192, 64), (2048, 2048, 32), (2048, 2048, 16)]:
        q, p = clouds(n, m)

        def xla_arm(q, p, k=k):
            # raw body (jit cache bypass): the production chunked exact
            # path, with _PALLAS_EXACT_ENV=off steering past the kernel
            return core._knn_jit.__wrapped__(k, q, p, 4096, True, 1.0)

        def krn_arm(q, p, k=k):
            return knn_exact(k, q, p, emit="lex")

        def krn_rm_arm(q, p, k=k):
            return knn_exact(k, q, p, emit="removal")

        # correctness first (indices must agree on tie-free random clouds)
        i_x = jax.jit(lambda q, p: xla_arm(q, p)[1])(q, p)
        i_k = jax.jit(lambda q, p: krn_arm(q, p)[1])(q, p)
        i_r = jax.jit(lambda q, p: krn_rm_arm(q, p)[1])(q, p)
        eq = bool(jnp.all(i_x == i_k)) and bool(jnp.all(i_x == i_r))

        t_x = make_timed(lambda p_, q_: xla_arm(q_, p_))(p, q)
        t_k = make_timed(lambda p_, q_: krn_arm(q_, p_))(p, q)
        t_r = make_timed(lambda p_, q_: krn_rm_arm(q_, p_))(p, q)
        row = dict(op=f"knn n{n} m{m} k{k}", xla_ms=t_x * 1e3,
                   kernel_ms=t_k * 1e3, speedup=t_x / t_k,
                   removal_ms=t_r * 1e3, removal_vs_lex=t_k / t_r,
                   idx_equal=eq)
        results.append(row)
        print(f"[{row['op']}] xla {row['xla_ms']:.2f} ms | kernel(lex) "
              f"{row['kernel_ms']:.2f} ms ({row['speedup']:.2f}x) | "
              f"removal {row['removal_ms']:.2f} ms "
              f"(vs lex {row['removal_vs_lex']:.2f}x) | "
              f"idx_equal={eq}", file=sys.stderr, flush=True)

    # --- ball-query arms --------------------------------------------------
    for nq, m, ns, r in [(8192, 8192, 64, 2.0), (2048, 8192, 32, 1.0)]:
        ctr, p = clouds(nq, m)

        def xla_ball(ctr, p, ns=ns, r=r):
            return core._ball_query_jit.__wrapped__(
                r, ns, p, ctr, True, 2048)

        def krn_ball(ctr, p, ns=ns, r=r):
            cand = ball_query_exact(r, ns, p, ctr)
            return core._fill_balls(cand, ns)

        i_x = jax.jit(xla_ball)(ctr, p)
        i_k = jax.jit(krn_ball)(ctr, p)
        eq = bool(jnp.all(i_x == i_k))

        t_x = make_timed(xla_ball)(ctr, p)
        t_k = make_timed(krn_ball)(ctr, p)
        row = dict(op=f"ball n{nq} m{m} ns{ns} r{r}", xla_ms=t_x * 1e3,
                   kernel_ms=t_k * 1e3, speedup=t_x / t_k, idx_equal=eq)
        results.append(row)
        print(f"[{row['op']}] xla {row['xla_ms']:.2f} ms | kernel "
              f"{row['kernel_ms']:.2f} ms | {row['speedup']:.2f}x | "
              f"idx_equal={eq}", file=sys.stderr, flush=True)

    print(json.dumps(results))
    bad = [r["op"] for r in results if not r["idx_equal"]]
    if bad:  # the exactness canary is enforced, not just reported
        sys.exit(f"index mismatch between XLA and Pallas exact paths: {bad}")


if __name__ == "__main__":
    main()
