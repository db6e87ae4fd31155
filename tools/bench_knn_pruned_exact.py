"""On-chip A/B: exact Pallas kernels vs the bound-pruned exact kernels
(pallas_knn.knn_exact_pruned / ball_query_exact_pruned).

The pruned kernels must be bit-equal to the unpruned exact kernels (same
direct-form d2, same reference tie order — pruning only removes provably
irrelevant candidate blocks), so equality here is enforced, not just
reported.  Timed on BOTH uniform and clustered clouds: pruning wins scale
with spatial concentration (uniform 30 m clouds are the worst case for
the AABB bounds; KITTI scenes are clustered and quasi-2D).

Run ON TPU, one process at a time:  python tools/bench_knn_pruned_exact.py
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
    from ogc_tpu.ops.pallas_knn import (
        ball_query_exact, ball_query_exact_pruned, knn_exact,
        knn_exact_pruned,
    )

    rng = np.random.RandomState(0)
    results = []

    def uniform(n, b=8):
        # 0.25-grid quantized (see bench_knn_exact.py): d2 exactly
        # representable -> bit-equality decisions are ulp-free.
        return jnp.asarray(
            np.round(120 * rng.rand(b, n, 3)).astype(np.float32) / 4.0)

    def clustered(n, b=8, n_clusters=24):
        ctr = 30 * rng.rand(b, n_clusters, 3).astype(np.float32)
        ctr[..., 2] *= 0.1  # quasi-2D, like outdoor lidar
        a = rng.randint(0, n_clusters, size=(b, n))
        pts = ctr[np.arange(b)[:, None], a]
        pts = pts + 0.75 * rng.randn(b, n, 3).astype(np.float32)
        return jnp.asarray(np.round(pts * 4).astype(np.float32) / 4.0)

    def run_knn(tag, q, p, k):
        i_u = jax.jit(lambda q, p: knn_exact(k, q, p)[1])(q, p)
        i_p = jax.jit(lambda q, p: knn_exact_pruned(k, q, p)[1])(q, p)
        d_u = jax.jit(lambda q, p: knn_exact(k, q, p)[0])(q, p)
        d_p = jax.jit(lambda q, p: knn_exact_pruned(k, q, p)[0])(q, p)
        eq = bool(jnp.all(i_u == i_p)) and bool(jnp.all(d_u == d_p))
        t_u = make_timed(lambda p_, q_: knn_exact(k, q_, p_))(p, q)
        t_p = make_timed(lambda p_, q_: knn_exact_pruned(k, q_, p_))(p, q)
        row = dict(op=tag, exact_ms=t_u * 1e3, pruned_ms=t_p * 1e3,
                   speedup=t_u / t_p, equal=eq)
        results.append(row)
        print(f"[{tag}] exact {row['exact_ms']:.2f} ms | pruned "
              f"{row['pruned_ms']:.2f} ms | {row['speedup']:.2f}x | "
              f"equal={eq}", file=sys.stderr, flush=True)

    def run_ball(tag, ctr, p, ns, r):
        def u(ctr, p):
            return core._fill_balls(ball_query_exact(r, ns, p, ctr), ns)

        def pr(ctr, p):
            return core._fill_balls(
                ball_query_exact_pruned(r, ns, p, ctr), ns)

        eq = bool(jnp.all(jax.jit(u)(ctr, p) == jax.jit(pr)(ctr, p)))
        t_u = make_timed(u)(ctr, p)
        t_p = make_timed(pr)(ctr, p)
        row = dict(op=tag, exact_ms=t_u * 1e3, pruned_ms=t_p * 1e3,
                   speedup=t_u / t_p, equal=eq)
        results.append(row)
        print(f"[{tag}] exact {row['exact_ms']:.2f} ms | pruned "
              f"{row['pruned_ms']:.2f} ms | {row['speedup']:.2f}x | "
              f"equal={eq}", file=sys.stderr, flush=True)

    for maker, ctag in [(uniform, "uni"), (clustered, "clu")]:
        for n, m, k in [(8192, 8192, 16), (8192, 8192, 32),
                        (2048, 8192, 64), (8192, 2048, 3)]:
            q, p = maker(n), maker(m)
            run_knn(f"knn[{ctag}] n{n} m{m} k{k}", q, p, k)
        for nq, m, ns, r in [(8192, 8192, 64, 2.0), (2048, 8192, 32, 1.0)]:
            ctr, p = maker(nq), maker(m)
            run_ball(f"ball[{ctag}] n{nq} m{m} ns{ns} r{r}", ctr, p, ns, r)

    print(json.dumps(results))
    bad = [r["op"] for r in results if not r["equal"]]
    if bad:
        sys.exit(f"pruned-exact mismatch vs exact kernels: {bad}")


if __name__ == "__main__":
    main()
