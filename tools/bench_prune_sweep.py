"""On-chip sweep: bound-pruned exact kernels at the TRUE parity-bench
shapes, over (cb, qt) tilings.

The r4 shape census (/tmp/shape_census.py methodology, BENCHLOG r4) shows
the parity forward's exact searches are NOT the 8192x8192 loss shapes:
  - segnet SA1:        knn k64 (8, 2048) x 8192
  - flow prefix enc:   knn k32 (16, 4096) x 8192   (doubled batch)
  - flow per-iter x5:  knn k32/k16 (8, 2048) x 2048, 3nn (8, 8192) <- 2048
  - seg FP:            3nn (8, 8192) <- 2048
Small-k ops have tiny theta -> aggressive provable pruning IF block/tile
granularity is fine enough.  Sweeps cb in {64, 128}, qt in {128, 256}.

Run ON TPU:  python tools/bench_prune_sweep.py [--quick]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import make_timed as _make_timed


def make_timed(fn, reps=8):
    return _make_timed(fn, reps=reps, warmup=2, iters=3)


SHAPES = [
    # (tag, b, n, m, k)
    ("seg_sa1_k64", 8, 2048, 8192, 64),
    ("flow_prefix_k32", 16, 4096, 8192, 32),
    ("flow_iter_k32", 8, 2048, 2048, 32),
    ("flow_iter_k16", 8, 2048, 2048, 16),
    ("three_nn", 8, 8192, 2048, 3),
]


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only cb=64/qt=128 vs baseline")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu.ops.pallas_knn import knn_exact, knn_exact_pruned

    rng = np.random.RandomState(0)

    def clustered(b, n):
        ctr = 30 * rng.rand(b, 24, 3).astype(np.float32)
        ctr[..., 2] *= 0.1
        a = rng.randint(0, 24, size=(b, n))
        pts = ctr[np.arange(b)[:, None], a] + 0.75 * rng.randn(b, n, 3)
        return jnp.asarray(np.round(pts * 4).astype(np.float32) / 4.0)

    cfgs = ([(64, 128)] if args.quick
            else [(128, 256), (128, 128), (64, 256), (64, 128)])
    results = []
    for tag, b, n, m, k in SHAPES:
        q, p = clustered(b, n), clustered(b, m)
        t_u = make_timed(lambda p_, q_, k=k: knn_exact(k, q_, p_))(p, q)
        print(f"[{tag}] exact {t_u*1e3:.2f} ms", file=sys.stderr, flush=True)
        row = dict(op=tag, exact_ms=t_u * 1e3, cfgs={})
        i_u = jax.jit(lambda q, p, k=k: knn_exact(k, q, p)[1])(q, p)
        for cb, qt in cfgs:
            try:
                t_p = make_timed(
                    lambda p_, q_, k=k, cb=cb, qt=qt: knn_exact_pruned(
                        k, q_, p_, cb=cb, qt=qt))(p, q)
                i_p = jax.jit(
                    lambda q, p, k=k, cb=cb, qt=qt: knn_exact_pruned(
                        k, q, p, cb=cb, qt=qt)[1])(q, p)
                eq = bool(jnp.all(i_u == i_p))
            except Exception as e:
                print(f"  cb{cb}/qt{qt}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", file=sys.stderr, flush=True)
                continue
            row["cfgs"][f"cb{cb}_qt{qt}"] = dict(
                ms=t_p * 1e3, speedup=t_u / t_p, equal=eq)
            print(f"  cb{cb}/qt{qt}: {t_p*1e3:.2f} ms "
                  f"({t_u/t_p:.2f}x) equal={eq}",
                  file=sys.stderr, flush=True)
        results.append(row)

    print(json.dumps(results))
    bad = [r["op"] for r in results
           for c in r["cfgs"].values() if not c["equal"]]
    if bad:
        sys.exit(f"pruned mismatch: {bad}")


if __name__ == "__main__":
    main()
