"""On-chip sweep: exact-kernel query-tile width (OGC_PALLAS_EXACT_QT).

The exact kernels keep an un-thinned (Mp, qt) scratch in VMEM; qt=128 was
chosen for VMEM safety at Mp=8192, but the k=3 arm of the emission A/B
measured ~3.6x its element-op estimate — per-grid-step overhead (block
copies, pipeline bubbles) dominates small-k kernels, and wider query
tiles amortize it.  Sweeps qt at the parity hot shapes; skips
configurations whose scratch would exceed the VMEM budget.

Run ON TPU, one process at a time:  python tools/bench_exact_qt.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import make_timed as _make_timed  # canonical timer

VMEM_SCRATCH_BUDGET = 12 * 2**20  # leave ~4 MB for in/out blocks + temps


def make_timed(fn, reps=8):
    return _make_timed(fn, reps=reps, warmup=2, iters=5)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu.ops import pallas_knn as pk

    rng = np.random.RandomState(0)
    results = []

    def clouds(n, m, b=8):
        q = jnp.asarray(np.round(120 * rng.rand(b, n, 3)).astype(np.float32)
                        / 4.0)
        p = jnp.asarray(np.round(120 * rng.rand(b, m, 3)).astype(np.float32)
                        / 4.0)
        return q, p

    # (n, m, k, kind): the flow self/cross-KNN, 3-NN upsample, segnet SA1
    # QueryAndGroup, and the smooth-loss ball query.
    ARMS = [(8192, 8192, 16, "knn"), (8192, 2048, 3, "knn"),
            (2048, 8192, 64, "knn"), (8192, 8192, 64, "ball")]
    for n, m, k, kind in ARMS:
        q, p = clouds(n, m)
        base_idx = None
        for qt in (128, 256, 512):
            mp = -(-m // pk._TM) * pk._TM
            if mp * qt * 4 > VMEM_SCRATCH_BUDGET:
                continue

            def arm(q, p, k=k, kind=kind):
                if kind == "knn":
                    return pk.knn_exact(k, q, p)
                return pk.ball_query_exact(2.0, k, p, q)

            import os

            os.environ["OGC_PALLAS_EXACT_QT"] = str(qt)
            try:
                idx = jax.jit(lambda q, p: arm(q, p)[1]
                              if kind == "knn" else arm(q, p))(q, p)
                idx = np.asarray(idx)
                if base_idx is None:
                    base_idx = idx
                eq = bool(np.array_equal(base_idx, idx))
                t = make_timed(lambda p_, q_: arm(q_, p_))(p, q)
            except Exception as e:
                results.append(dict(op=f"{kind} n{n} m{m} k{k}", qt=qt,
                                    error=f"{type(e).__name__}: {e}"[:200]))
                print(f"[{kind} n{n} m{m} k{k} qt{qt}] FAILED: "
                      f"{type(e).__name__}", file=sys.stderr, flush=True)
                continue
            finally:
                os.environ.pop("OGC_PALLAS_EXACT_QT", None)
            row = dict(op=f"{kind} n{n} m{m} k{k}", qt=qt, ms=t * 1e3,
                       idx_equal_vs_qt128=eq)
            results.append(row)
            print(f"[{row['op']} qt{qt}] {row['ms']:.2f} ms | "
                  f"idx_equal={eq}", file=sys.stderr, flush=True)

    print(json.dumps(results))
    bad = [r for r in results if not r.get("idx_equal_vs_qt128", True)]
    if bad:
        sys.exit(f"index mismatch across qt widths: {bad}")


if __name__ == "__main__":
    main()
