"""Certified-MXU exact KNN A/B (VERDICT r4 #4): 'expanded-form d2 on the
MXU, knife-edge band re-resolved in direct form' — measured, not argued.

Three questions, each with its own arm set (census shapes from
BENCHLOG r4 'Parity-bench exact-shape census' + the loss shape):

1. CEILING — how much of the exact kernel is even the d2 fill?
   k-sweep of the direct-form removal kernel: time(k) = fill+overhead
   intercept + per-extraction-round slope * k.  The MXU can only ever
   attack the intercept.

2. FILL A/B — same kernel, d2 fill VPU direct form vs MXU expanded
   form (pallas_knn._fill_d2_scratch "mxu", K=3 f32 HIGHEST dot).
   r2 measured the standalone K=3 MXU distance at 5.4 vs 2.1 ms VPU
   (BENCHLOG r2); this is the in-situ version inside the exact kernel.

3. CERTIFICATE OVERHEAD — knn_exact_mxu_certified end-to-end
   (k+extra expanded selection + direct re-resolution + band check)
   vs the plain direct kernel, plus the measured certificate failure
   fraction on continuous scene-scale clouds (each failing batch pays
   a full direct-kernel fallback on top).

Run ON TPU, one process at a time:
    python tools/bench_exact_mxu_cert.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import make_timed as _make_timed  # canonical timer


def make_timed(fn, reps=8):
    return _make_timed(fn, reps=reps, warmup=2, iters=5)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu.ops.pallas_knn import _mxu_certified_core, knn_exact

    rng = np.random.RandomState(0)
    out = {}

    def clouds(n, m, b=8, scale=30.0, spread=2.0):
        """Continuous CLUSTERED clouds far from the origin — the
        cancellation-band regime (NOT the grid-quantized clouds of
        bench_knn_exact.py: those make direct-vs-expanded agreement
        artificially easy)."""
        ctr = scale * rng.rand(b, 1, 3).astype(np.float32)
        q = jnp.asarray(ctr + spread * rng.rand(b, n, 3).astype(np.float32))
        p = jnp.asarray(ctr + spread * rng.rand(b, m, 3).astype(np.float32))
        return q, p

    # --- 1. k-sweep: fill/overhead intercept vs extraction slope ---------
    ksweep = []
    for n, m in [(8192, 8192), (2048, 8192)]:
        q, p = clouds(n, m)
        rows = []
        for k in (1, 4, 8, 16, 32):
            t = make_timed(
                lambda q_, p_, k=k: knn_exact(k, q_, p_, emit="removal")
            )(q, p)
            rows.append((k, t * 1e3))
            print(f"[ksweep n{n} m{m}] k={k}: {t*1e3:.2f} ms",
                  file=sys.stderr, flush=True)
        ks = np.array([r[0] for r in rows], np.float64)
        ts = np.array([r[1] for r in rows], np.float64)
        slope, intercept = np.polyfit(ks, ts, 1)
        ksweep.append(dict(shape=f"n{n}xm{m}", rows=rows,
                           per_round_ms=round(slope, 4),
                           fill_plus_overhead_ms=round(intercept, 4),
                           fill_frac_at_k16=round(
                               intercept / (intercept + 16 * slope), 4)))
    out["ksweep"] = ksweep

    # --- 2. in-situ fill A/B: VPU direct vs MXU expanded ------------------
    fill_ab = []
    for n, m, k in [(8192, 8192, 16), (2048, 8192, 64), (2048, 2048, 32),
                    (8192, 2048, 3)]:
        q, p = clouds(n, m)
        t_v = make_timed(
            lambda q_, p_: knn_exact(k, q_, p_, emit="removal"))(q, p)
        t_m = make_timed(
            lambda q_, p_: knn_exact(k, q_, p_, emit="removal",
                                     d2_mode="mxu"))(q, p)
        row = dict(shape=f"knn n{n} m{m} k{k}", vpu_ms=t_v * 1e3,
                   mxu_ms=t_m * 1e3, mxu_vs_vpu=t_v / t_m)
        fill_ab.append(row)
        print(f"[fill A/B {row['shape']}] vpu {row['vpu_ms']:.2f} | mxu "
              f"{row['mxu_ms']:.2f} ({row['mxu_vs_vpu']:.2f}x)",
              file=sys.stderr, flush=True)
    out["fill_ab"] = fill_ab

    # --- 3. certified end-to-end + certificate failure fraction ----------
    cert = []
    for n, m, k in [(2048, 8192, 64), (2048, 2048, 32), (8192, 2048, 3),
                    (8192, 8192, 16)]:
        q, p = clouds(n, m)
        for extra in ((4, 16) if (n, m) == (2048, 8192) else (4,)):
            # correctness canary vs the direct kernel (public API path,
            # includes fallback)
            from ogc_tpu.ops.pallas_knn import knn_exact_mxu_certified
            i_u = jax.jit(
                lambda q_, p_: knn_exact(k, q_, p_)[1])(q, p)
            i_c = jax.jit(
                lambda q_, p_, e=extra: knn_exact_mxu_certified(
                    k, q_, p_, extra=e)[1])(q, p)
            idx_equal = bool(jnp.all(i_u == i_c))

            core = jax.jit(lambda q_, p_, e=extra: _mxu_certified_core(
                k, q_, p_, e))
            fail = 1.0 - float(jnp.mean(core(q, p)[2]))
            t_u = make_timed(lambda q_, p_: knn_exact(k, q_, p_))(q, p)
            t_c = make_timed(
                lambda q_, p_, e=extra: _mxu_certified_core(
                    k, q_, p_, e)[:2])(q, p)
            # Shipped cost: certified path + (fallback trips whenever ANY
            # query in the batch fails -> full direct kernel on top).
            shipped = t_c + (t_u if fail > 0 else 0.0)
            row = dict(shape=f"knn n{n} m{m} k{k}", extra=extra,
                       direct_ms=t_u * 1e3, certified_ms=t_c * 1e3,
                       cert_fail_frac=round(fail, 6),
                       shipped_ms=shipped * 1e3,
                       shipped_vs_direct=t_u / shipped,
                       idx_equal=idx_equal)
            cert.append(row)
            print(f"[cert {row['shape']} extra={extra}] direct "
                  f"{row['direct_ms']:.2f} | certified {row['certified_ms']:.2f}"
                  f" | fail={fail:.4f} | shipped {row['shipped_ms']:.2f} "
                  f"({row['shipped_vs_direct']:.2f}x) | eq={idx_equal}",
                  file=sys.stderr, flush=True)
    out["certified"] = cert

    print(json.dumps(out))


if __name__ == "__main__":
    main()
