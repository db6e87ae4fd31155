"""Microbench: the smooth-loss mask edge-gather (the r4 timeline's biggest
single op — 55 ms for (B*N*64) x 10ch f32 = 13.1 ns/row, 3-7x worse than
the r2 fused-gather rates).

Variants probe WHY and what recovers the rate:
  - width: K=10 (the real mask) vs padded 16 / 32 / 128 columns
  - dtype: f32 vs bf16
  - consumer: materialize the (E, K) gather output vs FUSE the smooth
    reduction (sum_K |m_i - m_j|) so only (E,) leaves the fusion
  - flat edge list vs the model's (B, N, S) take_along_axis form

Run ON TPU: python tools/bench_mask_gather.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import make_timed as _make_timed


def make_timed(fn, reps=10):
    return _make_timed(fn, reps=reps, warmup=2, iters=3)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    B, N, S, K = 8, 8192, 64, 10
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, size=(B, N, S)).astype(np.int32))
    rows = B * N * S
    results = []

    def report(tag, t):
        ns = t / rows * 1e9
        results.append(dict(op=tag, ms=t * 1e3, ns_per_row=ns))
        print(f"[{tag}] {t*1e3:.2f} ms = {ns:.2f} ns/row",
              file=sys.stderr, flush=True)

    for kpad, dt, dtag in [(10, np.float32, "f32"), (16, np.float32, "f32"),
                           (32, np.float32, "f32"), (128, np.float32, "f32"),
                           (10, np.float32, "bf16"), (32, np.float32, "bf16")]:
        m = rng.rand(B, N, kpad).astype(np.float32)
        mj = jnp.asarray(m)
        if dtag == "bf16":
            mj = mj.astype(jnp.bfloat16)

        def gath(i, src, kpad=kpad):
            # perturbation rides src (cast back if bf16)
            return jnp.take_along_axis(
                src.astype(mj.dtype)[:, :, None, :],
                i[..., None].astype(jnp.int32),
                axis=1, mode="clip")

        t = make_timed(lambda i, s: gath(i, s))(idx, mj.astype(jnp.float32))
        report(f"materialize K={kpad} {dtag}", t)

    # Fused smooth reduction: only (B, N, S) leaves the fusion.
    for kpad, dtag in [(10, "f32"), (16, "f32"), (32, "f32"), (10, "bf16")]:
        m = rng.rand(B, N, kpad).astype(np.float32)

        def smooth(i, src, kpad=kpad, dtag=dtag):
            s = src if dtag == "f32" else src.astype(jnp.bfloat16)
            nn = jnp.take_along_axis(
                s[:, :, None, :], i[..., None].astype(jnp.int32),
                axis=1, mode="clip")                    # (B, N, S, kpad)
            diff = s[:, :, None, :] - nn
            return jnp.sum(jnp.abs(diff), axis=-1)      # (B, N, S)

        t = make_timed(lambda i, s: smooth(i, s))(idx, jnp.asarray(m))
        report(f"fused-reduce K={kpad} {dtag}", t)

    # Wider-but-fewer: gather 40ch once vs 4 x 10ch (the "never split"
    # rule at this exact shape).
    m40 = jnp.asarray(rng.rand(B, N, 40).astype(np.float32))

    def gath40(i, src):
        return jnp.take_along_axis(
            src[:, :, None, :], i[..., None].astype(jnp.int32),
            axis=1, mode="clip")

    t = make_timed(lambda i, s: gath40(i, s))(idx, m40)
    report("materialize K=40 f32 (4 tables merged)", t)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
