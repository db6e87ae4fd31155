"""On-chip A/B: one-hot-matmul grouping vs the XLA gather/scatter path.

Measures forward and forward+backward per-edge costs across source sizes
(the one-hot cost scales with N, the gather wall is flat ~7.1 ns/row), to
(a) calibrate the real Mosaic compare+MXU throughput for the r5 MXU edge
arm and (b) set onehot_path_applicable()'s dispatch threshold.

Run ON TPU:  python tools/bench_group_onehot.py
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

    from ogc_tpu.ops import core
    from ogc_tpu.ops.pallas_onehot import group_onehot

    rng = np.random.RandomState(0)
    results = []

    # (B, N, M, S, C) — sources from real surfaces: sapien smooth loss,
    # flow-model SA groupings, interior kitti levels, and the 8192 smooth
    # shape as the expected-loss calibration point.
    shapes = [
        (8, 512, 512, 96, 10),
        (8, 512, 512, 16, 131),
        (8, 1024, 1024, 64, 16),
        (8, 2048, 2048, 32, 10),
        (8, 2048, 2048, 32, 64),
        (2, 4096, 4096, 48, 10),
        (2, 8192, 8192, 96, 10),
    ]
    for B, N, M, S, C in shapes:
        src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
        cot = jnp.asarray(rng.randn(B, M, S, C).astype(np.float32))
        rows = B * M * S

        def fwd_xla(i, s):
            return jnp.sum(core.group(s, i).astype(jnp.float32))

        def fwd_oh(i, s):
            return jnp.sum(group_onehot(s, i, N).astype(jnp.float32))

        # fwd+bwd arms: the value must depend NONLINEARLY on the gather
        # output — grad(sum(out * const)) = scatter(const) is loop-
        # invariant inside the timing scan and XLA hoists it (the r5
        # first-run fb numbers were measured hoisted; CLAUDE.md trap).
        def fb_xla(i, s):
            return jnp.sum(jax.grad(
                lambda ss: jnp.sum(jnp.square(core.group(ss, i) - cot)))(s))

        def fb_oh(i, s):
            return jnp.sum(jax.grad(
                lambda ss: jnp.sum(
                    jnp.square(group_onehot(ss, i, N) - cot)))(s))

        tag = f"B{B}_N{N}_E{M*S}_C{C}"
        row = {"shape": tag, "rows": rows}
        for name, fn in [("fwd_xla", fwd_xla), ("fwd_onehot", fwd_oh),
                         ("fb_xla", fb_xla), ("fb_onehot", fb_oh)]:
            t = make_timed(fn)(idx, src)
            row[name + "_ms"] = round(t * 1e3, 3)
            row[name + "_ns_row"] = round(t / rows * 1e9, 2)
            print(f"[{tag}] {name}: {t*1e3:.2f} ms "
                  f"({t/rows*1e9:.2f} ns/row)", file=sys.stderr, flush=True)
        row["fwd_speedup"] = round(row["fwd_xla_ms"] / row["fwd_onehot_ms"], 2)
        row["fb_speedup"] = round(row["fb_xla_ms"] / row["fb_onehot_ms"], 2)
        results.append(row)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
