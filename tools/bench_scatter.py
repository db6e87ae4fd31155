"""Microbench: segment-sum strategies for the smooth-loss backward scatter
(4.2M rows x 10 ch -> 65k rows).  One TPU process at a time."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from tools.profile_r3 import make_timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    rng = np.random.RandomState(0)
    R, OUT, K = 4_194_304, 65_536, 10
    # Ball-query-like destinations: clustered runs of nearby indices.
    base = rng.randint(0, OUT, R // 64)
    dest = (np.repeat(base, 64) + rng.randint(-32, 32, R)) % OUT
    dest = dest.astype(np.int32)
    vals = rng.randn(R, K).astype(np.float32)
    d_dev = jnp.asarray(dest)
    v_dev = jnp.asarray(vals)
    dsort = jnp.asarray(np.sort(dest))
    order = jnp.asarray(np.argsort(dest, kind="stable").astype(np.int32))

    def scatter_plain(d, v):
        return jnp.zeros((OUT, K), jnp.float32).at[d].add(v)

    def scatter_sorted_flag(d, v):
        return jnp.zeros((OUT, K), jnp.float32).at[d].add(
            v, indices_are_sorted=True
        )

    def seg_sum(d, v):
        return jax.ops.segment_sum(v, d, num_segments=OUT)

    def full_sortpath(d, v):
        # What a custom VJP would do end-to-end: sort keys+rowids, permute
        # payload, sorted scatter.
        keys, perm = jax.lax.sort_key_val(d, jnp.arange(R, dtype=jnp.int32))
        vp = jnp.take(v, perm, axis=0, mode="clip")
        return jnp.zeros((OUT, K), jnp.float32).at[keys].add(
            vp, indices_are_sorted=True
        )

    def cumsum_path(d, v):
        # sort + permute + exact cumsum + boundary difference (no scatter).
        keys, perm = jax.lax.sort_key_val(d, jnp.arange(R, dtype=jnp.int32))
        vp = jnp.take(v, perm, axis=0, mode="clip")
        cs = jnp.cumsum(vp, axis=0)
        starts = jnp.searchsorted(keys, jnp.arange(OUT, dtype=jnp.int32))
        ends = jnp.concatenate(
            [starts[1:], jnp.array([R], jnp.int32)]
        )
        cs = jnp.concatenate([jnp.zeros((1, K), jnp.float32), cs], axis=0)
        return jnp.take(cs, ends, axis=0, mode="clip") - jnp.take(
            cs, starts, axis=0, mode="clip"
        )

    for name, fn, args in [
        ("plain .at[].add", scatter_plain, (d_dev, v_dev)),
        ("sorted idx + flag", scatter_sorted_flag, (dsort, v_dev)),
        ("segment_sum", seg_sum, (d_dev, v_dev)),
        ("sort+permute+sorted-scatter", full_sortpath, (d_dev, v_dev)),
        ("sort+permute+cumsum-diff", cumsum_path, (d_dev, v_dev)),
    ]:
        t = make_timed(lambda a, b: fn(a, b))(*args)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)

    # correctness spot check for the cumsum path
    ref = np.zeros((OUT, K), np.float32)
    np.add.at(ref, dest, vals)
    got = np.asarray(jax.jit(cumsum_path)(d_dev, v_dev))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"cumsum-path max rel err vs numpy: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
