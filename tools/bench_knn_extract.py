"""On-chip A/B: iterative vs partial-bitonic key extraction in flash-KNN.

The op-count model (pallas_knn._bitonic_smallest docstring) predicts the
bitonic network cuts extraction element-ops ~4x at k=32 / G=2048 and ~3x
at k=16 / G=256; extraction is the dominant term of the kernel (BENCHLOG
"Neighbor-search floor").  Decision rule: flip the OGC_PALLAS_KNN_EXTRACT
default to "bitonic" if it wins >= 1.10x at BOTH hot shapes and the
on-chip outputs match the iterative path bitwise.

Run on the real chip (ONE TPU process at a time):
    python tools/bench_knn_extract.py
"""

import json
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from bench import make_timed
    from ogc_tpu.ops.pallas_knn import ball_query_blockmin, knn_blockmin

    from tests.synth import scene_like_cloud

    rng = np.random.RandomState(0)

    def scene(n):
        return scene_like_cloud(rng, n)

    # The model's hot shapes (see bench_knn_pruned.py): encoder sa1 and the
    # FlowEmbedding / shared low-res table.
    cases = [
        (8, 4096, 8192, 32),
        (8, 2048, 2048, 16),
    ]
    results = []
    for B, N, M, k in cases:
        q = jnp.asarray(np.stack([scene(N) for _ in range(B)]))
        p = jnp.asarray(np.stack([scene(M) for _ in range(B)]))

        # Correctness first: on-chip bitwise equality of the two schemes.
        d_it, i_it = jax.jit(
            lambda qq, pp: knn_blockmin(k, qq, pp, extract="iter")
        )(q, p)
        d_bt, i_bt = jax.jit(
            lambda qq, pp: knn_blockmin(k, qq, pp, extract="bitonic")
        )(q, p)
        same = bool(jnp.all(i_it == i_bt)) and bool(jnp.all(d_it == d_bt))

        t_it = make_timed(
            lambda pp, qq: knn_blockmin(k, qq, pp, extract="iter")[0],
            reps=10,
        )(p, q)
        t_bt = make_timed(
            lambda pp, qq: knn_blockmin(k, qq, pp, extract="bitonic")[0],
            reps=10,
        )(p, q)
        row = {
            "shape": f"B{B} N{N} M{M} k{k}", "match": same,
            "iter_ms": t_it * 1e3, "bitonic_ms": t_bt * 1e3,
            "speedup": t_it / t_bt,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # Ball mode at the smooth-loss shape (8192 centers, r=1.0, ns=32).
    B, M, k = 8, 8192, 32
    p = jnp.asarray(np.stack([scene(M) for _ in range(B)]))
    t_it = make_timed(
        lambda pp, qq: ball_query_blockmin(1.0, k, pp, qq, extract="iter"),
        reps=10,
    )(p, p)
    t_bt = make_timed(
        lambda pp, qq: ball_query_blockmin(1.0, k, pp, qq, extract="bitonic"),
        reps=10,
    )(p, p)
    row = {"shape": f"ball B{B} M{M} ns{k}", "iter_ms": t_it * 1e3,
           "bitonic_ms": t_bt * 1e3, "speedup": t_it / t_bt}
    results.append(row)
    print(json.dumps(row), flush=True)

    print(json.dumps({"bench": "knn_extract_ab", "results": results}))


if __name__ == "__main__":
    main()
