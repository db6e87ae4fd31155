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

        # Correctness first: on-chip bitwise equality of the two
        # extraction schemes (same d2 path => same packed keys), and
        # top-1 agreement of the MXU d2 arm.
        d_it, i_it = jax.jit(
            lambda qq, pp: knn_blockmin(k, qq, pp, extract="iter")
        )(q, p)
        d_bt, i_bt = jax.jit(
            lambda qq, pp: knn_blockmin(k, qq, pp, extract="bitonic")
        )(q, p)
        same = bool(jnp.all(i_it == i_bt)) and bool(jnp.all(d_it == d_bt))
        row = {"shape": f"B{B} N{N} M{M} k{k}", "match": same}
        try:
            _, i_mx = jax.jit(
                lambda qq, pp: knn_blockmin(k, qq, pp, d2_mode="mxu")
            )(q, p)
            row["mxu_top1_match"] = bool(jnp.all(i_it[..., 0] == i_mx[..., 0]))
            row["mxu_topk_agree"] = float(jnp.mean(i_it == i_mx))
        except Exception as e:  # Mosaic may reject the K=3 dot lowering
            row["mxu_error"] = repr(e)[:200]

        base = None
        for ext in ("iter", "bitonic"):
            for d2m in ("vpu", "mxu"):
                if "mxu_error" in row and d2m == "mxu":
                    continue
                t = make_timed(
                    lambda pp, qq, ext=ext, d2m=d2m: knn_blockmin(
                        k, qq, pp, extract=ext, d2_mode=d2m)[0],
                    reps=10,
                )(p, q)
                row[f"{ext}_{d2m}_ms"] = t * 1e3
                base = base if base is not None else t
                row[f"speedup_{ext}_{d2m}"] = base / t
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

    # Decision rules: flip OGC_PALLAS_KNN_EXTRACT default if bitonic wins
    # >= 1.10x everywhere with bitwise match; flip OGC_PALLAS_KNN_D2 only
    # if mxu wins >= 1.10x on top AND top-1 matches (quality ablation
    # before any default change).

    print(json.dumps({"bench": "knn_extract_ab", "results": results}))


if __name__ == "__main__":
    main()
