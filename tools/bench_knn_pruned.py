"""On-chip A/B: flash-KNN (knn_blockmin) vs candidate-pruned KNN
(knn_pruned) at the model's hot shapes.

The CPU-side op-count analysis (BENCHLOG "KNN candidate pruning") predicts
<= 1.1x because both kernels are extraction-bound at the recall gate; this
measures whether real VMEM-load/issue costs disagree.  Decision rule: wire
knn_pruned into ops.knn only if it wins >= 1.15x at recall-gated configs.

Run on the real chip (ONE TPU process at a time):
    python tools/bench_knn_pruned.py
"""

import json
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honors OGC_PLATFORM, sets the compile cache
    import jax
    import jax.numpy as jnp

    from bench import make_timed
    from ogc_tpu.ops.pallas_knn import knn_blockmin, knn_pruned

    from tests.synth import scene_like_cloud  # REPO already on sys.path

    rng = np.random.RandomState(0)

    def scene(n):
        return scene_like_cloud(rng, n)

    # (B, N, M, k, pruned configs [(n_cand_blocks, blk)])
    cases = [
        (8, 4096, 8192, 32, [(32, 4), (28, 4)]),   # encoder sa1 (2B=16 is
                                                   # the eval batch; B=8
                                                   # keeps compile short)
        (8, 2048, 2048, 16, [(12, 4), (10, 2)]),   # FlowEmbedding / lr_idx
    ]
    results = []
    for B, N, M, k, cfgs in cases:
        q = jnp.asarray(np.stack([scene(N) for _ in range(B)]))
        p = jnp.asarray(np.stack([scene(M) for _ in range(B)]))

        # make_timed perturbs the LAST arg by the carry: perturb the query.
        t_flash = make_timed(
            lambda pp, qq: knn_blockmin(k, qq, pp)[0], reps=10
        )(p, q)
        row = {"shape": f"B{B} N{N} M{M} k{k}", "flash_ms": t_flash * 1e3}
        for bc, blk in cfgs:
            t_pr = make_timed(
                lambda pp, qq, bc=bc, blk=blk: knn_pruned(
                    k, qq, pp, n_cand_blocks=bc, blk=blk)[0],
                reps=10,
            )(p, q)
            row[f"pruned_bc{bc}_blk{blk}_ms"] = t_pr * 1e3
            row[f"speedup_bc{bc}_blk{blk}"] = t_flash / t_pr
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"bench": "knn_pruned_ab", "results": results}))


if __name__ == "__main__":
    main()
