"""Measure Morton-window locality of the smooth-loss edge graphs.

Design probe for the r5 MXU edge arm (VERDICT r4 #1): if the smooth-loss
KNN/ball edges on a Morton-SORTED cloud land overwhelmingly inside a
narrow index band |j - i| < W, the edge gather/scatter can run as
block-local one-hot matmuls on the MXU (contraction over a W-wide
candidate window) with only the rare out-of-band edges spilling to the
existing gather path.  This probe quantifies the band coverage that any
such design must engineer around — per geometry, per table, per W.

Semantics probed are the reference smooth-loss tables at the KITTI
protocol shape (config/seg/kittisf/kittisf_unsup.yaml): self-KNN k=32
with radius-clamp 1.0 (clamped slots fall back to the SELF index —
always in-band) and ball query k=64 r=2.0 (empty balls fill row 0 —
handled as an always-present extra candidate).

Runs on CPU (exact tables; the band statistic is search-mode-agnostic).
"""

import argparse
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def make_cloud(kind: str, n: int, rng) -> np.ndarray:
    if kind == "uniform":
        # bench_train.py's distribution: 30 m uniform box.
        return 30.0 * rng.rand(n, 3).astype(np.float32)
    if kind == "street":
        # KITTI-ish: dominant ground plane + sparse vertical clutter.
        n_ground = int(n * 0.6)
        g = np.stack(
            [60 * rng.rand(n_ground) - 30, 20 * rng.rand(n_ground) - 10,
             0.2 * rng.randn(n_ground)], axis=1)
        n_obj = n - n_ground
        centers = np.stack(
            [60 * rng.rand(12) - 30, 20 * rng.rand(12) - 10,
             1.0 + 0.5 * rng.rand(12)], axis=1)
        which = rng.randint(0, 12, n_obj)
        o = centers[which] + np.stack(
            [0.8 * rng.randn(n_obj), 0.8 * rng.randn(n_obj),
             0.8 * rng.randn(n_obj)], axis=1)
        return np.concatenate([g, o], 0).astype(np.float32)
    if kind == "sapien":
        # Small articulated-part scene at SAPIEN scale (unit-ish cloud).
        centers = 0.6 * rng.randn(4, 3)
        which = rng.randint(0, 4, n)
        return (centers[which]
                + 0.15 * rng.randn(n, 3)).astype(np.float32)
    raise KeyError(kind)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_points", type=int, default=8192)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--knn_k", type=int, default=32)
    ap.add_argument("--knn_radius", type=float, default=1.0)
    ap.add_argument("--ball_k", type=int, default=64)
    ap.add_argument("--ball_radius", type=float, default=2.0)
    ap.add_argument("--geoms", type=str, default="uniform,street,sapien")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ogc_tpu import ops
    from ogc_tpu.ops.pallas_knn import morton_codes

    windows = [128, 256, 512, 1024, 2048]

    for geom in args.geoms.split(","):
        rng = np.random.RandomState(0)
        # SAPIEN protocol runs 512-pt clouds; keep its native shape.
        n = 512 if geom == "sapien" else args.n_points
        kk = 8 if geom == "sapien" else args.knn_k
        kr = 0.1 if geom == "sapien" else args.knn_radius
        bk = 16 if geom == "sapien" else args.ball_k
        br = 0.2 if geom == "sapien" else args.ball_radius
        stats = {("knn", w): [] for w in windows}
        stats.update({("ball", w): [] for w in windows})
        rowdirty = {("knn", w): [] for w in windows}
        rowdirty.update({("ball", w): [] for w in windows})
        for b in range(args.batches):
            pc = make_cloud(geom, n, rng)
            order = np.argsort(np.asarray(morton_codes(jnp.asarray(pc[None])))[0])
            pcs = jnp.asarray(pc[order][None])

            dist, idx_raw = ops.knn(kk, pcs, pcs, exact=True)
            idx_knn = np.asarray(
                jnp.where(dist > kr, idx_raw[..., :1], idx_raw))[0]
            idx_ball = np.asarray(
                ops.ball_query(br, bk, pcs, pcs, exact=True))[0]

            i = np.arange(n)[:, None]
            # Adaptive design statistic: distinct cb-sized candidate
            # blocks touched per qt-sized query tile (the contraction
            # width of a block-sparse one-hot kernel is
            # distinct_blocks * cb, paid per edge).
            for cb, qt in ((128, 256), (256, 256)):
                for name, idx in (("knn", idx_knn), ("ball", idx_ball)):
                    blk = idx // cb
                    nt = n // qt if n % qt == 0 else -(-n // qt)
                    counts = []
                    for t in range(nt):
                        counts.append(
                            len(np.unique(blk[t * qt:(t + 1) * qt])))
                    counts = np.array(counts)
                    print(f"  distinct {cb}-blocks/{qt}-tile [{name}]: "
                          f"mean {counts.mean():.1f} p50 "
                          f"{np.percentile(counts, 50):.0f} p95 "
                          f"{np.percentile(counts, 95):.0f} max "
                          f"{counts.max()} (eff W {cb*counts.mean():.0f})")
            for name, idx in (("knn", idx_knn), ("ball", idx_ball)):
                # Row 0 is the always-present extra candidate (empty-ball
                # fill target); self-edges are in-band by construction.
                disp = np.abs(idx - i)
                special = (idx == 0) | (idx == i)
                for w in windows:
                    out = (disp >= w) & ~special
                    stats[(name, w)].append(out.mean())
                    rowdirty[(name, w)].append(out.any(axis=1).mean())

        print(f"\n[{geom}] n={n} knn k={kk} r={kr}  ball k={bk} r={br} "
              f"({args.batches} clouds)")
        print("| table | W | edge spill % | dirty-row % |")
        print("|---|---|---|---|")
        for name in ("knn", "ball"):
            for w in windows:
                es = 100 * np.mean(stats[(name, w)])
                dr = 100 * np.mean(rowdirty[(name, w)])
                print(f"| {name} | {w} | {es:.3f} | {dr:.3f} |")


if __name__ == "__main__":
    main()
