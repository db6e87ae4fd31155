"""Quantify framework-mode deviations by short training ablations
(VERDICT r1 #6/#7).

Trains paired short unsupervised seg runs on synthetic rigid scenes and
evaluates every (train mode x eval mode) combination:

  --ablate neighbors  exact vs approximate neighbor search (the default)
  --ablate symgrad    autodiff vs symmetric-graph smooth gradients
  --ablate dtype      f32 vs bf16 compute-dtype training

--seeds N repeats the whole grid over N seeds (fresh data, init, shuffle
per seed) and reports mean +/- std per cell — single-seed deltas at this
scale are dominated by run-to-run noise (PARITY.md r1).

Run ON TPU (the approximate path lowers to exact on CPU):
    python tools/ablate_approx_knn.py --seeds 5 [--epochs 12]
Prints a markdown table for PARITY.md.
"""

import argparse
import os.path as osp
import sys
import tempfile

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--n_points", type=int, default=2048)
    parser.add_argument("--n_scenes", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ablate",
                        choices=["neighbors", "symgrad", "dtype", "graph"],
                        default="neighbors",
                        help="neighbors: exact vs approx search; symgrad: "
                             "autodiff vs symmetric-graph smooth gradient; "
                             "dtype: f32 vs bf16 compute-dtype training; "
                             "graph: mutual vs reference smooth graph "
                             "(non-neighbors modes train approximate)")
    parser.add_argument("--seeds", type=int, default=1,
                        help="number of seeds (fresh data/init per seed); "
                             "reports mean +/- std")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ogc_tpu import ops
    from ogc_tpu.data.base import DataLoader
    from ogc_tpu.data.sapien import SapienDataset
    from ogc_tpu.losses.seg_unsup import OGCLossConfig
    from ogc_tpu.metrics.seg import (
        accumulate_eval_results,
        calculate_PQ_F1,
        clustering_metrics,
    )
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.nn.layers import set_compute_dtype
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.seg import SegTrainer, make_optimizer
    from tests.synth import make_sapien_root

    def make_sets(seed):
        root = make_sapien_root(
            osp.join(tempfile.mkdtemp(prefix="ablate_"), "mbs-shapepart"),
            n_scenes=args.n_scenes, n_views=4, n_points=args.n_points,
            n_parts=3, seed=seed,
        )
        train_set = SapienDataset(root, split="train",
                                  view_sels=[[0, 1], [1, 2], [2, 3]])
        test_set = SapienDataset(root, split="test", view_sels=[[0, 1]])
        return train_set, test_set

    def make_model():
        return MaskFormer3D(
            n_slot=8, n_point=args.n_points, arch="ogcdr",
            n_transformer_layer=2, transformer_embed_dim=128,
        )

    def train_one(variant: bool, seed: int, train_set):
        # neighbors: variant = exact search.  symgrad: variant =
        # symmetric_smooth_grad.  dtype: variant = bf16 compute (both
        # non-neighbors modes train with the approximate default).
        symgrad = False
        graph = "reference"
        if args.ablate == "neighbors":
            ops.set_exact_neighbors(variant)
        elif args.ablate == "symgrad":
            ops.set_exact_neighbors(False)
            symgrad = variant
        elif args.ablate == "graph":
            ops.set_exact_neighbors(False)
            graph = "mutual" if variant else "reference"
        else:
            ops.set_exact_neighbors(False)
            set_compute_dtype(jnp.bfloat16 if variant else None)
        model = make_model()
        pc0 = jnp.zeros((1, args.n_points, 3))
        params = model.init(jax.random.PRNGKey(seed), pc0, pc0)
        trainer = SegTrainer(
            model=model, params=params,
            loss_cfg=OGCLossConfig(
                weights=(10.0, 0.1, 0.0), start_steps=(0, 0, 0),
                knn_k=8, knn_radius=0.05, ball_q_k=16, ball_q_radius=0.1,
                symmetric_smooth_grad=symgrad, smooth_graph=graph,
            ),
            optimizer=make_optimizer(1e-3, 0.7, 1e-5, 200000, 4),
            aug_transform_epoch=9999, ignore_npoint_thresh=0,
            exp_base=tempfile.mkdtemp(prefix="ablate_ckpt_"),
            mesh=pmesh.make_mesh(jax.devices()[:1]),
        )
        loader = DataLoader(train_set, batch_size=4, shuffle=True,
                            seed=seed, drop_last=True, num_workers=2)
        it = 0
        for epoch in range(args.epochs):
            for batch in loader:
                ld, _, _ = trainer.train_it(it, batch)
                it += 1
            print(f"  [seed={seed} variant={variant}] epoch {epoch + 1}: "
                  f"loss={ld['sum']:.4f}", file=sys.stderr, flush=True)
        set_compute_dtype(None)
        return trainer

    def evaluate(trainer, exact: bool, test_set):
        ops.set_exact_neighbors(exact)
        model = trainer.model

        @jax.jit
        def fwd(params, pc):
            return model.apply(params, pc, pc)

        ap = {"iou": [], "matched": [], "ngt": []}
        mious, ris = [], []
        loader = DataLoader(test_set, batch_size=4, shuffle=False,
                            num_workers=2)
        for pcs, segms, _, _ in loader:
            mask = np.asarray(fwd(trainer.params, jnp.asarray(pcs[:, 0])))
            iou, matched, _, ngt = accumulate_eval_results(
                segms[:, 0], mask, 0
            )
            ap["iou"].append(iou)
            ap["matched"].append(matched)
            ap["ngt"].append(ngt)
            cm = clustering_metrics(mask, segms[:, 0], spec=["iou", "ri"])
            mious += cm["iou"]
            ris += cm["ri"]
        pq, f1, _, _ = calculate_PQ_F1(
            np.concatenate(ap["iou"]), np.concatenate(ap["matched"]),
            int(np.sum(ap["ngt"])),
        )
        return {"PQ@50": pq, "F1@50": f1,
                "mIoU": float(np.mean(mious)), "RI": float(np.mean(ris))}

    names = {
        "neighbors": ("exact", "approx"),
        "symgrad": ("symgrad", "autodiff"),
        "dtype": ("bf16", "f32"),
        "graph": ("mutual", "reference"),
    }[args.ablate]
    results = {}  # (variant, eval_mode) -> list of per-seed dicts
    for s in range(args.seeds):
        seed = args.seed + s
        train_set, test_set = make_sets(seed)
        for variant in (True, False):
            trainer = train_one(variant, seed, train_set)
            vname = names[0] if variant else names[1]
            for eval_exact in (True, False):
                key = (vname, ("exact" if eval_exact else "approx"))
                r = evaluate(trainer, eval_exact, test_set)
                results.setdefault(key, []).append(r)
                print(f"seed {seed} {key}: {r}", file=sys.stderr, flush=True)

    metrics = ("PQ@50", "F1@50", "mIoU", "RI")
    print(f"\n[{args.ablate}, {args.seeds} seed(s), {args.epochs} epochs, "
          f"{args.n_points} pts, {args.n_scenes} scenes]")
    print("| train \\ eval | " + " | ".join(metrics) + " |")
    print("|---|" + "---|" * len(metrics))
    for key, runs in results.items():
        cells = []
        for m in metrics:
            vals = np.array([r[m] for r in runs])
            cells.append(
                f"{vals.mean():.4f}"
                + (f" ± {vals.std():.4f}" if len(vals) > 1 else "")
            )
        print(f"| {key[0]} / {key[1]} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
