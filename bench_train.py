"""Training-step benchmark: fused unsupervised seg train step, KITTI config.

Measures the production SegTrainer._train_step (MaskFormer3D forward over
both frames + full OGC loss incl. weighted Kabsch and in-graph Hungarian +
backward + Adam update) at B=8, N=8192 — BASELINE.md configs 2/5 are full
train_seg loops, which the forward-only bench.py does not cover.

Prints one JSON line per measurement:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
plus a component breakdown (forward-only, per-loss-term fwd+bwd) on stderr.

Timing methodology matches bench.py: steps are repeated inside one jit via
lax.scan carrying (params, opt_state) — per-step wall time is amortized
against a single scalar host read (the TPU relay makes block_until_ready
unreliable as a barrier).
"""

import argparse
import json
import sys
import time

import numpy as np

# Derived A100 estimate of the reference train_seg step (fwd + OGC loss +
# bwd + Adam) at N=8192: tools/derive_baseline.py --train measures the
# unmodified reference stack (6,717 aten ops, 26.2 GFLOP matmul/conv,
# 21.0 GB eager traffic per scene) and applies a generous per-resource A100
# roofline (HBM-bound: 21 GB / 1.09 TB/s = 19.3 ms/scene).  Full
# derivation: BASELINE.md; constants: tools/baseline_derivation_train.json.
# Generosity means this is an UPPER bound on the reference's speed, so
# vs_baseline is conservative.
REFERENCE_A100_TRAIN_SCENES_PER_SEC = 51.9

BATCH = 8
N_POINTS = 8192
T_FRAMES = 2
WARMUP = 2
ITERS = 3
REPS = 5


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--arms", type=str, default=None,
        help="substring filter on breakdown-arm names (e.g. 'remat' runs "
             "only the remat A/B arms); default runs all arms",
    )
    ap.add_argument(
        "--skip_headline", action="store_true",
        help="skip the headline full-step measurement (its 247.7 ms figure "
             "is the remat=off comparison point, re-measured every queue "
             "run) and go straight to the filtered arms",
    )
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu.losses.seg_unsup import OGCLossConfig, ogc_loss
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.nn.layers import set_compute_dtype
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.seg import SegTrainer, make_optimizer

    set_compute_dtype(jnp.bfloat16)

    # KITTI-SF protocol (config/seg/kittisf/kittisf_unsup.yaml).
    loss_cfg = OGCLossConfig(
        weights=(10.0, 0.1, 0.1), start_steps=(0, 0, 0),
        smooth_w_knn=3.0, smooth_w_ball_q=1.0,
        knn_k=32, knn_radius=1.0, ball_q_k=64, ball_q_radius=2.0,
    )
    model = MaskFormer3D(
        n_slot=10, n_point=N_POINTS, arch="kitti",
        n_transformer_layer=2, transformer_embed_dim=128,
    )
    rng = np.random.RandomState(0)
    pc0 = jnp.zeros((1, N_POINTS, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pc0, pc0)
    optimizer = make_optimizer(1e-3, 0.7, 1e-5, 200000, BATCH)
    trainer = SegTrainer(
        model=model, params=params, loss_cfg=loss_cfg, optimizer=optimizer,
        aug_transform_epoch=9999, ignore_npoint_thresh=50,
        exp_base="/tmp/ogc_bench_train",
        mesh=pmesh.make_mesh(jax.devices()[:1]),
    )

    pcs = jnp.asarray(
        30.0 * rng.rand(BATCH, T_FRAMES, N_POINTS, 3).astype(np.float32)
    )
    flows = jnp.asarray(
        0.5 * rng.randn(BATCH, T_FRAMES, N_POINTS, 3).astype(np.float32)
    )

    def timed_scan(step_fn):
        def repeated(params, opt_state, pcs, flows):
            def body(carry, _):
                p, o = carry
                p, o, ld = step_fn(p, o, pcs, flows)
                return (p, o), ld

            (_, _), lds = jax.lax.scan(
                body, (params, opt_state), None, length=REPS
            )
            return lds[-1]

        jitted = jax.jit(repeated)

        def run(*args):
            t0 = time.perf_counter()
            float(jitted(*args))
            compile_s = time.perf_counter() - t0
            for _ in range(WARMUP - 1):
                float(jitted(*args))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                float(jitted(*args))
            return (time.perf_counter() - t0) / (ITERS * REPS), compile_s

        return run

    def full_step(p, o, pcs, flows):
        p, o, ld, _ = trainer._train_step_impl(
            p, o, pcs, flows, jnp.int32(10**6), False
        )
        return p, o, ld["sum"]

    if not cli.skip_headline:
        t_step, compile_s = timed_scan(full_step)(
            trainer.params, trainer.opt_state, pcs, flows
        )
        scenes_per_sec = BATCH / t_step
        print(
            json.dumps(
                {
                    "metric": "kittisf_train_step_scenes_per_sec_per_chip",
                    "value": round(scenes_per_sec, 3),
                    "unit": "scenes/s",
                    "vs_baseline": round(
                        scenes_per_sec / REFERENCE_A100_TRAIN_SCENES_PER_SEC,
                        3,
                    ),
                }
            )
        )
        print(
            f"# train step: {t_step*1e3:.1f} ms/batch, "
            f"compile {compile_s:.0f}s",
            file=sys.stderr,
        )

    # ---- component breakdown ---------------------------------------------
    # Each variant is a REAL optimizer step with some loss weights zeroed:
    # a variant that leaves params unchanged is loop-invariant inside the
    # timing scan and XLA hoists it (one compute amortized over REPS),
    # silently dividing the measurement by REPS.
    def ablated_step(weights, symmetric=False, monitors=True,
                     graph="reference", remat="off", smooth_exact=None,
                     edge_engine="gather", scat_kernel=False,
                     ref_bwd="autodiff"):
        cfg = OGCLossConfig(
            weights=weights, start_steps=(0, 0, 0),
            smooth_w_knn=loss_cfg.smooth_w_knn,
            smooth_w_ball_q=loss_cfg.smooth_w_ball_q,
            knn_k=loss_cfg.knn_k, knn_radius=loss_cfg.knn_radius,
            ball_q_k=loss_cfg.ball_q_k, ball_q_radius=loss_cfg.ball_q_radius,
            symmetric_smooth_grad=symmetric,
            monitor_terms=monitors, smooth_graph=graph,
            smooth_exact=smooth_exact, smooth_edge_engine=edge_engine,
            smooth_scatter_kernel=scat_kernel, smooth_ref_bwd=ref_bwd,
        )
        tr = SegTrainer(
            model=model, params=params, loss_cfg=cfg, optimizer=optimizer,
            aug_transform_epoch=9999, ignore_npoint_thresh=50,
            exp_base="/tmp/ogc_bench_train",
            mesh=pmesh.make_mesh(jax.devices()[:1]),
            remat=remat,
        )

        def step(p, o, pcs, flows):
            p, o, ld, _ = tr._train_step_impl(
                p, o, pcs, flows, jnp.int32(10**6), False
            )
            return p, o, ld["sum"]

        return step

    extra_arms = [
        # Targeted VMEM-scatter routing for the reference-graph smooth
        # backward ONLY (smooth_scatter_kernel) — the r4 closure measured
        # blanket routing; the smooth tables are the distribution the
        # kernel wins on isolated (10.6-16.4 vs 18-25 ns/row).
        ("full, reference graph + smooth-only VMEM scatter kernel",
         (10.0, 0.1, 0.1), False, True, "reference", "off", None,
         "gather", True, "autodiff"),
        # r5 EXACT differentiation-structure arms against the ~150 ms gap
        # symgrad exposed (symgrad's whole smooth fwd+bwd ~135 ms < the
        # autodiff path's 214 ms fwd): identical gradients, different
        # residual/fusion structure.
        ("full, reference + smooth_ref_bwd=lean (custom VJP, exact)",
         (10.0, 0.1, 0.1), False, True, "reference", "off", None,
         "gather", False, "lean"),
        ("full, reference + smooth_ref_bwd=remat (term checkpoint, exact)",
         (10.0, 0.1, 0.1), False, True, "reference", "off", None,
         "gather", False, "remat"),
    ]
    for name, w, sym, mon, graph, remat, sm_exact, engine in [
        ("model fwd+bwd + monitors + Adam", (0.0, 0.0, 0.0), False, True,
         "reference", "off", None, "gather"),
        # Isolate the smooth-loss machinery (r4 timeline finding: every
        # r3 arm computed the smooth forward for the log dict, so its
        # cost was invisible).  weights-0 + monitors-off would DCE the
        # whole model (zero grads -> constant step); dynamic-only keeps a
        # real data-dependent gradient while the smooth machinery is
        # statically skipped: smooth cost = full-step minus this.
        ("model + dynamic only, monitors off (no smooth machinery)",
         (10.0, 0.0, 0.0), False, False, "reference", "off", None, "gather"),
        ("+ dynamic (Kabsch)", (10.0, 0.0, 0.0), False, True, "reference",
         "off", None, "gather"),
        # r5: 'reference' is the DEFAULT graph again (the 10-seed paired
        # ablation measured a PQ deficit for 'mutual' — PARITY.md).
        ("+ smooth reference graph (default: autodiff scatter-add)",
         (0.0, 0.1, 0.0), False, True, "reference", "off", None, "gather"),
        # r5 MXU edge engine (block-sparse one-hot matmuls over the
        # Morton-sorted cloud, ops/pallas_onehot.py) vs the row wall.
        ("+ smooth reference graph via MXU edge engine",
         (0.0, 0.1, 0.0), False, True, "reference", "off", None, "mxu"),
        ("+ smooth mutual graph (r5 opt-in: exact scatter-free grad)",
         (0.0, 0.1, 0.0), False, True, "mutual", "off", None, "gather"),
        ("full, reference graph (default / parity graph)",
         (10.0, 0.1, 0.1), False, True, "reference", "off", None, "gather"),
        ("full, reference graph + MXU edge engine",
         (10.0, 0.1, 0.1), False, True, "reference", "off", None, "mxu"),
        ("full, reference + MXU engine + monitor_terms off",
         (10.0, 0.1, 0.1), False, False, "reference", "off", None, "mxu"),
        ("full, reference graph + symmetric_smooth_grad (approx bwd)",
         (10.0, 0.1, 0.1), True, True, "reference", "off", None, "gather"),
        ("full, reference graph + monitor_terms off",
         (10.0, 0.1, 0.1), False, False, "reference", "off", None, "gather"),
        ("full, mutual (r5 opt-in) + monitor_terms off",
         (10.0, 0.1, 0.1), False, False, "mutual", "off", None, "gather"),
        # Remat arms: measured r4 — both REGRESS ~9% (the step is gather-
        # latency-bound, not byte-bound; BENCHLOG r4 roofline
        # reconciliation).  Kept for re-measurement on future configs.
        ("full, reference + remat=full (bwd recomputes fwd)",
         (10.0, 0.1, 0.1), False, True, "reference", "full", None, "gather"),
        ("full, reference + remat=dots (save matmul outputs)",
         (10.0, 0.1, 0.1), False, True, "reference", "dots", None, "gather"),
        # r4 smoothexact arms: exact smooth-loss tables (pruned-exact ball
        # kernel) + the SCALAR mutual-membership test vs the shipping
        # approx tables + gather-based membership (~50 ms of neighbor-list
        # gathers in the r4 timeline).
        ("full, mutual + smoothexact tables (scalar membership)",
         (10.0, 0.1, 0.1), False, True, "mutual", "off", True, "gather"),
        ("full, mutual_gather + smoothexact tables (exact + gather test)",
         (10.0, 0.1, 0.1), False, True, "mutual_gather", "off", True, "gather"),
        ("full, mutual_gather + approx tables (r3 shipping form)",
         (10.0, 0.1, 0.1), False, True, "mutual_gather", "off", False, "gather"),
    ]:
        if cli.arms is not None and cli.arms not in name:
            continue
        t, _ = timed_scan(ablated_step(w, sym, mon, graph, remat,
                                       sm_exact, engine))(
            trainer.params, trainer.opt_state, pcs, flows
        )
        print(f"# {name}: {t*1e3:.1f} ms/batch", file=sys.stderr)
    for (name, w, sym, mon, graph, remat, sm_exact, engine, sk,
         rbwd) in extra_arms:
        if cli.arms is not None and cli.arms not in name:
            continue
        t, _ = timed_scan(ablated_step(w, sym, mon, graph, remat,
                                       sm_exact, engine, sk, rbwd))(
            trainer.params, trainer.opt_state, pcs, flows
        )
        print(f"# {name}: {t*1e3:.1f} ms/batch", file=sys.stderr)


if __name__ == "__main__":
    main()
