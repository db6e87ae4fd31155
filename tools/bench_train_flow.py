"""Flow-training-step benchmark (the BASELINE workload bench_train.py does
not cover: train_flow.py's FlowStep3D + UnsupervisedFlowStep3DLoss + bwd +
Adam).

Two protocols:
  - sapien: the reference's actual flow-training config
    (config/flow/sapien/sapien_unsup.yaml: 512 pts, B=32, iters=4,
    loc_flow_nn=8/rad=0.1) — reference train_flow.py:59-91.
  - kitti-scale probe: kitti arch at 8192 pts, B=8, iters=4 (the
    reference never trains flow at this scale — its KITTI flow weights
    ship pre-trained — so this is a TPU-first serving-scale figure, no
    baseline attached).

No derived A100 baseline exists for flow training yet (derive_baseline.py
covers seg); figures are absolute ms/batch + scenes/s.

Run ON TPU, one process at a time: python tools/bench_train_flow.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

WARMUP = 2
ITERS = 3
REPS = 5


def bench_one(tag, npoint, batch, model_iters, arch, loc_nn, loc_rad,
              iters_w, remat=None, remat_refine=False):
    import jax
    import jax.numpy as jnp
    import optax

    from ogc_tpu.losses.flow_unsup import FlowLossConfig
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.flow import FlowTrainer

    model = FlowStep3D(npoint=npoint, arch=arch, loc_flow_nn=loc_nn,
                       loc_flow_rad=loc_rad, k_decay_fact=1.0,
                       remat_refine=remat_refine)
    pc0 = jnp.zeros((1, npoint, 3), jnp.float32)
    variables = jax.jit(lambda k, a: model.init(k, a, a, a, a, 2))(
        jax.random.PRNGKey(0), pc0)
    trainer = FlowTrainer(
        model=model, variables=variables, model_iters=model_iters,
        loss_cfg=FlowLossConfig(weights=(0.75, 0.25), iters_w=iters_w),
        optimizer=optax.adamw(1e-3, weight_decay=1e-7),
        exp_base="/tmp/ogc_bench_train_flow",
        mesh=pmesh.make_mesh(jax.devices()[:1]),
        remat=remat,
    )

    rng = np.random.RandomState(0)
    scale = 30.0 if npoint >= 4096 else 1.0
    pc1 = jnp.asarray(scale * rng.rand(batch, npoint, 3).astype(np.float32))
    pc2 = pc1 + jnp.asarray(
        0.02 * scale * rng.randn(batch, npoint, 3).astype(np.float32))
    gtf = jnp.asarray(jnp.zeros((batch, npoint, 3), jnp.float32))

    def repeated(params, stats, opt_state, pc1, pc2, gtf):
        def body(carry, _):
            p, s, o = carry
            p, s, o, ld = trainer._train_step_impl(
                p, s, o, pc1, pc2, gtf, jnp.float32(0.9))
            return (p, s, o), ld["sum"]

        (_, _, _), ss = jax.lax.scan(
            body, (params, stats, opt_state), None, length=REPS)
        return ss[-1]

    jitted = jax.jit(repeated)
    args = (trainer.params, trainer.batch_stats, trainer.opt_state,
            pc1, pc2, gtf)
    t0 = time.perf_counter()
    float(jitted(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(WARMUP - 1):
        float(jitted(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(jitted(*args))
    t = (time.perf_counter() - t0) / (ITERS * REPS)
    row = dict(protocol=tag, ms_per_batch=t * 1e3,
               scenes_per_sec=batch / t, compile_s=compile_s)
    print(f"[{tag}] {t*1e3:.1f} ms/batch = {batch/t:.1f} scenes/s "
          f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
    return row


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)

    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=str, default=None,
                    help="substring filter on arm names; default: the two "
                         "headline protocols only (r4 behavior)")
    cli = ap.parse_args()

    def want(name):
        # Comma-separated substring filters; "decomp" alone matches the
        # whole decomposition set, "decomp_onehot" just that arm.
        if cli.arms is None:
            return False
        return any(a in name for a in cli.arms.split(","))

    results = []
    if cli.arms is None or want("sapien_ref_protocol"):
        results.append(
            bench_one("sapien_ref_protocol", 512, 32, 4, "sapien", 8, 0.1,
                      (0.5, 0.3, 0.3, 0.3)))
    # ---- r5 decomposition arms (VERDICT r4 #5: the 61.4 ms step was a
    # single unexplained number).  Each isolates one axis of the sapien
    # protocol; run with --arms decomp for the set.
    # Recurrence depth: iters=1 vs the protocol's 4 — splits the
    # prefix (encoders + global corr + flow0) from the GRU body.
    if want("decomp_iters"):
        results.append(
            bench_one("decomp_iters1", 512, 32, 1, "sapien", 8, 0.1,
                      (0.5,)))
        results.append(
            bench_one("decomp_iters2", 512, 32, 2, "sapien", 8, 0.1,
                      (0.5, 0.3)))
    # Batch scaling: latency/launch-bound steps scale sub-linearly in
    # B; a compute-bound step doubles.
    if want("decomp_B64"):
        results.append(
            bench_one("decomp_B64", 512, 64, 4, "sapien", 8, 0.1,
                      (0.5, 0.3, 0.3, 0.3)))
    if want("decomp_B128"):
        # NOTE: died twice on the remote compile helper (r5: HTTP 500 +
        # a 192 MB-temps allocation dump) — run only when explicitly
        # named; B-scaling is already established sub-linear by B64.
        results.append(
            bench_one("decomp_B128", 512, 128, 4, "sapien", 8, 0.1,
                      (0.5, 0.3, 0.3, 0.3)))
    # One-hot grouping for the 512-pt gathers (ops/pallas_onehot.py;
    # corrected standalone A/B r5: fwd 1.14x, fwd+bwd 1.81x at N=512).
    if want("decomp_onehot"):
        os.environ["OGC_GROUP_ONEHOT"] = "auto"
        try:
            results.append(
                bench_one("decomp_onehot_groups", 512, 32, 4, "sapien",
                          8, 0.1, (0.5, 0.3, 0.3, 0.3)))
        finally:
            os.environ["OGC_GROUP_ONEHOT"] = "off"
    if cli.arms is None or want("kitti_scale_probe"):
        # Stored activations at 8192 x B8 x iters4 OOM the 16 GB HBM
        # (384 MB temps per grouped level x iterations) — this probe is
        # the remat machinery's actual use case: per-GRU-iteration
        # nn.remat (model remat_refine) + whole-forward jax.checkpoint.
        results.append(
            bench_one("kitti_scale_probe", 8192, 4, 4, "kitti", 16, 1.5,
                      (0.5, 0.3, 0.3, 0.3), remat="full",
                      remat_refine=True))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
