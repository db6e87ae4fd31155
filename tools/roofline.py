"""Roofline / MFU measurement for the three hot jitted surfaces.

For seg fwd, flow fwd (5 iters), and the fused seg train step (B=8,
N=8192, KITTI config — the bench.py / bench_train.py protocol), reports:

  - measured wall time (bench.py's make_timed in-graph-scan methodology);
  - XLA cost-analysis FLOPs and bytes accessed of the compiled module;
  - achieved TFLOP/s and GB/s vs TPU v5e peaks (197 TFLOP/s bf16,
    819 GB/s HBM) -> MFU and HBM-roofline utilization;
  - two microbenchmark anchors: streaming-copy HBM bandwidth and
    random-row gather bandwidth at the model's hot gather shape, so the
    "gather row wall" can be stated as a fraction of achievable (not
    theoretical) bandwidth.

Caveats (also see BENCHLOG.md):
  - XLA "bytes accessed" counts each buffer use once; actual HBM traffic
    of fused loops can be lower (reuse in VMEM) or higher (spills), so
    the GB/s figure is an estimate, good to ~1.5x.
  - Run ON TPU, one process at a time: python tools/roofline.py [--train]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_BF16_TFLOPS = 197e12
V5E_HBM_GBS = 819e9

WARMUP = 2
ITERS = 5


from bench import make_timed  # canonical in-graph repetition timer


def cost_of(fn, *args):
    """XLA cost analysis (flops, bytes accessed) of the compiled fn."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def report(name, t, flops, bytes_, extra=""):
    tf = flops / t / 1e12
    gb = bytes_ / t / 1e9
    mfu = flops / t / V5E_BF16_TFLOPS * 100
    hbm = bytes_ / t / V5E_HBM_GBS * 100
    print(f"[{name}] {t*1e3:8.2f} ms | {flops/1e9:9.2f} GFLOP "
          f"{bytes_/1e9:8.3f} GB | {tf:6.2f} TFLOP/s ({mfu:5.1f}% MFU) | "
          f"{gb:6.1f} GB/s ({hbm:5.1f}% HBM) {extra}", file=sys.stderr)
    return dict(name=name, ms=t * 1e3, gflop=flops / 1e9, gb=bytes_ / 1e9,
                tflops=tf, mfu_pct=mfu, gbs=gb, hbm_pct=hbm)


def gather_anchors(B=8, n_src=2048, n_rows=3_500_000, C=64):
    """Anchor bandwidths: (a) streaming copy of a large f32 buffer;
    (b) random-row gather at the refinement loop's hot shape
    (~3.5M rows/iter of 32-128ch bf16, BENCHLOG r2)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.rand(512, 8192, 16).astype(np.float32))  # 256 MB

    # Stream bandwidth with the traffic enforced by a loop-carried ARRAY
    # dependency: each scan iteration must materialize its full-size carry
    # (1 read + 1 write of 256 MB), so XLA can neither fuse the passes away
    # nor collapse them into the final reduction.  (The earlier
    # perturb-and-reduce form under-measured: its only forced traffic was
    # one read, and XLA was free to split/fuse it unpredictably.)
    def stream(x):
        def body(c, _):
            return c * 1.000001 + 1e-7, None

        final, _ = jax.lax.scan(body, x, None, length=10)
        return jnp.sum(final)

    js = jax.jit(stream)
    float(js(big))
    float(js(big))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(js(big))
    t_copy = (time.perf_counter() - t0) / (ITERS * 10)
    copy_gbs = 2 * big.size * 4 / t_copy / 1e9  # read + write per iteration

    src = jnp.asarray(rng.rand(B, n_src, C).astype(np.float32)).astype(
        jnp.bfloat16)
    idx = jnp.asarray(
        rng.randint(0, n_src, size=(B, n_rows // B)).astype(np.int32))

    def gath(i, s):
        # make_timed perturbs the last arg with an f32 carry, which would
        # silently promote the bf16 source to f32 and double the row bytes
        # (measured ~2x on-chip); cast back so the gather moves true bf16
        # rows (the 2 MB/step cast is negligible vs the 450 MB gathered).
        return jnp.take_along_axis(
            s.astype(jnp.bfloat16), i[..., None].astype(jnp.int32),
            axis=1, mode="clip")

    # perturbable last arg must be float: swap arg order via closure
    t_g = make_timed(lambda i, s: gath(i, s))(idx, src)
    rows = B * (n_rows // B)
    g_gbs = rows * C * 2 / t_g / 1e9
    ns_row = t_g / rows * 1e9
    print(f"[anchor] stream copy {copy_gbs:.0f} GB/s "
          f"({copy_gbs/ (V5E_HBM_GBS/1e9) *100:.0f}% of v5e peak); "
          f"random gather {rows/1e6:.1f}M x {C}ch bf16 rows: "
          f"{ns_row:.2f} ns/row = {g_gbs:.0f} GB/s useful "
          f"({g_gbs / copy_gbs * 100:.0f}% of achieved stream)",
          file=sys.stderr)
    return dict(stream_gbs=copy_gbs, gather_ns_per_row=ns_row,
                gather_gbs=g_gbs, gather_rows=rows, gather_ch=C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="include the fused train step (slow compile)")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)

    B, N = 8, 8192
    rng = np.random.RandomState(0)
    pc = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))
    pc1 = pc[:1]

    results = {"anchors": gather_anchors()}
    rows = []

    segnet = MaskFormer3D(n_slot=10, n_point=N, arch="kitti",
                          n_transformer_layer=2, transformer_embed_dim=128)
    seg_params = jax.jit(segnet.init)(jax.random.PRNGKey(0), pc1, pc1)
    seg_fn = lambda p, x: segnet.apply(p, x, x)
    t_seg = make_timed(seg_fn)(seg_params, pc)
    fl, by = cost_of(lambda p, x: jnp.sum(seg_fn(p, x)), seg_params, pc)
    rows.append(report("seg fwd B8", t_seg, fl, by))

    from ogc_tpu.models.flownet import FlowStep3D

    flownet = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5,
                         loc_flow_nn=16, loc_flow_rad=1.5)
    fvars = jax.jit(lambda k, a, b: flownet.init(k, a, b, a, b, 2))(
        jax.random.PRNGKey(1), pc1, pc1)
    flow_fn = lambda v, a, b: flownet.apply(v, a, b, a, b, 5, train=False)[-1]
    t_flow = make_timed(lambda v, x: flow_fn(v, x, x))(fvars, pc)
    fl, by = cost_of(lambda v, x: jnp.sum(flow_fn(v, x, x)), fvars, pc)
    rows.append(report("flow fwd5 B8", t_flow, fl, by))

    if args.train:
        from ogc_tpu.losses.seg_unsup import OGCLossConfig
        from ogc_tpu.parallel import mesh as pmesh
        from ogc_tpu.train.seg import SegTrainer, make_optimizer

        loss_cfg = OGCLossConfig(
            weights=(10.0, 0.1, 0.1), start_steps=(0, 0, 0),
            smooth_w_knn=3.0, smooth_w_ball_q=1.0,
            knn_k=32, knn_radius=1.0, ball_q_k=64, ball_q_radius=2.0,
        )
        pc0 = jnp.zeros((1, N, 3), jnp.float32)
        params = jax.jit(segnet.init)(jax.random.PRNGKey(0), pc0, pc0)
        optimizer = make_optimizer(1e-3, 0.7, 1e-5, 200000, B)
        trainer = SegTrainer(
            model=segnet, params=params, loss_cfg=loss_cfg,
            optimizer=optimizer, aug_transform_epoch=9999,
            ignore_npoint_thresh=50, exp_base="/tmp/ogc_roofline",
            mesh=pmesh.make_mesh(jax.devices()[:1]),
        )
        pcs = jnp.asarray(
            30.0 * rng.rand(B, 2, N, 3).astype(np.float32))
        flows = jnp.asarray(
            0.5 * rng.randn(B, 2, N, 3).astype(np.float32))

        def step(p, o, pcs, flows):
            p, o, ld, _ = trainer._train_step_impl(
                p, o, pcs, flows, jnp.int32(10**6), False)
            return p, o, ld["sum"]

        # Timing: scan carrying (params, opt) like bench_train.
        def repeated(p, o, pcs, flows):
            def body(carry, _):
                p, o = carry
                p, o, s = step(p, o, pcs, flows)
                return (p, o), s

            (_, _), ss = jax.lax.scan(body, (p, o), None, length=5)
            return ss[-1]

        jitted = jax.jit(repeated)
        a = (trainer.params, trainer.opt_state, pcs, flows)
        float(jitted(*a))
        float(jitted(*a))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            float(jitted(*a))
        t_step = (time.perf_counter() - t0) / (ITERS * 5)

        def one(p, o, pcs, flows):
            p2, o2, s = step(p, o, pcs, flows)
            return p2, o2, s

        fl, by = cost_of(one, *a)
        rows.append(report("train step B8", t_step, fl, by))

    results["surfaces"] = rows
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
