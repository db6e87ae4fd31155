"""Capture a jax.profiler trace of the flow/seg forward and print the top
HLO ops by total device time (parsed with jax.profiler.ProfileData — no
TensorBoard needed).

Usage: python tools/trace_flow.py [flow|seg|train] [B]
"""

import glob
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def top_ops(trace_dir, n=45):
    from jax.profiler import ProfileData

    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    assert files, f"no xplane under {trace_dir}"
    pd = ProfileData.from_file(files[-1])
    totals = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue  # sync op stream only; async DMAs overlap compute
            for ev in line.events:
                d, c = totals.get(ev.name, (0.0, 0))
                totals[ev.name] = (d + ev.duration_ns, c + 1)
    items = sorted(totals.items(), key=lambda kv: -kv[1][0])
    tot = sum(d for d, _ in totals.values())
    print(f"total sync op time: {tot/1e6:.2f} ms ({len(totals)} distinct ops)")
    for name, (dur, cnt) in items[:n]:
        print(f"{dur/1e6:9.3f} ms x{cnt:<3d} {name[:130]}")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    what = sys.argv[1] if len(sys.argv) > 1 else "flow"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    N = 8192
    rng = np.random.RandomState(0)

    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)

    pc1 = jnp.asarray(30.0 * rng.rand(1, N, 3).astype(np.float32))
    pc = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))

    if what == "flow":
        from ogc_tpu.models.flownet import FlowStep3D

        net = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5,
                        loc_flow_nn=16, loc_flow_rad=1.5)
        fvars = jax.jit(lambda k, a, b: net.init(k, a, b, a, b, 2))(
            jax.random.PRNGKey(1), pc1, pc1
        )
        fn = jax.jit(
            lambda v, a, b: jnp.sum(net.apply(v, a, b, a, b, 5, train=False)[-1])
        )
        args = (fvars, pc, pc)
    elif what == "seg":
        from ogc_tpu.models.segnet import MaskFormer3D

        net = MaskFormer3D(
            n_slot=10, n_point=N, arch="kitti",
            n_transformer_layer=2, transformer_embed_dim=128,
        )
        params = jax.jit(net.init)(jax.random.PRNGKey(0), pc1, pc1)
        fn = jax.jit(lambda p, x: jnp.sum(net.apply(p, x, x)))
        args = (params, pc)
    elif what == "train_flow":
        # Flow-training step at the reference sapien protocol
        # (tools/bench_train_flow.py): 512 pts, B=32, iters=4.
        import optax

        from ogc_tpu.losses.flow_unsup import FlowLossConfig
        from ogc_tpu.models.flownet import FlowStep3D
        from ogc_tpu.parallel import mesh as pmesh
        from ogc_tpu.train.flow import FlowTrainer

        NF, BF = 512, 32
        fnet = FlowStep3D(npoint=NF, arch="sapien", loc_flow_nn=8,
                          loc_flow_rad=0.1, k_decay_fact=1.0)
        pc0 = jnp.zeros((1, NF, 3), jnp.float32)
        fv = jax.jit(lambda k, a: fnet.init(k, a, a, a, a, 2))(
            jax.random.PRNGKey(0), pc0)
        tr = FlowTrainer(
            model=fnet, variables=fv, model_iters=4,
            loss_cfg=FlowLossConfig(weights=(0.75, 0.25),
                                    iters_w=(0.5, 0.3, 0.3, 0.3)),
            optimizer=optax.adamw(1e-3, weight_decay=1e-7),
            exp_base="/tmp/ogc_trace_train_flow",
            mesh=pmesh.make_mesh(jax.devices()[:1]),
        )
        rngf = np.random.RandomState(0)
        fp1 = jnp.asarray(rngf.rand(BF, NF, 3).astype(np.float32))
        fp2 = fp1 + jnp.asarray(
            0.02 * rngf.randn(BF, NF, 3).astype(np.float32))
        gtf = jnp.zeros((BF, NF, 3), jnp.float32)

        _fstep = jax.jit(lambda p, s, o, a, b, g: tr._train_step_impl(
            p, s, o, a, b, g, jnp.float32(0.9))[:3])

        def fn(p, s, o, a, b, g):
            p2, s2, o2 = _fstep(p, s, o, a, b, g)
            return float(jax.tree_util.tree_leaves(p2)[0].sum())

        args = (tr.params, tr.batch_stats, tr.opt_state, fp1, fp2, gtf)
    elif what == "train":
        from ogc_tpu.losses.seg_unsup import OGCLossConfig
        from ogc_tpu.models.segnet import MaskFormer3D
        from ogc_tpu.parallel import mesh as pmesh
        from ogc_tpu.train.seg import SegTrainer, make_optimizer

        loss_cfg = OGCLossConfig(
            weights=(10.0, 0.1, 0.1), start_steps=(0, 0, 0),
            smooth_w_knn=3.0, smooth_w_ball_q=1.0,
            knn_k=32, knn_radius=1.0, ball_q_k=64, ball_q_radius=2.0,
        )
        net = MaskFormer3D(
            n_slot=10, n_point=N, arch="kitti",
            n_transformer_layer=2, transformer_embed_dim=128,
        )
        params = jax.jit(net.init)(jax.random.PRNGKey(0), pc1, pc1)
        optimizer = make_optimizer(1e-3, 0.7, 1e-5, 200000, B)
        trainer = SegTrainer(
            model=net, params=params, loss_cfg=loss_cfg, optimizer=optimizer,
            aug_transform_epoch=9999, ignore_npoint_thresh=50,
            exp_base="/tmp/ogc_trace_train",
            mesh=pmesh.make_mesh(jax.devices()[:1]),
        )
        pcs = jnp.asarray(
            30.0 * np.random.RandomState(0).rand(B, 2, N, 3).astype(np.float32)
        )
        flows = jnp.asarray(
            0.5 * np.random.RandomState(1).randn(B, 2, N, 3).astype(np.float32)
        )

        def step(p, o, pcs, flows):
            # Return the updated state too: returning only the loss lets
            # XLA dead-code-eliminate the whole backward + Adam update.
            p2, o2, ld, _ = trainer._train_step_impl(
                p, o, pcs, flows, jnp.int32(10**6), False
            )
            return p2, o2, ld["sum"]

        _step = jax.jit(step)

        def fn(p, o, pcs, flows):
            return _step(p, o, pcs, flows)[2]

        args = (trainer.params, trainer.opt_state, pcs, flows)
    else:
        raise SystemExit(f"unknown: {what}")

    # compile + warm
    float(fn(*args))
    float(fn(*args))

    trace_dir = f"/tmp/jaxtrace_{what}_b{B}"
    with jax.profiler.trace(trace_dir):
        v = fn(*args)
        float(v)  # force through the relay
    time.sleep(1)
    top_ops(trace_dir)


if __name__ == "__main__":
    main()
