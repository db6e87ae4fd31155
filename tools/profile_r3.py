"""Round-3 TPU profile: batch scaling + suspect ops.

Run ONE at a time through the TPU relay (CLAUDE.md).  Usage:
    python tools/profile_r3.py [section ...]
Sections: bench_b (flow/seg at B=8/16/32), ops (knn/three_nn shapes),
prefix (flow iters=1 vs 5).
"""

import sys

import numpy as np

sys.path.insert(0, ".")


from bench import make_timed as _make_timed  # canonical timer


def make_timed(fn, reps=10, warmup=2, iters=3):
    return _make_timed(fn, reps=reps, warmup=warmup, iters=iters)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    sections = set(sys.argv[1:]) or {"bench_b", "ops", "prefix"}
    rng = np.random.RandomState(0)

    from ogc_tpu import ops
    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)

    if "ops" in sections:
        print("== ops ==", flush=True)
        B = 8
        pc8k = jnp.asarray(30.0 * rng.rand(B, 8192, 3).astype(np.float32))
        pc4k = pc8k[:, :4096]
        pc2k = pc8k[:, :2048]
        for name, fn, args in [
            ("knn32 4096x8192", lambda q, p: ops.knn(32, q, p)[0], (pc4k, pc8k)),
            ("knn32 2048x4096", lambda q, p: ops.knn(32, q, p)[0], (pc2k, pc4k)),
            ("knn32 2048x2048", lambda q, p: ops.knn(32, q, p)[0], (pc2k, pc2k)),
            ("three_nn 8192<-2048", lambda q, p: ops.three_nn(q, p)[0], (pc8k, pc2k)),
            ("three_nn 8192<-2048 exact", lambda q, p: ops.three_nn(q, p, exact=True)[0], (pc8k, pc2k)),
            ("knn8 2048x2048", lambda q, p: ops.knn(8, q, p)[0], (pc2k, pc2k)),
            ("knn1 8192x8192", lambda q, p: ops.knn(1, q, p)[0], (pc8k, pc8k)),
        ]:
            # time w.r.t. perturbing the LAST arg
            t = make_timed(fn)(*args)
            print(f"{name}: {t*1e3:.2f} ms", flush=True)

    if "bench_b" in sections:
        print("== bench_b ==", flush=True)
        from ogc_tpu.models.flownet import FlowStep3D
        from ogc_tpu.models.segnet import MaskFormer3D

        N = 8192
        segnet = MaskFormer3D(
            n_slot=10, n_point=N, arch="kitti",
            n_transformer_layer=2, transformer_embed_dim=128,
        )
        flownet = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5,
                        loc_flow_nn=16, loc_flow_rad=1.5)
        pc1 = jnp.asarray(30.0 * rng.rand(1, N, 3).astype(np.float32))
        seg_params = jax.jit(segnet.init)(jax.random.PRNGKey(0), pc1, pc1)
        fvars = jax.jit(lambda k, a, b: flownet.init(k, a, b, a, b, 2))(
            jax.random.PRNGKey(1), pc1, pc1
        )
        for B in (8, 16, 32):
            pc = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))
            t_seg = make_timed(lambda p, x: segnet.apply(p, x, x))(seg_params, pc)
            t_flow = make_timed(
                lambda v, a, b: flownet.apply(v, a, b, a, b, 5, train=False)[-1]
            )(fvars, pc, pc)
            tput = B / (t_seg + t_flow)
            print(
                f"B={B}: seg {t_seg*1e3:.1f} ms, flow {t_flow*1e3:.1f} ms, "
                f"{tput:.1f} scenes/s", flush=True,
            )

    if "prefix" in sections:
        print("== prefix ==", flush=True)
        from ogc_tpu.models.flownet import FlowStep3D

        N, B = 8192, 8
        flownet = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5,
                        loc_flow_nn=16, loc_flow_rad=1.5)
        pc1 = jnp.asarray(30.0 * rng.rand(1, N, 3).astype(np.float32))
        fvars = jax.jit(lambda k, a, b: flownet.init(k, a, b, a, b, 2))(
            jax.random.PRNGKey(1), pc1, pc1
        )
        pc = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))
        for iters in (1, 2, 5):
            t = make_timed(
                lambda v, a, b: flownet.apply(
                    v, a, b, a, b, iters, train=False
                )[-1]
            )(fvars, pc, pc)
            print(f"flow iters={iters}: {t*1e3:.1f} ms", flush=True)




def section_scaling():
    """Find the superlinear-in-B component."""
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    rng = np.random.RandomState(0)
    from ogc_tpu import ops
    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)

    for B in (2, 4, 8, 16):
        pc8k = jnp.asarray(30.0 * rng.rand(B, 8192, 3).astype(np.float32))
        pc4k = pc8k[:, :4096]
        idx = jnp.asarray(
            rng.randint(0, 8192, (B, 4096, 32)).astype(np.int32)
        )
        feat = jnp.asarray(rng.rand(B, 8192, 35).astype(np.float32))
        t_knn = make_timed(lambda q, p: ops.knn(32, q, p)[0])(pc4k, pc8k)
        t_g = make_timed(
            lambda i, f: ops.group(f, i), reps=10
        )(idx, feat)
        t_fps = make_timed(
            lambda p: ops.furthest_point_sample(p, 2048).astype(jnp.float32)
        )(pc8k)
        print(
            f"B={B}: knn32(4096x8192) {t_knn*1e3:.2f} ms, "
            f"group(4096x32,C35) {t_g*1e3:.2f} ms, fps->2048 {t_fps*1e3:.2f} ms",
            flush=True,
        )


def section_flow_small_b():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.nn.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    rng = np.random.RandomState(0)
    N = 8192
    segnet = MaskFormer3D(
        n_slot=10, n_point=N, arch="kitti",
        n_transformer_layer=2, transformer_embed_dim=128,
    )
    flownet = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5,
                        loc_flow_nn=16, loc_flow_rad=1.5)
    pc1 = jnp.asarray(30.0 * rng.rand(1, N, 3).astype(np.float32))
    seg_params = jax.jit(segnet.init)(jax.random.PRNGKey(0), pc1, pc1)
    fvars = jax.jit(lambda k, a, b: flownet.init(k, a, b, a, b, 2))(
        jax.random.PRNGKey(1), pc1, pc1
    )
    for B in (2, 4, 8):
        pc = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))
        t_seg = make_timed(lambda p, x: segnet.apply(p, x, x))(seg_params, pc)
        t_flow = make_timed(
            lambda v, a, b: flownet.apply(v, a, b, a, b, 5, train=False)[-1]
        )(fvars, pc, pc)
        print(
            f"B={B}: seg {t_seg*1e3:.1f} ms, flow {t_flow*1e3:.1f} ms, "
            f"{B/(t_seg+t_flow):.1f} scenes/s", flush=True,
        )


_SECTIONS = {"scaling": section_scaling, "flow_small_b": section_flow_small_b}




def section_overhead():
    """Isolate lax.scan per-trip overhead vs true op cost: a trivial body,
    then 1 vs 4 chained knn calls per trip."""
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    rng = np.random.RandomState(0)
    from ogc_tpu import ops

    B = 8
    pc8k = jnp.asarray(30.0 * rng.rand(B, 8192, 3).astype(np.float32))
    pc4k = pc8k[:, :4096]

    t0 = make_timed(lambda p: p * 1.0001)(pc8k)
    print(f"trivial body: {t0*1e3:.3f} ms/trip", flush=True)

    def knn_n(n):
        def f(q, p):
            acc = jnp.float32(0.0)
            for _ in range(n):
                d, _ = ops.knn(32, q, p)
                acc = acc + jnp.sum(d)
                p = p + acc * 1e-13  # serialize: next knn depends on previous
            return acc

        return f

    t1 = make_timed(knn_n(1))(pc4k, pc8k)
    t4 = make_timed(knn_n(4))(pc4k, pc8k)
    print(f"knn x1/trip: {t1*1e3:.2f} ms; knn x4/trip: {t4*1e3:.2f} ms "
          f"(marginal {(t4-t1)/3*1e3:.2f} ms/knn)", flush=True)

    def group_n(n):
        idx = jnp.asarray(rng.randint(0, 8192, (B, 4096, 32)).astype(np.int32))

        def f(i_unused, feat):
            acc = jnp.float32(0.0)
            for _ in range(n):
                g = ops.group(feat, idx)
                acc = acc + jnp.sum(g[..., 0])
                feat = feat + acc * 1e-13
            return acc

        return f, idx

    f1, idx = group_n(1)
    f4, _ = group_n(4)
    feat = jnp.asarray(rng.rand(B, 8192, 35).astype(np.float32))
    tg1 = make_timed(f1)(idx, feat)
    tg4 = make_timed(f4)(idx, feat)
    print(f"group x1/trip: {tg1*1e3:.2f} ms; x4: {tg4*1e3:.2f} ms "
          f"(marginal {(tg4-tg1)/3*1e3:.2f} ms/group of 1M rows)", flush=True)


_SECTIONS["overhead"] = section_overhead


if __name__ == "__main__":
    extra = [a for a in sys.argv[1:] if a in _SECTIONS]
    for a in extra:
        _SECTIONS[a]()
    if not extra:
        main()
    elif set(sys.argv[1:]) - set(extra):
        main()
