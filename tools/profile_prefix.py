"""Stage-level breakdown of the FlowStep3D eval PREFIX (~28 ms of the
~82 ms B=8 forward, TODO.md) — the encoders, global-correlation decoder,
flow0/H0 heads, shared low-res KNN, and upsample stencil, each timed with
in-graph repetition (bench.make_timed pattern; block_until_ready is not a
barrier through the relay).

Run on the real chip, ONE process at a time:
    python tools/profile_prefix.py [--bf16/--no-bf16] [--batch 8]

Stages (matching models/flownet.py __call__'s eval path):
    enc_loc    _encode_loc on the concatenated 2B batch
    enc_glob   _encode_glob on the 2B batch
    corr       _calc_corr_mat + _global_corr decoder chain
    lr_knn     shared low-res self-KNN (k=32 at N/4)
    flow0      flow0_sa + flow0_fc + upsample weights + up-sample
    h0         h0_sa1 + h0_sa2 + tanh
"""

import argparse
import json
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_points", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU dry-run (correctness of the harness, not "
                         "timings)")
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["OGC_PLATFORM"] = "cpu"
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # platform override + the right compile cache
    import jax
    import jax.numpy as jnp

    from bench import make_timed
    from ogc_tpu import ops
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.nn.flowstep3d import FlowFPModule
    from ogc_tpu.nn.layers import set_compute_dtype

    if args.bf16:
        set_compute_dtype(jnp.bfloat16)

    B, N = args.batch, args.n_points
    rng = np.random.RandomState(0)
    pc1 = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))
    pc2 = jnp.asarray(30.0 * rng.rand(B, N, 3).astype(np.float32))

    flownet = FlowStep3D(npoint=N, arch="kitti", k_decay_fact=0.5,
                         loc_flow_nn=16, loc_flow_rad=1.5)
    fvars = jax.jit(lambda k, a, b: flownet.init(k, a, b, a, b, 2))(
        jax.random.PRNGKey(1), pc1[:1], pc2[:1]
    )

    def method(fn):
        """apply() wrapper calling a bound-module method in eval mode."""
        def run(v, *xs):
            return flownet.apply(v, *xs, method=fn)
        return run

    # ---- stage inputs (computed once, stay on device) ----
    def _prefix_inputs(v, a, b):
        def go(mdl, a, b):
            pc12 = jnp.concatenate([a, b], axis=0)
            pc12_l, feats12, fps12, _ = mdl._encode_loc(
                pc12, pc12, train=False, bnm=0.1, return_knn=True)
            pc12_g, f12g = mdl._encode_glob(pc12_l[-1], feats12,
                                            train=False, bnm=0.1)
            return pc12_l, feats12, pc12_g, f12g
        return flownet.apply(v, a, b, method=go)

    pc12_l, feats12, pc12_g, f12g = jax.jit(_prefix_inputs)(fvars, pc1, pc2)
    pc1_l_loc = [p[:B] for p in pc12_l]
    pc1_l_glob = [p[:B] for p in pc12_g]
    pc2_l_glob = [p[B:] for p in pc12_g]
    f1g, f2g = f12g[:B], f12g[B:]
    feats1_loc = feats12[:B]
    corr_feats = jax.jit(method(
        lambda m, *xs: m._global_corr(
            list(xs[:4]), list(xs[4:8]), xs[8], xs[9], False, 0.1)
    ))(fvars, *pc1_l_glob, *pc2_l_glob, f1g, f2g)
    _, lr_idx = ops.knn(32, pc1_l_loc[2], pc1_l_loc[2])

    res = {}

    # enc_loc on the 2B concatenated batch (perturb the cloud input).
    enc_loc = method(lambda m, pc: m._encode_loc(
        pc, pc, train=False, bnm=0.1)[1])
    res["enc_loc_2B"] = make_timed(enc_loc)(
        fvars, jnp.concatenate([pc1, pc2], axis=0)) * 1e3

    enc_glob = method(lambda m, pc, f: m._encode_glob(
        pc, f, train=False, bnm=0.1)[1])
    res["enc_glob_2B"] = make_timed(
        lambda v, f, pc: enc_glob(v, pc, f))(fvars, feats12,
                                             pc12_l[-1]) * 1e3

    def corr(v, g1_rest, g2, f1, f2, p1):
        gl1 = [p1] + list(g1_rest)
        return flownet.apply(
            v, gl1, list(g2), f1, f2, False, 0.1,
            method=lambda m, a, b, c, d, t, bm: m._global_corr(a, b, c, d,
                                                               t, bm))
    res["corr_chain"] = make_timed(
        lambda v, g1r, g2, f1, f2, p1: corr(v, g1r, g2, f1, f2, p1)
    )(fvars, tuple(pc1_l_glob[1:]), tuple(pc2_l_glob), f1g, f2g,
      pc1_l_glob[0]) * 1e3

    # Substages of the corr chain: the coarsest-level kernelized softmax
    # (corr_mat + soft-argmax flow0) vs the FP/SA decoder walk back up.
    def corr_mat(v, p1, p2, f1, f2):
        def go(m, p1, p2, f1, f2):
            corr = m._calc_corr_mat(p1, p2, f1, f2)
            row_sum = jnp.sum(corr, -1, keepdims=True)
            return jnp.einsum("bnm,bmd->bnd", corr, p2) / (row_sum + 1e-8) - p1
        return flownet.apply(v, p1, p2, f1, f2, method=go)
    res["corr_mat"] = make_timed(
        lambda v, p2, f1, f2, p1: corr_mat(v, p1, p2, f1, f2)
    )(fvars, pc2_l_glob[-1], f1g, f2g, pc1_l_glob[-1]) * 1e3

    def corr_decode(v, g1_rest, feats, p1):
        gl1 = [p1] + list(g1_rest)
        def go(m, pc1_l_glob, feats):
            level = len(pc1_l_glob) - 1
            for i, sa in enumerate(m.corr_sas):
                feats = m.corr_fps[i](pc1_l_glob[level - 1],
                                      pc1_l_glob[level], None, feats,
                                      train=False, bn_momentum=0.1)
                _, feats, _ = sa(pc1_l_glob[level - 1], feats, train=False,
                                 bn_momentum=0.1)
                level -= 1
            return m.corr_fps[-1](pc1_l_glob[level - 1], pc1_l_glob[level],
                                  None, feats, train=False, bn_momentum=0.1)
        return flownet.apply(v, gl1, feats, method=go)
    flow0_coarse = jax.jit(
        lambda v, p2, f1, f2, p1: corr_mat(v, p1, p2, f1, f2)
    )(fvars, pc2_l_glob[-1], f1g, f2g, pc1_l_glob[-1])
    res["corr_decode"] = make_timed(
        lambda v, g1r, f, p1: corr_decode(v, g1r, f, p1)
    )(fvars, tuple(pc1_l_glob[1:]), flow0_coarse, pc1_l_glob[0]) * 1e3

    res["lr_knn"] = make_timed(
        lambda v, pc: ops.knn(32, pc, pc)[0])(fvars, pc1_l_loc[2]) * 1e3

    def flow0(v, cf, idx, p0, plr):
        def go(m, cf, idx, p0, plr):
            _, x0, _ = m.flow0_sa(plr, cf, train=False, bn_momentum=0.1,
                                  group_idx=idx)
            flow0_lr = m.flow0_fc(x0)
            cache = FlowFPModule.weights(p0, plr)
            return m.flow_up_sample(p0, plr, None, flow0_lr, train=False,
                                    bn_momentum=0.1, cached=cache)
        return flownet.apply(v, cf, idx, p0, plr, method=go)
    res["flow0_and_upsample"] = make_timed(
        lambda v, cf, idx, p0, plr: flow0(v, cf, idx, p0, plr)
    )(fvars, corr_feats, lr_idx, pc1_l_loc[0], pc1_l_loc[2]) * 1e3

    def h0(v, f, idx, plr):
        def go(m, f, idx, plr):
            _, h, _ = m.h0_sa1(plr, f, train=False, bn_momentum=0.1,
                               group_idx=idx)
            _, h, _ = m.h0_sa2(plr, h, train=False, bn_momentum=0.1,
                               group_idx=idx)
            return jnp.tanh(h)
        return flownet.apply(v, f, idx, plr, method=go)
    res["h0"] = make_timed(
        lambda v, f, idx, plr: h0(v, f, idx, plr)
    )(fvars, feats1_loc, lr_idx, pc1_l_loc[2]) * 1e3

    # whole prefix = iters=1 forward, for cross-checking the sum.
    res["iters1_total"] = make_timed(
        lambda v, a, b: flownet.apply(v, a, b, a, b, 1, train=False)[-1]
    )(fvars, pc1, pc2) * 1e3

    res = {k: round(v, 3) for k, v in res.items()}
    print(json.dumps({"profile": "flow_prefix", "bf16": args.bf16,
                      "batch": B, "ms": res}))


if __name__ == "__main__":
    main()
