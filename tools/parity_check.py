"""Numeric parity harness: run the flax models on saved inputs and compare
against reference outputs.

Workflow (BASELINE.md):
 1. On a CUDA machine, run the reference on a batch of inputs and save
    inputs + outputs:  np.savez(ref.npz, pc=..., mask=...) or
    np.savez(ref.npz, pc1=..., pc2=..., flow=...).
 2. Convert the reference checkpoint: tools/torch_ckpt_to_npz.py.
 3. Here:  python tools/parity_check.py segnet --ckpt seg.npz --ref ref.npz
           --arch sapien --n_point 512 --n_slot 8 --embed 128

Prints per-tensor max-abs / mean-abs deltas and metric-level deltas.
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu.utils.torch_interop import (
        flownet_variables_from_torch,
        load_npz_state,
        segnet_params_from_torch,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("model", choices=["segnet", "flownet"])
    parser.add_argument("--ckpt", type=str, required=True,
                        help="npz from tools/torch_ckpt_to_npz.py")
    parser.add_argument("--ref", type=str, required=True,
                        help="npz with inputs (+ reference outputs if known)")
    parser.add_argument("--arch", type=str, default="sapien")
    parser.add_argument("--n_point", type=int, default=512)
    parser.add_argument("--n_slot", type=int, default=8)
    parser.add_argument("--embed", type=int, default=128)
    parser.add_argument("--n_transformer_layer", type=int, default=2)
    parser.add_argument("--iters", type=int, default=4)
    args = parser.parse_args()

    state = load_npz_state(args.ckpt)
    ref = np.load(args.ref)

    if args.model == "segnet":
        from ogc_tpu.models.segnet import MaskFormer3D

        model = MaskFormer3D(
            n_slot=args.n_slot, n_point=args.n_point, arch=args.arch,
            n_transformer_layer=args.n_transformer_layer,
            transformer_embed_dim=args.embed,
        )
        pc = jnp.asarray(ref["pc"])
        params = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:1], pc[:1])
        params = segnet_params_from_torch(
            state, params, n_transformer_layer=args.n_transformer_layer
        )
        # Exact neighbor search for parity comparison.
        from ogc_tpu import ops

        ops.set_exact_neighbors(True)
        out = np.asarray(jax.jit(lambda p, x: model.apply(p, x, x))(params, pc))
        print("mask shape:", out.shape)
        if "mask" in ref:
            d = np.abs(out - ref["mask"])
            print(f"mask delta: max={d.max():.3e} mean={d.mean():.3e}")
            agree = (out.argmax(-1) == ref["mask"].argmax(-1)).mean()
            print(f"argmax agreement: {agree:.6f}")
        else:
            np.savez("parity_segnet_out.npz", mask=out)
            print("saved parity_segnet_out.npz")
    else:
        from ogc_tpu.models.flownet import FlowStep3D

        model = FlowStep3D(
            npoint=args.n_point, arch=args.arch, k_decay_fact=0.5
        )
        pc1 = jnp.asarray(ref["pc1"])
        pc2 = jnp.asarray(ref["pc2"])
        variables = jax.jit(
            lambda k, a, b: model.init(k, a, b, a, b, 2)
        )(jax.random.PRNGKey(0), pc1[:1], pc2[:1])
        variables = flownet_variables_from_torch(state, variables)
        from ogc_tpu import ops

        ops.set_exact_neighbors(True)
        out = np.asarray(
            jax.jit(
                lambda v, a, b: model.apply(
                    v, a, b, a, b, args.iters, train=False
                )[-1]
            )(variables, pc1, pc2)
        )
        print("flow shape:", out.shape)
        if "flow" in ref:
            d = np.abs(out - ref["flow"])
            epe = np.linalg.norm(out - ref["flow"], axis=-1).mean()
            print(f"flow delta: max={d.max():.3e} mean={d.mean():.3e} EPE={epe:.3e}")
        else:
            np.savez("parity_flownet_out.npz", flow=out)
            print("saved parity_flownet_out.npz")


if __name__ == "__main__":
    main()
