"""Import a converted reference checkpoint into a framework checkpoint.

Second stage of the released-weight runbook (BASELINE.md): takes the flat
npz from tools/torch_ckpt_to_npz.py (torch parameter names), maps it into
the flax model's tree (utils.torch_interop), and writes a framework
checkpoint that the eval CLIs' load_checkpoint consumes directly — after
this, `test_seg.py` / `test_flow*.py` run the full reference protocols on
the released weights with no further plumbing.

Usage:
  python tools/import_torch_ckpt.py segnet  seg.npz  <save_path>/best \
      --arch kitti --n_point 8192 --n_slot 10
  python tools/import_torch_ckpt.py flownet flow.npz <save_path>/best \
      --arch kitti --n_point 8192
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu.utils.checkpoint import save_checkpoint, wait_pending_saves
    from ogc_tpu.utils.torch_interop import (
        flownet_variables_from_torch,
        load_npz_state,
        segnet_params_from_torch,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("model", choices=["segnet", "flownet"])
    parser.add_argument("npz", type=str,
                        help="flat npz from tools/torch_ckpt_to_npz.py")
    parser.add_argument("out", type=str,
                        help="checkpoint basename (eval CLIs expect "
                             "<save_path>/best)")
    parser.add_argument("--arch", type=str, default="sapien")
    parser.add_argument("--n_point", type=int, default=512)
    parser.add_argument("--n_slot", type=int, default=8)
    parser.add_argument("--embed", type=int, default=128)
    parser.add_argument("--n_transformer_layer", type=int, default=2)
    parser.add_argument("--loc_flow_nn", type=int, default=16)
    parser.add_argument("--loc_flow_rad", type=float, default=1.5)
    args = parser.parse_args()

    state = load_npz_state(args.npz)
    pc = jnp.zeros((1, args.n_point, 3), jnp.float32)
    if args.model == "segnet":
        from ogc_tpu.models.segnet import MaskFormer3D

        model = MaskFormer3D(
            n_slot=args.n_slot, n_point=args.n_point, arch=args.arch,
            n_transformer_layer=args.n_transformer_layer,
            transformer_embed_dim=args.embed,
        )
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc, pc)
        variables = segnet_params_from_torch(
            state, variables, n_transformer_layer=args.n_transformer_layer
        )
    else:
        from ogc_tpu.models.flownet import FlowStep3D

        model = FlowStep3D(
            npoint=args.n_point, arch=args.arch, k_decay_fact=0.5,
            loc_flow_nn=args.loc_flow_nn, loc_flow_rad=args.loc_flow_rad,
        )
        variables = jax.jit(
            lambda k, a, b: model.init(k, a, b, a, b, 2)
        )(jax.random.PRNGKey(0), pc, pc)
        variables = flownet_variables_from_torch(state, variables)

    n = len(jax.tree_util.tree_leaves(variables))
    save_checkpoint(jax.device_get(variables), False, filename=args.out,
                    bestname=args.out, async_save=False)
    wait_pending_saves()
    print(f"imported {n} arrays -> {args.out}.ckpt")


if __name__ == "__main__":
    main()
