"""Generate full-model forward goldens from the UNMODIFIED reference models.

Runs the reference MaskFormer3D / FlowStep3D (PyTorch, /root/reference) on
CPU via tools/pointnet2_cpu_shim, with fixed random weights and inputs, and
saves {state_dict arrays, inputs, outputs} to an npz.  The companion test
(tests/test_full_model_parity.py) maps the weights into the flax models and
compares outputs — executed end-to-end numeric parity without released
checkpoints (VERDICT r1 #9 substitute; BASELINE.md procedure).

MUST run in its own process (torch + JAX deadlock; CLAUDE.md).

Usage: python tools/torch_golden_gen.py {segnet,flownet} out.npz
       [--ref_root /root/reference]
"""

import argparse
import os.path as osp
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("model", choices=["segnet", "flownet"])
    parser.add_argument("out", type=str)
    parser.add_argument("--ref_root", type=str, default="/root/reference")
    parser.add_argument("--n_point", type=int, default=512)
    parser.add_argument("--batch", type=int, default=2)
    args = parser.parse_args()

    import torch

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    import tools.pointnet2_cpu_shim as shim

    sys.modules["pointnet2_cuda"] = shim
    shim.patch_torch_cuda()
    sys.path.insert(0, args.ref_root)

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    pc = rng.rand(args.batch, args.n_point, 3).astype(np.float32)

    if args.model == "segnet":
        from models.segnet_sapien import MaskFormer3D

        net = MaskFormer3D(
            n_slot=8, n_point=args.n_point, use_xyz=True,
            n_transformer_layer=2, transformer_embed_dim=128,
        )
        net.eval()
        with torch.no_grad():
            mask = net(torch.from_numpy(pc), torch.from_numpy(pc))
        arrays = {f"w/{k}": v.detach().numpy()
                  for k, v in net.state_dict().items()}
        np.savez(args.out, pc=pc, mask=mask.numpy(), **arrays)
        print(f"segnet golden: mask {tuple(mask.shape)} -> {args.out}")
    else:
        from models.flownet_sapien import FlowStep3D

        net = FlowStep3D(
            npoint=args.n_point, use_instance_norm=False,
            loc_flow_nn=8, loc_flow_rad=0.1, k_decay_fact=1.0,
        )
        net.eval()
        pc2 = (pc + 0.05 * rng.randn(*pc.shape)).astype(np.float32)
        with torch.no_grad():
            flows = net(
                torch.from_numpy(pc), torch.from_numpy(pc2),
                torch.from_numpy(pc), torch.from_numpy(pc2), iters=4,
            )
        arrays = {f"w/{k}": v.detach().numpy()
                  for k, v in net.state_dict().items()}
        np.savez(
            args.out, pc1=pc, pc2=pc2,
            **{f"flow{i}": f.numpy() for i, f in enumerate(flows)},
            n_flows=np.int32(len(flows)), **arrays,
        )
        print(f"flownet golden: {len(flows)} flows -> {args.out}")


if __name__ == "__main__":
    main()
