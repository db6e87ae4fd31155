"""Write reference-FORMAT checkpoint files with the reference's OWN writers.

Closes the file-level interop gap (VERDICT r3 #5): generates

  <outdir>/current.pth.tar + best.pth.tar
      via the reference's checkpoint_state + save_checkpoint
      (/root/reference/utils/pytorch_util.py:84-100 — the exact writer
      train_seg.py uses), holding a reference MaskFormer3D state dict;
  <outdir>/flow_lightning.ckpt
      a PyTorch-Lightning-style {'state_dict': {'model.<k>': v}} blob —
      the format the reference's released FlowStep3D weights ship in
      (test_flow_kittisf.py:42-44 strips the 6-char 'model.' prefix);
  <outdir>/segnet_golden.npz / flownet_golden.npz
      forward goldens (inputs + outputs) from the same weights, so the
      consumer test can assert numeric equality after the whole
      .pth.tar -> torch_ckpt_to_npz -> flax chain.

MUST run in its own process (torch + JAX deadlock; CLAUDE.md).

Usage: python tools/torch_ckpt_write.py <outdir> [--ref_root /root/reference]
"""

import argparse
import os.path as osp
import sys
from collections import OrderedDict

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("outdir", type=str)
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

    # --- segnet: the reference's own .pth.tar writer ---------------------
    from models.segnet_sapien import MaskFormer3D
    from utils.pytorch_util import checkpoint_state, save_checkpoint

    net = MaskFormer3D(
        n_slot=8, n_point=args.n_point, use_xyz=True,
        n_transformer_layer=2, transformer_embed_dim=128,
    )
    net.eval()
    with torch.no_grad():
        mask = net(torch.from_numpy(pc), torch.from_numpy(pc))
    save_checkpoint(
        checkpoint_state(net), True,
        filename=osp.join(args.outdir, "current"),
        bestname=osp.join(args.outdir, "best"),
    )
    np.savez(osp.join(args.outdir, "segnet_golden.npz"),
             pc=pc, mask=mask.numpy())

    # --- flownet: Lightning-style released-weight format -----------------
    from models.flownet_sapien import FlowStep3D

    fnet = FlowStep3D(
        npoint=args.n_point, use_instance_norm=False,
        loc_flow_nn=8, loc_flow_rad=0.1, k_decay_fact=1.0,
    )
    fnet.eval()
    pc2 = (pc + 0.05 * rng.randn(*pc.shape)).astype(np.float32)
    with torch.no_grad():
        flows = fnet(
            torch.from_numpy(pc), torch.from_numpy(pc2),
            torch.from_numpy(pc), torch.from_numpy(pc2), iters=4,
        )
    torch.save(
        {
            "state_dict": OrderedDict(
                ("model." + k, v) for k, v in fnet.state_dict().items()
            ),
            "epoch": 3,  # Lightning blobs carry trainer extras; the
            # converter must ignore everything but state_dict
        },
        osp.join(args.outdir, "flow_lightning.ckpt"),
    )
    np.savez(
        osp.join(args.outdir, "flownet_golden.npz"),
        pc1=pc, pc2=pc2, n_flows=np.int32(len(flows)),
        **{f"flow{i}": f.numpy() for i, f in enumerate(flows)},
    )
    print(f"wrote current/best.pth.tar + flow_lightning.ckpt + goldens "
          f"to {args.outdir}")


if __name__ == "__main__":
    main()
