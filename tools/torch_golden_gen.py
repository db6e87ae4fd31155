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
    parser.add_argument(
        "model",
        choices=["segnet", "flownet", "seg_grad", "flow_grad",
                 "seg_waymo_grad"],
    )
    parser.add_argument("out", type=str)
    parser.add_argument("--ref_root", type=str, default="/root/reference")
    parser.add_argument("--n_point", type=int, default=512)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--aug", action="store_true",
                        help="seg_grad: 4-frame augmented-view input "
                        "(exercises the Hungarian invariance term)")
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

    if args.model == "seg_grad":
        # Reference training signal: segnet forward -> UnsupervisedOGCLoss
        # -> backward; save loss values AND parameter gradients
        # (train_seg.py:47-86, losses/seg_loss_unsup.py:317-409).
        from models.segnet_sapien import MaskFormer3D
        from losses.seg_loss_unsup import (
            DynamicLoss, SmoothLoss, InvarianceLoss, EntropyLoss, RankLoss,
            UnsupervisedOGCLoss,
        )

        net = MaskFormer3D(
            n_slot=8, n_point=args.n_point, use_xyz=True,
            n_transformer_layer=2, transformer_embed_dim=128,
        )
        net.train()
        # Record the Hungarian permutations the invariance loss picks: with
        # zero-IoU (never-overlapping) slot pairs the optimum is degenerate
        # and scipy's tie-breaking is implementation-defined — the parity
        # test injects these exact perms for an apples-to-apples gradient
        # comparison and separately asserts equal optimality of its own LAP.
        import losses.seg_loss_unsup as SL

        recorded_perms = []
        _orig_match = SL.match_mask_by_iou

        def _recording_match(m1, m2):
            p = _orig_match(m1, m2)
            recorded_perms.append(p.detach().numpy())
            return p

        SL.match_mask_by_iou = _recording_match
        criterion = UnsupervisedOGCLoss(
            DynamicLoss(loss_norm=2),
            SmoothLoss(
                w_knn=3.0, w_ball_q=1.0,
                knn_loss_params=dict(k=8, radius=0.1, loss_norm=1),
                ball_q_loss_params=dict(k=16, radius=0.2, loss_norm=1),
            ),
            InvarianceLoss(loss_norm=2),
            EntropyLoss(), RankLoss(),
            weights=[10.0, 0.1, 0.1], start_steps=[0, 0, 0],
        )
        t = 4 if args.aug else 2
        pcs = rng.rand(args.batch, t, args.n_point, 3).astype(np.float32)
        flows = 0.1 * rng.randn(args.batch, t, args.n_point, 3).astype(
            np.float32
        )
        pcs_t = torch.from_numpy(
            pcs.reshape(args.batch * t, args.n_point, 3)
        )
        masks = net(pcs_t, pcs_t)
        masks = masks.view(args.batch, t, args.n_point, -1)
        loss, loss_dict = criterion(
            [torch.from_numpy(np.ascontiguousarray(pcs[:, tt]))
             for tt in range(t)],
            [masks[:, tt].contiguous() for tt in range(t)],
            [torch.from_numpy(np.ascontiguousarray(flows[:, tt]))
             for tt in range(t)],
            step_w=False, aug_transform=args.aug,
        )
        loss.backward()
        arrays = {f"w/{k}": v.detach().numpy()
                  for k, v in net.state_dict().items()}
        grads = {f"g/{k}": p.grad.detach().numpy()
                 for k, p in net.named_parameters() if p.grad is not None}
        np.savez(
            args.out, pcs=pcs, flows=flows, loss=np.float32(loss.item()),
            mask=masks.detach().numpy(),
            **{f"perm{i}": p for i, p in enumerate(recorded_perms)},
            n_perms=np.int32(len(recorded_perms)),
            **{f"ld/{k}": np.float32(v) for k, v in loss_dict.items()},
            **arrays, **grads,
        )
        print(f"seg_grad golden: loss={loss.item():.6f} "
              f"({len(grads)} grads) -> {args.out}")
        return

    if args.model == "seg_waymo_grad":
        # The Waymo trainer's OWN loss copy (train_seg_waymo.py:244-334):
        # 1-frame backward-flow input (non-aug) or 2 augmented views with
        # the invariance pair (0, 1).  Same term modules, different frame
        # plumbing than losses/seg_loss_unsup.UnsupervisedOGCLoss.
        from models.segnet_sapien import MaskFormer3D
        from losses.seg_loss_unsup import (
            DynamicLoss, SmoothLoss, InvarianceLoss, EntropyLoss, RankLoss,
        )
        import losses.seg_loss_unsup as SL
        from train_seg_waymo import UnsupervisedOGCLoss as WaymoLoss

        net = MaskFormer3D(
            n_slot=8, n_point=args.n_point, use_xyz=True,
            n_transformer_layer=2, transformer_embed_dim=128,
        )
        net.train()
        recorded_perms = []
        _orig_match = SL.match_mask_by_iou

        def _recording_match(m1, m2):
            p = _orig_match(m1, m2)
            recorded_perms.append(p.detach().numpy())
            return p

        SL.match_mask_by_iou = _recording_match
        criterion = WaymoLoss(
            DynamicLoss(loss_norm=2),
            SmoothLoss(
                w_knn=3.0, w_ball_q=1.0,
                knn_loss_params=dict(k=8, radius=0.1, loss_norm=1),
                ball_q_loss_params=dict(k=16, radius=0.2, loss_norm=1),
            ),
            InvarianceLoss(loss_norm=2),
            EntropyLoss(), RankLoss(),
            weights=[10.0, 0.1, 0.1], start_steps=[0, 0, 0],
        )
        t = 2 if args.aug else 1
        pcs = rng.rand(args.batch, t, args.n_point, 3).astype(np.float32)
        flows = 0.1 * rng.randn(args.batch, t, args.n_point, 3).astype(
            np.float32
        )
        pcs_t = torch.from_numpy(
            pcs.reshape(args.batch * t, args.n_point, 3)
        )
        masks = net(pcs_t, pcs_t)
        masks = masks.view(args.batch, t, args.n_point, -1)
        loss, loss_dict = criterion(
            [torch.from_numpy(np.ascontiguousarray(pcs[:, tt]))
             for tt in range(t)],
            [masks[:, tt].contiguous() for tt in range(t)],
            [torch.from_numpy(np.ascontiguousarray(flows[:, tt]))
             for tt in range(t)],
            step_w=False, aug_transform=args.aug,
        )
        loss.backward()
        arrays = {f"w/{k}": v.detach().numpy()
                  for k, v in net.state_dict().items()}
        grads = {f"g/{k}": p.grad.detach().numpy()
                 for k, p in net.named_parameters() if p.grad is not None}
        np.savez(
            args.out, pcs=pcs, flows=flows, loss=np.float32(loss.item()),
            mask=masks.detach().numpy(),
            **{f"perm{i}": p for i, p in enumerate(recorded_perms)},
            n_perms=np.int32(len(recorded_perms)),
            **{f"ld/{k}": np.float32(v) for k, v in loss_dict.items()},
            **arrays, **grads,
        )
        print(f"seg_waymo_grad golden: loss={loss.item():.6f} "
              f"({len(grads)} grads) -> {args.out}")
        return

    if args.model == "flow_grad":
        # Reference flow training signal: flownet (train mode) ->
        # UnsupervisedFlowStep3DLoss -> backward (train_flow.py:59-91).
        from models.flownet_sapien import FlowStep3D
        from losses.flow_loss_unsup import (
            ChamferLoss, SmoothLoss, UnsupervisedFlowStep3DLoss,
        )

        net = FlowStep3D(
            npoint=args.n_point, use_instance_norm=False,
            loc_flow_nn=8, loc_flow_rad=0.1, k_decay_fact=1.0,
        )
        net.train()
        # 2 iterations (flow0 + one GRU refinement): enough to exercise the
        # full recurrent backward once.  More iterations make the comparison
        # chaotic — float-level differences flip near-tied KNN neighbors on
        # the warped cloud and compound through the recurrence (observed
        # 1.5e-5 -> 0.3 max-diff over 4 iters between the torch CPU shim
        # and JAX CPU, same exact-neighbor semantics on both sides).
        criterion = UnsupervisedFlowStep3DLoss(
            ChamferLoss(loss_norm=2),
            SmoothLoss(
                w_knn=3.0, w_ball_q=1.0,
                knn_loss_params=dict(k=4, radius=0.05, loss_norm=1),
                ball_q_loss_params=dict(k=8, radius=0.1, loss_norm=1),
            ),
            weights=[0.75, 0.25], iters_w=[0.5, 0.3],
        )
        pc2 = (pc + 0.05 * rng.randn(*pc.shape)).astype(np.float32)
        t1, t2 = torch.from_numpy(pc), torch.from_numpy(pc2)
        flow_preds = net(t1, t2, t1, t2, iters=2)
        loss, loss_dict = criterion(t1, t2, flow_preds)
        loss.backward()
        arrays = {f"w/{k}": v.detach().numpy()
                  for k, v in net.state_dict().items()}
        grads = {f"g/{k}": p.grad.detach().numpy()
                 for k, p in net.named_parameters() if p.grad is not None}
        np.savez(
            args.out, pc1=pc, pc2=pc2, loss=np.float32(loss.item()),
            **{f"flow{i}": f.detach().numpy()
               for i, f in enumerate(flow_preds)},
            n_flows=np.int32(len(flow_preds)),
            **{f"ld/{k}": np.float32(v) for k, v in loss_dict.items()},
            **arrays, **grads,
        )
        print(f"flow_grad golden: loss={loss.item():.6f} "
              f"({len(grads)} grads) -> {args.out}")
        return

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
