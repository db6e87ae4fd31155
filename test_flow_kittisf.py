"""Evaluate / extract scene flow on full-resolution KITTI-SF scenes:
ground removal by height, ICP ego-motion on FPS subclouds, FlowStep3D on
FPS-8192 points, 3-NN upsampling back, ego+residual flow composition.

Usage (CLI-compatible with the reference test_flow_kittisf.py):
    python test_flow_kittisf.py <config.yaml> --split train --save
"""

import argparse
import os
import os.path as osp

import numpy as np


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    """Pad (m, 3) to (n, 3) with duplicates of row 0.  Duplicates are at
    min-distance 0 from the FPS seed (index 0), so FPS never selects them
    over a true point, and their higher indices lose every tie — batched
    FPS/KNN over padded clouds select exactly the per-scene indices."""
    if len(a) >= n:
        return a[:n]
    return np.concatenate(
        [a, np.broadcast_to(a[:1], (n - len(a), a.shape[1]))], 0
    )


def _batched_eval(args, test_set, fwd, variables, eval_meter, n_point,
                  n_point_icp, max_icp_iters, decentralize, epe_norm_thresh,
                  save_dir):
    """Scene-batched eval: K scenes per device dispatch.  Variable-size
    non-ground clouds bucket-pad to a shared length (multiples of 4096 to
    bound recompiles); FPS, ICP, the network forward, and the 3-NN
    upsample all run batched; padded rows are sliced off host-side before
    flow composition and metrics.  Exact w.r.t. the per-scene path (see
    _pad_rows); verified by tests/test_outdoor_cli.py."""
    import jax

    from ogc_tpu import ops
    from ogc_tpu.metrics.flow import eval_flow
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.utils.icp import icp_xla

    # Every batched device call goes through dp_eval_fwd: at --dp 1 a plain
    # host wrapper, at --dp N the scene batch shards over the mesh.
    dp = getattr(args, "dp", 1)
    fps_icp = pmesh.dp_eval_fwd(
        jax.jit(lambda _, p: ops.furthest_point_sample(p, n_point_icp)),
        None, dp,
    )
    fps_net = pmesh.dp_eval_fwd(
        jax.jit(lambda _, p: ops.furthest_point_sample(p, n_point)),
        None, dp,
    )
    icp_fn = pmesh.dp_eval_fwd(
        jax.jit(lambda _, a, b: icp_xla(a, b, max_iterations=max_icp_iters)),
        None, dp,
    )
    net_fn = pmesh.dp_eval_fwd(fwd, variables, dp)
    up_fn = pmesh.dp_eval_fwd(
        jax.jit(lambda _, pc, sub, f: ops.upsample_feat(pc, sub, f)),
        None, dp,
    )

    K = args.scene_batch
    sids = list(range(len(test_set)))
    for g0 in range(0, len(sids), K):
        group = sids[g0:g0 + K]
        scenes = []
        for sid in group:
            pcs, _, flows, _ = test_set[sid]
            pc1_org, pc2_org = pcs[0], pcs[1]
            is_ground = np.logical_and(
                pc1_org[:, 1] < -1.4, pc2_org[:, 1] < -1.4
            )
            not_ground = np.logical_not(is_ground)
            pc1, pc2 = pc1_org[not_ground], pc2_org[not_ground]
            center = (
                np.concatenate((pc1, pc2), 0).mean(0)
                if decentralize else np.zeros(3, pc1.dtype)
            )
            scenes.append(dict(
                sid=sid, pc1_org=pc1_org, flow_org=flows[0],
                not_ground=not_ground, pc1=pc1, pc2=pc2, center=center,
            ))
        while len(scenes) < K:  # pad the last group; extras discarded
            scenes.append(scenes[-1])

        nmax = max(max(len(s["pc1"]), len(s["pc2"])) for s in scenes)
        bucket = max(-(-nmax // 4096) * 4096, n_point)
        P1 = np.stack([_pad_rows(s["pc1"], bucket) for s in scenes])
        P2 = np.stack([_pad_rows(s["pc2"], bucket) for s in scenes])
        C = np.stack([s["center"] for s in scenes])[:, None, :]

        # Batched ICP ego-motion on FPS subclouds (decentralized).
        P1_icp = (P1 - C).astype(np.float32)
        P2_icp = (P2 - C).astype(np.float32)
        i1 = fps_icp(P1_icp)
        i2 = fps_icp(P2_icp)
        pc1_fps = np.take_along_axis(P1_icp, i1[..., None], 1)
        pc2_fps = np.take_along_axis(P2_icp, i2[..., None], 1)
        T = icp_fn(pc1_fps, pc2_fps)
        rot, transl = T[:, :3, :3], T[:, :3, 3]

        # Ego-compensated non-ground clouds, batched network + upsample.
        P1e = (
            np.einsum("kni,kji->knj", P1, rot) + transl[:, None, :]
        ).astype(np.float32)
        P2f = P2.astype(np.float32)
        j1 = fps_net(P1e)
        j2 = fps_net(P2f)
        pc1_net = np.take_along_axis(P1e, j1[..., None], 1)
        pc2_net = np.take_along_axis(P2f, j2[..., None], 1)
        flow_fps = net_fn(pc1_net, pc2_net)
        flow_up = up_fn(P1e, pc1_net, flow_fps)

        for t, sid in enumerate(group):
            s = scenes[t]
            n = len(s["pc1"])
            flow_pred_org = (
                s["pc1_org"] @ rot[t].T + transl[t] - s["pc1_org"]
            ).astype(np.float32)
            flow_pred_org[s["not_ground"]] += flow_up[t, :n]

            epe, acc_s, acc_r, outlier = eval_flow(
                s["flow_org"][None], flow_pred_org[None],
                epe_norm_thresh=epe_norm_thresh,
            )
            eval_meter.append_loss(
                {"EPE": epe, "AccS": acc_s, "AccR": acc_r,
                 "Outlier": outlier}
            )
            if save_dir is not None:
                test_set._save_predflow(
                    flow_pred_org[None], save_root=save_dir, batch_size=1,
                    n_frame=2, offset=sid,
                )


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu import ops
    from ogc_tpu.data.kittisf import KITTISceneFlowDataset as TestDataset
    from ogc_tpu.metrics.flow import eval_flow
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.checkpoint import load_checkpoint
    from ogc_tpu.utils.config import load_config_into_args
    from ogc_tpu.utils.gpf import fps_downsample
    from ogc_tpu.utils.icp import icp, icp_xla
    from ogc_tpu.utils.meters import AverageMeter

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--test_model_iters", type=int, default=4)
    parser.add_argument("--save", default=False, action="store_true")
    parser.add_argument("--approx_knn", default=False,
                        action="store_true",
                        help="Use approximate neighbor search in "
                             "evaluation (faster; default exact "
                             "for metric parity)")
    parser.add_argument("--host_preproc", default=False, action="store_true",
                        help="Run ICP ego-motion with the host numpy oracle "
                             "instead of the jitted on-device loop")
    parser.add_argument("--dp", type=int, default=1,
                        help="With --scene_batch: shard the scene batch "
                             "over N local devices (0 = all)")
    parser.add_argument("--scene_batch", type=int, default=1,
                        help="Process K scenes per device dispatch (FPS, "
                             "ICP, network, upsample all batched).  Clouds "
                             "pad with duplicate points, which FPS/KNN "
                             "never select over true points; padded rows "
                             "are sliced off host-side.  Equivalent to "
                             "per-scene up to fp reassociation (~1e-7).")
    args = parser.parse_args()
    load_config_into_args(args)
    from ogc_tpu import ops as _ops

    _ops.set_exact_neighbors(not args.approx_knn)

    flownet = FlowStep3D(
        npoint=args.flownet["npoint"],
        arch="kitti",
        use_instance_norm=args.flownet["use_instance_norm"],
        loc_flow_nn=args.flownet["loc_flow_nn"],
        loc_flow_rad=args.flownet["loc_flow_rad"],
        k_decay_fact=0.5,
    )
    n_point = args.flownet["npoint"]
    dummy = jnp.zeros((1, n_point, 3), jnp.float32)
    variables = jax.jit(
        lambda k: flownet.init(k, dummy, dummy, dummy, dummy, 2)
    )(jax.random.PRNGKey(0))
    variables = load_checkpoint(args.save_path, variables)
    print("Loaded weights from", args.save_path)

    data_root = args.data["root"]
    # YAML-overridable mapping (tests point it at a synthetic fixture).
    mapping_path = args.data.get("mapping_path") or (
        "data_prepare/kittisf/splits/val.txt"
        if args.split == "val"
        else "data_prepare/kittisf/splits/train.txt"
    )
    view_sels = [[0, 1], [1, 0]]
    test_set = TestDataset(
        data_root=data_root, mapping_path=mapping_path, downsampled=False,
        view_sels=view_sels,
    )
    epe_norm_thresh = 0.05

    if args.save:
        save_dir = osp.join(data_root, "flow_preds/flowstep3d")
        os.makedirs(save_dir, exist_ok=True)

    # ICP hyperparameters (reference test_flow_kittisf.py:69-72).
    n_point_icp = 1024
    max_icp_iters = 50
    decentralize = True

    fwd = jax.jit(
        lambda v, a, b: flownet.apply(
            v, a, b, a, b, args.test_model_iters, train=False
        )[-1]
    )

    eval_meter = AverageMeter()

    if args.scene_batch > 1:
        if args.host_preproc:
            raise SystemExit(
                "--scene_batch requires the batched on-device ICP "
                "(drop --host_preproc)"
            )
        _batched_eval(args, test_set, fwd, variables, eval_meter,
                      n_point, n_point_icp, max_icp_iters, decentralize,
                      epe_norm_thresh,
                      save_dir if args.save else None)
        print("Evaluation on kittisf-%s:" % args.split,
              eval_meter.get_mean_loss_dict())
        return

    for sid in range(len(test_set)):
        pcs, _, flows, _ = test_set[sid]
        pc1_org, pc2_org = pcs[0], pcs[1]
        flow_org = flows[0]

        # Ground removal by height (reference :84-86).
        is_ground = np.logical_and(pc1_org[:, 1] < -1.4, pc2_org[:, 1] < -1.4)
        not_ground = np.logical_not(is_ground)
        pc1, pc2 = pc1_org[not_ground], pc2_org[not_ground]

        if decentralize:
            center = np.concatenate((pc1, pc2), 0).mean(0)
            pc1_icp, pc2_icp = pc1 - center, pc2 - center
        else:
            pc1_icp, pc2_icp = pc1, pc2

        pc1_fps = pc1_icp[fps_downsample(pc1_icp, n_point_icp)]
        pc2_fps = pc2_icp[fps_downsample(pc2_icp, n_point_icp)]

        # Ego-motion from ICP on background points — by default the jitted
        # on-device loop (one call; SURVEY §3.5), numpy with --host_preproc.
        if args.host_preproc:
            T, _, _ = icp(pc1_fps, pc2_fps, max_iterations=max_icp_iters)
        else:
            T = np.asarray(icp_xla(
                jnp.asarray(pc1_fps[None]), jnp.asarray(pc2_fps[None]),
                max_iterations=max_icp_iters,
            ))[0]
        rot, transl = T[:3, :3], T[:3, 3].T
        flow_pred_org = (pc1_org @ rot.T + transl - pc1_org).astype(np.float32)

        # Residual flow from the network on ego-compensated points.
        pc1 = (pc1 @ rot.T + transl).astype(np.float32)
        pc1_net = pc1[fps_downsample(pc1, n_point)]
        pc2_net = pc2[fps_downsample(pc2, n_point)]
        flow_fps = fwd(
            variables, jnp.asarray(pc1_net[None]), jnp.asarray(pc2_net[None])
        )
        flow_up = np.asarray(
            ops.upsample_feat(
                jnp.asarray(pc1[None]), jnp.asarray(pc1_net[None]), flow_fps
            )
        )[0]
        flow_pred_org[not_ground] += flow_up

        epe, acc_s, acc_r, outlier = eval_flow(
            flow_org[None], flow_pred_org[None], epe_norm_thresh=epe_norm_thresh
        )
        eval_meter.append_loss(
            {"EPE": epe, "AccS": acc_s, "AccR": acc_r, "Outlier": outlier}
        )

        if args.save:
            test_set._save_predflow(
                flow_pred_org[None], save_root=save_dir, batch_size=1,
                n_frame=len(view_sels), offset=sid,
            )

    print("Evaluation on kittisf-%s:" % args.split, eval_meter.get_mean_loss_dict())


if __name__ == "__main__":
    main()
