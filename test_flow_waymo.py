"""Evaluate / extract scene flow on full-resolution Waymo scenes:
ground removal (height + GPF), ego-motion (GT odometry or ICP), FOV
register-bounding, FPS to 8192, FlowStep3D, 3-NN upsampling, optional
flow-norm denoising, ego+residual composition.

Usage (CLI-compatible with the reference test_flow_waymo.py):
    python test_flow_waymo.py <config.yaml> --split train --use_odometry --bound --save
"""

import argparse
import os
import os.path as osp

import numpy as np


def register_bound(pc1, pc2, rot, transl, bound=True):
    """Keep frame-1 points that remain inside frame-2's FOV after warping
    (reference test_flow_waymo.py:18-46)."""
    pc1_t = pc1 @ rot.T + transl
    select = np.ones(pc1.shape[0], dtype=bool)
    if bound:
        front = pc1_t[:, 2] > np.abs(pc1_t[:, 0])
        in_range = (pc1_t**2).sum(1) < 60 * 60
        in_bound = np.abs(pc1_t[:, 0]) < 50
        in_depth = pc1_t[:, 2] < 35
        select = np.logical_and(select, front & in_range & in_bound & in_depth)
    return select


def _pad_batch(a: np.ndarray, k: int) -> np.ndarray:
    """Pad the leading (batch) axis to k by repeating row 0; extras are
    sliced off after the device call (no host-side aliasing, unlike
    padding the scene list)."""
    if len(a) >= k:
        return a
    reps = np.broadcast_to(a[:1], (k - len(a),) + a.shape[1:])
    return np.concatenate([a, reps], 0)


def _batched_eval(args, test_set, fwd, variables, meters, n_point,
                  data_root, save_dir):
    """Scene-batched Waymo eval: K scenes per device dispatch across three
    device phases — GPF ground removal on the 2K raw clouds, ICP ego-motion
    (unless --use_odometry), network forward + 3-NN upsample — mirroring
    test_flow_kittisf._batched_eval.  The scene-conditional host logic
    (empty-frame skips, odometry pose loads, register_bound selections,
    denoise) stays host-side between phases; padded duplicate rows never
    win an FPS/KNN tie (test_flow_kittisf._pad_rows), so the batched path
    reproduces the per-scene XLA path up to fp reassociation
    (tests/test_outdoor_cli.py pins the equality)."""
    import jax

    from ogc_tpu import ops
    from ogc_tpu.metrics.flow import eval_flow
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.utils.gpf import ground_plane_fitting_xla
    from ogc_tpu.utils.icp import icp_xla
    from test_flow_kittisf import _pad_rows

    meter, meter_g, meter_ng = meters
    # Hyperparameters (reference test_flow_waymo.py:113-126).
    n_point_gpf, n_gpf_iter, n_gpf_lpr = 2048, 5, 50
    thresh_seed, thresh_dist = 0.4, 0.4
    n_point_icp, max_icp_iters, decentralize = 1024, 50, True
    thresh_flow_norm = 2.5
    epe_norm_thresh = 0.05

    dp = args.dp
    fps_gpf = pmesh.dp_eval_fwd(
        jax.jit(lambda _, p: ops.furthest_point_sample(p, n_point_gpf)),
        None, dp)
    gpf_fn = pmesh.dp_eval_fwd(
        jax.jit(lambda _, p, v, fv: ground_plane_fitting_xla(
            p, valid=v, fit_valid=fv, n_iter=n_gpf_iter, n_lpr=n_gpf_lpr,
            thresh_seed=thresh_seed, thresh_dist=thresh_dist)), None, dp)
    fps_icp = pmesh.dp_eval_fwd(
        jax.jit(lambda _, p: ops.furthest_point_sample(p, n_point_icp)),
        None, dp)
    icp_fn = pmesh.dp_eval_fwd(
        jax.jit(lambda _, a, b: icp_xla(a, b, max_iterations=max_icp_iters)),
        None, dp)
    fps_net = pmesh.dp_eval_fwd(
        jax.jit(lambda _, p: ops.furthest_point_sample(p, n_point)), None, dp)
    net_fn = pmesh.dp_eval_fwd(fwd, variables, dp)
    up_fn = pmesh.dp_eval_fwd(
        jax.jit(lambda _, pc, sub, f: ops.upsample_feat(pc, sub, f)),
        None, dp)

    K = args.scene_batch

    def _load_group(g0, sids):
        scenes = []
        for sid in sids[g0:g0 + K]:
            sequence_name, v1, v2 = test_set.data_ids[sid]
            pcs, _, flows, _ = test_set[sid]
            pc1_org, pc2_org = pcs[0], pcs[1]
            # Empty frames are skipped with zero flow (reference :147-154).
            if min(pc1_org.shape[0], pc2_org.shape[0]) < 1:
                if save_dir is not None:
                    test_set._save_predflow(
                        np.zeros_like(pc1_org)[None], save_root=save_dir,
                        batch_size=1, n_frame=1, offset=sid)
                continue
            scenes.append(dict(sid=sid, seq=(sequence_name, v1, v2),
                               pc1_org=pc1_org, pc2_org=pc2_org,
                               flow_org=flows[0]))
        return scenes

    def _process_group(scenes):
        """Device phases A-C for one K-group; fills each scene's
        flow_pred_org / not_ground1 in place and returns the list."""
        S = len(scenes)

        # ---- Phase A: batched GPF ground removal over the 2K raw clouds.
        # The per-scene path FPS-downsamples the fit subcloud only when
        # N > n_point_gpf; FPS-ing unconditionally is identical (with
        # npoint >= N every real point is selected before any duplicate,
        # and duplicate-index marks are ANDed away by `valid` inside
        # ground_plane_fitting_xla).
        clouds = [s["pc1_org"] for s in scenes] + \
                 [s["pc2_org"] for s in scenes]
        bucket = -(-max(len(c) for c in clouds) // 4096) * 4096
        P = np.stack([_pad_rows(c.astype(np.float32), bucket)
                      for c in clouds])
        V = np.zeros((len(clouds), bucket), bool)
        for i, c in enumerate(clouds):
            V[i, :len(c)] = True
        Pp = _pad_batch(P, 2 * K)
        fi = fps_gpf(Pp)
        FV = np.zeros((len(Pp), bucket), bool)
        np.put_along_axis(FV, fi, True, axis=1)
        G = gpf_fn(Pp, _pad_batch(V, 2 * K), FV)[:len(clouds)]
        for t, s in enumerate(scenes):
            for j, key in ((t, 1), (S + t, 2)):
                c = clouds[j]
                g_h = c[:, 1] < 0.3
                g_gpf = G[j, :len(c)].astype(bool)
                s["not_ground%d" % key] = np.logical_not(
                    np.logical_or(g_h, g_gpf))
            s["pc1"] = s["pc1_org"][s["not_ground1"]]
            s["pc2"] = s["pc2_org"][s["not_ground2"]]

        # ---- Phase B: ego-motion — GT odometry (host) or batched ICP on
        # decentralized FPS subclouds.
        if args.use_odometry:
            for s in scenes:
                sequence_name, v1, v2 = s["seq"]
                seq_path = osp.join(data_root, "data", sequence_name)
                pose1 = np.load(osp.join(seq_path, "pose_%04d.npy" % v1))
                pose2 = np.load(osp.join(seq_path, "pose_%04d.npy" % v2))
                s["rot"] = pose2[:3, :3].T @ pose1[:3, :3]
                s["transl"] = pose2[:3, :3].T @ (pose1[:3, 3] - pose2[:3, 3])
        else:
            # Scenes left empty by ground removal can't drive ICP (and
            # _pad_rows can't broadcast from an empty cloud): route them
            # to the ego-only identity path (zero residual flow), like
            # the Phase C net_scenes filter.
            icp_scenes = []
            for s in scenes:
                if min(len(s["pc1"]), len(s["pc2"])) > 0:
                    icp_scenes.append(s)
                else:
                    s["rot"] = np.eye(3, dtype=np.float64)
                    s["transl"] = np.zeros(3, dtype=np.float64)
            if icp_scenes:
                bucket_i = -(-max(max(len(s["pc1"]), len(s["pc2"]))
                                  for s in icp_scenes) // 4096) * 4096
                C = np.stack([
                    np.concatenate((s["pc1"], s["pc2"]), 0).mean(0)
                    if decentralize else np.zeros(3, np.float64)
                    for s in icp_scenes])[:, None, :]
                P1 = np.stack([_pad_rows(s["pc1"], bucket_i)
                               for s in icp_scenes])
                P2 = np.stack([_pad_rows(s["pc2"], bucket_i)
                               for s in icp_scenes])
                P1 = _pad_batch((P1 - C).astype(np.float32), K)
                P2 = _pad_batch((P2 - C).astype(np.float32), K)
                i1, i2 = fps_icp(P1), fps_icp(P2)
                pc1_fps = np.take_along_axis(P1, i1[..., None], 1)
                pc2_fps = np.take_along_axis(P2, i2[..., None], 1)
                T = icp_fn(pc1_fps, pc2_fps)[:len(icp_scenes)]
                for t, s in enumerate(icp_scenes):
                    s["rot"], s["transl"] = T[t, :3, :3], T[t, :3, 3]

        # ---- Phase C: FOV selections (host) + batched network residual.
        net_scenes = []
        for s in scenes:
            rot, transl = s["rot"], s["transl"]
            s["flow_pred_org"] = (
                s["pc1_org"] @ rot.T + transl - s["pc1_org"]
            ).astype(np.float32)
            pc1w = (s["pc1"] @ rot.T + transl).astype(np.float32)
            select1 = register_bound(pc1w, s["pc2"], rot, transl, args.bound)
            pc1_sel = pc1w[select1]
            inv_rot, inv_transl = rot.T, -rot.T @ transl
            select2 = register_bound(s["pc2"], pc1_sel, inv_rot, inv_transl,
                                     args.bound)
            s.update(pc1w=pc1w, select1=select1, pc1_sel=pc1_sel,
                     pc2_sel=s["pc2"][select2])
            if min(s["pc1_sel"].shape[0], s["pc2_sel"].shape[0]) > 0:
                net_scenes.append(s)
        if net_scenes:
            bucket_n = max(-(-max(max(len(s["pc1_sel"]), len(s["pc2_sel"]))
                                  for s in net_scenes) // 4096) * 4096,
                           n_point)
            P1s = _pad_batch(np.stack(
                [_pad_rows(s["pc1_sel"].astype(np.float32), bucket_n)
                 for s in net_scenes]), K)
            P2s = _pad_batch(np.stack(
                [_pad_rows(s["pc2_sel"].astype(np.float32), bucket_n)
                 for s in net_scenes]), K)
            j1, j2 = fps_net(P1s), fps_net(P2s)
            pc1_net = np.take_along_axis(P1s, j1[..., None], 1)
            pc2_net = np.take_along_axis(P2s, j2[..., None], 1)
            flow_fps = net_fn(pc1_net, pc2_net)
            flow_up = up_fn(P1s, pc1_net, flow_fps)
            for t, s in enumerate(net_scenes):
                flow_sel = flow_up[t, :len(s["pc1_sel"])].copy()
                if args.denoise:
                    outlier = np.linalg.norm(flow_sel, axis=1) \
                        > thresh_flow_norm
                    flow_sel[outlier] = 0
                flow_pred = np.zeros((s["pc1w"].shape[0], 3), np.float32)
                flow_pred[s["select1"]] = flow_sel
                s["flow_pred_org"][s["not_ground1"]] += flow_pred
        return scenes

    def _finalize(scenes):
        for s in scenes:
            epe, acc_s, acc_r, outl = eval_flow(
                s["flow_org"][None], s["flow_pred_org"][None],
                epe_norm_thresh=epe_norm_thresh)
            meter.append_loss(
                {"EPE": epe, "AccS": acc_s, "AccR": acc_r, "Outlier": outl})
            is_ground1 = np.logical_not(s["not_ground1"])
            if is_ground1.any():
                e = eval_flow(
                    s["flow_org"][None][:, is_ground1],
                    s["flow_pred_org"][None][:, is_ground1],
                    epe_norm_thresh=epe_norm_thresh)
                meter_g.append_loss(
                    dict(zip(["EPE", "AccS", "AccR", "Outlier"], e)))
            if s["not_ground1"].any():
                e = eval_flow(
                    s["flow_org"][None][:, s["not_ground1"]],
                    s["flow_pred_org"][None][:, s["not_ground1"]],
                    epe_norm_thresh=epe_norm_thresh)
                meter_ng.append_loss(
                    dict(zip(["EPE", "AccS", "AccR", "Outlier"], e)))
            if save_dir is not None:
                test_set._save_predflow(
                    s["flow_pred_org"][None], save_root=save_dir,
                    batch_size=1, n_frame=1, offset=s["sid"])

    # Double-buffered pipeline: group k+1's device phases (A-C) run in a
    # worker thread while the main thread finalizes group k (per-scene
    # metric evaluation + predflow writes).  JAX dispatch is thread-safe;
    # groups are independent and finalized in order, so metrics and
    # artifacts are identical to the serial loop (pinned by
    # tests/test_outdoor_cli.py).  OGC_WAYMO_PIPELINE=off serializes for
    # A/B (measured gain: BENCHLOG).
    sids = list(range(len(test_set)))
    groups = [g0 for g0 in range(0, len(sids), K)]
    pipelined = os.environ.get("OGC_WAYMO_PIPELINE", "on") != "off"
    if not pipelined:
        for g0 in groups:
            scenes = _load_group(g0, sids)
            if scenes:
                _finalize(_process_group(scenes))
        return

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    def _load_and_process(g0):
        scenes = _load_group(g0, sids)
        return _process_group(scenes) if scenes else []

    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = deque()
        for g0 in groups:
            pending.append(ex.submit(_load_and_process, g0))
            if len(pending) >= 2:
                _finalize(pending.popleft().result())
        while pending:
            _finalize(pending.popleft().result())


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu import ops
    from ogc_tpu.data.waymo import WaymoOpenDataset as TestDataset
    from ogc_tpu.metrics.flow import eval_flow
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.checkpoint import load_checkpoint
    from ogc_tpu.utils.config import load_config_into_args
    from ogc_tpu.utils.gpf import (
        fps_downsample,
        ground_plane_fitting,
        ground_plane_fitting_xla,
    )
    from ogc_tpu.utils.icp import icp, icp_xla
    from ogc_tpu.utils.meters import AverageMeter

    np.random.seed(0)

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--use_odometry", default=False, action="store_true")
    parser.add_argument("--denoise", default=False, action="store_true")
    parser.add_argument("--bound", default=False, action="store_true")
    parser.add_argument("--test_model_iters", type=int, default=4)
    parser.add_argument("--save", default=False, action="store_true")
    parser.add_argument("--approx_knn", default=False,
                        action="store_true",
                        help="Use approximate neighbor search in "
                             "evaluation (faster; default exact "
                             "for metric parity)")
    parser.add_argument("--host_preproc", default=False, action="store_true",
                        help="Run GPF/ICP preprocessing with the host numpy "
                             "oracles instead of the batched XLA path "
                             "(parity/debug)")
    parser.add_argument("--dp", type=int, default=1,
                        help="With --scene_batch: shard the scene batch "
                             "over N local devices (0 = all)")
    parser.add_argument("--scene_batch", type=int, default=1,
                        help="Process K scenes per device dispatch (GPF, "
                             "FPS, ICP, network, upsample all batched; "
                             "host logic between phases unchanged).  "
                             "Equivalent to per-scene up to fp "
                             "reassociation (~1e-7).")
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
    # YAML-overridable mapping (tests point it at a synthetic fixture); the
    # default is the reference's fixed split file path.
    mapping_path = args.data.get("mapping_path") or (
        "data_prepare/waymo/splits/val.txt"
        if args.split == "val"
        else "data_prepare/waymo/splits/train.txt"
    )
    test_set = TestDataset(data_root=data_root, mapping_path=mapping_path)
    epe_norm_thresh = 0.05

    save_dir = None
    if args.save:
        save_dir = osp.join(data_root, "flow_preds/flowstep3d_gpf")
        if args.use_odometry:
            save_dir += "_odo"
        if args.bound:
            save_dir += "_bound"
        if args.denoise:
            save_dir += "_denoise"
        os.makedirs(save_dir, exist_ok=True)

    # Hyperparameters (reference test_flow_waymo.py:113-126).
    n_point_gpf, n_gpf_iter, n_gpf_lpr = 2048, 5, 50
    thresh_seed, thresh_dist = 0.4, 0.4
    n_point_icp, max_icp_iters, decentralize = 1024, 50, True
    thresh_flow_norm = 2.5

    fwd = jax.jit(
        lambda v, a, b: flownet.apply(
            v, a, b, a, b, args.test_model_iters, train=False
        )[-1]
    )

    meter, meter_g, meter_ng = AverageMeter(), AverageMeter(), AverageMeter()

    if args.scene_batch > 1:
        if args.host_preproc:
            raise SystemExit(
                "--scene_batch requires the batched on-device GPF/ICP "
                "(drop --host_preproc)"
            )
        import sys
        import time

        t0 = time.perf_counter()
        _batched_eval(args, test_set, fwd, variables,
                      (meter, meter_g, meter_ng), n_point, data_root,
                      save_dir if args.save else None)
        dt = time.perf_counter() - t0
        print(
            f"# batched eval wall: {dt:.2f} s for {len(test_set)} scenes "
            f"({len(test_set) / dt:.3f} scenes/s, incl. compile)",
            file=sys.stderr,
        )
        print("Evaluation on waymo-%s:" % args.split,
              meter.get_mean_loss_dict())
        print("Ground points:", meter_g.get_mean_loss_dict())
        print("Above ground points:", meter_ng.get_mean_loss_dict())
        return

    for sid in range(len(test_set)):
        sequence_name, v1, v2 = test_set.data_ids[sid]
        pcs, _, flows, _ = test_set[sid]
        pc1_org, pc2_org = pcs[0], pcs[1]
        flow_org = flows[0]

        # Empty frames are skipped with zero flow (reference :147-154).
        if min(pc1_org.shape[0], pc2_org.shape[0]) < 1:
            if args.save:
                test_set._save_predflow(
                    np.zeros_like(pc1_org)[None], save_root=save_dir,
                    batch_size=1, n_frame=1, offset=sid,
                )
            continue

        # Ground removal: height threshold OR GPF.  Default is the batched
        # XLA path (SURVEY §3.5): clouds padded to a 4096 bucket, the plane
        # fitted on an FPS subcloud mask, all reductions on-device in one
        # jit call per bucket size; --host_preproc keeps the per-scene
        # numpy oracle.
        def not_ground(pc):
            g_h = pc[:, 1] < 0.3
            if args.host_preproc:
                g_gpf = ground_plane_fitting(
                    pc, n_sample_point=n_point_gpf, n_iter=n_gpf_iter,
                    n_lpr=n_gpf_lpr, thresh_seed=thresh_seed,
                    thresh_dist=thresh_dist,
                ).astype(bool)
            else:
                N = pc.shape[0]
                Nb = max(4096, -(-N // 4096) * 4096)
                # Pad by repeating the first point: FPS never prefers
                # duplicates, and padding is masked out of every reduction.
                pcp = np.concatenate(
                    [pc, np.repeat(pc[:1], Nb - N, axis=0)], 0
                ).astype(np.float32)
                valid = np.zeros(Nb, bool)
                valid[:N] = True
                fit_valid = None
                if N > n_point_gpf:
                    fps_idx = np.asarray(ops.furthest_point_sample(
                        jnp.asarray(pcp[None]), n_point_gpf
                    ))[0]
                    fv = np.zeros(Nb, bool)
                    fv[fps_idx] = True
                    fit_valid = jnp.asarray(fv[None])
                g_gpf = np.asarray(ground_plane_fitting_xla(
                    jnp.asarray(pcp[None]), valid=jnp.asarray(valid[None]),
                    fit_valid=fit_valid, n_iter=n_gpf_iter, n_lpr=n_gpf_lpr,
                    thresh_seed=thresh_seed, thresh_dist=thresh_dist,
                ))[0, :N].astype(bool)
            return np.logical_not(np.logical_or(g_h, g_gpf))

        not_ground1 = not_ground(pc1_org)
        not_ground2 = not_ground(pc2_org)
        pc1, pc2 = pc1_org[not_ground1], pc2_org[not_ground2]

        if args.use_odometry:
            seq_path = osp.join(data_root, "data", sequence_name)
            pose1 = np.load(osp.join(seq_path, "pose_%04d.npy" % v1))
            pose2 = np.load(osp.join(seq_path, "pose_%04d.npy" % v2))
            rot = pose2[:3, :3].T @ pose1[:3, :3]
            transl = pose2[:3, :3].T @ (pose1[:3, 3] - pose2[:3, 3])
        else:
            if decentralize:
                center = np.concatenate((pc1, pc2), 0).mean(0)
                pc1_icp, pc2_icp = pc1 - center, pc2 - center
            else:
                pc1_icp, pc2_icp = pc1, pc2
            pc1_fps = pc1_icp[fps_downsample(pc1_icp, n_point_icp)]
            pc2_fps = pc2_icp[fps_downsample(pc2_icp, n_point_icp)]
            if args.host_preproc:
                T, _, _ = icp(pc1_fps, pc2_fps, max_iterations=max_icp_iters)
            else:
                # Jitted batched ICP: the 50-iteration NN/Kabsch loop runs
                # entirely on-device (one call) instead of 50 host KD-tree
                # round-trips per scene.
                T = np.asarray(icp_xla(
                    jnp.asarray(pc1_fps[None]), jnp.asarray(pc2_fps[None]),
                    max_iterations=max_icp_iters,
                ))[0]
            rot, transl = T[:3, :3], T[:3, 3]

        flow_pred_org = (pc1_org @ rot.T + transl - pc1_org).astype(np.float32)

        pc1 = (pc1 @ rot.T + transl).astype(np.float32)
        select1 = register_bound(pc1, pc2, rot, transl, args.bound)
        pc1_sel = pc1[select1]
        inv_rot, inv_transl = rot.T, -rot.T @ transl
        select2 = register_bound(pc2, pc1_sel, inv_rot, inv_transl, args.bound)
        pc2_sel = pc2[select2]

        if min(pc1_sel.shape[0], pc2_sel.shape[0]) > 0:
            pc1_net = pc1_sel[fps_downsample(pc1_sel, n_point)]
            pc2_net = pc2_sel[fps_downsample(pc2_sel, n_point)]
            flow_fps = fwd(
                variables, jnp.asarray(pc1_net[None]), jnp.asarray(pc2_net[None])
            )
            flow_sel = np.asarray(
                ops.upsample_feat(
                    jnp.asarray(pc1_sel[None]), jnp.asarray(pc1_net[None]),
                    flow_fps,
                )
            )[0]

            if args.denoise:
                outlier = np.linalg.norm(flow_sel, axis=1) > thresh_flow_norm
                flow_sel[outlier] = 0

            flow_pred = np.zeros((pc1.shape[0], 3), np.float32)
            flow_pred[select1] = flow_sel
            flow_pred_org[not_ground1] += flow_pred

        epe, acc_s, acc_r, outl = eval_flow(
            flow_org[None], flow_pred_org[None], epe_norm_thresh=epe_norm_thresh
        )
        meter.append_loss({"EPE": epe, "AccS": acc_s, "AccR": acc_r, "Outlier": outl})

        is_ground1 = np.logical_not(not_ground1)
        if is_ground1.any():
            e = eval_flow(
                flow_org[None][:, is_ground1], flow_pred_org[None][:, is_ground1],
                epe_norm_thresh=epe_norm_thresh,
            )
            meter_g.append_loss(dict(zip(["EPE", "AccS", "AccR", "Outlier"], e)))
        if not_ground1.any():
            e = eval_flow(
                flow_org[None][:, not_ground1], flow_pred_org[None][:, not_ground1],
                epe_norm_thresh=epe_norm_thresh,
            )
            meter_ng.append_loss(dict(zip(["EPE", "AccS", "AccR", "Outlier"], e)))

        if args.save:
            test_set._save_predflow(
                flow_pred_org[None], save_root=save_dir, batch_size=1,
                n_frame=1, offset=sid,
            )

    print("Evaluation on waymo-%s:" % args.split, meter.get_mean_loss_dict())
    print("Ground points:", meter_g.get_mean_loss_dict())
    print("Above ground points:", meter_ng.get_mean_loss_dict())


if __name__ == "__main__":
    main()
