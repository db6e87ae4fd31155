"""Reproduce the FlowStep3D evaluation protocol on KITTI (kitti142 split,
seed 18) to compare published numbers against OGC-refined flow.

Usage (CLI-compatible with the reference test_flow_kittisf_benchmark.py):
    python test_flow_kittisf_benchmark.py config/flow/kittisf/kittisf_unsup.yaml
"""

import argparse

import numpy as np


def preproc(pc1, pc2, flow, remove_ground=False, n_sample_point=None):
    """FlowStep3D's preprocessing: ground removal + random sampling
    (reference test_flow_kittisf_benchmark.py:14-43)."""
    if remove_ground:
        is_ground = np.logical_and(pc1[:, 1] < -1.4, pc2[:, 1] < -1.4)
        not_ground = np.logical_not(is_ground)
        pc1, pc2 = pc1[not_ground], pc2[not_ground]
        flow = flow[not_ground]
    if n_sample_point is not None:
        n = pc1.shape[0]
        replace = n < n_sample_point
        idx1 = np.random.choice(n, size=n_sample_point, replace=replace)
        idx2 = np.random.choice(n, size=n_sample_point, replace=replace)
        pc1, pc2 = pc1[idx1], pc2[idx2]
        flow = flow[idx1]
    return pc1, pc2, flow


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
    from ogc_tpu.utils.meters import AverageMeter

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--approx_knn", default=False,
                        action="store_true",
                        help="Use approximate neighbor search in "
                             "evaluation (faster; default exact "
                             "for metric parity)")
    args = parser.parse_args()
    load_config_into_args(args)
    from ogc_tpu import ops as _ops

    _ops.set_exact_neighbors(not args.approx_knn)

    # Fixed seed matching the FlowStep3D protocol (reference :58-59).
    np.random.seed(18)

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
    view_sels = [[0, 1], [1, 0]]
    mapping_path = "data_prepare/kittisf/splits/kitti142.txt"
    test_set = TestDataset(
        data_root=data_root, mapping_path=mapping_path, downsampled=False,
        view_sels=view_sels,
    )
    test_set_predflow = TestDataset(
        data_root=data_root + "_downsampled", mapping_path=mapping_path,
        downsampled=True, view_sels=view_sels,
        predflow_path="flowstep3d_for-benchmark_R2",
    )

    fwd = jax.jit(
        lambda v, a, b: flownet.apply(v, a, b, a, b, 5, train=False)[-1]
    )

    meter_fs3d, meter = AverageMeter(), AverageMeter()
    n_scenes = len(test_set) // 2
    for sid in range(n_scenes):
        pcs_org, _, flows_org, _ = test_set[sid * 2]
        pcs, _, flow_preds, _ = test_set_predflow[sid * 2]
        pc1_org, pc2_org, flow_org = pcs_org[0], pcs_org[1], flows_org[0]
        pc, flow_pred = pcs[0], flow_preds[0]

        pc1_org, pc2_org, flow_org = preproc(
            pc1_org, pc2_org, flow_org, remove_ground=True, n_sample_point=8192
        )

        flow_fs3d = np.asarray(
            fwd(variables, jnp.asarray(pc1_org[None]), jnp.asarray(pc2_org[None]))
        )
        e = eval_flow(flow_org[None], flow_fs3d)
        meter_fs3d.append_loss(dict(zip(["EPE", "AccS", "AccR", "Outlier"], e)))

        # Interpolate OUR saved (OA-ICP refined) flow to the protocol points.
        not_ground = np.logical_not(pc[:, 1] < -1.4)
        pc_ng, flow_ng = pc[not_ground], flow_pred[not_ground]
        flow_up = np.asarray(
            ops.upsample_feat(
                jnp.asarray(pc1_org[None]), jnp.asarray(pc_ng[None]),
                jnp.asarray(flow_ng[None]),
            )
        )
        e = eval_flow(flow_org[None], flow_up)
        meter.append_loss(dict(zip(["EPE", "AccS", "AccR", "Outlier"], e)))

    print("FlowStep3D:", meter_fs3d.get_mean_loss_dict())
    print("Ours:", meter.get_mean_loss_dict())


if __name__ == "__main__":
    main()
