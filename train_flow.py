"""Train the self-supervised scene-flow network (FlowStep3D).

Usage (CLI-compatible with the reference train_flow.py):
    python train_flow.py config/flow/sapien/sapien_unsup.yaml
"""

import argparse
import os.path as osp

import numpy as np


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ogc_tpu.data.base import DataLoader
    from ogc_tpu.losses.flow_unsup import FlowLossConfig
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.flow import FlowTrainer, make_bn_schedule
    from ogc_tpu.train.seg import make_optimizer
    from ogc_tpu.utils.config import load_config_into_args

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--resume", default=False, action="store_true",
                        help="Resume from <save_path>/current (full train "
                             "state; the reference restarts at epoch 1)")
    parser.add_argument("--remat", type=str, default=None,
                        choices=["off", "full", "dots", "scan"],
                        help="Rematerialize forward activations in the "
                             "backward: full/dots = whole-model "
                             "jax.checkpoint, scan = per-GRU-iteration "
                             "nn.remat of the refinement scan body "
                             "(default $OGC_REMAT or off)")
    parser.add_argument("--bn_sync", type=str, default="local",
                        choices=["local", "global"],
                        help="Multi-device BatchNorm batch statistics: "
                             "local (default) = per-device stats, one "
                             "fused running-stat all-reduce per step; "
                             "global = cross-device pmean per BN "
                             "application (GSPMD global-batch semantics; "
                             "use for multi-chip parity runs — see "
                             "PARITY.md).  Identical on one device.")
    args = parser.parse_args()
    load_config_into_args(args)

    np.random.seed(args.random_seed)

    data_root = args.data["root"]
    if args.dataset == "sapien":
        from ogc_tpu.data.sapien import SapienDataset as TrainDataset

        data_root = osp.join(data_root, "mbs-shapepart")
    elif args.dataset == "ogcdr":
        from ogc_tpu.data.ogcdr import OGCDynamicRoomDataset as TrainDataset
    else:
        raise KeyError("Unrecognized dataset!")

    flownet = FlowStep3D(
        npoint=args.flownet["npoint"],
        arch=args.dataset,
        use_instance_norm=args.flownet["use_instance_norm"],
        loc_flow_nn=args.flownet["loc_flow_nn"],
        loc_flow_rad=args.flownet["loc_flow_rad"],
        k_decay_fact=args.flownet["k_decay_fact"],
        remat_refine=args.remat == "scan",
    )

    # Only adjacent frame pairs: self-supervised training cannot handle large
    # motions (reference train_flow.py:246).
    view_sels = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2]]
    train_set = TrainDataset(
        data_root=data_root, split="train", view_sels=view_sels,
        aug_transform=args.data["aug_transform"],
        aug_transform_args=args.data["aug_transform_args"],
    )
    val_set = TrainDataset(
        data_root=data_root, split="val", view_sels=view_sels,
        aug_transform=False,
    )
    train_loader = DataLoader(
        train_set, batch_size=args.batch_size, shuffle=True,
        seed=args.random_seed, num_workers=4, drop_last=True,
    )
    val_loader = DataLoader(
        val_set, batch_size=args.batch_size, shuffle=False, num_workers=4
    )

    n_point = args.flownet["npoint"]
    dummy = jnp.zeros((1, n_point, 3), jnp.float32)
    variables = flownet.init(
        jax.random.PRNGKey(args.random_seed), dummy, dummy, dummy, dummy, 2
    )

    optimizer = make_optimizer(
        args.lr, args.lr_decay, args.lr_clip, args.decay_step,
        args.batch_size, args.weight_decay,
    )
    loss_cfg = FlowLossConfig.from_dict(args.loss)
    bn_schedule = make_bn_schedule(
        args.bn_momentum, args.bn_decay, args.decay_step, args.batch_size
    )

    from ogc_tpu.utils.logging import make_writer

    writer = make_writer(osp.join(args.save_path, "log"))

    trainer = FlowTrainer(
        model=flownet,
        variables=variables,
        model_iters=args.model_iters,
        loss_cfg=loss_cfg,
        optimizer=optimizer,
        exp_base=args.save_path,
        bn_schedule=bn_schedule,
        mesh=pmesh.make_mesh(),
        writer=writer,
        remat=None if args.remat == "scan" else args.remat,
        bn_sync=args.bn_sync,
    )
    start_epoch = 1
    if args.resume:
        start_epoch = trainer.resume(osp.join(args.save_path, "current")) + 1
        print(f"Resumed from epoch {start_epoch - 1}")
    trainer.train(args.epochs, train_loader, val_loader,
                  start_epoch=start_epoch)


if __name__ == "__main__":
    main()
