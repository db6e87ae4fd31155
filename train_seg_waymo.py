"""Train unsupervised segmentation on Waymo Open (backward-flow-only,
1-frame loss variant).

Usage (CLI-compatible with the reference train_seg_waymo.py):
    python train_seg_waymo.py config/seg/waymo/waymo_unsup.yaml --round R
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
    from ogc_tpu.data.waymo import WaymoOpenDataset as TrainDataset
    from ogc_tpu.losses.seg_unsup import OGCLossConfig
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.seg import SegTrainer, make_optimizer
    from ogc_tpu.utils.config import load_config_into_args
    from ogc_tpu.utils.logging import make_writer

    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--resume", default=False, action="store_true",
                        help="Resume from the experiment dir's `current` "
                             "checkpoint (full train state; the reference "
                             "restarts at epoch 1)")
    parser.add_argument("--remat", type=str, default=None,
                        choices=["off", "full", "dots"],
                        help="Rematerialize the model forward in the "
                             "backward (recompute instead of storing "
                             "activations; default $OGC_REMAT or off)")
    parser.add_argument("--round", type=int, default=0)
    args = parser.parse_args()
    load_config_into_args(args)

    np.random.seed(args.random_seed)

    data_root = args.data["root"]
    model = MaskFormer3D(
        n_slot=args.segnet["n_slot"],
        n_point=args.segnet["n_point"],
        arch="waymo",  # Waymo uses the KITTI segnet architecture
        use_xyz=args.segnet["use_xyz"],
        n_transformer_layer=args.segnet["n_transformer_layer"],
        transformer_embed_dim=args.segnet["transformer_embed_dim"],
        transformer_input_pos_enc=args.segnet["transformer_input_pos_enc"],
    )

    if args.predflow_path == "None":
        predflow_path = None
    elif args.round > 1:
        predflow_path = args.predflow_path + "_R%d" % (args.round - 1)
    else:
        predflow_path = args.predflow_path

    train_set = TrainDataset(
        data_root=data_root,
        mapping_path=args.data["train_mapping"],
        downsampled=True,
        select_frame=args.data["train_select_frame"],
        predflow_path=predflow_path,
        aug_transform_args=args.data["aug_transform_args"],
        decentralize=args.data["decentralize"],
    )
    val_set = TrainDataset(
        data_root=data_root,
        mapping_path=args.data["val_mapping"],
        downsampled=True,
        select_frame=args.data["val_select_frame"],
        predflow_path=predflow_path,
        decentralize=args.data["decentralize"],
    )
    train_loader = DataLoader(
        train_set, batch_size=args.batch_size, shuffle=True,
        seed=args.random_seed, num_workers=4, drop_last=True,
    )
    val_loader = DataLoader(
        val_set, batch_size=args.batch_size, shuffle=False, num_workers=4
    )

    dummy = jnp.zeros((1, args.segnet["n_point"], 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.random_seed), dummy, dummy)

    optimizer = make_optimizer(
        args.lr, args.lr_decay, args.lr_clip, args.decay_step,
        args.batch_size, args.weight_decay,
    )
    loss_cfg = OGCLossConfig.from_dict(args.loss)

    exp_base = args.save_path + "_R%d" % args.round
    trainer = SegTrainer(
        model=model,
        params=params,
        loss_cfg=loss_cfg,
        optimizer=optimizer,
        aug_transform_epoch=args.aug_transform_epoch,
        ignore_npoint_thresh=args.ignore_npoint_thresh,
        exp_base=exp_base,
        mesh=pmesh.make_mesh(),
        writer=make_writer(osp.join(exp_base, "log")),
        frame_stride=2,  # Waymo items duplicate the single (backward) frame
        remat=args.remat,
    )
    start_epoch = 1
    if args.resume:
        start_epoch = trainer.resume(osp.join(exp_base, "current")) + 1
        print(f"Resumed from epoch {start_epoch - 1}")
    trainer.train(args.epochs, train_set, train_loader, val_loader,
                  start_epoch=start_epoch)


if __name__ == "__main__":
    main()
