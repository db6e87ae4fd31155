"""Train the unsupervised object segmentation network.

Usage (CLI-compatible with the reference train_seg.py):
    python train_seg.py config/seg/sapien/sapien_unsup.yaml --round R
"""

import argparse
import os.path as osp

import numpy as np

import jax

from ogc_tpu.losses.seg_unsup import OGCLossConfig
from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.data.base import DataLoader
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.train.seg import SegTrainer, make_optimizer
from ogc_tpu.utils.config import load_config_into_args


def build_model_and_datasets(args, predflow_path):
    data_root = args.data["root"]
    if args.dataset == "sapien":
        from ogc_tpu.data.sapien import SapienDataset as TrainDataset
        data_root = osp.join(data_root, "mbs-shapepart")
    elif args.dataset == "ogcdr":
        from ogc_tpu.data.ogcdr import OGCDynamicRoomDataset as TrainDataset
    elif args.dataset == "kittisf":
        from ogc_tpu.data.kittisf import KITTISceneFlowDataset as TrainDataset
    else:
        raise KeyError("Unrecognized dataset!")

    model = MaskFormer3D(
        n_slot=args.segnet["n_slot"],
        n_point=args.segnet["n_point"],
        arch=args.dataset,
        use_xyz=args.segnet["use_xyz"],
        n_transformer_layer=args.segnet["n_transformer_layer"],
        transformer_embed_dim=args.segnet["transformer_embed_dim"],
        transformer_input_pos_enc=args.segnet["transformer_input_pos_enc"],
    )

    if args.dataset in ("sapien", "ogcdr"):
        view_sels = [[0, 1], [1, 2], [2, 3]]
        train_set = TrainDataset(
            data_root=data_root,
            split="train",
            view_sels=view_sels,
            predflow_path=predflow_path,
            aug_transform_args=args.data["aug_transform_args"],
            decentralize=args.data["decentralize"],
        )
        val_set = TrainDataset(
            data_root=data_root,
            split="val",
            view_sels=view_sels,
            predflow_path=predflow_path,
            decentralize=args.data["decentralize"],
        )
    else:  # KITTI-SF
        view_sels = [[0, 1]]
        train_set = TrainDataset(
            data_root=data_root,
            mapping_path=args.data["train_mapping"],
            downsampled=True,
            view_sels=view_sels,
            predflow_path=predflow_path,
            aug_transform_args=args.data["aug_transform_args"],
            decentralize=args.data["decentralize"],
        )
        val_set = TrainDataset(
            data_root=data_root,
            mapping_path=args.data["val_mapping"],
            downsampled=True,
            view_sels=view_sels,
            predflow_path=predflow_path,
            decentralize=args.data["decentralize"],
        )
    return model, train_set, val_set


def main():
    from ogc_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Config file")
    parser.add_argument("--round", type=int, default=0,
                        help="Which round of iterative optimization")
    parser.add_argument("--resume", default=False, action="store_true",
                        help="Resume from <save_path>_R<round>/current.ckpt")
    parser.add_argument("--remat", type=str, default=None,
                        choices=["off", "full", "dots"],
                        help="Rematerialize the model forward in the "
                             "backward (recompute instead of storing "
                             "activations; default $OGC_REMAT or off)")
    args = parser.parse_args()
    load_config_into_args(args)

    np.random.seed(args.random_seed)

    if args.round > 1:
        predflow_path = args.predflow_path + "_R%d" % (args.round - 1)
    else:
        predflow_path = args.predflow_path

    model, train_set, val_set = build_model_and_datasets(args, predflow_path)

    # Initialize parameters.
    rng = jax.random.PRNGKey(args.random_seed)
    n_point = args.segnet["n_point"]
    dummy = jax.numpy.zeros((1, n_point, 3), jax.numpy.float32)
    params = model.init(rng, dummy, dummy)

    train_loader = DataLoader(
        train_set, batch_size=args.batch_size, shuffle=True,
        seed=args.random_seed, num_workers=4, drop_last=True,
    )
    val_loader = DataLoader(
        val_set, batch_size=args.batch_size, shuffle=False, num_workers=4,
    )

    optimizer = make_optimizer(
        args.lr, args.lr_decay, args.lr_clip, args.decay_step,
        args.batch_size, args.weight_decay,
    )
    loss_cfg = OGCLossConfig.from_dict(args.loss)

    mesh = pmesh.make_mesh()
    exp_base = args.save_path + "_R%d" % args.round
    from ogc_tpu.utils.logging import make_writer

    writer = make_writer(osp.join(exp_base, "log"))

    trainer = SegTrainer(
        model=model,
        params=params,
        loss_cfg=loss_cfg,
        optimizer=optimizer,
        aug_transform_epoch=args.aug_transform_epoch,
        ignore_npoint_thresh=args.ignore_npoint_thresh,
        exp_base=exp_base,
        mesh=mesh,
        writer=writer,
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
