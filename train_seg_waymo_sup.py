"""Train the fully-supervised segmentation baseline on Waymo Open
(single-frame items with per-point valid masks).

Usage (CLI-compatible with the reference train_seg_waymo_sup.py):
    python train_seg_waymo_sup.py config/seg/waymo/waymo_sup.yaml
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
    from ogc_tpu.data.waymo import WaymoOpenSingleFrameDataset as TrainDataset
    from ogc_tpu.losses.seg_sup import SupLossConfig
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.parallel import mesh as pmesh
    from ogc_tpu.train.seg import make_optimizer
    from ogc_tpu.train.seg_sup import SupSegTrainer
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
    args = parser.parse_args()
    load_config_into_args(args)

    np.random.seed(args.random_seed)

    data_root = args.data["root"]
    model = MaskFormer3D(
        n_slot=args.segnet["n_slot"],
        n_point=args.segnet["n_point"],
        arch="waymo",
        use_xyz=args.segnet["use_xyz"],
        n_transformer_layer=args.segnet["n_transformer_layer"],
        transformer_embed_dim=args.segnet["transformer_embed_dim"],
        transformer_input_pos_enc=args.segnet["transformer_input_pos_enc"],
    )

    common = dict(
        data_root=data_root,
        downsampled=True,
        decentralize=args.data["decentralize"],
        onehot_label=True,
        max_n_object=args.segnet["n_slot"],
        ignore_class_ids=[2, 3],
        ignore_npoint_thresh=args.ignore_npoint_thresh,
    )
    train_set = TrainDataset(
        mapping_path=args.data["train_mapping"],
        select_frame=args.data["train_select_frame"],
        aug_transform=args.data.get("aug_transform", False),
        aug_transform_args=args.data["aug_transform_args"],
        **common,
    )
    val_set = TrainDataset(
        mapping_path=args.data["val_mapping"],
        select_frame=args.data["val_select_frame"],
        **common,
    )

    class _FlowPad:
        """Adapt 3-tuple single-frame items to the 4-tuple trainer format."""

        def __init__(self, ds):
            self.ds = ds
            self.aug_transform = ds.aug_transform

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            pcs, segms, valids = self.ds[i]
            return pcs, segms, np.zeros_like(pcs), valids

    dummy = jnp.zeros((1, args.segnet["n_point"], 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.random_seed), dummy, dummy)

    train_loader = DataLoader(
        _FlowPad(train_set), batch_size=args.batch_size, shuffle=True,
        seed=args.random_seed, num_workers=4, drop_last=True,
    )
    val_loader = DataLoader(
        _FlowPad(val_set), batch_size=args.batch_size, shuffle=False,
        num_workers=4,
    )

    optimizer = make_optimizer(
        args.lr, args.lr_decay, args.lr_clip, args.decay_step,
        args.batch_size, args.weight_decay,
    )
    trainer = SupSegTrainer(
        model=model,
        params=params,
        loss_cfg=SupLossConfig(weights=tuple(args.loss["weights"]),
                               use_focal=args.loss.get("use_focal", False)),
        optimizer=optimizer,
        ignore_npoint_thresh=args.ignore_npoint_thresh,
        exp_base=args.save_path,
        mesh=pmesh.make_mesh(),
        writer=make_writer(osp.join(args.save_path, "log")),
        remat=args.remat,
    )
    start_epoch = 1
    if args.resume:
        start_epoch = trainer.resume(osp.join(args.save_path, "current")) + 1
        print(f"Resumed from epoch {start_epoch - 1}")
    trainer.train(args.epochs, train_loader, val_loader,
                  start_epoch=start_epoch)


if __name__ == "__main__":
    main()
