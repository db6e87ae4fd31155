"""Fully-supervised segmentation trainer (baseline).

Counterpart of the reference train_seg_sup.py Trainer: single-frame forward,
Hungarian-matched CE+Dice loss against one-hot GT with valid masks.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ogc_tpu.losses.seg_sup import SupLossConfig, supervised_mask_loss
from ogc_tpu.metrics.seg import accumulate_eval_results, calculate_PQ_F1
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.utils.checkpoint import load_train_state, save_checkpoint
from ogc_tpu.utils.meters import AverageMeter


class SupSegTrainer:
    def __init__(self, model, params, loss_cfg: SupLossConfig, optimizer,
                 ignore_npoint_thresh, exp_base, mesh=None, writer=None,
                 manual_spmd=None, remat=None):
        """:param manual_spmd: shard_map the steps (None = auto: manual on
        >1-device meshes — keeps the Mosaic kernels on multi-chip; the
        segnet has no cross-sample statistics, so pmean'ing gradients and
        loss scalars over the equal padded shards is exactly the GSPMD
        global-batch math; see SegTrainer).
        :param remat: model-forward rematerialization under grad — see
        SegTrainer (off/full/dots, default from $OGC_REMAT)."""
        from ogc_tpu.train.seg import _remat_wrap, _resolve_remat

        self.model = model
        self.loss_cfg = loss_cfg
        self.remat = _resolve_remat(remat)
        self._remat_wrap = _remat_wrap
        self.optimizer = optimizer
        self.ignore_npoint_thresh = ignore_npoint_thresh
        self.exp_base = exp_base
        os.makedirs(exp_base, exist_ok=True)
        self.checkpoint_name = osp.join(exp_base, "current")
        self.best_name = osp.join(exp_base, "best")
        self.writer = writer

        self.mesh = mesh if mesh is not None else pmesh.make_mesh(jax.devices()[:1])
        self.params = pmesh.replicate(self.mesh, params)
        self.opt_state = pmesh.replicate(self.mesh, optimizer.init(params))

        if manual_spmd is None:
            manual_spmd = int(self.mesh.devices.size) > 1
        if manual_spmd:
            axis = pmesh.DATA_AXIS

            def train_step(params, opt_state, pc, gt_mask, valid):
                (_, (ld, mask)), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, pc, gt_mask, valid, True)
                grads = jax.lax.pmean(grads, axis)
                ld = jax.lax.pmean(ld, axis)
                updates, opt_state = self.optimizer.update(
                    grads, opt_state, params
                )
                params = optax.apply_updates(params, updates)
                return params, opt_state, ld, mask

            self._train_step = pmesh.manual_jit(
                train_step, self.mesh,
                in_batch=(False, False, True, True, True),
                out_batch=(False, False, False, True),
            )

            def eval_step(params, pc, gt_mask, valid):
                loss, (ld, mask) = self._loss(params, pc, gt_mask, valid)
                return (jax.lax.pmean(loss, axis),
                        jax.lax.pmean(ld, axis), mask)

            self._eval_step = pmesh.manual_jit(
                eval_step, self.mesh, in_batch=(False, True, True, True),
                out_batch=(False, False, True),
            )
        else:
            self._train_step = jax.jit(self._train_step_impl)
            self._eval_step = jax.jit(self._eval_step_impl)

    def _full_state(self, epoch: int):
        return {
            "model_state": self.params,
            "opt_state": self.opt_state,
            "epoch": epoch,
        }

    def save(self, is_best: bool, epoch: int = 0):
        save_checkpoint(
            self._full_state(epoch), is_best,
            filename=self.checkpoint_name, bestname=self.best_name,
            # Training continues while the write hits disk (single-slot
            # background writer; loaders join it before reading).
            async_save=True,
        )

    def resume(self, path: str) -> int:
        state = load_train_state(path, jax.device_get(self._full_state(0)))
        self.params = pmesh.replicate(self.mesh, state["model_state"])
        self.opt_state = pmesh.replicate(self.mesh, state["opt_state"])
        return int(state["epoch"])

    def _loss(self, params, pc, gt_mask, valid, train=False):
        def apply(p, x):
            return self.model.apply(p, x, x, train=train)

        if train:  # remat only matters under grad (see SegTrainer)
            apply = self._remat_wrap(apply, self.remat)
        mask = apply(params, pc)
        loss, ld = supervised_mask_loss(mask, gt_mask, valid, self.loss_cfg)
        return loss, (ld, mask)

    def _train_step_impl(self, params, opt_state, pc, gt_mask, valid):
        (loss, (ld, mask)), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, pc, gt_mask, valid, True
        )
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, ld, mask

    def _eval_step_impl(self, params, pc, gt_mask, valid):
        loss, (ld, mask) = self._loss(params, pc, gt_mask, valid)
        return loss, ld, mask

    def _shard(self, *arrays):
        return pmesh.shard_padded(self.mesh, arrays)

    def train_it(self, it, batch):
        pcs, segms, _, valids = batch
        pc, gt_mask, valid = pcs[:, 0], segms[:, 0], valids[:, 0]
        (pc, gt_mask, valid), b = self._shard(pc, gt_mask, valid)
        self.params, self.opt_state, ld, mask = self._train_step(
            self.params, self.opt_state, pc, gt_mask, valid
        )
        ld = {k: float(v) for k, v in ld.items()}
        segm = pmesh.local_values(gt_mask, b).argmax(2)
        return ld, segm, pmesh.local_values(mask, b)

    def eval_epoch(self, loader):
        meter = AverageMeter()
        total_loss, count = 0.0, 0.0
        ap = {"Pred_IoU": [], "Pred_Matched": [], "N_GT_Inst": []}
        for batch in loader:
            pcs, segms, _, valids = batch
            pc, gt_mask, valid = pcs[:, 0], segms[:, 0], valids[:, 0]
            (pc_d, gt_d, valid_d), b = self._shard(pc, gt_mask, valid)
            loss, ld, mask = self._eval_step(self.params, pc_d, gt_d, valid_d)
            total_loss += float(loss) * b
            count += b
            meter.append_loss({k: float(v) for k, v in ld.items()})
            segm = pmesh.local_values(gt_d, b).argmax(2)
            iou, matched, _, n_gt = accumulate_eval_results(
                segm, pmesh.local_values(mask, b), self.ignore_npoint_thresh
            )
            ap["Pred_IoU"].append(iou)
            ap["Pred_Matched"].append(matched)
            ap["N_GT_Inst"].append(n_gt)
        return total_loss / max(count, 1.0), meter.get_mean_loss_dict(), ap

    def train(self, n_epochs, train_loader, test_loader=None, progress=True,
              start_epoch: int = 1):
        # Resume semantics mirror SegTrainer.train (it drives the LR/BN
        # schedules through the optimizer's step count on restore).
        it = (start_epoch - 1) * len(train_loader)
        best_loss = 1e10
        if start_epoch == 1:
            self.save(True, 0)
        for epoch in range(start_epoch, n_epochs + 1):
            train_meter = AverageMeter()
            ap = {"Pred_IoU": [], "Pred_Matched": [], "N_GT_Inst": []}
            for batch in train_loader:
                ld, segm, mask = self.train_it(it, batch)
                it += 1
                train_meter.append_loss(ld)
                if self.writer is not None:
                    for k, v in ld.items():
                        self.writer.add_scalar("train/" + k, v, global_step=it)
                iou, matched, _, n_gt = accumulate_eval_results(
                    segm, mask, self.ignore_npoint_thresh
                )
                ap["Pred_IoU"].append(iou)
                ap["Pred_Matched"].append(matched)
                ap["N_GT_Inst"].append(n_gt)

            train_avg = train_meter.get_mean_loss_dict()
            pq, f1, pre, rec = calculate_PQ_F1(
                np.concatenate(ap["Pred_IoU"]) if ap["Pred_IoU"] else np.zeros(0),
                np.concatenate(ap["Pred_Matched"]) if ap["Pred_Matched"] else np.zeros(0),
                int(np.sum(ap["N_GT_Inst"])),
            )
            if progress:
                msg = ", ".join(f"{k}={v:.4f}" for k, v in train_avg.items())
                print(f"[epoch {epoch:3d}] train: {msg} | PQ@50={pq:.4f}")
            if self.writer is not None:
                for k, v in train_avg.items():
                    self.writer.add_scalar("epoch_sum_train/" + k, v, global_step=epoch)
                self.writer.add_scalar("epoch_sum_train/PQ@50", pq, global_step=epoch)

            if test_loader is not None:
                val_loss, val_avg, val_ap = self.eval_epoch(test_loader)
                pq, f1, pre, rec = calculate_PQ_F1(
                    np.concatenate(val_ap["Pred_IoU"]) if val_ap["Pred_IoU"] else np.zeros(0),
                    np.concatenate(val_ap["Pred_Matched"]) if val_ap["Pred_Matched"] else np.zeros(0),
                    int(np.sum(val_ap["N_GT_Inst"])),
                )
                if progress:
                    print(f"[epoch {epoch:3d}]   val: loss={val_loss:.4f} PQ@50={pq:.4f} F1@50={f1:.4f}")
                if self.writer is not None:
                    for k, v in val_avg.items():
                        self.writer.add_scalar("epoch_sum_val/" + k, v, global_step=epoch)
                    self.writer.add_scalar("epoch_sum_val/PQ@50", pq, global_step=epoch)
                is_best = val_loss < best_loss
                best_loss = min(best_loss, val_loss)
                self.save(is_best, epoch)
        # Surface an ENOSPC-style failure of the FINAL async write before
        # returning — nothing else would ever check it (ADVICE r1).
        from ogc_tpu.utils.checkpoint import wait_pending_saves

        wait_pending_saves()
        return best_loss
