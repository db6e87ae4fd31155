"""Unsupervised segmentation trainer.

TPU-native counterpart of the reference train_seg.py Trainer (train_seg.py:
19-227): one fused, jitted train step (forward over all frames, OGC loss with
in-graph Hungarian, Adam update with finite-grad guard), data-parallel over a
device mesh, epoch-level eval + best checkpointing, TensorBoard scalars.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ogc_tpu.losses.seg_unsup import OGCLossConfig, ogc_loss
from ogc_tpu.metrics.seg import accumulate_eval_results, calculate_PQ_F1
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.utils.checkpoint import (
    load_train_state,
    save_checkpoint,
    wait_pending_saves,
)
from ogc_tpu.utils.meters import AverageMeter, RunningAverageMeter


def make_lr_schedule(lr, lr_decay, lr_clip, decay_step, batch_size):
    """Exponential staircase decay with floor (reference lr_curve,
    train_seg.py:230-234)."""

    def schedule(step):
        exp = jnp.floor(step * batch_size / decay_step)
        factor = jnp.maximum(lr_decay**exp, lr_clip / lr)
        return lr * factor

    return schedule


def make_optimizer(lr, lr_decay, lr_clip, decay_step, batch_size, weight_decay=0.0):
    """Adam + staircase LR + L2 weight decay + finite-grad step skip (the
    reference's try/except + NaN-grad guard, train_seg.py:76-84, realized as
    optax.apply_if_finite)."""
    schedule = make_lr_schedule(lr, lr_decay, lr_clip, decay_step, batch_size)
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts += [
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.apply_if_finite(optax.chain(*parts), max_consecutive_errors=10**8)


def _resolve_remat(remat: Optional[str]) -> Optional[str]:
    """Resolve the remat mode at trainer construction (NOT inside jit —
    jit caches would pin the first trace's env read, CLAUDE.md)."""
    if remat is None:
        remat = os.environ.get("OGC_REMAT", "")
    remat = (remat or "").lower()
    if remat in ("", "off", "0", "none"):
        return None
    if remat not in ("full", "dots"):
        raise ValueError(
            f"remat must be one of off/full/dots, got {remat!r}"
        )
    return remat


def _remat_wrap(fn, mode: Optional[str]):
    """Wrap `fn` in jax.checkpoint per the resolved remat mode.

    Both policies additionally pin the neighbor/sampling indices
    (ops.core.NEIGHBOR_IDX_CHECKPOINT_NAME) as saved residuals: neighbor
    selection is discontinuous in the coordinates, so letting the backward
    recompute it under different fusion can flip a near-tie neighbor and
    silently route gradients through a different gather pattern than the
    primal forward (loss unchanged, gradients wrong).  Saving int32
    indices costs ~nothing next to the activations remat frees.
    """
    if mode is None:
        return fn
    from ogc_tpu.ops.core import NEIGHBOR_IDX_CHECKPOINT_NAME

    pin_idx = jax.checkpoint_policies.save_only_these_names(
        NEIGHBOR_IDX_CHECKPOINT_NAME
    )
    policy = (
        jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_saveable, pin_idx
        )
        if mode == "dots"
        else pin_idx
    )
    return jax.checkpoint(fn, policy=policy)


class SegTrainer:
    def __init__(
        self,
        model,
        params,
        loss_cfg: OGCLossConfig,
        optimizer: optax.GradientTransformation,
        aug_transform_epoch: int,
        ignore_npoint_thresh: int,
        exp_base: str,
        mesh=None,
        writer=None,
        frame_stride: int = 1,
        manual_spmd=None,
        remat: Optional[str] = None,
    ):
        """:param frame_stride: subsample the item's frame axis (Waymo items
        duplicate the single frame; the reference takes pcs[:, ::2],
        train_seg_waymo.py:58).
        :param manual_spmd: partition the train/eval steps via shard_map
        (manual SPMD) instead of GSPMD.  None (default) = automatic: manual
        whenever the mesh has more than one device — inside the manual
        region every array is the per-device local shard, so the Mosaic
        kernels lower on the mesh (GSPMD cannot auto-partition them and
        the dispatch gates would fall back to XLA paths).  Math identical:
        per-device local loss means + a pmean over gradients equal the
        global-batch mean (equal padded local sizes); the segnet has no
        cross-sample statistics (GroupNorm is per-sample).
        :param remat: rematerialization of the model forward under grad
        (`jax.checkpoint`): None/"off" stores the grouped SA/FP
        activations for the backward (XLA default), "full" saves nothing
        (backward recomputes the whole forward), "dots" saves matmul
        outputs only (`dots_saveable`).  The train step is HBM-bound at
        ~96% of the byte roofline (BENCHLOG r3 roofline) while MXU
        utilization is ~1%, so trading recompute FLOPs for saved-
        activation traffic is the remaining lever; the math is identical
        (same ops re-executed).  Defaults from $OGC_REMAT."""
        self.model = model
        self.loss_cfg = loss_cfg
        self.remat = _resolve_remat(remat)
        self.frame_stride = frame_stride
        self.optimizer = optimizer
        self.aug_transform_epoch = aug_transform_epoch
        self.ignore_npoint_thresh = ignore_npoint_thresh
        self.exp_base = exp_base
        os.makedirs(exp_base, exist_ok=True)
        self.checkpoint_name = osp.join(exp_base, "current")
        self.best_name = osp.join(exp_base, "best")

        self.mesh = mesh if mesh is not None else pmesh.make_mesh(jax.devices()[:1])
        self.params = pmesh.replicate(self.mesh, params)
        self.opt_state = pmesh.replicate(self.mesh, optimizer.init(params))
        self.writer = writer
        self.cur_epoch = 0

        if manual_spmd is None:
            manual_spmd = int(self.mesh.devices.size) > 1
        if manual_spmd:
            self._train_step = self._manual_train_step()
            self._eval_step = self._manual_eval_step()
        else:
            self._train_step = jax.jit(
                self._train_step_impl, static_argnames=("aug",)
            )
            self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    # Checkpointing: full train state (the reference saves model weights
    # only and cannot resume, SURVEY §5).
    # ------------------------------------------------------------------

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
        """Restore params + optimizer + epoch; returns the saved epoch."""
        state = load_train_state(path, jax.device_get(self._full_state(0)))
        self.params = pmesh.replicate(self.mesh, state["model_state"])
        self.opt_state = pmesh.replicate(self.mesh, state["opt_state"])
        return int(state["epoch"])

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------

    def _forward_masks(self, params, pcs, train=False):
        B, T, N, _ = pcs.shape
        flat = pcs.reshape(B * T, N, 3)

        def apply(p, x):
            return self.model.apply(p, x, x, train=train)

        if train:
            # Only the differentiated (train) forward benefits: remat
            # changes WHICH intermediates the backward reads from HBM
            # (recompute instead of store), never the math.
            apply = _remat_wrap(apply, self.remat)
        masks = apply(params, flat)
        return masks.reshape(B, T, N, -1)

    def _loss(self, params, pcs, flows, it_samples, step_w, aug,
              train=False):
        masks = self._forward_masks(params, pcs, train=train)
        T = pcs.shape[1]
        loss, ld = ogc_loss(
            [pcs[:, t] for t in range(T)],
            [masks[:, t] for t in range(T)],
            [flows[:, t] for t in range(T)],
            self.loss_cfg,
            step_w=step_w,
            it=it_samples,
            aug_transform=aug,
        )
        return loss, (ld, masks)

    def _train_step_impl(self, params, opt_state, pcs, flows, it_samples, aug):
        (loss, (ld, masks)), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(params, pcs, flows, it_samples, True, aug, True)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, ld, masks

    def _eval_step_impl(self, params, pcs, flows):
        loss, (ld, masks) = self._loss(params, pcs, flows, 0, False, False)
        return loss, ld, masks

    # ------------------------------------------------------------------
    # Manual-SPMD (shard_map) step variants: identical math to the GSPMD
    # impls above — the batch shards over pmesh.DATA_AXIS, each device
    # computes its local-batch loss, gradients/scalars pmean across the
    # axis (equal padded local sizes => exactly the global-batch mean).
    # What manual mode buys: Mosaic kernels lower inside shard_map while
    # GSPMD refuses to auto-partition them (ops.core.pallas_available).
    # check_vma=False: model fori_loops seed carries from constants, which
    # the varying-axes type check rejects.
    # ------------------------------------------------------------------

    def _manual_train_step(self):
        import functools

        axis = pmesh.DATA_AXIS

        def step(aug, params, opt_state, pcs, flows, it_samples):
            (_, (ld, masks)), grads = jax.value_and_grad(
                self._loss, has_aux=True
            )(params, pcs, flows, it_samples, True, aug, True)
            grads = jax.lax.pmean(grads, axis)
            ld = jax.lax.pmean(ld, axis)
            updates, opt_state = self.optimizer.update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            return params, opt_state, ld, masks

        cache = {}

        def run(params, opt_state, pcs, flows, it_samples, aug):
            if aug not in cache:
                cache[aug] = pmesh.manual_jit(
                    functools.partial(step, aug), self.mesh,
                    in_batch=(False, False, True, True, False),
                    out_batch=(False, False, False, True),
                )
            return cache[aug](params, opt_state, pcs, flows, it_samples)

        run.cache = cache  # exposes the per-aug jitted fns for HLO audits
        return run

    def _manual_eval_step(self):
        axis = pmesh.DATA_AXIS

        def step(params, pcs, flows):
            loss, (ld, masks) = self._loss(
                params, pcs, flows, 0, False, False
            )
            return (
                jax.lax.pmean(loss, axis), jax.lax.pmean(ld, axis), masks
            )

        return pmesh.manual_jit(
            step, self.mesh, in_batch=(False, True, True),
            out_batch=(False, False, True),
        )

    # ------------------------------------------------------------------
    # Host loop
    # ------------------------------------------------------------------

    def _shard(self, *arrays):
        return pmesh.shard_padded(self.mesh, arrays)

    def train_it(self, it: int, batch, aug_transform: bool = False):
        pcs, segms, flows, _ = batch
        if self.frame_stride > 1:
            pcs = pcs[:, :: self.frame_stride]
            segms = segms[:, :: self.frame_stride]
            flows = flows[:, :: self.frame_stride]
        (pcs_d, flows_d), b = self._shard(pcs, flows)
        # Sample counter for start_steps gating must be process-consistent
        # (same SPMD program on every host) and counts GLOBAL samples.
        b_glob = pmesh.global_batch_size(self.mesh, b)
        self.params, self.opt_state, ld, masks = self._train_step(
            self.params, self.opt_state, pcs_d, flows_d,
            jnp.int32(it * b_glob), aug=aug_transform,
        )
        ld = {k: float(v) for k, v in ld.items()}
        segm = segms[:, 0]
        mask = pmesh.local_values(masks, b)[:, 0]
        return ld, segm, mask

    def eval_epoch(self, loader) -> Tuple[float, Dict[str, float], Dict[str, list]]:
        meter = AverageMeter()
        total_loss, count = 0.0, 0.0
        ap = {"Pred_IoU": [], "Pred_Matched": [], "Confidence": [], "N_GT_Inst": []}
        for batch in loader:
            pcs, segms, flows, _ = batch
            if self.frame_stride > 1:
                pcs = pcs[:, :: self.frame_stride]
                segms = segms[:, :: self.frame_stride]
                flows = flows[:, :: self.frame_stride]
            (pcs_d, flows_d), b = self._shard(pcs, flows)
            loss, ld, masks = self._eval_step(self.params, pcs_d, flows_d)
            # Weight each batch's mean loss by its true size so the epoch
            # value is a per-sample average (was biased by a count=1 seed).
            total_loss += float(loss) * b
            count += b
            meter.append_loss({k: float(v) for k, v in ld.items()})

            iou, matched, _, n_gt = accumulate_eval_results(
                segms[:, 0], pmesh.local_values(masks, b)[:, 0],
                self.ignore_npoint_thresh,
            )
            ap["Pred_IoU"].append(iou)
            ap["Pred_Matched"].append(matched)
            ap["N_GT_Inst"].append(n_gt)
        return total_loss / max(count, 1.0), meter.get_mean_loss_dict(), ap

    def train(self, n_epochs, train_set, train_loader, test_loader=None,
              log_every: int = 1, progress: bool = True, start_epoch: int = 1):
        it = (start_epoch - 1) * len(train_loader)
        best_loss = 1e10
        aug_transform = False
        if start_epoch > self.aug_transform_epoch + 1:
            aug_transform = True
            train_set.aug_transform = True

        if start_epoch == 1:
            self.save(True, 0)

        for epoch in range(start_epoch, n_epochs + 1):
            self.cur_epoch = epoch
            train_meter = AverageMeter()
            running = RunningAverageMeter(alpha=0.3)

            # Phase in the augmented-view invariance loss
            # (reference train_seg.py:150-154).
            if epoch == self.aug_transform_epoch + 1:
                aug_transform = True
                train_set.aug_transform = True
                best_loss = 1e10

            ap = {"Pred_IoU": [], "Pred_Matched": [], "N_GT_Inst": []}
            for batch in train_loader:
                ld, segm, mask = self.train_it(it, batch, aug_transform)
                it += 1
                running.append_loss(ld)
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
                print(f"[epoch {epoch:3d}] train: {msg} | PQ@50={pq:.4f} F1@50={f1:.4f}")
            if self.writer is not None:
                for k, v in train_avg.items():
                    self.writer.add_scalar("epoch_sum_train/" + k, v, global_step=epoch)
                self.writer.add_scalar("epoch_sum_train/PQ@50", pq, global_step=epoch)
                self.writer.add_scalar("epoch_sum_train/F1@50", f1, global_step=epoch)
                self.writer.add_scalar("epoch_sum_train/Pre@50", pre, global_step=epoch)
                self.writer.add_scalar("epoch_sum_train/Rec@50", rec, global_step=epoch)

            if test_loader is not None:
                val_loss, val_avg, val_ap = self.eval_epoch(test_loader)
                pq, f1, pre, rec = calculate_PQ_F1(
                    np.concatenate(val_ap["Pred_IoU"]) if val_ap["Pred_IoU"] else np.zeros(0),
                    np.concatenate(val_ap["Pred_Matched"]) if val_ap["Pred_Matched"] else np.zeros(0),
                    int(np.sum(val_ap["N_GT_Inst"])),
                )
                if progress:
                    print(
                        f"[epoch {epoch:3d}]   val: loss={val_loss:.4f} "
                        f"PQ@50={pq:.4f} F1@50={f1:.4f} Pre@50={pre:.4f} Rec@50={rec:.4f}"
                    )
                if self.writer is not None:
                    for k, v in val_avg.items():
                        self.writer.add_scalar("epoch_sum_val/" + k, v, global_step=epoch)
                    self.writer.add_scalar("epoch_sum_val/PQ@50", pq, global_step=epoch)
                    self.writer.add_scalar("epoch_sum_val/F1@50", f1, global_step=epoch)
                    self.writer.add_scalar("epoch_sum_val/Pre@50", pre, global_step=epoch)
                    self.writer.add_scalar("epoch_sum_val/Rec@50", rec, global_step=epoch)

                is_best = val_loss < best_loss
                best_loss = min(best_loss, val_loss)
                self.save(is_best, epoch)
        # Surface an ENOSPC-style failure of the FINAL async write before
        # returning — nothing else would ever check it (ADVICE r1).
        wait_pending_saves()
        return best_loss
