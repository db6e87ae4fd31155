"""Self-supervised scene-flow trainer.

TPU-native counterpart of the reference train_flow.py Trainer
(train_flow.py:33-189): fused jitted step over the full recurrent unroll,
BatchNorm running stats as jit-carried state with scheduled momentum, per-
iteration EPE monitoring, best-checkpoint selection on val loss.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ogc_tpu.losses.flow_unsup import FlowLossConfig, flowstep3d_loss
from ogc_tpu.parallel import mesh as pmesh
from ogc_tpu.utils.checkpoint import load_train_state, save_checkpoint
from ogc_tpu.utils.meters import AverageMeter, RunningAverageMeter


def make_bn_schedule(bn_momentum, bn_decay, decay_step, batch_size):
    """Reference bn_curve (train_flow.py:199-207): torch momentum decayed by
    bn_decay every decay_step samples, floored at 1e-2."""

    def schedule(it):
        if decay_step == -1:
            return bn_momentum
        exp = np.floor(it * batch_size / decay_step)
        return max(bn_momentum * (bn_decay**exp), 1e-2)

    return schedule


class FlowTrainer:
    def __init__(
        self,
        model,
        variables,
        model_iters: int,
        loss_cfg: FlowLossConfig,
        optimizer: optax.GradientTransformation,
        exp_base: str,
        bn_schedule=None,
        mesh=None,
        writer=None,
        manual_spmd=None,
        remat=None,
        bn_sync: str = "local",
    ):
        """:param manual_spmd: partition the train/eval steps via shard_map
        instead of GSPMD — None (default) = automatic: manual whenever the
        mesh has >1 device, keeping the Mosaic kernels on multi-chip (see
        SegTrainer).  BatchNorm batch statistics pmean across the mesh
        inside the manual region (SchedulableBatchNorm), matching GSPMD's
        global-batch statistics exactly.
        :param remat: whole-model-forward rematerialization under grad —
        off/full/dots, default from $OGC_REMAT (see SegTrainer).  For
        per-GRU-iteration remat use the model's `remat_refine` flag
        instead (scan-body nn.remat).
        :param bn_sync: BatchNorm batch-statistic handling in the manual-
        SPMD region.  "local" (default): per-device batch stats normalize
        (torch-DataParallel replica semantics — the reference never syncs
        BN stats across GPUs) and the running-stat pytree is synced by ONE
        fused all-reduce per step, instead of 2 latency-bound collectives
        per BatchNorm application (~200/step through the recurrent unroll
        at production iters, MULTICHIP r3 audit).  "global": in-layer
        two-pass pmeans reproducing GSPMD's global-batch statistics
        exactly (the r2/r3 behavior; pinned against GSPMD in
        tests/test_sharding.py).  Single-device meshes are identical
        either way."""
        from ogc_tpu.train.seg import _remat_wrap, _resolve_remat

        assert bn_sync in ("local", "global"), bn_sync
        self.bn_sync = bn_sync
        self.model = model
        self.remat = _resolve_remat(remat)
        self._remat_wrap = _remat_wrap
        self.model_iters = model_iters
        self.loss_cfg = loss_cfg
        self.optimizer = optimizer
        self.bn_schedule = bn_schedule or (lambda it: 0.9)
        self.exp_base = exp_base
        os.makedirs(exp_base, exist_ok=True)
        self.checkpoint_name = osp.join(exp_base, "current")
        self.best_name = osp.join(exp_base, "best")
        self.writer = writer

        self.mesh = mesh if mesh is not None else pmesh.make_mesh(jax.devices()[:1])
        self.params = pmesh.replicate(self.mesh, variables["params"])
        self.batch_stats = pmesh.replicate(self.mesh, variables["batch_stats"])
        self.opt_state = pmesh.replicate(
            self.mesh, optimizer.init(variables["params"])
        )

        if manual_spmd is None:
            manual_spmd = int(self.mesh.devices.size) > 1
        if manual_spmd:
            axis = pmesh.DATA_AXIS

            def train_step(params, batch_stats, opt_state, pc1, pc2,
                           gt_flow, bnm):
                from ogc_tpu.ops.core import bn_local_stats

                with bn_local_stats(self.bn_sync == "local"):
                    params, new_stats, opt_state, ld = self._train_step_impl(
                        params, batch_stats, opt_state, pc1, pc2, gt_flow,
                        bnm, pmean_grads=True,
                    )
                if self.bn_sync == "local":
                    # The per-layer running-stat updates are LINEAR in the
                    # local batch moments, so pmean-ing the updated pytree
                    # equals updating with the pmean'd moments.  One pytree
                    # pmean lowers to a single tuple-operand all-reduce.
                    new_stats = jax.lax.pmean(new_stats, axis)
                # else: stats already pmean'd in-layer.  Grads pmean'd in
                # impl either way.
                ld = jax.lax.pmean(ld, axis)
                return params, new_stats, opt_state, ld

            self._train_step = pmesh.manual_jit(
                train_step, self.mesh,
                in_batch=(False, False, False, True, True, True, False),
                out_batch=(False, False, False, False),
            )

            def eval_step(params, batch_stats, pc1, pc2, gt_flow):
                loss, ld = self._eval_step_impl(
                    params, batch_stats, pc1, pc2, gt_flow
                )
                return (
                    jax.lax.pmean(loss, axis), jax.lax.pmean(ld, axis)
                )

            self._eval_step = pmesh.manual_jit(
                eval_step, self.mesh,
                in_batch=(False, False, True, True, True),
                out_batch=(False, False),
            )
        else:
            self._train_step = jax.jit(self._train_step_impl)
            self._eval_step = jax.jit(self._eval_step_impl)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def _full_state(self, epoch: int):
        return {
            "model_state": self.variables,
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
        self.params = pmesh.replicate(self.mesh, state["model_state"]["params"])
        self.batch_stats = pmesh.replicate(
            self.mesh, state["model_state"]["batch_stats"]
        )
        self.opt_state = pmesh.replicate(self.mesh, state["opt_state"])
        return int(state["epoch"])

    # ------------------------------------------------------------------

    def _train_step_impl(self, params, batch_stats, opt_state, pc1, pc2,
                         gt_flow, bnm, pmean_grads=False):
        def apply(p):
            return self.model.apply(
                {"params": p, "batch_stats": batch_stats},
                pc1, pc2, pc1, pc2, self.model_iters,
                train=True, bn_momentum=bnm, mutable=["batch_stats"],
            )

        # Whole-forward remat (no-op when self.remat is None).  The aux
        # batch_stats output rides through jax.checkpoint unchanged.
        apply = self._remat_wrap(apply, self.remat)

        def loss_fn(p):
            flow_preds, new_vars = apply(p)
            loss, ld = flowstep3d_loss(pc1, pc2, flow_preds, self.loss_cfg)
            return loss, (ld, flow_preds, new_vars["batch_stats"])

        (loss, (ld, flow_preds, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        if pmean_grads:  # manual-SPMD region: local grads -> global mean
            grads = jax.lax.pmean(grads, pmesh.DATA_AXIS)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # EPE monitoring per iteration (reference epe_metric,
        # train_flow.py:18-30).
        for i, fp in enumerate(flow_preds):
            ld[f"epe3d_#{i}"] = jnp.mean(
                jnp.linalg.norm(fp - gt_flow, axis=-1)
            )
        return params, new_stats, opt_state, ld

    def _eval_step_impl(self, params, batch_stats, pc1, pc2, gt_flow):
        flow_preds = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            pc1, pc2, pc1, pc2, self.model_iters, train=False,
        )
        loss, ld = flowstep3d_loss(pc1, pc2, flow_preds, self.loss_cfg)
        for i, fp in enumerate(flow_preds):
            ld[f"epe3d_#{i}"] = jnp.mean(jnp.linalg.norm(fp - gt_flow, axis=-1))
        return loss, ld

    # ------------------------------------------------------------------

    def _shard(self, *arrays):
        return pmesh.shard_padded(self.mesh, arrays)

    def train_it(self, it: int, batch) -> Dict[str, float]:
        pcs, _, flows, _ = batch
        pc1, pc2 = pcs[:, 0], pcs[:, 1]
        gt_flow = flows[:, 0]
        (pc1, pc2, gt_flow), _ = self._shard(pc1, pc2, gt_flow)
        bnm = jnp.float32(self.bn_schedule(it))
        self.params, self.batch_stats, self.opt_state, ld = self._train_step(
            self.params, self.batch_stats, self.opt_state, pc1, pc2, gt_flow, bnm
        )
        return {k: float(v) for k, v in ld.items()}

    def eval_epoch(self, loader) -> Tuple[float, Dict[str, float]]:
        meter = AverageMeter()
        total_loss, count = 0.0, 0.0
        for batch in loader:
            pcs, _, flows, _ = batch
            pc1, pc2 = pcs[:, 0], pcs[:, 1]
            gt_flow = flows[:, 0]
            (pc1, pc2, gt_flow), b = self._shard(pc1, pc2, gt_flow)
            loss, ld = self._eval_step(
                self.params, self.batch_stats, pc1, pc2, gt_flow
            )
            total_loss += float(loss) * b
            count += b
            meter.append_loss({k: float(v) for k, v in ld.items()})
        return total_loss / max(count, 1.0), meter.get_mean_loss_dict()

    def train(self, n_epochs, train_loader, val_loader=None, progress=True,
              start_epoch: int = 1):
        # Resume semantics mirror SegTrainer.train: the it counter (drives
        # the BN-momentum schedule) continues from the restored epoch.
        it = (start_epoch - 1) * len(train_loader)
        best_loss = 1e10
        if start_epoch == 1:
            self.save(True, 0)
        for epoch in range(start_epoch, n_epochs + 1):
            train_meter = AverageMeter()
            running = RunningAverageMeter(alpha=0.3)
            for batch in train_loader:
                ld = self.train_it(it, batch)
                it += 1
                running.append_loss(ld)
                train_meter.append_loss(ld)
                if self.writer is not None:
                    for k, v in ld.items():
                        self.writer.add_scalar("train/" + k, v, global_step=it)

            train_avg = train_meter.get_mean_loss_dict()
            if progress:
                msg = ", ".join(f"{k}={v:.4f}" for k, v in train_avg.items())
                print(f"[epoch {epoch:3d}] train: {msg}")
            if self.writer is not None:
                for k, v in train_avg.items():
                    self.writer.add_scalar(
                        "epoch_sum_train/" + k, v, global_step=epoch
                    )

            if val_loader is not None:
                val_loss, val_avg = self.eval_epoch(val_loader)
                if progress:
                    msg = ", ".join(f"{k}={v:.4f}" for k, v in val_avg.items())
                    print(f"[epoch {epoch:3d}]   val: loss={val_loss:.4f} {msg}")
                if self.writer is not None:
                    for k, v in val_avg.items():
                        self.writer.add_scalar(
                            "epoch_sum_val/" + k, v, global_step=epoch
                        )
                is_best = val_loss < best_loss
                best_loss = min(best_loss, val_loss)
                self.save(is_best, epoch)
        # Surface an ENOSPC-style failure of the FINAL async write before
        # returning — nothing else would ever check it (ADVICE r1).
        from ogc_tpu.utils.checkpoint import wait_pending_saves

        wait_pending_saves()
        return best_loss
