"""FlowStep3D: recurrent scene-flow network.

One config-parameterized implementation covering the reference's three
per-dataset copies (models/flownet_sapien.py, flownet_ogcdr.py,
flownet_kitti.py).  Pipeline (flownet_kitti.py:209-252):

  local encoders on both clouds -> global encoders -> all-pairs kernelized
  softmax correlation (learnable epsilon, 10 m support) -> flow0 at 1/4
  resolution -> upsample; then iters-1 GRU refinement steps: re-encode the
  warped cloud (reusing frame-1 FPS indices), local FlowEmbedding
  correlation, GRU update, delta-flow regression with k_decay damping,
  upsample and accumulate.  Gradients are stopped between iterations
  (:229-233).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ogc_tpu.nn.flowstep3d import FlowEmbedding, FlowFPModule, FlowSAModule


@dataclasses.dataclass(frozen=True)
class SASpec:
    npoint_div: int
    nsample: int
    mlp: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class FlowNetArch:
    """Per-dataset hyperparameters (diffs of models/flownet_*.py)."""

    enc_loc: Tuple[SASpec, ...]
    enc_glob: Tuple[SASpec, ...]
    # Global corr decoder: alternating FP-upsample and SA stages walking the
    # glob pyramid back to the 1/4-resolution level.
    corr_sa: Tuple[SASpec, ...]
    corr_dim: int  # output channels of the corr feature chain
    reg_nsample: int
    reg_mlp: Tuple[int, ...]
    hidden_dim: int
    local_corr_mlp: Tuple[int, ...]
    flow_conv1: SASpec
    flow_conv2: SASpec
    h0_mlp1: Tuple[int, ...]


ARCHS = {
    # models/flownet_sapien.py (npoint=512)
    "sapien": FlowNetArch(
        enc_loc=(SASpec(2, 16, (32, 32, 32)), SASpec(4, 16, (64, 64, 64))),
        enc_glob=(SASpec(8, 16, (128, 128, 128)), SASpec(16, 8, (256, 256, 256))),
        corr_sa=(SASpec(8, 8, (32, 64, 128)),),
        corr_dim=128,
        reg_nsample=16,
        reg_mlp=(128, 128, 128),
        hidden_dim=128,
        local_corr_mlp=(128, 128, 128),
        flow_conv1=SASpec(4, 8, (32, 32, 32)),
        flow_conv2=SASpec(4, 4, (16, 16, 16)),
        h0_mlp1=(128, 128, 128),
    ),
    # models/flownet_ogcdr.py (npoint=2048)
    "ogcdr": FlowNetArch(
        enc_loc=(SASpec(2, 16, (32, 32, 32)), SASpec(4, 16, (64, 64, 64))),
        enc_glob=(SASpec(8, 16, (128, 128, 128)), SASpec(16, 8, (128, 128, 128))),
        corr_sa=(SASpec(8, 8, (32, 64, 64)),),
        corr_dim=64,
        reg_nsample=16,
        reg_mlp=(64, 64, 64),
        hidden_dim=64,
        local_corr_mlp=(64, 64, 64),
        flow_conv1=SASpec(4, 8, (32, 32, 32)),
        flow_conv2=SASpec(4, 4, (16, 16, 16)),
        h0_mlp1=(64, 64, 64),
    ),
    # models/flownet_kitti.py (npoint=8192): 3-level global encoder and a
    # deeper corr decoder.
    "kitti": FlowNetArch(
        enc_loc=(SASpec(2, 32, (32, 32, 32)), SASpec(4, 32, (64, 64, 64))),
        enc_glob=(
            SASpec(8, 32, (128, 128, 128)),
            SASpec(16, 24, (128, 128, 128)),
            SASpec(32, 16, (256, 256, 256)),
        ),
        corr_sa=(SASpec(16, 16, (32, 32, 64)), SASpec(8, 16, (64, 64, 128))),
        corr_dim=128,
        reg_nsample=32,
        reg_mlp=(128, 128, 128),
        hidden_dim=128,
        local_corr_mlp=(128, 128, 128),
        flow_conv1=SASpec(4, 16, (32, 32, 32)),
        flow_conv2=SASpec(4, 8, (16, 16, 16)),
        h0_mlp1=(128, 128, 128),
    ),
}
# ogcdrsv shares the ogcdr flownet; waymo uses the kitti flownet.
ARCHS["ogcdrsv"] = ARCHS["ogcdr"]
ARCHS["waymo"] = ARCHS["kitti"]
ARCHS["kittisf"] = ARCHS["kitti"]

# H0Net second stage is a single conv (no act): mlp=[hidden_dim]
# (flownet_*.py H0Net).


class FlowStep3D(nn.Module):
    npoint: int = 512
    arch: str = "sapien"
    use_instance_norm: bool = False
    loc_flow_nn: int = 8
    loc_flow_rad: float = 0.1
    k_decay_fact: float = 1.0
    # Force the Python-unrolled refinement loop instead of nn.scan (debug /
    # equivalence testing; the scanned path is the default — same math, one
    # compiled step body).
    unroll_refine: bool = False
    # Rematerialize each scanned GRU refinement iteration in the backward
    # (nn.remat around the scan body): the bwd recomputes an iteration's
    # intra-body activations from its carry instead of loading per-iteration
    # saved residuals from HBM.  Identical math (same ops re-executed);
    # training-only effect (eval has no backward).  prevent_cse=False is
    # safe under nn.scan (the scan boundary already prevents the CSE the
    # default guards against).
    remat_refine: bool = False

    def _arch(self) -> FlowNetArch:
        return ARCHS[self.arch] if isinstance(self.arch, str) else self.arch

    def setup(self):
        a = self._arch()
        npoint = self.npoint
        inorm = self.use_instance_norm

        self.encoder_loc = [
            FlowSAModule(
                npoint=npoint // s.npoint_div, nsample=s.nsample, mlp=s.mlp,
                use_instance_norm=inorm, name=f"enc_loc_sa{i+1}",
            )
            for i, s in enumerate(a.enc_loc)
        ]
        self.encoder_glob = [
            FlowSAModule(
                npoint=npoint // s.npoint_div, nsample=s.nsample, mlp=s.mlp,
                use_instance_norm=inorm, name=f"enc_glob_sa{i+1}",
            )
            for i, s in enumerate(a.enc_glob)
        ]
        # Global correlation decoder (GlobalCorrLayer).
        self.epsilon = self.param(
            "epsilon", nn.initializers.zeros, (1,)
        )
        self.corr_fps = [
            FlowFPModule(name=f"corr_fp{i}") for i in range(len(a.corr_sa) + 1)
        ]
        self.corr_sas = [
            FlowSAModule(
                npoint=npoint // s.npoint_div, nsample=s.nsample, mlp=s.mlp,
                use_instance_norm=inorm, name=f"corr_sa{i+1}",
            )
            for i, s in enumerate(a.corr_sa)
        ]
        # H0Net
        self.h0_sa1 = FlowSAModule(
            npoint=npoint // 4, nsample=4, mlp=a.h0_mlp1,
            use_instance_norm=inorm, name="h0_sa1",
        )
        self.h0_sa2 = FlowSAModule(
            npoint=npoint // 4, nsample=4, mlp=(a.hidden_dim,),
            use_act=False, use_instance_norm=inorm, name="h0_sa2",
        )
        # Flow0 / Flow regressors.
        self.flow0_sa = FlowSAModule(
            npoint=npoint // 4, nsample=a.reg_nsample, mlp=a.reg_mlp,
            use_instance_norm=inorm, name="flow0_sa1",
        )
        self.flow0_fc = nn.Dense(3, name="flow0_fc")
        self.flow_sa1 = FlowSAModule(
            npoint=npoint // 4, nsample=a.reg_nsample, mlp=a.reg_mlp,
            use_instance_norm=inorm, name="flow_sa1",
        )
        self.flow_sa2 = FlowSAModule(
            npoint=npoint // 4, nsample=a.reg_nsample, mlp=a.reg_mlp,
            use_instance_norm=inorm, name="flow_sa2",
        )
        self.flow_fc = nn.Dense(3, name="flow_fc")
        # Local correlation + GRU.
        self.local_corr_layer = FlowEmbedding(
            radius=self.loc_flow_rad, nsample=self.loc_flow_nn,
            mlp=a.local_corr_mlp, use_instance_norm=inorm, name="local_corr",
        )
        self.gru_convz = FlowSAModule(
            npoint=npoint // 4, nsample=4, mlp=(a.hidden_dim,), use_act=False,
            use_instance_norm=inorm, name="gru_convz",
        )
        self.gru_convr = FlowSAModule(
            npoint=npoint // 4, nsample=4, mlp=(a.hidden_dim,), use_act=False,
            use_instance_norm=inorm, name="gru_convr",
        )
        self.gru_convq = FlowSAModule(
            npoint=npoint // 4, nsample=4, mlp=(a.hidden_dim,), use_act=False,
            use_instance_norm=inorm, name="gru_convq",
        )
        self.flow_conv1 = FlowSAModule(
            npoint=npoint // a.flow_conv1.npoint_div,
            nsample=a.flow_conv1.nsample, mlp=a.flow_conv1.mlp,
            use_instance_norm=inorm, name="flow_conv1",
        )
        self.flow_conv2 = FlowSAModule(
            npoint=npoint // a.flow_conv2.npoint_div,
            nsample=a.flow_conv2.nsample, mlp=a.flow_conv2.mlp,
            use_instance_norm=inorm, name="flow_conv2",
        )
        self.flow_up_sample = FlowFPModule(name="flow_up_sample")

    # ------------------------------------------------------------------

    def _encode_loc(self, pc, feature, fps_idx=None, train=True, bnm=0.1,
                    knn_idx=None, return_knn=False):
        """EncoderLoc (flownet_*.py EncoderLoc.forward): two SA levels with
        reusable FPS indices; returns ([pc, pc_l1, pc_l2], feats, fps_idxs
        [, knn tables]).

        Level 2's FPS reuses level 1's ordering (fps_nested — greedy FPS is
        incremental, so a cloud already in selection order samples to its
        prefix); approximate-neighbor mode only, exact mode keeps the
        per-level reference FPS.  `knn_idx` freezes the per-level self-KNN
        graphs (refinement-loop reuse, see __call__)."""
        from ogc_tpu import ops as _ops

        nested = not _ops.exact_neighbors()
        f1 = fps_idx[0] if fps_idx is not None else None
        pc_l1, feat_l1, f1, k1 = self.encoder_loc[0](
            pc, feature, fps_idx=f1, train=train, bn_momentum=bnm,
            knn_idx=knn_idx[0] if knn_idx is not None else None,
            return_knn=True,
        )
        f2 = fps_idx[1] if fps_idx is not None else None
        pc_l2, feat_l2, f2, k2 = self.encoder_loc[1](
            pc_l1, feat_l1, fps_idx=f2, train=train, bn_momentum=bnm,
            fps_nested=nested,
            knn_idx=knn_idx[1] if knn_idx is not None else None,
            return_knn=True,
        )
        out = [pc, pc_l1, pc_l2], feat_l2, [f1, f2]
        return out + ([k1, k2],) if return_knn else out

    def _encode_glob(self, pc, feature, train=True, bnm=0.1):
        from ogc_tpu import ops as _ops

        # The input cloud is an FPS stage's output (already in selection
        # order), and each level's output keeps that order — every glob FPS
        # nests (approx mode; see _encode_loc).
        nested = not _ops.exact_neighbors()
        pc_l, feats = [pc], feature
        for sa in self.encoder_glob:
            new_pc, feats, _ = sa(pc_l[-1], feats, train=train,
                                  bn_momentum=bnm, fps_nested=nested)
            pc_l.append(new_pc)
        return pc_l, feats

    def _calc_corr_mat(self, pc1, pc2, f1, f2):
        """Kernelized softmax correlation (flownet_kitti.py:53-65):
        exp(-(1 - cos(f1, f2)) / eps) masked to a 10 m support."""
        eps = jnp.exp(self.epsilon) + 0.03
        d2 = (
            jnp.sum(pc1**2, -1, keepdims=True)
            + jnp.swapaxes(jnp.sum(pc2**2, -1, keepdims=True), 1, 2)
            - 2.0
            * jnp.einsum(
                "bnd,bmd->bnm", pc1, pc2, precision=jax.lax.Precision.HIGHEST
            )
        )
        support = (d2 < 10.0**2).astype(f1.dtype)
        f1 = f1 * jax.lax.rsqrt(jnp.sum(f1**2, -1, keepdims=True) + 1e-8)
        f2 = f2 * jax.lax.rsqrt(jnp.sum(f2**2, -1, keepdims=True) + 1e-8)
        C = 1.0 - jnp.einsum(
            "bnd,bmd->bnm", f1, f2, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.exp(-C / eps) * support

    def _global_corr(self, pc1_l_glob, pc2_l_glob, f1g, f2g, train, bnm):
        """GlobalCorrLayer.forward: soft-argmax flow at the coarsest level,
        then FP/SA chain back to the 1/4-resolution level."""
        p1, p2 = pc1_l_glob[-1], pc2_l_glob[-1]
        corr = self._calc_corr_mat(p1, p2, f1g, f2g)
        row_sum = jnp.sum(corr, -1, keepdims=True)
        flow0 = (
            jnp.einsum(
                "bnm,bmd->bnd", corr, p2, precision=jax.lax.Precision.HIGHEST
            )
            / (row_sum + 1e-8)
            - p1
        )

        # Walk back up: fp0 -> sa1 [-> fp1 -> sa2 ...] -> final fp.
        feats = flow0
        level = len(pc1_l_glob) - 1
        for i, sa in enumerate(self.corr_sas):
            feats = self.corr_fps[i](
                pc1_l_glob[level - 1], pc1_l_glob[level], None, feats,
                train=train, bn_momentum=bnm,
            )
            _, feats, _ = sa(
                pc1_l_glob[level - 1], feats, train=train, bn_momentum=bnm
            )
            level -= 1
        feats = self.corr_fps[-1](
            pc1_l_glob[level - 1], pc1_l_glob[level], None, feats,
            train=train, bn_momentum=bnm,
        )
        return feats

    def _gru(self, h, x, pc, train, bnm, group_idx=None):
        from ogc_tpu.nn.layers import compute_dtype

        hx = jnp.concatenate([h, x], axis=-1)
        # convz and convr group the IDENTICAL (pc, hx) with the same
        # indices: share one raw gather between them (bf16 TRAIN split path;
        # in eval the gates take the source-projected fold path instead —
        # each gathers its own narrow projected rows, no wide shared gather).
        split = None
        if group_idx is not None and compute_dtype() == jnp.bfloat16 and train:
            from ogc_tpu.nn.layers import raw_split_inputs

            # The split is keyed on convz's neighborhood but consumed by
            # convr too — sharing is only sound while both pool over the
            # same nsample (true for all ARCHS; guard future divergence).
            assert self.gru_convz.nsample == self.gru_convr.nsample, (
                "GRU convz/convr nsample mismatch: shared raw-gather split "
                "would silently pool over the wrong neighborhood"
            )
            k = self.gru_convz.nsample
            split = raw_split_inputs(pc, pc, hx, group_idx[..., :k])
        z = jax.nn.sigmoid(
            self.gru_convz(pc, hx, train=train, bn_momentum=bnm,
                           group_idx=group_idx, precomputed_split=split)[1]
        )
        r = jax.nn.sigmoid(
            self.gru_convr(pc, hx, train=train, bn_momentum=bnm,
                           group_idx=group_idx, precomputed_split=split)[1]
        )
        q = jnp.tanh(
            self.gru_convq(
                pc, jnp.concatenate([r * h, x], axis=-1),
                train=train, bn_momentum=bnm, group_idx=group_idx,
            )[1]
        )
        return (1 - z) * h + z * q

    def __call__(self, pc1, pc2, feature1, feature2, iters: int = 1,
                 train: bool = True, bn_momentum=0.1) -> List[jax.Array]:
        """
        :param pc1, pc2: (B, N, 3); :param feature1, feature2: (B, N, 3).
        :return: list of per-iteration flow predictions [(B, N, 3)].
        """
        bnm = bn_momentum
        flow_predictions = []

        from ogc_tpu import ops as _ops

        # Freeze the warped cloud's SELF-KNN graphs across refinement
        # iterations (eval + approximate-neighbor mode): the per-iteration
        # warp is near-rigid per object, so self-neighborhoods barely change,
        # and the prefix's tables serve every iteration.  The cross-cloud
        # correlation KNN (FlowEmbedding, pc1_new vs pc2) stays live — that
        # matching IS the algorithm.  Exact mode recomputes per iteration
        # (reference semantics, flownet_kitti.py:231-250).
        freeze_knn = (not train) and (not _ops.exact_neighbors())
        knn1 = None
        if train:
            # Separate passes: BatchNorm batch statistics and running-stat
            # updates must see each cloud on its own (reference order).
            pc1_l_loc, feats1_loc, fps_idx1 = self._encode_loc(
                pc1, feature1, train=train, bnm=bnm
            )
            pc2_l_loc, feats2_loc, _ = self._encode_loc(
                pc2, feature2, train=train, bnm=bnm
            )
            pc1_l_glob, f1g = self._encode_glob(
                pc1_l_loc[-1], feats1_loc, train=train, bnm=bnm
            )
            pc2_l_glob, f2g = self._encode_glob(
                pc2_l_loc[-1], feats2_loc, train=train, bnm=bnm
            )
        else:
            # Eval: norms use running stats, so encoding both clouds in ONE
            # 2B batch is numerically identical to two passes — and the
            # doubled batch fills the KNN/gather/MLP tiles better.
            B = pc1.shape[0]
            pc12 = jnp.concatenate([pc1, pc2], axis=0)
            f12 = jnp.concatenate([feature1, feature2], axis=0)
            pc12_l, feats12, fps_idx12, knn12 = self._encode_loc(
                pc12, f12, train=train, bnm=bnm, return_knn=True
            )
            pc1_l_loc = [p[:B] for p in pc12_l]
            pc2_l_loc = [p[B:] for p in pc12_l]
            feats1_loc, feats2_loc = feats12[:B], feats12[B:]
            fps_idx1 = [f[:B] for f in fps_idx12]
            if freeze_knn:
                knn1 = [k[:B] for k in knn12]

            pc12_g, f12g = self._encode_glob(
                pc12_l[-1], feats12, train=train, bnm=bnm
            )
            pc1_l_glob = [p[:B] for p in pc12_g]
            pc2_l_glob = [p[B:] for p in pc12_g]
            f1g, f2g = f12g[:B], f12g[B:]
        corr_feats = self._global_corr(
            pc1_l_glob, pc2_l_glob, f1g, f2g, train, bnm
        )

        # One shared KNN table of the fixed 1/4-resolution cloud against
        # itself: the regressors, H0Net, GRU gates, and flow convs all group
        # this same cloud (with nsamples that are prefixes of the sorted
        # neighbor list) — the reference recomputes the identical KNN dozens
        # of times per forward.
        a = self._arch()
        lr_k = max(a.reg_nsample, a.flow_conv1.nsample, a.flow_conv2.nsample, 4)
        from ogc_tpu import ops as _ops

        _, lr_idx = _ops.knn(lr_k, pc1_l_loc[2], pc1_l_loc[2])

        _, x0, _ = self.flow0_sa(
            pc1_l_loc[2], corr_feats, train=train, bn_momentum=bnm,
            group_idx=lr_idx,
        )
        flow0_lr = self.flow0_fc(x0)

        # The upsample stencil (full cloud <- 1/4-res cloud) is fixed across
        # all refinement iterations — compute it once.
        up_cache = FlowFPModule.weights(pc1_l_loc[0], pc1_l_loc[2])
        flow0 = self.flow_up_sample(
            pc1_l_loc[0], pc1_l_loc[2], None, flow0_lr, train=train,
            bn_momentum=bnm, cached=up_cache,
        )
        flow_predictions.append(flow0)

        _, h, _ = self.h0_sa1(
            pc1_l_loc[-1], feats1_loc, train=train, bn_momentum=bnm,
            group_idx=lr_idx,
        )
        _, h, _ = self.h0_sa2(pc1_l_loc[-1], h, train=train, bn_momentum=bnm,
                              group_idx=lr_idx)
        h = jnp.tanh(h)

        sg = jax.lax.stop_gradient
        pc1_new = pc1 + sg(flow0)
        pc1_new_lr = pc1_l_loc[2] + sg(flow0_lr)
        if iters <= 1:
            return flow_predictions

        def refine_step(mdl, carry, consts, it):
            """One GRU refinement iteration (reference loop body,
            flownet_kitti.py:231-250).  `it` is the traced step index used
            only for the k_decay damping scalar."""
            h, pc1_new, pc1_new_lr = carry
            (pc1, pc1_lr, pc2_lr, feats2_loc, lr_idx, up_idx, up_w,
             bnm, knn1) = consts
            pc1_new = sg(pc1_new)
            pc1_new_lr = sg(pc1_new_lr)
            flow_lr = pc1_new_lr - pc1_lr

            pc1_new_l_loc, feats1_loc_new, _ = mdl._encode_loc(
                pc1_new, pc1_new, fps_idx1, train=train, bnm=bnm,
                knn_idx=knn1,
            )
            _, corr_feats = mdl.local_corr_layer(
                pc1_new_l_loc[-1], pc2_lr, feats1_loc_new, feats2_loc,
                train=train, bn_momentum=bnm,
            )

            # x = [feats1_new, corr, flow_feats, flow]
            _, flow_feats, _ = mdl.flow_conv1(
                pc1_lr, flow_lr, train=train, bn_momentum=bnm,
                group_idx=lr_idx,
            )
            _, flow_feats, _ = mdl.flow_conv2(
                pc1_lr, flow_feats, train=train, bn_momentum=bnm,
                group_idx=lr_idx,
            )
            x = jnp.concatenate(
                [feats1_loc_new, corr_feats, flow_feats, flow_lr], axis=-1
            )
            h = mdl._gru(h, x, pc1_lr, train, bnm, group_idx=lr_idx)

            _, dx, _ = mdl.flow_sa1(
                pc1_lr, h, train=train, bn_momentum=bnm, group_idx=lr_idx,
            )
            _, dx, _ = mdl.flow_sa2(
                pc1_lr, dx, train=train, bn_momentum=bnm, group_idx=lr_idx,
            )
            delta_flow_lr = mdl.flow_fc(dx) / (
                mdl.k_decay_fact * it.astype(jnp.float32) + 1.0
            )
            pc1_new_lr = pc1_new_lr + delta_flow_lr

            delta_flow = mdl.flow_up_sample(
                pc1, pc1_lr, None, delta_flow_lr,
                train=train, bn_momentum=bnm, cached=(up_idx, up_w),
            )
            pc1_new = pc1_new + delta_flow
            return (h, pc1_new, pc1_new_lr), pc1_new - pc1

        consts = (
            pc1, pc1_l_loc[2], pc2_l_loc[-1], feats2_loc, lr_idx,
            up_cache[0], up_cache[1], jnp.asarray(bnm, jnp.float32), knn1,
        )
        if self.is_initializing() or self.unroll_refine:
            # Unrolled during init: the scan's carried batch_stats don't
            # exist yet on the first pass; a direct call creates all
            # step-body variables under the same scopes the scan broadcasts.
            carry = (h, pc1_new, pc1_new_lr)
            for i in range(iters - 1):
                carry, flow = refine_step(
                    self, carry, consts, jnp.int32(i)
                )
                flow_predictions.append(flow)
            return flow_predictions

        # Scanned rather than unrolled: XLA compiles the step body ONCE
        # (the 5-iteration unroll dominated whole-model compile time), with
        # identical per-step math.  Params are broadcast (weights shared
        # across iterations, like the reference's single modules); BatchNorm
        # running stats are carried sequentially, matching the unrolled
        # update order.
        # In train mode BatchNorm running stats are written every iteration:
        # carry them sequentially (matching the unrolled update order).  In
        # eval they are read-only -> broadcast (a carry that is never written
        # would leave the output carry empty and break the scan contract).
        body = refine_step
        if self.remat_refine:
            from ogc_tpu.ops.core import NEIGHBOR_IDX_CHECKPOINT_NAME

            # Pin the iteration's neighbor indices as saved residuals:
            # neighbor selection is discontinuous, and a backward-pass
            # recompute under different fusion can flip a near-tie
            # neighbor and mis-route gradients (see train.seg._remat_wrap).
            body = nn.remat(
                refine_step,
                prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    NEIGHBOR_IDX_CHECKPOINT_NAME
                ),
            )
        scan_refine = nn.scan(
            body,
            variable_broadcast=("params", "batch_stats") if not train
            else "params",
            variable_carry="batch_stats" if train else (),
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
            length=iters - 1,
        )
        _, flows = scan_refine(
            self, (h, pc1_new, pc1_new_lr), consts,
            jnp.arange(iters - 1, dtype=jnp.int32),
        )
        flow_predictions.extend(flows[i] for i in range(iters - 1))
        return flow_predictions
