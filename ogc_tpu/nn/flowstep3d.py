"""FlowStep3D building blocks (Flax, channels-last).

Equivalents of the reference utils/flowstep3d_util.py: KNN-grouped set
abstraction with BatchNorm/InstanceNorm, cross-cloud FlowEmbedding
correlation, and MLP-free feature propagation.  BatchNorm momentum is a call
argument so the reference's BNMomentumScheduler (utils/pytorch_util.py:
112-137) can be applied inside jit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ogc_tpu import ops


def _pool_neighbors(x, mean: bool, train: bool):
    """Neighbor-axis reduce; Pallas rowgroup kernel on TPU eval forwards
    (see ops/pallas_pool.pool_neighbors)."""
    from ogc_tpu.ops.pallas_pool import pool_neighbors

    return pool_neighbors(x, mean=mean, differentiable=train)


def _fold_bn_pool(norm_mod, x, pool):
    """Eval-mode last layer of a grouped stack: the eval BatchNorm is a
    per-channel affine — fold it and the ReLU into the neighbor pool so the
    post-norm grouped tensor is never materialized (pallas_pool)."""
    from ogc_tpu.ops.pallas_pool import pool_neighbors

    k_s, b_s = norm_mod(
        x, use_running_average=True, return_affine=True,
    )
    return pool_neighbors(
        x, mean=pool == "mean", differentiable=False,
        scale=k_s, add=b_s, relu=True,
    )


class SchedulableBatchNorm(nn.Module):
    """BatchNorm over all axes but the last, with momentum as a call arg.

    Torch semantics: running <- (1 - m) * running + m * batch
    (torch momentum m, the value the reference's scheduler sets).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = False, momentum=0.1,
                 return_affine: bool = False):
        """`return_affine`: instead of normalizing x, return the eval-mode
        per-channel affine (k, b) with BN_eval(y) = y * k + b — the classic
        inference BatchNorm fold (k = scale * rsqrt(var + eps),
        b = bias - mean * k).  x is only used for its channel count; running
        stats must be in use."""
        features = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,))
        )

        if return_affine:
            assert use_running_average
            k = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            return k, bias - ra_mean.value * k

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Stats always in f32 (bf16 mean/var accumulation is too lossy).
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            n = x.size // features
            if not self.is_initializing():
                from ogc_tpu.ops.core import (
                    bn_local_stats_active, manual_data_axis,
                )

                # Under bn_local_stats (FlowTrainer bn_sync="local"), skip
                # the two per-layer pmeans: normalize with the per-device
                # batch stats (torch-DataParallel replica semantics) and
                # let the trainer sync the running-stat pytree with one
                # fused all-reduce per step.
                ax = None if bn_local_stats_active() else manual_data_axis()
                if ax is not None:
                    # Manual-SPMD region (shard_map): x is the per-device
                    # local batch — compute global-batch statistics via
                    # two stable passes (pmean the mean, then pmean the
                    # second moment CENTERED on the global mean; the
                    # E[x^2]-E[x]^2 form cancels catastrophically for
                    # low-variance channels).  Exactly GSPMD's jnp.var
                    # over the global batch (equal-sized local shards).
                    name, n_dev = ax
                    mean = jax.lax.pmean(mean, name)
                    var = jax.lax.pmean(
                        jnp.mean((xf - mean) ** 2, axis=axes), name
                    )
                    n = n * n_dev
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                # torch updates running_var with the unbiased batch variance.
                unbiased = var * n / max(n - 1, 1)
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        # Normalize in the input dtype: with bf16 compute this keeps the
        # full activation tensor out of f32 HBM roundtrips.
        dt = x.dtype
        y = (x - mean.astype(dt)) * jax.lax.rsqrt(
            var + self.epsilon
        ).astype(dt)
        return y * scale.astype(dt) + bias.astype(dt)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True): per-sample, per-channel stats over the
    spatial axes (all but first and last)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)  # stats in f32
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        dt = x.dtype
        y = (x - mean.astype(dt)) * jax.lax.rsqrt(var + self.epsilon).astype(dt)
        return y * scale.astype(dt) + bias.astype(dt)


class _NormedConvStack(nn.Module):
    """Conv(1x1, no bias) + norm + act per layer — the mlp stack shared by
    the flow modules (flowstep3d_util.py:19-25, 84-91).

    `split_first`: optional (raw, center_in) pair replacing `x` for the
    first layer, exploiting the layer's linearity:

        Dense(concat([g_xyz - center, g_feat])) ==
            Dense(raw) - Dense(concat([center, 0]))        (no bias)

    where raw = gather(concat([xyz, feat])) is the UNTOUCHED (B, M, S, 3+C)
    gather output and center_in = concat([center, zeros]) is per-point
    (B, M, 3+C).  This lets the big gathered tensor feed the MXU directly —
    profiling showed the old concat path spends several ms per call on XLA
    rewrite chains (relative-xyz select fusion + layout copy + bf16
    cast-slice + transpose) around each grouped tensor, dwarfing the matmul.
    The first layer then runs in f32 with HIGH (3-pass bf16) precision:
    unlike the relative coordinates of the fused path, raw xyz columns carry
    scene-scale magnitudes (~30 m on KITTI) that a single-pass bf16 matmul
    would quantize to ~0.1 m.  Parameter tree and math are unchanged.
    """

    mlp: Sequence[int]
    use_instance_norm: bool = False
    use_act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum=0.1,
                 split_first=None, fold_first=None, pool=None):
        from ogc_tpu.nn.layers import compute_dtype
        from ogc_tpu.ops.pallas_pool import pool_neighbors

        pooled = False
        for i, c in enumerate(self.mlp):
            last = i == len(self.mlp) - 1
            if i == 0 and fold_first is not None:
                # Source-projected grouping (eval + bf16 + BatchNorm only):
                # apply the first Dense to the N SOURCE points BEFORE the
                # gather (by linearity, as in the split path — but on the
                # source list, S x fewer rows), fold the eval-mode BatchNorm
                # affine into the projection, and gather the narrow bf16
                # pre-activations.  The (B, M, S, 3+C) f32 gather and the
                # (B*M*S, 3+C) -> c matmul+norm fusions both disappear; the
                # grouped tensor is born (B, M, S, c) bf16.  f32-HIGH
                # projection on the source keeps scene-scale xyz precision
                # (same rationale as the split path).
                xyz, new_xyz, feat, idx = fold_first
                d = nn.Dense(
                    c, use_bias=False, dtype=None,
                    precision=jax.lax.Precision.HIGH,
                )
                src = (
                    xyz if feat is None
                    else jnp.concatenate([xyz, feat], axis=-1)
                )
                proj = d(src)  # (B, N, c)
                cin = (
                    new_xyz if feat is None
                    else jnp.concatenate(
                        [new_xyz,
                         jnp.zeros(
                             new_xyz.shape[:2] + (feat.shape[-1],),
                             new_xyz.dtype,
                         )],
                        axis=-1,
                    )
                )
                cproj = d(cin)  # (B, M, c)
                cd = compute_dtype()
                if self.use_act:
                    k_s, b_s = SchedulableBatchNorm()(
                        proj, use_running_average=True, momentum=bn_momentum,
                        return_affine=True,
                    )
                    g = ops.group((proj * k_s).astype(cd), idx)
                    cterm = (b_s - cproj * k_s).astype(cd)
                else:
                    g = ops.group(proj.astype(cd), idx)
                    cterm = -cproj.astype(cd)
                if last and pool is not None and not train:
                    # Single-layer stack (GRU gates, H0 second conv): the
                    # group add + act + neighbor reduce all fold into the
                    # pool kernel — the activated grouped tensor is never
                    # materialized.
                    x = pool_neighbors(
                        g, mean=pool == "mean", differentiable=False,
                        add=cterm, relu=self.use_act,
                    )
                    pooled = True
                    continue
                x = g + cterm[:, :, None, :]
                if self.use_act:
                    x = nn.relu(x)
                continue
            if i == 0 and split_first is not None:
                raw, center_in = split_first
                # dtype=None: run in the f32 input dtype (precision note
                # above); identical params to the compute-dtype Dense.
                d = nn.Dense(
                    c, use_bias=False, dtype=None,
                    precision=jax.lax.Precision.HIGH,
                )
                x = d(raw) - d(center_in)[..., None, :]
                x = x.astype(compute_dtype())
            else:
                x = nn.Dense(c, use_bias=False, dtype=compute_dtype())(x)
            if self.use_act:
                if (
                    last and pool is not None and not train
                    and not self.use_instance_norm
                ):
                    x = _fold_bn_pool(SchedulableBatchNorm(), x, pool)
                    pooled = True
                    continue
                # Norms run in the compute dtype (stats in f32 inside): no
                # per-layer f32 materialization of the grouped tensors.
                if self.use_instance_norm:
                    x = InstanceNorm()(x)
                else:
                    x = SchedulableBatchNorm()(
                        x, use_running_average=not train, momentum=bn_momentum
                    )
                x = nn.relu(x)
        if pool is not None and not pooled:
            # Pool in the compute dtype, before the f32 cast.
            x = _pool_neighbors(x, pool == "mean", train)
        return x.astype(jnp.float32)


class FlowSAModule(nn.Module):
    """FlowStep3D-flavor set abstraction: FPS (optional, reusable indices) +
    KNN grouping + conv stack + max/mean pool.

    Reference: PointNetSetAbstraction (utils/flowstep3d_util.py:69-138).
    With radius=None the grouping is pure KNN (QueryAndGroup without clamp).
    `use_act=False` means conv only — no norm, no activation (:123-128).
    """

    npoint: Optional[int]
    nsample: int
    mlp: Sequence[int]
    radius: Optional[float] = None
    use_xyz: bool = True
    use_act: bool = True
    mean_aggr: bool = False
    use_instance_norm: bool = False

    def _grouped_inputs(self, xyz, new_xyz, idx, features, train=True):
        """Prepare the conv-stack input for precomputed neighbor indices,
        returning (grouped, split, fold):

        - eval + bf16 + BatchNorm: `fold` carries (xyz, new_xyz, feat, idx)
          for the source-projected first layer (_NormedConvStack fold_first —
          Dense + BN-affine applied to the N source points, gather moved
          after the projection).
        - train bf16: the raw-gather split form (Dense on the gathered rows,
          still skipping the XLA rewrite chains).
        - otherwise the reference-shaped fused (rel_xyz || feat) tensor.
        """
        import os

        from ogc_tpu.nn.layers import compute_dtype

        if self.use_xyz:
            # r4: eval fold for EVERY dtype (pure linearity; in f32 parity
            # mode it removes the grouped-row matmul blowup).  Train keeps
            # the bf16-only raw-split (its f32 backward is unmeasured).
            # OGC_EVAL_FOLD=off restores the reference-shaped eval chain.
            if (not train and not self.use_instance_norm
                    and os.environ.get("OGC_EVAL_FOLD", "on") != "off"):
                return None, None, (xyz, new_xyz, features, idx)
            if compute_dtype() == jnp.bfloat16 and features is not None:
                from ogc_tpu.nn.layers import raw_split_inputs

                return None, raw_split_inputs(xyz, new_xyz, features, idx), None
        grouped, _ = ops.group_with_idx(
            xyz, new_xyz, idx, features, use_xyz=self.use_xyz
        )
        return grouped, None, None

    @nn.compact
    def __call__(self, xyz, features, fps_idx=None, train: bool = True,
                 bn_momentum=0.1, group_idx=None, precomputed_split=None,
                 fps_nested: bool = False, knn_idx=None,
                 return_knn: bool = False):
        """
        :param xyz: (B, N, 3); :param features: (B, N, C) or None.
        :param group_idx: optional precomputed (B, N, >=nsample) KNN table of
            xyz against itself (only valid on identity-npoint modules); the
            first `nsample` columns are used, skipping the KNN search.
        :param precomputed_split: optional (raw, center_in) gather shared by
            several modules over the same (xyz, features, idx) — only with
            group_idx.
        :param fps_nested: the input cloud is already in FPS selection order
            (it is the output of an upstream FPS stage).  Greedy FPS is
            incremental — at every step the full-set argmax lies among the
            already-selected prefix's candidates — so FPS(npoint) of such a
            cloud IS its first npoint rows: the sample becomes a slice and
            the returned fps_idx is arange.  Exact up to distance ties
            (full-set runs break ties by original index, a nested run by
            selection rank); callers gate this on approximate-neighbor mode.
        :param knn_idx: optional precomputed (B, M, >=nsample) neighbor
            table replacing the KNN search of new_xyz against xyz (requires
            radius=None).  Used to freeze the self-KNN graph across flow
            refinement iterations.
        :param return_knn: also return the (B, M, nsample) neighbor table.
        :return: (new_xyz (B, M, 3), new_feats (B, M, mlp[-1]), fps_idx
            [, knn idx]).
        """
        if group_idx is not None:
            assert not return_knn
            assert self.npoint in (None, -1, xyz.shape[1])
            if precomputed_split is not None:
                # Caller-shared raw gather (e.g. the GRU's convz/convr group
                # the IDENTICAL (xyz, hx) with the same indices — one gather
                # serves both).
                grouped, split, fold = None, precomputed_split, None
            else:
                grouped, split, fold = self._grouped_inputs(
                    xyz, xyz, group_idx[..., : self.nsample], features, train
                )
            out = _NormedConvStack(
                tuple(self.mlp), self.use_instance_norm, self.use_act
            )(grouped, train=train, bn_momentum=bn_momentum,
              split_first=split, fold_first=fold,
              pool="mean" if self.mean_aggr else "max")
            return xyz, out, fps_idx
        if (
            self.npoint is not None
            and self.npoint != -1
            and self.npoint != xyz.shape[1]
        ):
            if fps_idx is None and fps_nested:
                fps_idx = jnp.broadcast_to(
                    jnp.arange(self.npoint, dtype=jnp.int32)[None],
                    (xyz.shape[0], self.npoint),
                )
                new_xyz = xyz[:, : self.npoint]
            else:
                if fps_idx is None:
                    fps_idx = ops.furthest_point_sample(xyz, self.npoint)
                new_xyz = ops.gather(xyz, fps_idx)
        else:
            # npoint == N: identity.  The reference still runs FPS here
            # (flowstep3d_util.py:113-116), which permutes the cloud into
            # farthest-first order while downstream code keeps indexing it in
            # the original order (e.g. flownet_kitti.py:230 adds the
            # regressor's output to the unpermuted cloud) — a latent
            # misalignment inherited from FlowStep3D.  The identity shortcut
            # fixes the alignment AND removes ~10 needless FPS+gather passes
            # per forward; per-point features are unchanged (grouping is
            # permutation-equivariant).
            new_xyz = xyz
        # KNN + radius clamp (QueryAndGroup semantics, pointnet2.py:281-301).
        if knn_idx is not None:
            # Frozen/precomputed neighbor table (no clamp distances).
            assert self.radius is None
            idx = knn_idx[..., : self.nsample]
        else:
            dist, idx = ops.knn(self.nsample, new_xyz, xyz)
            if self.radius is not None:
                from ogc_tpu.ops.core import _tag_idx

                nearest = idx[..., :1]
                # Tag post-clamp indices for remat policies: the clamp is a
                # fresh discontinuous selection (see ops.core.query_and_group).
                idx = _tag_idx(jnp.where(dist > self.radius, nearest, idx))
        grouped, split, fold = self._grouped_inputs(
            xyz, new_xyz, idx, features, train
        )
        out = _NormedConvStack(
            tuple(self.mlp), self.use_instance_norm, self.use_act
        )(grouped, train=train, bn_momentum=bn_momentum,
          split_first=split, fold_first=fold,
          pool="mean" if self.mean_aggr else "max")
        if return_knn:
            return new_xyz, out, fps_idx, idx
        return new_xyz, out, fps_idx


class FlowFPModule(nn.Module):
    """3-NN inverse-distance upsampling, optional conv1d+BN mlp.

    Reference: PointNetFeaturePropogation (utils/flowstep3d_util.py:141-184);
    clamps distances below 1e-10 (:169) rather than adding an epsilon.
    """

    mlp: Sequence[int] = ()
    use_instance_norm: bool = False

    @staticmethod
    def weights(pos1, pos2):
        """Precompute the 3-NN inverse-distance stencil (pos1 <- pos2).
        Callers upsampling between FIXED clouds every refinement iteration
        (flow_up_sample, flownet_kitti.py:224/247) compute this once."""
        dist, idx = ops.three_nn(pos1, pos2)
        from ogc_tpu.ops.core import _tag_idx

        dist = jnp.maximum(dist, 1e-10)
        w = 1.0 / dist
        # Tag the normalized stencil weights for remat policies: for
        # coincident points (the sub-cloud is an FPS SUBSET of the full
        # cloud, so exact hits are the common case) dist==0 clamps to
        # 1e-10 and w spans ~1e10 — a backward-pass recompute of the
        # matmul-form d2 with ~1e-8 fp noise lands at dist~1e-4 instead
        # and swings the normalized weights O(1).  The stencil is routing
        # state, like the indices; saving it costs (B, N, 3) floats.
        return idx, _tag_idx(w / jnp.sum(w, axis=-1, keepdims=True))

    @nn.compact
    def __call__(self, pos1, pos2, feature1, feature2, train: bool = True,
                 bn_momentum=0.1, cached=None):
        """
        :param pos1: (B, N, 3) targets; :param pos2: (B, S, 3) sources.
        :param feature1: (B, N, C1) or None; :param feature2: (B, S, C2).
        :param cached: optional (idx, weight) from FlowFPModule.weights.
        :return: (B, N, C').
        """
        idx, w = cached if cached is not None else self.weights(pos1, pos2)
        interpolated = ops.three_interpolate(feature2, idx, w)
        if feature1 is not None:
            out = jnp.concatenate([interpolated, feature1], axis=-1)
        else:
            out = interpolated
        if self.mlp:
            out = _NormedConvStack(tuple(self.mlp), self.use_instance_norm)(
                out, train=train, bn_momentum=bn_momentum
            )
        return out


class FlowEmbedding(nn.Module):
    """Cross-cloud correlation: for each point of cloud 1, group `nsample`
    KNN neighbors in cloud 2 (radius-clamped), concat
    [pos_diff, feat2_grouped, feat1] and run the conv stack + maxpool.

    Reference: FlowEmbedding (utils/flowstep3d_util.py:7-66), corr_func
    'concat'.
    """

    radius: float
    nsample: int
    mlp: Sequence[int]
    use_instance_norm: bool = False

    @nn.compact
    def __call__(self, pos1, pos2, feature1, feature2, train: bool = True,
                 bn_momentum=0.1):
        """
        :param pos1/pos2: (B, N, 3); :param feature1/feature2: (B, N, C).
        :return: (pos1, feat_new (B, N, mlp[-1])).
        """
        from ogc_tpu.ops.core import _tag_idx

        dist, idx = ops.knn(self.nsample, pos1, pos2)
        nearest = idx[..., :1]
        # Tag post-clamp indices for remat policies (see query_and_group).
        idx = _tag_idx(jnp.where(dist > self.radius, nearest, idx))

        from ogc_tpu.nn.layers import compute_dtype

        if (
            compute_dtype() == jnp.bfloat16
            and not train
            and not self.use_instance_norm
        ):
            # Source-projected eval path: first Dense + BN fold applied to
            # cloud 2's points before the gather (see _FlowEmbedStack).
            x = _FlowEmbedStack(
                tuple(self.mlp), self.use_instance_norm,
                name="_NormedConvStack_0",
            )(None, pos1, feature1, train=train, bn_momentum=bn_momentum,
              fold_src=(pos2, feature2, idx), pool="max")
            return pos1, x

        # Fused single row-gather of [pos2, feature2].
        g = ops.group(jnp.concatenate([pos2, feature2], axis=-1), idx)
        x = _FlowEmbedStack(
            tuple(self.mlp), self.use_instance_norm, name="_NormedConvStack_0"
        )(g, pos1, feature1, train=train, bn_momentum=bn_momentum, pool="max")
        return pos1, x


class _RawKernel(nn.Module):
    """Bare Dense kernel parameter — same path/shape/init as the kernel an
    nn.Dense(use_bias=False) child would create, but directly readable so a
    caller can apply column blocks of it separately (see _FlowEmbedStack)."""

    shape: Tuple[int, int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )


class _FlowEmbedStack(nn.Module):
    """_NormedConvStack specialization for the FlowEmbedding input
    concat([pos_diff, feat2_grouped, feat1_rep]) — parameter tree identical
    (named _NormedConvStack_0 by the caller; children Dense_i / norm_i).

    bf16 compute mode applies the first layer by column blocks of the same
    (3+C2+C1, c0) kernel:

        y = raw @ W[:3+C2] - pos1 @ W[:3] + feat1 @ W[3+C2:]

    so the raw gather output feeds the matmul directly and the feat1 term is
    a per-POINT (B, N, c0) product — the (B, N, S, 259) concat + feat1
    broadcast materialization disappears.  The raw/pos1 products run in
    f32/HIGH (scene-scale coordinates; see _NormedConvStack).  f32 mode
    keeps the reference-shaped fused computation exactly.
    """

    mlp: Sequence[int]
    use_instance_norm: bool = False

    def _norm(self, i):
        if self.use_instance_norm:
            return InstanceNorm(name=f"InstanceNorm_{i}")
        return SchedulableBatchNorm(name=f"SchedulableBatchNorm_{i}")

    def _fold_norm_pool(self, x, i, bn_momentum, pool):
        return _fold_bn_pool(self._norm(i), x, pool), True

    @nn.compact
    def __call__(self, g, pos1, feat1, train: bool = True, bn_momentum=0.1,
                 fold_src=None, pool=None):
        from ogc_tpu.nn.layers import compute_dtype

        c2 = (g.shape[-1] if fold_src is None else fold_src[1].shape[-1] + 3) - 3
        c1 = feat1.shape[-1]
        W = _RawKernel((3 + c2 + c1, self.mlp[0]), name="Dense_0")()

        if fold_src is not None:
            # Source-projected eval path (bf16 + BatchNorm): project cloud
            # 2's [pos2 || feat2] through the kernel's first column block
            # BEFORE the gather, fold the eval BatchNorm affine into the
            # projection, and add the per-POINT feat1/pos1 terms — the
            # (B, N, S, 3+c2) f32 gather and the grouped matmul disappear.
            pos2, feat2, idx = fold_src
            hp = jax.lax.Precision.HIGH
            src = jnp.concatenate([pos2, feat2], axis=-1)
            proj2 = jnp.einsum("bmi,ij->bmj", src, W[: 3 + c2], precision=hp)
            point = (
                jnp.einsum("bni,ij->bnj", feat1, W[3 + c2:], precision=hp)
                - jnp.einsum("bni,ij->bnj", pos1, W[:3], precision=hp)
            )
            k_s, b_s = self._norm(0)(
                proj2, use_running_average=True, momentum=bn_momentum,
                return_affine=True,
            )
            cd = jnp.bfloat16
            gp = ops.group((proj2 * k_s).astype(cd), idx)
            cterm = (point * k_s + b_s).astype(cd)
            x = nn.relu(gp + cterm[:, :, None, :])
            pooled = False
            for i, c in enumerate(self.mlp[1:], start=1):
                x = nn.Dense(
                    c, use_bias=False, dtype=compute_dtype(), name=f"Dense_{i}"
                )(x)
                if (
                    i == len(self.mlp) - 1 and pool is not None
                    and not train and not self.use_instance_norm
                ):
                    x, pooled = self._fold_norm_pool(x, i, bn_momentum, pool)
                    continue
                x = self._norm(i)(
                    x, use_running_average=not train, momentum=bn_momentum
                )
                x = nn.relu(x)
            if pool is not None and not pooled:
                x = _pool_neighbors(x, pool == "mean", train)
            return x.astype(jnp.float32)

        if compute_dtype() == jnp.bfloat16:
            hp = jax.lax.Precision.HIGH
            x = jnp.einsum("bnsi,ij->bnsj", g, W[: 3 + c2], precision=hp)
            point = (
                jnp.einsum("bni,ij->bnj", feat1, W[3 + c2:], precision=hp)
                - jnp.einsum("bni,ij->bnj", pos1, W[:3], precision=hp)
            )
            x = (x + point[:, :, None, :]).astype(jnp.bfloat16)
        else:
            pos_diff = g[..., :3] - pos1[:, :, None, :]
            feat1_rep = jnp.broadcast_to(
                feat1[:, :, None, :], g.shape[:3] + (c1,)
            )
            full = jnp.concatenate([pos_diff, g[..., 3:], feat1_rep], axis=-1)
            x = jnp.einsum("bnsi,ij->bnsj", full, W)

        x = self._norm(0)(x) if self.use_instance_norm else self._norm(0)(
            x, use_running_average=not train, momentum=bn_momentum
        )
        x = nn.relu(x)
        pooled = False
        for i, c in enumerate(self.mlp[1:], start=1):
            x = nn.Dense(
                c, use_bias=False, dtype=compute_dtype(), name=f"Dense_{i}"
            )(x)
            if (
                i == len(self.mlp) - 1 and pool is not None
                and not train and not self.use_instance_norm
            ):
                x, pooled = self._fold_norm_pool(x, i, bn_momentum, pool)
                continue
            if self.use_instance_norm:
                x = self._norm(i)(x)
            else:
                x = self._norm(i)(
                    x, use_running_average=not train, momentum=bn_momentum
                )
            x = nn.relu(x)
        if pool is not None and not pooled:
            x = _pool_neighbors(x, pool == "mean", train)
        return x.astype(jnp.float32)
