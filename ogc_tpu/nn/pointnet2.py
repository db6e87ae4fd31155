"""PointNet++ set-abstraction and feature-propagation modules (Flax,
channels-last).

Equivalents of the reference utils/pointnet2_util.py: SA = FPS -> KNN-group
(with radius clamp) -> SharedMLP -> maxpool over the neighborhood; FP =
three_nn inverse-distance interpolation + SharedMLP.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ogc_tpu import ops
from ogc_tpu.nn.layers import (
    NormSpec,
    PointwiseConv,
    SharedMLP,
    kaiming_normal,
    make_norm,
)


class _RawDenseKernel(nn.Module):
    """Bare kernel parameter with the same path/shape/init as the kernel an
    nn.Dense(use_bias=False) child named Dense_0 would create — readable
    before the gather so the projection can move to the source points."""

    shape: Tuple[int, int]

    def setup(self):
        self.kernel = self.param("kernel", kaiming_normal, self.shape)

    def __call__(self):
        return self.kernel


class _FirstConvParams(nn.Module):
    """Param-compatible stand-in for the first PointwiseConv of a SharedMLP
    in the source-projected path: owns Dense_0's kernel (applied by the
    caller to the SOURCE points) and GroupNorm_0 (applied to the gathered
    projections)."""

    in_dim: int
    out_dim: int
    norm: NormSpec

    def setup(self):
        from ogc_tpu.nn.layers import GroupStatsNorm

        self.dense = _RawDenseKernel((self.in_dim, self.out_dim),
                                     name="Dense_0")
        # Reshape-free GroupNorm (param-compatible with the nn.GroupNorm
        # the non-fold path creates): flax's grouped reshape on the gather
        # output forces TPU layout copies costlier than the norm itself.
        assert self.norm.get("class") == "GroupNorm"
        self.norm_layer = GroupStatsNorm(
            num_groups=self.norm["num_groups"], name="GroupNorm_0"
        )

    def __call__(self):  # pragma: no cover - params accessed via methods
        raise NotImplementedError


class _ConvParams(nn.Module):
    """Param-compatible stand-in for PointwiseConv(norm=GroupNorm):
    owns Dense_0's kernel and GroupNorm_0's affine, readable so the merged
    multi-scale chain can apply all scales' layers as one block-diagonal
    matmul + one merged norm (see SAModuleMSG).  apply() reproduces the
    per-scale PointwiseConv behavior for the unmerged fallback."""

    in_dim: int
    out_dim: int
    norm: NormSpec

    def setup(self):
        from ogc_tpu.nn.layers import GroupStatsNorm

        self.dense = _RawDenseKernel((self.in_dim, self.out_dim),
                                     name="Dense_0")
        assert self.norm.get("class") == "GroupNorm"
        self.norm_layer = GroupStatsNorm(
            num_groups=self.norm["num_groups"], name="GroupNorm_0"
        )

    def kernel(self):
        return self.dense()

    def affine(self):
        dummy = jnp.zeros((1, self.out_dim), jnp.float32)
        return self.norm_layer(dummy, return_params=True)

    def apply_conv(self, x):
        from ogc_tpu.nn.layers import compute_dtype

        w = self.dense()
        cd = compute_dtype()
        if cd is not None:
            x = x.astype(cd)
            w = w.astype(cd)
        x = x @ w
        x = self.norm_layer(x)
        return nn.relu(x)

    def __call__(self):  # pragma: no cover - params accessed via methods
        raise NotImplementedError


def _block_diag(mats):
    """Block-diagonal stack of 2-D kernels (static shapes/offsets)."""
    tin = sum(m.shape[0] for m in mats)
    tout = sum(m.shape[1] for m in mats)
    W = jnp.zeros((tin, tout), mats[0].dtype)
    i = j = 0
    for m in mats:
        W = jax.lax.dynamic_update_slice(W, m.astype(W.dtype), (i, j))
        i += m.shape[0]
        j += m.shape[1]
    return W


class _FoldScaleMLP(nn.Module):
    """SharedMLP-compatible per-scale stack for the source-projected MSG
    path (identical parameter tree: PointwiseConv_j/Dense_0 + GroupNorm_0).

    kernel() exposes the first layer's weight so SAModuleMSG can project
    ALL scales on the source cloud and gather their concatenation ONCE;
    post() then applies the first layer's norm + act and the remaining
    convs to the gathered (B, M, S, c0) block.  norm_affine()/rest expose
    the per-layer parameters for the fully merged multi-scale chain.
    """

    in_dim: int
    channels: Sequence[int]
    norm: NormSpec

    def setup(self):
        self.first = _FirstConvParams(
            self.in_dim, self.channels[0], self.norm, name="PointwiseConv_0"
        )
        self.rest = [
            _ConvParams(cin, c, self.norm, name=f"PointwiseConv_{j}")
            for j, (cin, c) in enumerate(
                zip(self.channels[:-1], self.channels[1:]), start=1
            )
        ]

    def kernel(self):
        return self.first.dense()

    def norm_affine(self):
        dummy = jnp.zeros((1, self.channels[0]), jnp.float32)
        return self.first.norm_layer(dummy, return_params=True)

    def post(self, x):
        x = self.first.norm_layer(x)
        x = nn.relu(x)
        for conv in self.rest:
            x = conv.apply_conv(x)
        return x


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    Reference: PointnetSAModuleMSG (utils/pointnet2_util.py:9-73).

    :param npoint: number of FPS centroids (None => group-all).
    :param radii / nsamples / mlps: one entry per scale; mlps holds OUTPUT
        channel dims per layer (the reference's mlp[1:] — input inferred).
    """

    npoint: Optional[int]
    radii: Sequence[Optional[float]]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    norm: NormSpec = None
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features=None, return_inds=False,
                 train: bool = False, fps_nested: bool = False):
        """
        :param xyz: (B, N, 3); :param features: optional (B, N, C).
        :param train: training step?  GroupNorm itself is train/eval
            agnostic; the flag only picks the bf16 fast path — the
            source-projected fold is an INFERENCE layout (its backward
            measured slower than the split path's), training keeps the
            raw-gather split.
        :param fps_nested: the input cloud is an upstream FPS stage's output
            (in selection order) — greedy FPS is incremental, so this
            stage's FPS is its first-npoint prefix (a slice).  Exact up to
            distance ties; callers gate on approximate-neighbor mode.
        :return: (new_xyz (B, npoint, 3), new_features (B, npoint, sum(out)))
        """
        if self.npoint is not None:
            if fps_nested:
                inds = jnp.broadcast_to(
                    jnp.arange(self.npoint, dtype=jnp.int32)[None],
                    (xyz.shape[0], self.npoint),
                )
                new_xyz = xyz[:, : self.npoint]
            else:
                inds = ops.furthest_point_sample(xyz, self.npoint)
                new_xyz = ops.gather(xyz, inds)
            # One KNN serves every scale: reference MSG scales share nsample
            # and differ only in the clamp radius (segnet_sapien.py:28-33),
            # and smaller nsamples are sorted prefixes of the larger.
            k_max = max(self.nsamples)
            dist, idx = ops.knn(k_max, new_xyz, xyz)
        else:
            inds = None
            new_xyz = None

        from ogc_tpu.nn.layers import compute_dtype
        from ogc_tpu.ops.pallas_pool import pool_neighbors

        # bf16 compute: SOURCE-PROJECTED grouping — by linearity the first
        # Dense of each scale applies to the N source points BEFORE the
        # gather (S x fewer matmul rows), all scales' projections concat
        # into ONE narrow bf16 gather, and each scale's radius clamp is a
        # row-select on its projected block.  The per-point center
        # correction is a tiny (B, M, c0) product.  GroupNorm (data-
        # dependent stats) still runs on the grouped tensor — only the
        # gather+matmul pair moves.  f32-HIGH projection on the source
        # keeps scene-scale xyz precision.
        # r4: the fold is pure linearity (Dense before gather) — enabled
        # for EVERY eval dtype, not just bf16.  In f32 (parity mode) it
        # removes the S x matmul-row blowup and the per-scale layout forks
        # outright; outputs differ from the reference-shaped chain only by
        # matmul reassociation (~1e-6 rel, pinned by
        # tests/test_segnet.py::test_eval_fold_matches_reference_shape).
        # OGC_EVAL_FOLD=off restores the reference-shaped eval chain.
        use_fold = (
            self.npoint is not None
            and self.use_xyz
            and features is not None
            and self.norm is not None
            and self.norm.get("class") == "GroupNorm"
            and os.environ.get("OGC_EVAL_FOLD", "on") != "off"
            and not train
        )
        # bf16 TRAINING keeps the r3 raw-gather split first layer (Dense on
        # the gathered rows, per-point center correction): the fold's
        # backward (wide projected scatter + select transposes) measured
        # slower than the split's, while forward-only work favors the fold.
        # r4: the raw-gather split first Dense is dtype-independent (its
        # first layer always runs f32-HIGH for scene-scale xyz); enabling
        # it for f32 TRAINING removes the same concat/select/layout chains
        # it removed in bf16.  Grad parity vs the reference is pinned by
        # tests/test_grad_parity.py (f32).  OGC_TRAIN_SPLIT=off restores
        # the reference-shaped fused tensor.
        use_split = (
            self.npoint is not None
            and self.use_xyz
            and features is not None
            and self.norm is not None
            and os.environ.get("OGC_TRAIN_SPLIT", "on") != "off"
            and train
        )
        if use_split:
            src_s = jnp.concatenate([xyz, features], axis=-1)
            center_in = jnp.concatenate(
                [
                    new_xyz,
                    jnp.zeros(
                        new_xyz.shape[:2] + (features.shape[-1],),
                        new_xyz.dtype,
                    ),
                ],
                axis=-1,
            )
            # One shared gather across scales; per-scale radius clamp as a
            # row-select on the gathered tensor.
            raw_all = (
                ops.group(src_s, idx) if len(self.nsamples) > 1 else None
            )
            outs = []
            for radius, nsample, mlp in zip(
                self.radii, self.nsamples, self.mlps
            ):
                d = dist[..., :nsample]
                i = idx[..., :nsample]
                if raw_all is not None:
                    raw = raw_all[..., :nsample, :]
                    if radius is not None:
                        raw = jnp.where(
                            (d > radius)[..., None], raw_all[..., :1, :], raw
                        )
                else:
                    if radius is not None:
                        i = jnp.where(d > radius, i[..., :1], i)
                    raw = ops.group(src_s, i)
                h = SharedMLP(tuple(mlp), norm=self.norm)(
                    None, split_first=(raw, center_in)
                )
                outs.append(jnp.max(h, axis=2))
            new_features = jnp.concatenate(outs, axis=-1)
            if return_inds:
                return new_xyz, new_features, inds
            return new_xyz, new_features
        if use_fold:
            hp = jax.lax.Precision.HIGH
            src = jnp.concatenate([xyz, features], axis=-1)
            in_dim = src.shape[-1]
            scales = [
                _FoldScaleMLP(in_dim, tuple(mlp), self.norm,
                              name=f"SharedMLP_{s}")
                for s, mlp in enumerate(self.mlps)
            ]
            Ws = [sc.kernel() for sc in scales]
            Wcat = jnp.concatenate(Ws, axis=-1)  # (3+C, sum c0)
            proj = jnp.einsum("bni,ij->bnj", src, Wcat, precision=hp)
            # center term: -Dense([new_xyz, 0]) = -new_xyz @ Wcat[:3]
            cproj = jnp.einsum(
                "bmi,ij->bmj", new_xyz, Wcat[:3], precision=hp
            )
            cd = compute_dtype()
            G = ops.group(proj.astype(cd), idx)  # (B, M, k_max, sum c0)
            cprojc = cproj.astype(cd)

            # All reference MSG stages share nsample and depth across
            # scales — then the WHOLE stage runs as ONE chain over the
            # concatenated channels: per-channel-block radius clamp,
            # block-diagonal Dense for the later layers, and merged
            # group-stats norms.  Per-scale math is exactly the sliced
            # block of each merged op; the win is one XLA layout for the
            # stage (the per-scale forks made XLA copy the shared gather
            # into two different layouts, ~1.6 ms per seg forward) and one
            # stats reduction per layer instead of one per scale.
            merged = (
                len(set(self.nsamples)) == 1
                and self.nsamples[0] == k_max
                and len({len(m) for m in self.mlps}) == 1
            )
            if merged:
                import numpy as np

                gnum = self.norm["num_groups"]
                if any(r is not None for r in self.radii):
                    rvec = jnp.asarray(
                        np.concatenate(
                            [
                                np.full(
                                    m[0],
                                    np.inf if r is None else r,
                                    np.float32,
                                )
                                for r, m in zip(self.radii, self.mlps)
                            ]
                        )
                    )
                    Gc = jnp.where(dist[..., None] > rvec, G[..., :1, :], G)
                else:
                    Gc = G
                from ogc_tpu.nn.layers import merged_group_stats_norm

                x = Gc - cprojc[:, :, None, :]
                x = merged_group_stats_norm(
                    x,
                    [sc.norm_affine() for sc in scales],
                    [(m[0], gnum) for m in self.mlps],
                )
                x = nn.relu(x)
                n_layers = len(self.mlps[0])
                for j in range(1, n_layers):
                    Wbd = _block_diag(
                        [sc.rest[j - 1].kernel() for sc in scales]
                    ).astype(cd)
                    x = x @ Wbd
                    x = merged_group_stats_norm(
                        x,
                        [sc.rest[j - 1].affine() for sc in scales],
                        [(m[j], gnum) for m in self.mlps],
                    )
                    x = nn.relu(x)
                new_features = pool_neighbors(x, differentiable=train)
                if return_inds:
                    return new_xyz, new_features, inds
                return new_xyz, new_features

            outs = []
            off = 0
            for radius, nsample, sc, mlp in zip(
                self.radii, self.nsamples, scales, self.mlps
            ):
                c0 = mlp[0]
                Gs = G[..., :nsample, off : off + c0]
                if radius is not None:
                    Gs = jnp.where(
                        (dist[..., :nsample] > radius)[..., None],
                        G[..., :1, off : off + c0],
                        Gs,
                    )
                x = Gs - cprojc[..., off : off + c0][:, :, None, :]
                h = sc.post(x)
                outs.append(pool_neighbors(h, differentiable=train))
                off += c0
            new_features = jnp.concatenate(outs, axis=-1)
            if return_inds:
                return new_xyz, new_features, inds
            return new_xyz, new_features

        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            if self.npoint is not None:
                d = dist[..., :nsample]
                i = idx[..., :nsample]
                if radius is not None:
                    i = jnp.where(d > radius, i[..., :1], i)
                grouped, _ = ops.group_with_idx(
                    xyz, new_xyz, i, features, use_xyz=self.use_xyz
                )  # (B, M, S, 3+C)
            else:
                grouped, _ = ops.group_all(xyz, features, use_xyz=self.use_xyz)
            h = SharedMLP(tuple(mlp), norm=self.norm)(grouped)
            outs.append(pool_neighbors(h, differentiable=train))  # neighborhood maxpool
        new_features = jnp.concatenate(outs, axis=-1)
        if return_inds:
            return new_xyz, new_features, inds
        return new_xyz, new_features


class SAModule(SAModuleMSG):
    """Single-scale set abstraction (utils/pointnet2_util.py:76-88)."""

    @classmethod
    def single(cls, npoint, radius, nsample, mlp, norm=None, use_xyz=True,
               name=None):
        return cls(
            npoint=npoint,
            radii=(radius,),
            nsamples=(nsample,),
            mlps=(tuple(mlp),),
            norm=norm,
            use_xyz=use_xyz,
            name=name,
        )


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + SharedMLP.

    Reference: PointnetFPModule (utils/pointnet2_util.py:91-121).
    """

    mlp: Sequence[int]
    norm: NormSpec = None

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats):
        """
        :param unknown: (B, N, 3); :param known: (B, M, 3) or None.
        :param unknown_feats: (B, N, C1) or None; :param known_feats: (B, M, C2).
        :return: (B, N, mlp[-1]).
        """
        if known is not None:
            idx, weight = ops.interpolate_weights(unknown, known)
            interpolated = ops.three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )

        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated
        return SharedMLP(tuple(self.mlp), norm=self.norm)(new_features)
