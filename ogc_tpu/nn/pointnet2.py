"""PointNet++ set-abstraction and feature-propagation modules (Flax,
channels-last).

Equivalents of the reference utils/pointnet2_util.py: SA = FPS -> KNN-group
(with radius clamp) -> SharedMLP -> maxpool over the neighborhood; FP =
three_nn inverse-distance interpolation + SharedMLP.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ogc_tpu import ops
from ogc_tpu.nn.layers import NormSpec, SharedMLP


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
    def __call__(self, xyz, features=None, return_inds=False):
        """
        :param xyz: (B, N, 3); :param features: optional (B, N, C).
        :return: (new_xyz (B, npoint, 3), new_features (B, npoint, sum(out)))
        """
        if self.npoint is not None:
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

        # bf16 compute: first-layer raw-gather split (the gather output
        # feeds the first Dense directly; the per-point center correction
        # is a tiny second Dense call — see flowstep3d._NormedConvStack).
        use_split = (
            self.npoint is not None
            and self.use_xyz
            and features is not None
            and self.norm is not None
            and compute_dtype() == jnp.bfloat16
        )
        if use_split:
            src = jnp.concatenate([xyz, features], axis=-1)
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

        # With several scales, gather the neighborhood ONCE (unclamped,
        # k_max) and apply each scale's radius clamp as a row-select on the
        # gathered tensor: gather(where(d>r, i0, i)) == where(d>r, row0,
        # rows), and the select costs a fraction of a second row-gather.
        raw_all = None
        if use_split and len(self.nsamples) > 1:
            raw_all = ops.group(src, idx)  # (B, M, k_max, 3+C)

        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            if self.npoint is not None:
                d = dist[..., :nsample]
                i = idx[..., :nsample]
                if use_split:
                    if raw_all is not None:
                        raw = raw_all[..., :nsample, :]
                        if radius is not None:
                            raw = jnp.where(
                                (d > radius)[..., None], raw_all[..., :1, :],
                                raw,
                            )
                    else:
                        if radius is not None:
                            i = jnp.where(d > radius, i[..., :1], i)
                        raw = ops.group(src, i)
                    h = SharedMLP(tuple(mlp), norm=self.norm)(
                        None, split_first=(raw, center_in)
                    )
                    outs.append(jnp.max(h, axis=2))
                    continue
                if radius is not None:
                    i = jnp.where(d > radius, i[..., :1], i)
                grouped, _ = ops.group_with_idx(
                    xyz, new_xyz, i, features, use_xyz=self.use_xyz
                )  # (B, M, S, 3+C)
            else:
                grouped, _ = ops.group_all(xyz, features, use_xyz=self.use_xyz)
            h = SharedMLP(tuple(mlp), norm=self.norm)(grouped)
            outs.append(jnp.max(h, axis=2))  # maxpool over neighborhood
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
