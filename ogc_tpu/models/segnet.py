"""MaskFormer3D: PointNet++ encoder/decoder + MaskFormer head emitting K soft
object masks.

One config-parameterized implementation replaces the reference's three
per-dataset copies (models/segnet_sapien.py, segnet_ogcdr.py,
segnet_kitti.py — they differ only in SA/FP hyperparameters).  Mask is the
softmax over K of cosine similarity between per-point embeddings and object
slots with temperature 0.05 (reference: models/segnet_sapien.py:77-80).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ogc_tpu.nn.layers import NormSpec, PointwiseConv
from ogc_tpu.nn.pointnet2 import FPModule, SAModule, SAModuleMSG

GN_CONFIG = {"class": "GroupNorm", "num_groups": 4}


@dataclasses.dataclass(frozen=True)
class SAStage:
    npoint_div: int  # npoint = n_point // npoint_div
    radii: Tuple[Optional[float], ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]  # output channels per layer per scale


@dataclasses.dataclass(frozen=True)
class SegNetArch:
    sa_stages: Tuple[SAStage, ...]
    fp_mlps: Tuple[Tuple[int, ...], ...]  # index 0 = shallowest level


# Per-dataset architectures (reference: models/segnet_{sapien,ogcdr,kitti}.py).
ARCHS = {
    # segnet_sapien.py:26-43 — n_point=512, radii .1/.2/.4
    "sapien": SegNetArch(
        sa_stages=(
            SAStage(2, (0.1, 0.2), (64, 64), ((64, 64, 64), (64, 64, 128))),
            SAStage(4, (0.4,), (64,), ((128, 128, 256),)),
        ),
        fp_mlps=((128, 128, 64), (256, 128)),
    ),
    # segnet_ogcdr.py:26-43 — n_point=2048, radii .05/.1/.2
    "ogcdr": SegNetArch(
        sa_stages=(
            SAStage(2, (0.05, 0.1), (64, 64), ((64, 64, 64), (64, 64, 128))),
            SAStage(4, (0.2,), (64,), ((128, 128, 256),)),
        ),
        fp_mlps=((128, 128, 64), (256, 128)),
    ),
    # segnet_kitti.py:26-52 — n_point=8192, 3 SA levels, radii 1/2/4/8
    "kitti": SegNetArch(
        sa_stages=(
            SAStage(4, (1.0, 2.0), (64, 64), ((32, 32, 32), (32, 32, 64))),
            SAStage(8, (4.0,), (64,), ((64, 64, 128),)),
            SAStage(16, (8.0,), (64,), ((128, 128, 256),)),
        ),
        fp_mlps=((64, 64, 64), (64, 64), (128, 128)),
    ),
}
# Waymo uses the KITTI architecture (reference train_seg_waymo.py imports
# models.segnet_kitti).
ARCHS["waymo"] = ARCHS["kitti"]
ARCHS["ogcdrsv"] = ARCHS["ogcdr"]
ARCHS["kittisf"] = ARCHS["kitti"]
ARCHS["kittidet"] = ARCHS["kitti"]
ARCHS["semantickitti"] = ARCHS["kitti"]


class MaskFormer3D(nn.Module):
    """3D object segmentation network: PointNet++ + MaskFormer.

    :param arch: dataset key into ARCHS or a SegNetArch.
    """

    n_slot: int
    n_point: int = 512
    arch: str = "sapien"
    use_xyz: bool = True
    norm: NormSpec = dataclasses.field(default_factory=lambda: dict(GN_CONFIG))
    n_transformer_layer: int = 2
    transformer_embed_dim: int = 256
    transformer_input_pos_enc: bool = False

    def _arch(self) -> SegNetArch:
        return ARCHS[self.arch] if isinstance(self.arch, str) else self.arch

    @nn.compact
    def __call__(self, pc, point_feats, train: bool = False):
        """
        :param pc: (B, N, 3); :param point_feats: (B, N, 3).
        :param train: training step?  Math-neutral (GroupNorm only); picks
            the bf16 fast path in the SA stages (inference fold vs
            training split — see SAModuleMSG).
        :return: mask (B, N, K).
        """
        from ogc_tpu.nn.transformer import MaskFormerHead

        arch = self._arch()
        norm = dict(self.norm) if self.norm is not None else None

        # PointNet++ encoder.  From stage 1 on, the input cloud is the
        # previous FPS stage's output (in selection order) — greedy FPS
        # nests, so the stage's sample is a prefix slice (approximate mode;
        # exact mode keeps the reference's per-stage FPS).
        from ogc_tpu import ops as _ops

        nested_ok = not _ops.exact_neighbors()
        l_pc, l_feats = [pc], [point_feats]
        for si, stage in enumerate(arch.sa_stages):
            new_xyz, new_feats = SAModuleMSG(
                npoint=self.n_point // stage.npoint_div,
                radii=stage.radii,
                nsamples=stage.nsamples,
                mlps=stage.mlps,
                norm=norm,
                use_xyz=self.use_xyz,
                name=f"sa{si}",
            )(l_pc[si], l_feats[si], train=train,
              fps_nested=nested_ok and si > 0)
            l_pc.append(new_xyz)
            l_feats.append(new_feats)

        # PointNet++ decoder (deepest level first, reference
        # segnet_sapien.py:67-70).
        n_fp = len(arch.fp_mlps)
        for i in range(-1, -(n_fp + 1), -1):
            l_feats[i - 1] = FPModule(
                mlp=arch.fp_mlps[i], norm=norm, name=f"fp{n_fp + i}"
            )(l_pc[i - 1], l_pc[i], l_feats[i - 1], l_feats[i])

        # MaskFormer head on the deepest features.
        slot = MaskFormerHead(
            n_slot=self.n_slot,
            input_dim=l_feats[-1].shape[-1],
            n_transformer_layer=self.n_transformer_layer,
            transformer_embed_dim=self.transformer_embed_dim,
            transformer_n_head=8,
            transformer_hidden_dim=self.transformer_embed_dim,
            input_pos_enc=self.transformer_input_pos_enc,
            name="mf_head",
        )(l_feats[-1], l_pc[-1])

        slot = PointwiseConv(self.transformer_embed_dim, norm=norm, name="object_mlp0")(slot)
        slot = PointwiseConv(64, norm=None, act=False, name="object_mlp1")(slot)

        # Cosine-similarity mask with temperature 0.05
        # (segnet_sapien.py:77-80).  Head math in f32 regardless of the
        # compute dtype: the mask is the model's contract with losses and
        # metrics (temperature-0.05 softmax is precision-sensitive).
        feats0 = l_feats[0].astype(jnp.float32)
        slot = slot.astype(jnp.float32)
        feats_n = feats0 / jnp.linalg.norm(feats0, axis=-1, keepdims=True).clip(1e-12)
        slot_n = slot / jnp.linalg.norm(slot, axis=-1, keepdims=True).clip(1e-12)
        logits = jnp.einsum(
            "bnd,bkd->bnk", feats_n, slot_n,
            precision=jax.lax.Precision.HIGHEST,
        ) / 0.05
        return jax.nn.softmax(logits, axis=-1)
