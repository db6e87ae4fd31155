"""Unsupervised FlowStep3D losses: bidirectional nearest-neighbor Chamfer and
local flow smoothness, weighted per refinement iteration.

Parity with reference losses/flow_loss_unsup.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ogc_tpu import ops

Array = jax.Array


def chamfer_loss(pc1: Array, pc2: Array, flow: Array, loss_norm: int = 2) -> Array:
    """Bidirectional 1-NN Chamfer between warped pc1 and pc2
    (flow_loss_unsup.py:7-35)."""
    warped = pc1 + flow
    # The searches take stop_gradient'ed inputs: neighbor INDICES are
    # piecewise-constant in the warp (the reference's CUDA knn is likewise
    # index-only, flow_loss_unsup.py:16-24), and a param-dependent search
    # input would route tangents into the Pallas flash kernel, which has
    # no JVP rule (surfaced by tools/bench_train_flow.py at 8192 pts —
    # sub-1024 clouds take the XLA path and hid this).  Gradients flow
    # through `warped` in the distance terms exactly as before.
    warped_ng = jax.lax.stop_gradient(warped)
    _, idx1 = ops.knn(1, warped_ng, pc2)
    nn1 = ops.group(pc2, jax.lax.stop_gradient(idx1))[:, :, 0, :]
    dist1 = jnp.linalg.norm(warped - nn1, ord=loss_norm, axis=-1)
    _, idx2 = ops.knn(1, pc2, warped_ng)
    nn2 = ops.group(warped, jax.lax.stop_gradient(idx2))[:, :, 0, :]
    dist2 = jnp.linalg.norm(pc2 - nn2, ord=loss_norm, axis=-1)
    return jnp.mean(dist1 + dist2)


def knn_flow_smooth(pc: Array, flow: Array, k: int, radius: float,
                    loss_norm: int = 1, symmetric_grad: bool = False) -> Array:
    """KNN flow smoothness with radius clamp (flow_loss_unsup.py:38-62)."""
    dist, idx = ops.knn(k, pc, pc)
    nearest = idx[..., :1]
    idx = jax.lax.stop_gradient(jnp.where(dist > radius, nearest, idx))
    if symmetric_grad:
        # Scatter-free backward under the symmetric-graph assumption
        # (losses/seg_unsup.py::_sym_grad_discrepancy — same math over the
        # 3 flow channels); opt-in, see OGCLossConfig.symmetric_smooth_grad.
        from ogc_tpu.losses.seg_unsup import _sym_grad_discrepancy

        return _sym_grad_discrepancy(flow, idx, loss_norm)
    nn_flow = ops.group(flow, idx)  # (B, N, k, 3)
    diff = flow[:, :, None, :] - nn_flow
    return jnp.mean(jnp.linalg.norm(diff, ord=loss_norm, axis=-1))


def ball_q_flow_smooth(pc: Array, flow: Array, k: int, radius: float,
                       loss_norm: int = 1, symmetric_grad: bool = False) -> Array:
    """Ball-query flow smoothness (flow_loss_unsup.py:65-87)."""
    idx = jax.lax.stop_gradient(ops.ball_query(radius, k, pc, pc))
    if symmetric_grad:
        from ogc_tpu.losses.seg_unsup import _sym_grad_discrepancy

        return _sym_grad_discrepancy(flow, idx, loss_norm)
    nn_flow = ops.group(flow, idx)
    diff = flow[:, :, None, :] - nn_flow
    return jnp.mean(jnp.linalg.norm(diff, ord=loss_norm, axis=-1))


@dataclasses.dataclass(frozen=True)
class FlowLossConfig:
    """Mirrors the reference YAML `loss:` block
    (config/flow/sapien/sapien_unsup.yaml)."""

    weights: Tuple[float, float] = (0.75, 0.25)  # chamfer, smooth
    iters_w: Tuple[float, ...] = (1.0,)
    chamfer_loss_norm: int = 2
    smooth_w_knn: float = 3.0
    smooth_w_ball_q: float = 1.0
    knn_k: int = 4
    knn_radius: float = 0.05
    knn_loss_norm: int = 1
    ball_q_k: int = 8
    ball_q_radius: float = 0.1
    ball_q_loss_norm: int = 1
    # Scatter-free smooth backward (symmetric-graph assumption); opt-in.
    symmetric_smooth_grad: bool = False

    @classmethod
    def from_dict(cls, loss_cfg: dict) -> "FlowLossConfig":
        c = loss_cfg.get("chamfer_loss_params", {})
        s = loss_cfg.get("smooth_loss_params", {})
        kp = s.get("knn_loss_params", {})
        bp = s.get("ball_q_loss_params", {})
        return cls(
            weights=tuple(loss_cfg.get("weights", (0.75, 0.25))),
            iters_w=tuple(loss_cfg.get("iters_w", (1.0,))),
            chamfer_loss_norm=c.get("loss_norm", 2),
            smooth_w_knn=s.get("w_knn", 3.0),
            smooth_w_ball_q=s.get("w_ball_q", 1.0),
            knn_k=kp.get("k", 4),
            knn_radius=kp.get("radius", 0.05),
            knn_loss_norm=kp.get("loss_norm", 1),
            ball_q_k=bp.get("k", 8),
            ball_q_radius=bp.get("radius", 0.1),
            ball_q_loss_norm=bp.get("loss_norm", 1),
            # Extension key (not in reference YAMLs).
            symmetric_smooth_grad=s.get("symmetric_grad", False),
        )


def flow_smooth_loss(pc: Array, flow: Array, cfg: FlowLossConfig) -> Array:
    return cfg.smooth_w_knn * knn_flow_smooth(
        pc, flow, cfg.knn_k, cfg.knn_radius, cfg.knn_loss_norm,
        cfg.symmetric_smooth_grad,
    ) + cfg.smooth_w_ball_q * ball_q_flow_smooth(
        pc, flow, cfg.ball_q_k, cfg.ball_q_radius, cfg.ball_q_loss_norm,
        cfg.symmetric_smooth_grad,
    )


def flowstep3d_loss(
    pc1: Array, pc2: Array, flow_preds: List[Array], cfg: FlowLossConfig
) -> Tuple[Array, Dict[str, Array]]:
    """Per-iteration weighted sum (UnsupervisedFlowStep3DLoss,
    flow_loss_unsup.py:112-140)."""
    assert len(flow_preds) == len(cfg.iters_w), (
        f"{len(flow_preds)} flow iters vs {len(cfg.iters_w)} weights"
    )
    loss_dict: Dict[str, Array] = {}
    total = jnp.float32(0.0)
    for i, flow_pred in enumerate(flow_preds):
        l_ch = chamfer_loss(pc1, pc2, flow_pred, cfg.chamfer_loss_norm)
        l_sm = flow_smooth_loss(pc1, flow_pred, cfg)
        loss_dict[f"chamfer_loss_#{i}"] = l_ch
        loss_dict[f"smooth_loss_#{i}"] = l_sm
        total = total + cfg.iters_w[i] * (
            cfg.weights[0] * l_ch + cfg.weights[1] * l_sm
        )
    loss_dict["sum"] = total
    return total, loss_dict
