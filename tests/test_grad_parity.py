"""Executed GRADIENT parity against the unmodified PyTorch reference.

Round-1 parity was forward-only (VERDICT #2): this closes the training-signal
hole.  tools/torch_golden_gen.py {seg_grad,flow_grad} runs the reference
model + unsupervised loss + loss.backward() on CPU (pointnet2_cpu_shim, its
own process — torch and JAX must not share one) and saves loss values AND
parameter gradients; here the same weights/inputs go through the flax models
and jax.grad of the fused losses, and every parameter's gradient is compared
leaf-by-leaf.

This exercises the full backward stack: Kabsch/SVD differentiation with the
reflection fix (losses/seg_loss_unsup.py:10-61 reference), detached
transformed clouds (:91), the in-graph Hungarian invariance match vs scipy
(:234-237), KNN/ball-query smooth-loss scatter-add grads, and the flow
Chamfer/smooth backward through the recurrent GRU (train_flow.py:59-91).
Exact-neighbor mode throughout.  Skips when /root/reference is absent.
"""

import os.path as osp
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF), reason="reference repo not available"
)


def _gen(mode, out, extra=()):
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "torch_golden_gen.py"),
         mode, out, "--ref_root", REF, *extra],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    if r.returncode != 0:
        pytest.skip(f"golden generation failed: {r.stderr[-800:]}")


@pytest.fixture(scope="module")
def exact_neighbors():
    from ogc_tpu import ops

    ops.set_exact_neighbors(True)
    yield
    ops.set_exact_neighbors(False)


def _compare_grad_trees(jax_tree, ref_tree, rtol=3e-3, atol_frac=2e-5):
    """Leaf-wise gradient comparison: relative Frobenius error per leaf plus
    a global cosine similarity.  atol floor scales with the global gradient
    magnitude (tiny leaves carry float noise from either stack)."""
    j_leaves = jax.tree_util.tree_leaves_with_path(jax_tree)
    r_flat = jax.tree_util.tree_leaves(ref_tree)
    assert len(j_leaves) == len(r_flat)
    j_all = np.concatenate([np.ravel(np.asarray(l)) for _, l in j_leaves])
    r_all = np.concatenate([np.ravel(np.asarray(l)) for l in r_flat])
    gscale = np.sqrt((r_all**2).mean()) + 1e-12
    cos = (j_all @ r_all) / (
        np.linalg.norm(j_all) * np.linalg.norm(r_all) + 1e-30
    )
    assert cos > 0.9999, f"global grad cosine {cos}"
    bad = []
    for (path, jl), rl in zip(j_leaves, r_flat):
        jl, rl = np.asarray(jl), np.asarray(rl)
        err = np.linalg.norm(jl - rl)
        ref = np.linalg.norm(rl)
        if err > rtol * ref + atol_frac * gscale * np.sqrt(jl.size):
            bad.append((jax.tree_util.keystr(path), err, ref))
    assert not bad, f"{len(bad)} leaves off: {bad[:6]}"


def _loss_cfg():
    from ogc_tpu.losses.seg_unsup import OGCLossConfig

    # config/seg/sapien/sapien_unsup.yaml loss params, start_steps ungated.
    # Reference-semantics smooth graph, pinned explicitly (it is also the
    # r5 framework default — the mutual graph is opt-in now, PARITY.md 9b).
    return OGCLossConfig(
        weights=(10.0, 0.1, 0.1), start_steps=(0, 0, 0),
        dynamic_loss_norm=2, smooth_w_knn=3.0, smooth_w_ball_q=1.0,
        knn_k=8, knn_radius=0.1, knn_loss_norm=1,
        ball_q_k=16, ball_q_radius=0.2, ball_q_loss_norm=1,
        invariance_loss_norm=2, smooth_graph="reference",
    )


@pytest.mark.parametrize(
    "mode,aug",
    [
        ("seg_grad", False), ("seg_grad", True),
        # The Waymo trainer's own loss copy (train_seg_waymo.py:244-334):
        # 1-frame backward-flow input / 2 augmented views with invariance
        # pair (0, 1) — ogc_loss covers it through the same n_frames
        # plumbing, so the comparison body is shared.
        ("seg_waymo_grad", False), ("seg_waymo_grad", True),
    ],
    ids=["2frame", "4frame_aug", "waymo_1frame", "waymo_2frame_aug"],
)
def test_seg_unsup_loss_grad_parity(tmp_path_factory, exact_neighbors, mode,
                                    aug):
    out = str(tmp_path_factory.mktemp("golden") / f"{mode}{aug}.npz")
    _gen(mode, out, ("--aug",) if aug else ())
    z = np.load(out)
    state = {k[2:]: z[k] for k in z.files if k.startswith("w/")}
    grads = {k[2:]: z[k] for k in z.files if k.startswith("g/")}

    from ogc_tpu.losses.seg_unsup import ogc_loss
    from ogc_tpu.models.segnet import MaskFormer3D
    from ogc_tpu.utils.torch_interop import segnet_params_from_torch

    pcs = jnp.asarray(z["pcs"])     # (B, T, N, 3)
    flows = jnp.asarray(z["flows"])
    B, T, N, _ = pcs.shape
    model = MaskFormer3D(n_slot=8, n_point=N, arch="sapien",
                         n_transformer_layer=2, transformer_embed_dim=128)
    params = segnet_params_from_torch(
        state, model.init(jax.random.PRNGKey(0), pcs[:, 0], pcs[:, 0])
    )
    cfg = _loss_cfg()

    def loss_fn(p):
        flat = pcs.reshape(B * T, N, 3)
        masks = model.apply(p, flat, flat).reshape(B, T, N, -1)
        loss, ld = ogc_loss(
            [pcs[:, t] for t in range(T)],
            [masks[:, t] for t in range(T)],
            [flows[:, t] for t in range(T)],
            cfg, step_w=False, it=0, aug_transform=aug,
        )
        return loss, ld

    if aug:
        # The invariance Hungarian is DEGENERATE on random-weight masks:
        # most slot pairs never overlap (IoU 0), so many assignments tie at
        # the optimum and scipy's tie-break is implementation-defined while
        # the loss value depends on the pick.  For the gradient comparison,
        # inject the reference's recorded permutations; our own LAP's equal
        # optimality is asserted below.
        import ogc_tpu.losses.seg_unsup as SL

        ref_perms = [jnp.asarray(z[f"perm{i}"])
                     for i in range(int(z["n_perms"]))]
        our_perms, iou_mats = [], []
        orig_match = SL.match_mask_by_iou

        def capture_match(m1, m2):
            p = orig_match(m1, m2)
            our_perms.append(np.asarray(jax.lax.stop_gradient(p)))
            seg1 = np.asarray(jnp.argmax(m1, -1))
            seg2 = np.asarray(jnp.argmax(m2, -1))
            K = m1.shape[-1]
            oh1 = np.eye(K, dtype=np.float64)[seg1]
            oh2 = np.eye(K, dtype=np.float64)[seg2]
            inter = np.einsum("bng,bnp->bgp", oh1, oh2)
            union = oh1.sum(1)[..., None] + oh2.sum(1)[:, None, :] - inter
            iou_mats.append(inter / np.maximum(union, 1e-10))
            return p

        SL.match_mask_by_iou = capture_match
        try:
            loss_fn(params)  # record our LAP's choices + the IoU matrices
        finally:
            SL.match_mask_by_iou = orig_match

        # Equal optimality: our in-graph LAP must attain the same total IoU
        # as scipy on every matrix (assignments may differ among ties).
        assert len(our_perms) == len(ref_perms)
        for ours, ref, iou in zip(our_perms, ref_perms, iou_mats):
            np.testing.assert_allclose(
                np.einsum("bgp,bgp->b", iou, ours.astype(np.float64)),
                np.einsum("bgp,bgp->b", iou, np.asarray(ref, np.float64)),
                rtol=1e-9, atol=1e-9,
            )

        perm_iter = iter(ref_perms)
        SL.match_mask_by_iou = lambda m1, m2: next(perm_iter)
        try:
            (loss, ld), jgrads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
        finally:
            SL.match_mask_by_iou = orig_match
    else:
        (loss, ld), jgrads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    # Loss values: total and per-term.
    np.testing.assert_allclose(float(loss), float(z["loss"]), rtol=1e-4)
    for term in ("dynamic", "smooth"):
        np.testing.assert_allclose(
            float(ld[term]), float(z[f"ld/{term}"]), rtol=1e-3,
            err_msg=term,
        )
    if aug:
        np.testing.assert_allclose(
            float(ld["invariance"]), float(z["ld/invariance"]), rtol=1e-3
        )

    # Gradients: map the torch grads through the SAME interop mapping the
    # weights use (per-tensor transposes — linear, so valid for grads).
    state_g = {k: grads.get(k, np.zeros_like(v)) for k, v in state.items()}
    ref_gtree = segnet_params_from_torch(
        state_g, jax.tree_util.tree_map(np.zeros_like, params)
    )
    _compare_grad_trees(jgrads["params"], ref_gtree["params"])


@pytest.mark.slow
def test_flow_unsup_loss_grad_parity(tmp_path_factory, exact_neighbors):
    out = str(tmp_path_factory.mktemp("golden") / "flow_grad.npz")
    _gen("flow_grad", out)
    z = np.load(out)
    state = {k[2:]: z[k] for k in z.files if k.startswith("w/")}
    grads = {k[2:]: z[k] for k in z.files if k.startswith("g/")}

    from ogc_tpu.losses.flow_unsup import FlowLossConfig, flowstep3d_loss
    from ogc_tpu.models.flownet import FlowStep3D
    from ogc_tpu.utils.torch_interop import flownet_variables_from_torch

    pc1, pc2 = jnp.asarray(z["pc1"]), jnp.asarray(z["pc2"])
    model = FlowStep3D(npoint=pc1.shape[1], arch="sapien", loc_flow_nn=8,
                       loc_flow_rad=0.1, k_decay_fact=1.0)
    variables = flownet_variables_from_torch(
        state, model.init(jax.random.PRNGKey(0), pc1, pc2, pc1, pc2, 2)
    )
    # 2 iterations to stay on the non-chaotic side of the recurrence (see
    # tools/torch_golden_gen.py flow_grad note).
    cfg = FlowLossConfig(
        weights=(0.75, 0.25), iters_w=(0.5, 0.3),
        chamfer_loss_norm=2, smooth_w_knn=3.0, smooth_w_ball_q=1.0,
        knn_k=4, knn_radius=0.05, knn_loss_norm=1,
        ball_q_k=8, ball_q_radius=0.1, ball_q_loss_norm=1,
    )

    def loss_fn(p):
        flow_preds, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            pc1, pc2, pc1, pc2, 2, train=True, mutable=["batch_stats"],
        )
        loss, ld = flowstep3d_loss(pc1, pc2, flow_preds, cfg)
        return loss, ld

    (loss, ld), jgrads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    np.testing.assert_allclose(float(loss), float(z["loss"]), rtol=2e-4)

    state_g = {k: grads.get(k, np.zeros_like(v)) for k, v in state.items()}
    ref_gtree = flownet_variables_from_torch(
        state_g, jax.tree_util.tree_map(np.zeros_like, variables)
    )
    # Per-leaf tolerance is looser than the seg test: even at 2 iterations a
    # handful of near-tied KNN neighbors on the warped cloud resolve
    # differently between the two stacks (forward diff 1.4e-4 by iter 1),
    # rerouting a small part of the gradient.  The global cosine check
    # (> 0.9999) still pins the training signal.
    _compare_grad_trees(jgrads, ref_gtree["params"], rtol=0.05)
