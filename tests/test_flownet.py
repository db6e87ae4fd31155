"""FlowStep3D model + flow loss tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ogc_tpu.models.flownet import FlowStep3D
from ogc_tpu.losses.flow_unsup import (
    FlowLossConfig,
    chamfer_loss,
    flowstep3d_loss,
)


@pytest.fixture(scope="module")
def tiny_flownet():
    model = FlowStep3D(npoint=64, arch="sapien")
    rng = np.random.RandomState(0)
    pc1 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    pc2 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pc1, pc2, pc1, pc2, 2)
    return model, variables, pc1, pc2


def test_flownet_output_shapes(tiny_flownet):
    model, variables, pc1, pc2 = tiny_flownet
    flows, _ = model.apply(
        variables, pc1, pc2, pc1, pc2, 3, mutable=["batch_stats"]
    )
    assert len(flows) == 3
    for f in flows:
        assert f.shape == (2, 64, 3)
        assert np.isfinite(np.asarray(f)).all()


def test_flownet_eval_mode_no_stats_update(tiny_flownet):
    model, variables, pc1, pc2 = tiny_flownet
    flows = model.apply(variables, pc1, pc2, pc1, pc2, 2, train=False)
    assert len(flows) == 2


def test_flownet_has_batch_stats(tiny_flownet):
    _, variables, _, _ = tiny_flownet
    assert "batch_stats" in variables


def test_flownet_grads_finite(tiny_flownet):
    model, variables, pc1, pc2 = tiny_flownet
    params = variables["params"]
    stats = variables["batch_stats"]
    cfg = FlowLossConfig(iters_w=(0.5, 0.3))

    def loss_fn(p):
        flows, _ = model.apply(
            {"params": p, "batch_stats": stats},
            pc1, pc2, pc1, pc2, 2, mutable=["batch_stats"],
        )
        loss, _ = flowstep3d_loss(pc1, pc2, flows, cfg)
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_flownet_kitti_arch_builds():
    model = FlowStep3D(npoint=128, arch="kitti")
    rng = np.random.RandomState(1)
    pc = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pc, pc, pc, pc, 2)
    flows, _ = model.apply(variables, pc, pc, pc, pc, 2, mutable=["batch_stats"])
    assert flows[-1].shape == (1, 128, 3)


def test_chamfer_zero_for_perfect_flow():
    rng = np.random.RandomState(2)
    pc1 = jnp.asarray(rng.rand(1, 50, 3).astype(np.float32))
    shift = jnp.asarray(np.array([0.5, 0, 0], np.float32))
    pc2 = pc1 + shift
    flow = jnp.broadcast_to(shift, pc1.shape)
    assert float(chamfer_loss(pc1, pc2, flow)) < 1e-6
    assert float(chamfer_loss(pc1, pc2, jnp.zeros_like(flow))) > 0.1


def test_scan_matches_unrolled(tiny_flownet):
    """The nn.scan refinement loop must reproduce the unrolled loop.

    Eval mode is compared at float-noise tolerance.  Train mode is compared
    at the model's measured conditioning floor: with batch-stat
    normalization at random init, the unrolled model itself amplifies a
    1e-7 input perturbation to ~4e-4 at the first refinement output (and
    chaotically beyond through neighbor-set flips), so train-mode scan vs
    unrolled can only agree to that level — same math, different XLA
    reduction order."""
    model, variables, pc1, pc2 = tiny_flownet
    model_unroll = FlowStep3D(npoint=64, arch="sapien", unroll_refine=True)

    # Train mode, single refinement step: agree to the conditioning floor;
    # updated batch stats agree tightly (they are means over large axes).
    f_scan, v_scan = model.apply(
        variables, pc1, pc2, pc1, pc2, 2, mutable=["batch_stats"]
    )
    f_unr, v_unr = model_unroll.apply(
        variables, pc1, pc2, pc1, pc2, 2, mutable=["batch_stats"]
    )
    np.testing.assert_array_equal(np.asarray(f_scan[0]), np.asarray(f_unr[0]))
    np.testing.assert_allclose(np.asarray(f_scan[1]), np.asarray(f_unr[1]),
                               atol=5e-3)
    stats_close = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-3, atol=1e-4),
        v_scan["batch_stats"], v_unr["batch_stats"],
    )
    assert all(jax.tree_util.tree_leaves(stats_close))

    # Eval mode (batch_stats broadcast in the scan): float-noise tolerance
    # across all 3 predictions.
    e_scan = model.apply(variables, pc1, pc2, pc1, pc2, 3, train=False)
    e_unr = model_unroll.apply(variables, pc1, pc2, pc1, pc2, 3, train=False)
    for a, b in zip(e_scan, e_unr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_split_grouped_dense_matches_fused_path():
    """bf16 compute routes grouped SA stacks through the raw-gather split
    form (first Dense on the raw gather + per-point center correction);
    outputs must match the fused (rel_xyz || feat) path to bf16 tolerance
    and the param tree must be identical."""
    import numpy as np

    from ogc_tpu.nn import flowstep3d as F
    from ogc_tpu.nn.layers import set_compute_dtype
    from ogc_tpu import ops

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(30.0 * rng.rand(2, 256, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32))
    m = F.FlowSAModule(npoint=128, nsample=8, mlp=(32, 32), radius=None)

    set_compute_dtype(jnp.float32)
    p32 = m.init(jax.random.PRNGKey(0), xyz, feat)
    # Perturb the running statistics so the eval-mode BN (and its folded
    # affine) is a non-trivial transform, not the init identity.
    import flax

    p32 = flax.core.unfreeze(p32)
    p32["batch_stats"] = jax.tree_util.tree_map(
        lambda x: x + 0.25 * jnp.abs(jnp.asarray(
            np.random.RandomState(7).randn(*x.shape), x.dtype
        )),  # abs: running var must stay positive
        p32["batch_stats"],
    )
    (_, ref_out, _), _ = m.apply(
        p32, xyz, feat, train=False, mutable=["batch_stats"]
    )

    set_compute_dtype(jnp.bfloat16)
    try:
        p16 = m.init(jax.random.PRNGKey(0), xyz, feat)
        assert jax.tree_util.tree_structure(p32) == \
            jax.tree_util.tree_structure(p16)
        assert jax.tree_util.tree_map(lambda a: a.shape, p32) == \
            jax.tree_util.tree_map(lambda a: a.shape, p16)
        # train=True: the raw-gather SPLIT path (eval routes to the
        # source-projected fold path, tested separately below).
        (_, split_out, _), _ = m.apply(
            p32, xyz, feat, train=True, mutable=["batch_stats"]
        )
        # train=False: the source-projected FOLD path (first Dense +
        # eval-BN affine applied to the source points before the gather).
        (_, fold_out, _), _ = m.apply(
            p32, xyz, feat, train=False, mutable=["batch_stats"]
        )

        orig = F.FlowSAModule._grouped_inputs

        def fused_only(self, xyz, new_xyz, idx, features, train=True):
            grouped, _ = ops.group_with_idx(
                xyz, new_xyz, idx, features, use_xyz=self.use_xyz
            )
            return grouped, None, None

        F.FlowSAModule._grouped_inputs = fused_only
        try:
            (_, fused_out, _), _ = m.apply(
                p32, xyz, feat, train=True, mutable=["batch_stats"]
            )
        finally:
            F.FlowSAModule._grouped_inputs = orig
    finally:
        set_compute_dtype(jnp.float32)

    ref, sp, fu, fo = map(
        np.asarray, (ref_out, split_out, fused_out, fold_out)
    )
    scale = np.sqrt((ref**2).mean())
    # Split runs the first layer in f32-HIGH: close to the bf16 fused path
    # (both in train mode -> batch statistics; only float rounding differs).
    assert np.abs(sp - fu).max() < 0.1
    # Fold path (eval): f32-HIGH source projection, one bf16 rounding of the
    # normalized activations — a few percent of output scale at most.
    rms_fo = np.sqrt(((fo - ref) ** 2).mean())
    assert rms_fo < 0.03 * max(scale, 1e-6), (rms_fo, scale)


def test_flow_embedding_split_bf16_close_to_f32():
    """bf16 FlowEmbedding applies the first layer by kernel column blocks
    (raw-gather + per-point feat1/pos1 terms); must stay close to the f32
    fused path with an identical param tree."""
    import numpy as np

    from ogc_tpu.nn.flowstep3d import FlowEmbedding
    from ogc_tpu.nn.layers import set_compute_dtype

    rng = np.random.RandomState(3)
    p1 = jnp.asarray(30.0 * rng.rand(2, 128, 3).astype(np.float32))
    p2 = jnp.asarray(p1 + 0.1 * rng.randn(2, 128, 3).astype(np.float32))
    f1 = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    m = FlowEmbedding(radius=1.0, nsample=8, mlp=(32, 32))

    p32 = m.init(jax.random.PRNGKey(0), p1, p2, f1, f2)
    (_, ref), _ = m.apply(p32, p1, p2, f1, f2, train=False,
                          mutable=["batch_stats"])
    set_compute_dtype(jnp.bfloat16)
    try:
        p16 = m.init(jax.random.PRNGKey(0), p1, p2, f1, f2)
        assert jax.tree_util.tree_structure(p32) == \
            jax.tree_util.tree_structure(p16)
        # identical init values too (path-derived RNG)
        for a, b in zip(jax.tree_util.tree_leaves(p32),
                        jax.tree_util.tree_leaves(p16)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        (_, out), _ = m.apply(p32, p1, p2, f1, f2, train=False,
                              mutable=["batch_stats"])
    finally:
        set_compute_dtype(None)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d.max() < 0.25 and d.mean() < 0.02, (d.max(), d.mean())


def test_nested_frozen_eval_close_to_exact_mode():
    """Default (approximate) eval mode adds two gated deviations on top of
    approx-KNN: nested FPS (math-exact, slice instead of re-sample) and a
    frozen refinement self-KNN graph.  On CPU approx KNN lowers to exact, so
    exact-mode vs default-mode eval isolates exactly those two — the flow
    fields must agree to ~1e-2 of the flow scale."""
    from ogc_tpu import ops

    model = FlowStep3D(npoint=128, arch="sapien", k_decay_fact=0.5)
    rng = np.random.RandomState(3)
    pc1 = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    pc2 = jnp.asarray(pc1 + 0.05 * rng.randn(2, 128, 3).astype(np.float32))
    try:
        ops.set_exact_neighbors(True)
        variables = model.init(jax.random.PRNGKey(0), pc1, pc2, pc1, pc2, 2)
        f_exact = np.asarray(
            model.apply(variables, pc1, pc2, pc1, pc2, 4, train=False)[-1]
        )
        ops.set_exact_neighbors(False)
        f_fast = np.asarray(
            model.apply(variables, pc1, pc2, pc1, pc2, 4, train=False)[-1]
        )
    finally:
        ops.set_exact_neighbors(False)
    scale = np.abs(f_exact).max() + 1e-6
    assert np.abs(f_exact - f_fast).max() / scale < 2e-2
