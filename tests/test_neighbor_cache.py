"""Regression guards for the shared-KNN optimizations: cached-index paths
must produce identical outputs to the direct KNN paths (exact mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from ogc_tpu import ops
from ogc_tpu.nn.flowstep3d import FlowSAModule


def test_group_with_idx_matches_query_and_group():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 5).astype(np.float32))
    new_xyz = xyz[:, :16]

    want, want_xyz = ops.query_and_group(
        None, 8, xyz, new_xyz, feats, use_xyz=True
    )
    _, idx = ops.knn(8, new_xyz, xyz, exact=True)
    got, got_xyz = ops.group_with_idx(xyz, new_xyz, idx, feats, use_xyz=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_knn_prefix_property():
    # knn(k_small) must equal the first k_small columns of knn(k_large).
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.rand(2, 40, 3).astype(np.float32))
    p = jnp.asarray(rng.rand(2, 80, 3).astype(np.float32))
    _, idx32 = ops.knn(32, q, p, exact=True)
    _, idx4 = ops.knn(4, q, p, exact=True)
    np.testing.assert_array_equal(np.asarray(idx32)[..., :4], np.asarray(idx4))


def test_flow_sa_cached_idx_matches_direct():
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.rand(1, 48, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 48, 6).astype(np.float32))

    mod = FlowSAModule(npoint=48, nsample=4, mlp=(8,))
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats)

    def run(group_idx):
        out, _ = mod.apply(
            variables, xyz, feats, group_idx=group_idx,
            mutable=["batch_stats"],
        )
        return np.asarray(out[1])

    direct = run(None)
    _, idx = ops.knn(16, xyz, xyz, exact=True)
    cached = run(idx)
    np.testing.assert_allclose(cached, direct, atol=1e-5)
