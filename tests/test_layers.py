"""GroupStatsNorm must be math- and param-compatible with flax GroupNorm.

The source-projected inference path (nn/pointnet2._FirstConvParams) swaps
flax's nn.GroupNorm for the reshape-free GroupStatsNorm on the gathered
tensors; these tests pin that the swap is invisible — identical parameter
tree and identical outputs (within float tolerance) on the same inputs.
Reference norm semantics: utils/nn_util.py:33-42 (get_norm_layer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ogc_tpu.nn.layers import GroupStatsNorm
import flax.linen as nn


@pytest.mark.parametrize("shape", [(2, 64, 32), (2, 16, 8, 32), (1, 5, 8)])
@pytest.mark.parametrize("groups", [4, 1])
def test_group_stats_norm_matches_flax(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 3.0 + 1.5)

    ref = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    ours = GroupStatsNorm(num_groups=groups, epsilon=1e-5)

    p_ref = ref.init(jax.random.PRNGKey(0), x)
    p_ours = ours.init(jax.random.PRNGKey(0), x)

    # Same parameter tree (shape AND path): checkpoints trained through one
    # implementation must load into the other.
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(
        p_ours
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_ours)):
        assert a.shape == b.shape

    # Non-trivial affine so scale/bias application is covered too.
    params = jax.tree_util.tree_map(
        lambda p: p + jnp.asarray(
            rng.randn(*p.shape).astype(np.float32) * 0.1
        ),
        p_ref,
    )
    y_ref = ref.apply(params, x)
    y_ours = ours.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_ours), rtol=2e-5, atol=2e-5
    )


def test_group_stats_norm_bf16_io_f32_stats():
    """bf16 inputs: output stays bf16, statistics match the f32 reference
    within bf16 resolution."""
    rng = np.random.RandomState(1)
    x32 = rng.randn(2, 128, 16).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)

    ours = GroupStatsNorm(num_groups=4)
    params = ours.init(jax.random.PRNGKey(0), x16)
    y16 = ours.apply(params, x16)
    assert y16.dtype == jnp.bfloat16

    ref = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    y32 = ref.apply(params, jnp.asarray(x32))
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), atol=0.06
    )


def test_group_stats_norm_grad_matches_flax():
    """Backward parity: same cotangents through both implementations."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 16).astype(np.float32))

    ref = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    ours = GroupStatsNorm(num_groups=4, epsilon=1e-5)
    params = ref.init(jax.random.PRNGKey(0), x)

    g_ref = jax.grad(lambda p, x: jnp.sum(jnp.sin(ref.apply(p, x))), argnums=(0, 1))(
        params, x
    )
    g_ours = jax.grad(
        lambda p, x: jnp.sum(jnp.sin(ours.apply(p, x))), argnums=(0, 1)
    )(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ours)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
