"""Jittable LAP solver vs scipy on random matrices (optimal cost must match)."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment as scipy_lsa

from ogc_tpu.utils.lap import linear_sum_assignment


def total_cost(cost, col_ind):
    return cost[np.arange(cost.shape[0]), col_ind].sum()


def test_lap_matches_scipy_minimize():
    rng = np.random.RandomState(42)
    for K in [1, 2, 3, 5, 8, 12, 18]:
        for _ in range(20):
            cost = rng.rand(K, K).astype(np.float32) * 10
            got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
            _, want = scipy_lsa(cost)
            assert sorted(got.tolist()) == list(range(K))  # valid permutation
            np.testing.assert_allclose(
                total_cost(cost, got), total_cost(cost, want), rtol=1e-5
            )


def test_lap_maximize():
    rng = np.random.RandomState(7)
    cost = rng.rand(6, 6).astype(np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost), maximize=True))
    _, want = scipy_lsa(cost, maximize=True)
    np.testing.assert_allclose(total_cost(cost, got), total_cost(cost, want), rtol=1e-5)


def test_lap_batched():
    rng = np.random.RandomState(3)
    cost = rng.rand(4, 8, 8).astype(np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    for b in range(4):
        _, want = scipy_lsa(cost[b])
        np.testing.assert_allclose(
            total_cost(cost[b], got[b]), total_cost(cost[b], want), rtol=1e-5
        )


def test_lap_degenerate_ties():
    cost = np.zeros((5, 5), dtype=np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert sorted(got.tolist()) == list(range(5))


def test_lap_identity_structure():
    cost = (np.ones((4, 4)) - np.eye(4)).astype(np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    np.testing.assert_array_equal(got, np.arange(4))
