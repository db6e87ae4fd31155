"""Native (C++) component tests: batched LAP and threaded npy reader."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from ogc_tpu.native import lap_lib, lap_solve_batch, loader_lib
from ogc_tpu.native.npy import read_npy_batch


def total_cost(cost, col):
    return cost[np.arange(cost.shape[0]), col].sum()


def test_native_lap_builds():
    assert lap_lib() is not None, "g++ build of lap.cpp failed"


def test_native_lap_matches_scipy():
    rng = np.random.RandomState(0)
    cost = (rng.rand(16, 12, 12) * 10).astype(np.float32)
    got = lap_solve_batch(cost)
    for b in range(16):
        _, want = scipy_lsa(cost[b])
        assert sorted(got[b].tolist()) == list(range(12))
        np.testing.assert_allclose(
            total_cost(cost[b], got[b]), total_cost(cost[b], want), rtol=1e-5
        )


def test_native_lap_maximize():
    rng = np.random.RandomState(1)
    cost = rng.rand(4, 8, 8).astype(np.float32)
    got = lap_solve_batch(cost, maximize=True)
    for b in range(4):
        _, want = scipy_lsa(cost[b], maximize=True)
        np.testing.assert_allclose(
            total_cost(cost[b], got[b]), total_cost(cost[b], want), rtol=1e-5
        )


def test_native_npy_reader(tmp_path):
    assert loader_lib() is not None, "g++ build of loader.cpp failed"
    rng = np.random.RandomState(2)
    arrays, paths = [], []
    for i in range(10):
        a = rng.randn(64, 3).astype(np.float32)
        p = str(tmp_path / f"a{i}.npy")
        np.save(p, a)
        arrays.append(a)
        paths.append(p)
    out = read_npy_batch(paths, n_threads=4)
    np.testing.assert_array_equal(out, np.stack(arrays, 0))
