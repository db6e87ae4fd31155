"""OA-ICP + voting tests on synthetic rigid scenes."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from ogc_tpu.refine.oa_icp import object_aware_icp, weighted_kabsch
from ogc_tpu.refine.vote import mask_voting, match_mask_by_cost
from ogc_tpu.metrics.flow import eval_flow


def make_two_object_scene(rng, n=128):
    pc1 = rng.rand(n, 3).astype(np.float32)
    segm = (rng.rand(n) > 0.5).astype(np.int32)
    flow = np.zeros_like(pc1)
    for k in range(2):
        R = Rotation.from_euler("zyx", rng.uniform(-20, 20, 3), degrees=True).as_matrix()
        t = rng.uniform(-0.2, 0.2, 3)
        sel = segm == k
        flow[sel] = pc1[sel] @ R.T.astype(np.float32) + t.astype(np.float32) - pc1[sel]
    pc2 = pc1 + flow
    return pc1, pc2, segm, flow


def test_weighted_kabsch_rigidifies_noisy_flow():
    rng = np.random.RandomState(0)
    pc1, pc2, segm, flow = make_two_object_scene(rng)
    mask = np.eye(2, dtype=np.float32)[segm][None]
    noisy = flow[None] + 0.02 * rng.randn(1, *flow.shape).astype(np.float32)
    out = np.asarray(
        weighted_kabsch(jnp.asarray(pc1[None]), jnp.asarray(noisy), jnp.asarray(mask))
    )
    epe_noisy = np.linalg.norm(noisy[0] - flow, axis=-1).mean()
    epe_rigid = np.linalg.norm(out[0] - flow, axis=-1).mean()
    assert epe_rigid < epe_noisy


def test_oa_icp_improves_noisy_flow():
    rng = np.random.RandomState(1)
    pc1, pc2, segm, flow = make_two_object_scene(rng)
    mask = np.eye(2, dtype=np.float32)[segm][None]
    noisy = flow[None] + 0.03 * rng.randn(1, *flow.shape).astype(np.float32)
    out = np.asarray(
        object_aware_icp(
            jnp.asarray(pc1[None]), jnp.asarray(pc2[None]), jnp.asarray(noisy),
            jnp.asarray(mask), jnp.asarray(mask), icp_iter=10,
        )
    )
    epe0, *_ = eval_flow(flow[None], noisy, epe_norm_thresh=0.01)
    epe1, *_ = eval_flow(flow[None], out, epe_norm_thresh=0.01)
    assert epe1 < epe0
    assert epe1 < 0.01


def test_match_mask_by_cost_recovers_permutation():
    rng = np.random.RandomState(2)
    m = jax.nn.softmax(jnp.asarray(5 * rng.randn(60, 4).astype(np.float32)), -1)
    perm = np.asarray([3, 1, 0, 2])
    m2 = m[:, perm]
    out = np.asarray(match_mask_by_cost(m, m2))
    np.testing.assert_allclose(out, np.asarray(m), atol=1e-5)


def test_mask_voting_denoises():
    # 3 frames of the same static scene; frame 1's mask is corrupted.
    rng = np.random.RandomState(3)
    n = 96
    pc0 = rng.rand(n, 3).astype(np.float32)
    pc = np.stack([pc0, pc0, pc0], 0)
    segm = (pc0[:, 0] > 0.5).astype(np.int32)
    clean = np.eye(2, dtype=np.float32)[segm]
    clean = np.clip(clean, 0.05, 0.95)
    clean = clean / clean.sum(-1, keepdims=True)
    corrupt = clean[::-1].copy()  # scrambled wrt geometry
    mask = np.stack([clean, corrupt, clean], 0)
    flows = np.zeros((2, 2, n, 3), np.float32)

    voted = np.asarray(
        mask_voting(jnp.asarray(pc), jnp.asarray(mask), jnp.asarray(flows),
                    time_window_size=2)
    )
    # Frame-1 prediction accuracy must improve after voting.
    acc_before = (mask[1].argmax(-1) == segm).mean()
    acc_after = (voted[1].argmax(-1) == segm).mean()
    assert acc_after > acc_before


def test_blockwise_oa_icp_matches_dense():
    """The streaming (tile-chunked) OA-ICP must match the dense (N, N) path
    to float tolerance (same math, different summation order)."""
    rng = np.random.RandomState(3)
    pc1, pc2, segm, flow = make_two_object_scene(rng, n=200)
    mask = np.eye(2, dtype=np.float32)[segm][None]
    noisy = flow[None] + 0.03 * rng.randn(1, *flow.shape).astype(np.float32)
    args = (jnp.asarray(pc1[None]), jnp.asarray(pc2[None]),
            jnp.asarray(noisy), jnp.asarray(mask), jnp.asarray(mask))
    out_dense = np.asarray(object_aware_icp(*args, icp_iter=5, dense=True))
    out_block = np.asarray(
        object_aware_icp(*args, icp_iter=5, dense=False, tile=64)
    )
    np.testing.assert_allclose(out_block, out_dense, rtol=1e-4, atol=1e-5)


def test_blockwise_vote_matches_dense_reference():
    """warp_mask_chain (telescoped normalization, streaming matvecs) must
    match the dense collect_correspondences transitive products."""
    from ogc_tpu.refine.vote import collect_correspondences, warp_mask_chain

    rng = np.random.RandomState(4)
    T, N, K = 4, 96, 3
    pc = jnp.asarray(rng.rand(T, N, 3).astype(np.float32))
    flows = jnp.asarray(0.05 * rng.randn(T - 1, 2, N, 3).astype(np.float32))
    mask = jnp.asarray(rng.dirichlet(np.ones(K), size=(T, N)).astype(np.float32))

    corrs = collect_correspondences(pc, flows)
    for t, v in [(0, 1), (1, 0), (0, 2), (3, 1), (0, 3)]:
        dense = np.asarray(
            jnp.einsum("mn,nk->mk", corrs[f"{t}_{v}"], mask[v])
        )
        block = np.asarray(warp_mask_chain(pc, flows, t, v, mask[v], tile=32))
        np.testing.assert_allclose(block, dense, rtol=2e-4, atol=2e-5,
                                   err_msg=f"chain {t}->{v}")
