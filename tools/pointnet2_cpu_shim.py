"""CPU stand-in for the reference's `pointnet2_cuda` extension.

Lets the UNMODIFIED reference PyTorch models run on CPU as a numeric parity
oracle (no CUDA device in this environment).  Each wrapper reproduces the
documented kernel semantics — FPS seeded at index 0 with first-max ties
(sampling_gpu.cu:93-253), KNN ascending with stable ties
(interpolate_gpu.cu:9-57), ball query's strict d2 < r^2 / first-point
padding / empty-ball zeros (ball_query_gpu.cu:9-45) — implemented fresh in
numpy; no reference code is copied.

Usage (inside a torch-only process, BEFORE importing the reference):

    import tools.pointnet2_cpu_shim as shim
    sys.modules["pointnet2_cuda"] = shim
    shim.patch_torch_cuda()          # CPU torch.cuda.*Tensor + no-op .cuda()
    sys.path.insert(0, "/root/reference")
"""

from __future__ import annotations

import numpy as np


def patch_torch_cuda() -> None:
    """Make `torch.cuda.FloatTensor(...)`-style allocations and `.cuda()`
    placement no-ops so the reference models run on CPU."""
    import torch

    class _CPUAlloc:
        def __init__(self, dtype):
            self.dtype = dtype

        def __call__(self, *shape):
            if len(shape) == 1 and not isinstance(shape[0], int):
                return torch.tensor(shape[0], dtype=self.dtype)
            return torch.zeros(shape, dtype=self.dtype)

    torch.cuda.FloatTensor = _CPUAlloc(torch.float32)
    torch.cuda.IntTensor = _CPUAlloc(torch.int32)
    torch.cuda.LongTensor = _CPUAlloc(torch.int64)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def _np(t):
    return t.detach().cpu().numpy()


def _fill(dst, arr):
    import torch

    dst.copy_(torch.from_numpy(np.ascontiguousarray(arr)).to(dst.dtype))


def _d2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 3) x (M, 3) -> (N, M) squared distances, f32 accumulation."""
    diff = a[:, None, :].astype(np.float32) - b[None, :, :].astype(np.float32)
    return np.einsum("nmd,nmd->nm", diff, diff, dtype=np.float32)


def furthest_point_sampling_wrapper(B, N, npoint, xyz, temp, output):
    pts = _np(xyz).astype(np.float32)
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        mind = np.full(N, 1e10, np.float32)
        last = 0
        for i in range(1, npoint):
            d = ((pts[b] - pts[b, last]) ** 2).sum(-1).astype(np.float32)
            mind = np.minimum(mind, d)
            last = int(np.argmax(mind))  # first max wins
            out[b, i] = last
    _fill(output, out)


def gather_points_wrapper(B, C, N, npoint, features, idx, output):
    f = _np(features)
    i = _np(idx).astype(np.int64)
    out = np.take_along_axis(f, i[:, None, :].repeat(C, 1), axis=2)
    _fill(output, out)


def knn_wrapper(B, N, m, k, unknown, known, dist2, idx):
    u, kn = _np(unknown), _np(known)
    d_out = np.zeros((B, N, k), np.float32)
    i_out = np.zeros((B, N, k), np.int32)
    for b in range(B):
        d2 = _d2(u[b], kn[b])
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]
        d_out[b] = np.take_along_axis(d2, order, axis=1)
        i_out[b] = order
    _fill(dist2, d_out)
    _fill(idx, i_out)


def three_nn_wrapper(B, N, m, unknown, known, dist2, idx):
    knn_wrapper(B, N, m, 3, unknown, known, dist2, idx)


def three_interpolate_wrapper(B, c, m, n, features, idx, weight, output):
    f = _np(features)                     # (B, c, m)
    i = _np(idx).astype(np.int64)         # (B, n, 3)
    w = _np(weight).astype(np.float32)    # (B, n, 3)
    g = np.stack([
        np.take_along_axis(f[b], i[b].reshape(1, -1).repeat(c, 0), axis=1)
        .reshape(c, n, 3)
        for b in range(B)
    ])
    _fill(output, np.einsum("bcnk,bnk->bcn", g, w))


def group_points_wrapper(B, C, N, nfeatures, nsample, features, idx, output):
    f = _np(features)                     # (B, C, N)
    i = _np(idx).astype(np.int64)         # (B, nfeatures, nsample)
    out = np.stack([
        np.take_along_axis(
            f[b], i[b].reshape(1, -1).repeat(C, 0), axis=1
        ).reshape(C, nfeatures, nsample)
        for b in range(B)
    ])
    _fill(output, out)


def gather_points_grad_wrapper(B, C, N, npoint, grad_out, idx, grad_features):
    """Scatter-add (B, C, npoint) grads back to (B, C, N) — the shim's
    deterministic equivalent of the atomicAdd backward
    (sampling_gpu.cu:46-83)."""
    g = _np(grad_out)                     # (B, C, npoint)
    i = _np(idx).astype(np.int64)         # (B, npoint)
    out = np.zeros((B, C, N), np.float32)
    for b in range(B):
        np.add.at(out[b], (slice(None), i[b]), g[b])
    _fill(grad_features, out)


def three_interpolate_grad_wrapper(B, c, n, m, grad_out, idx, weight,
                                   grad_features):
    """Backward of three_interpolate: weighted scatter-add of (B, c, n)
    grads into the (B, c, m) source (interpolate_gpu.cu:193-232)."""
    g = _np(grad_out)                     # (B, c, n)
    i = _np(idx).astype(np.int64)         # (B, n, 3)
    w = _np(weight).astype(np.float32)    # (B, n, 3)
    out = np.zeros((B, c, m), np.float32)
    for b in range(B):
        for k in range(3):
            np.add.at(out[b], (slice(None), i[b, :, k]), g[b] * w[b, :, k])
    _fill(grad_features, out)


def group_points_grad_wrapper(B, C, N, npoint, nsample, grad_out, idx,
                              grad_features):
    """Backward of grouping: scatter-add (B, C, npoint, nsample) grads into
    (B, C, N) (group_points_gpu.cu:8-45)."""
    g = _np(grad_out)                     # (B, C, npoint, nsample)
    i = _np(idx).astype(np.int64)         # (B, npoint, nsample)
    out = np.zeros((B, C, N), np.float32)
    for b in range(B):
        np.add.at(out[b], (slice(None), i[b].reshape(-1)),
                  g[b].reshape(C, -1))
    _fill(grad_features, out)


def ball_query_wrapper(B, N, npoint, radius, nsample, new_xyz, xyz, idx):
    centers, pts = _np(new_xyz), _np(xyz)
    out = np.zeros((B, npoint, nsample), np.int32)
    r2 = np.float32(radius) * np.float32(radius)
    for b in range(B):
        d2 = _d2(centers[b], pts[b])      # (npoint, N)
        for p in range(npoint):
            inside = np.nonzero(d2[p] < r2)[0]
            if inside.size == 0:
                continue
            take = inside[:nsample]
            row = np.full(nsample, take[0], np.int32)
            row[: take.size] = take
            out[b, p] = row
    _fill(idx, out)
