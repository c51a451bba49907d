"""Brute-force numpy oracles for the geometry ops (float64, explicit loops).

These mirror the semantics of the reference CUDA kernels directly from their
source (see mvp_benchmark_tpu/ops/jnp_ref.py docstrings for citations) and are
deliberately written in the dumbest possible way.
"""

import numpy as np


def pairwise_sqdist(a, b):
    """(N,3),(M,3) -> (N,M) exact squared distances in float64."""
    d = a[:, None, :].astype(np.float64) - b[None, :, :].astype(np.float64)
    return np.sum(d * d, axis=-1)


def chamfer_np(a, b):
    """Batched chamfer oracle. a(B,N,3), b(B,M,3)."""
    B = a.shape[0]
    d1 = np.zeros((B, a.shape[1]))
    d2 = np.zeros((B, b.shape[1]))
    i1 = np.zeros((B, a.shape[1]), np.int32)
    i2 = np.zeros((B, b.shape[1]), np.int32)
    for k in range(B):
        P = pairwise_sqdist(a[k], b[k])
        d1[k] = P.min(1)
        i1[k] = P.argmin(1)
        d2[k] = P.min(0)
        i2[k] = P.argmin(0)
    return d1, d2, i1, i2


def fps_np(xyz, m):
    """FPS oracle: start at 0, running min-dist buffer, argmax each step."""
    B, N, _ = xyz.shape
    out = np.zeros((B, m), np.int32)
    for k in range(B):
        dists = np.full(N, 1e10)
        last = 0
        for j in range(1, m):
            d = np.sum((xyz[k] - xyz[k, last]) ** 2, axis=-1)
            dists = np.minimum(dists, d)
            last = int(np.argmax(dists))
            out[k, j] = last
    return out


def ball_query_np(min_r, max_r, nsample, xyz, centers):
    """Ball query oracle with first-hit-fill semantics."""
    B, N, _ = xyz.shape
    M = centers.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    for b in range(B):
        for i in range(M):
            cnt = 0
            for k in range(N):
                d2 = float(np.sum((centers[b, i] - xyz[b, k]) ** 2))
                if d2 == 0.0 or (min_r**2 <= d2 < max_r**2):
                    if cnt == 0:
                        idx[b, i, :] = k
                    idx[b, i, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def knn_np(query, points, k):
    """kNN oracle: indices of k smallest distances (stable ascending order)."""
    B, M, _ = query.shape
    idx = np.zeros((B, M, k), np.int64)
    dist = np.zeros((B, M, k))
    for b in range(B):
        P = pairwise_sqdist(query[b], points[b])
        order = np.argsort(P, axis=1, kind="stable")[:, :k]
        idx[b] = order
        dist[b] = np.take_along_axis(P, order, axis=1)
    return dist, idx
