"""Feasibility: Morton-sorted windowed gathers for VRCNet SA modules.

For Morton-sorted clouds, what window width W covers a (TM)-query tile's
k=16 exact-kNN neighbour indices? Report per-tile spread percentiles and
tile-overflow probability for candidate W at each SKN level size.
"""
import numpy as np


def morton3(p, bits=10):
    # p in [0,1)^3 -> interleaved morton code
    q = np.minimum((p * (1 << bits)).astype(np.uint64), (1 << bits) - 1)
    code = np.zeros(p.shape[0], np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + d)
    return code


def knn_idx(p, k):
    d = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    return np.argpartition(d, k, axis=1)[:, :k]


def study(N, k=16, TM=256, trials=3, dist="uniform"):
    rng = np.random.default_rng(0)
    spreads = []
    for t in range(trials):
        if dist == "uniform":
            p = rng.random((N, 3))
        else:  # surface-ish: points on a noisy sphere patch
            u = rng.random((N, 2))
            th, ph = u[:, 0] * np.pi, u[:, 1] * np.pi
            p = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                          np.cos(th)], 1) * 0.5 + 0.5
            p += rng.normal(0, 0.01, p.shape)
            p = np.clip(p, 0, 0.999)
        order = np.argsort(morton3(p))
        p = p[order]
        idx = knn_idx(p, k)
        for s in range(0, N, TM):
            tile = idx[s:s + TM].ravel()
            spreads.append(tile.max() - tile.min())
    spreads = np.array(spreads)
    print(f"N={N} k={k} TM={TM} {dist}: spread p50={np.percentile(spreads,50):.0f} "
          f"p90={np.percentile(spreads,90):.0f} p99={np.percentile(spreads,99):.0f} max={spreads.max()}")
    for W in (N // 4, 3 * N // 8, N // 2, 5 * N // 8, 3 * N // 4):
        ov = (spreads > W).mean()
        print(f"   W={W}: tile-overflow {ov*100:.1f}%")


for dist in ("uniform", "surface"):
    for N in (3072, 1536, 768, 384):
        study(N, dist=dist)
