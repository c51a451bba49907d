"""Per-EDGE window stats: window centered on each query's sorted position.

For each tile, how many edges fall outside [q - W/2, q + W/2]? The windowed
kernel contracts in-window edges at W width; out-of-window edges go through
a fixed-budget exact side path (per-tile count must be bounded)."""
import numpy as np
from morton_study import morton3, knn_idx  # reuse


def study(N, k=16, TM=256, trials=3, dist="uniform"):
    rng = np.random.default_rng(0)
    frac = []
    tile_counts = []
    for t in range(trials):
        if dist == "uniform":
            p = rng.random((N, 3))
        else:
            u = rng.random((N, 2))
            th, ph = u[:, 0] * np.pi, u[:, 1] * np.pi
            p = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                          np.cos(th)], 1) * 0.5 + 0.5
            p += rng.normal(0, 0.01, p.shape)
            p = np.clip(p, 0, 0.999)
        order = np.argsort(morton3(p))
        p = p[order]
        idx = knn_idx(p, k)                      # (N, k) sorted-domain ids
        q = np.arange(N)[:, None]
        for W in (256, 512, 768, 1024):
            out = np.abs(idx - q) > (W // 2)
            frac.append((W, out.mean()))
            cnts = out.reshape(-1, TM * k if False else TM, k)
            # per-tile out-of-window edge count
            per_tile = out.reshape(N // TM, TM * k).sum(1)
            tile_counts.append((W, per_tile.max(), np.percentile(per_tile, 99)))
    fr = {}
    tc = {}
    for W, f in frac:
        fr.setdefault(W, []).append(f)
    for W, mx, p99 in tile_counts:
        tc.setdefault(W, []).append((mx, p99))
    print(f"N={N} {dist}:")
    for W in sorted(fr):
        mx = max(m for m, _ in tc[W])
        p99 = max(p for _, p in tc[W])
        print(f"  W={W}: edge-out {np.mean(fr[W])*100:.2f}%  per-tile-out max={mx} p99={p99:.0f}")


for dist in ("uniform", "surface"):
    for N in (3072, 1536, 768):
        study(N, dist=dist)
