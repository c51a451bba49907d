#!/usr/bin/env python
"""kNN kernel variant sweep on the chip (TM x G x shapes).

Times knn_pallas at the VRCNet workload shapes under the chained-sync
protocol. Ground truth for the _knn_tile / _KNN_G choices in
ops/pallas_kernels.py (PERF.md records the table).

Usage: python tools/bench_knn.py [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mvp_benchmark_tpu.ops import pallas_kernels as pk  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20

# (B, M, N, k): VRCNet self-kNN levels (doubled batch) + EPS knn_points.
SHAPES = [
    (64, 3072, 3072, 16),
    (64, 1536, 1536, 16),
    (64, 768, 768, 16),
    (64, 1536, 3072, 10),
]


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    # chain: each rep consumes the previous output's first element so the
    # sequence serializes; one scalar pull at the end.
    t0 = time.perf_counter()
    d = None
    for _ in range(REPS):
        d, i = fn(*args)
    float(d[0, 0, 0])
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    rng = np.random.default_rng(0)
    for (B, M, N, k) in SHAPES:
        q = jnp.asarray(rng.random((B, M, 3), np.float32))
        p = q if M == N else jnp.asarray(rng.random((B, N, 3), np.float32))
        for tm in (128,):
            if M % tm:
                continue
            # (G, R) pairs: narrower extraction slabs need deeper insertion
            # folds to keep the dry-group rescan probability negligible.
            for g, r in ((256, 3), (128, 3), (128, 4), (64, 5), (64, 6),
                         (32, 7)):
                if N % g or N // g < 2:
                    continue

                f = jax.jit(lambda q, p, tm=tm, g=g, r=r: pk.knn_pallas(
                    q, p, k, tm=tm, g_size=g, r_size=r))
                try:
                    ms = timeit(f, q, p)
                    print(f"B{B} M{M} N{N} k{k} TM={tm} G={g} R={r}: "
                          f"{ms:7.2f} ms", flush=True)
                except Exception as e:
                    print(f"B{B} M{M} N{N} k{k} TM={tm} G={g} R={r}: FAILED "
                          f"{str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
