#!/usr/bin/env python
"""Packed-key kNN selection fidelity statistics (VERDICT r2 weak #4).

The Pallas kNN packs the neighbour index into the low ceil(log2 N) mantissa
bits of the f32 squared distance, quantizing the comparison by
~2^-(23 - log2 N) relative (~5e-4 at N=2048): neighbours closer than that
are tie-broken by index. This script MEASURES the consequence instead of
back-of-enveloping it:

  - set mismatch: fraction of (query, k)-neighbourhoods whose index SET
    differs from exact float32 selection;
  - order mismatch: fraction of neighbour slots whose index differs
    (set-equal neighbourhoods with swapped near-tie order included);
  - an adversarial near-tie cloud (pairs of points ~1e-5 apart).

Runs the REAL kernel (interpret mode off-TPU bit-reproduces the packed-key
arithmetic). Results recorded in PERF.md.

Usage: python tools/knn_fidelity.py [trials]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main(trials: int = 8):
    import jax

    if jax.default_backend() not in ("tpu",):
        pass  # interpret mode reproduces the packed-key math exactly
    import jax.numpy as jnp

    from mvp_benchmark_tpu.ops import jnp_ref, pallas_kernels as pk

    B, N, k = 4, 2048, 16
    rng = np.random.default_rng(0)

    def stats(q, p, label):
        set_bad = 0
        slot_bad = 0
        rows = 0
        _, idx_k = pk.knn_pallas(jnp.asarray(q), jnp.asarray(p), k)
        _, idx_r = jnp_ref.knn_points(jnp.asarray(q), jnp.asarray(p), k)
        idx_k, idx_r = np.asarray(idx_k), np.asarray(idx_r)
        for b in range(q.shape[0]):
            for r in range(q.shape[1]):
                rows += 1
                s_k, s_r = set(idx_k[b, r]), set(idx_r[b, r])
                if s_k != s_r:
                    set_bad += 1
                slot_bad += int((idx_k[b, r] != idx_r[b, r]).sum())
        print(f"{label}: set-mismatch {set_bad}/{rows} "
              f"({100 * set_bad / rows:.4f}%), slot-mismatch "
              f"{slot_bad}/{rows * k} ({100 * slot_bad / (rows * k):.4f}%)",
              flush=True)
        return set_bad, slot_bad, rows

    tot_set = tot_slot = tot_rows = 0
    for t in range(trials):
        p = rng.random((B, N, 3), dtype=np.float64).astype(np.float32)
        q = p  # self-kNN, the model's usage (knn_indices)
        s, sl, ro = stats(q, p, f"random trial {t}")
        tot_set += s
        tot_slot += sl
        tot_rows += ro
    print(f"RANDOM TOTAL: set-mismatch {tot_set}/{tot_rows} "
          f"({100 * tot_set / tot_rows:.5f}%), slot-mismatch "
          f"{tot_slot}/{tot_rows * k} ({100 * tot_slot / (tot_rows * k):.5f}%)")

    # Adversarial: every point has a twin offset by ~1e-5 (well inside the
    # ~5e-4 relative quantization at typical distances) -> near-ties
    # everywhere.
    base = rng.random((B, N // 2, 3), dtype=np.float64).astype(np.float32)
    twin = base + np.float32(1e-5)
    p = np.concatenate([base, twin], axis=1)
    stats(p, p, "adversarial twins (1e-5 pairs)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
