"""Native C++ data-loader core: build, correctness, and distribution checks."""

import numpy as np
import pytest

from mvp_benchmark_tpu import native


@pytest.fixture(scope="module")
def available():
    if not native.is_available():
        pytest.skip("no C++ toolchain available")
    return True


def test_gather_batch(available, rng):
    src = rng.random((20, 16, 3), dtype=np.float64).astype(np.float32)
    idx = rng.integers(0, 20, 7)
    out = native.gather_batch(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_se3_augment_rigid_and_consistent(available, rng):
    """With src == tgt, tgt' must equal transform applied to src'."""
    B, N = 4, 64
    cloud = rng.random((B, N, 3), dtype=np.float64).astype(np.float32)
    s, t, T = native.se3_augment_batch(cloud, cloud, np.pi / 4, 0.5, seed=7)

    # transform blocks are valid rigid poses
    R = T[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.tile(np.eye(3), (B, 1, 1)),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    np.testing.assert_array_equal(T[:, 3], np.tile([0, 0, 0, 1], (B, 1)))

    # rigid-motion invariant: pairwise distances preserved
    d0 = np.linalg.norm(cloud[:, :1] - cloud[:, 1:2], axis=-1)
    d1 = np.linalg.norm(s[:, :1] - s[:, 1:2], axis=-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-4)

    # gt pose consistency: tgt' = src' @ R^T + t
    pred = np.einsum("bij,bnj->bni", R, s) + T[:, None, :3, 3]
    np.testing.assert_allclose(pred, t, atol=1e-4)


def test_se3_angle_translation_bounds(available, rng):
    """Sampled poses respect max_angle / max_trans (dataset.py:102-107:
    transform uses (max_angle, max_trans/2))."""
    B, N = 256, 4
    cloud = rng.random((B, N, 3), dtype=np.float64).astype(np.float32)
    max_angle = np.pi / 6
    _, _, T = native.se3_augment_batch(cloud, cloud, max_angle, 0.5, seed=3)
    R = T[:, :3, :3]
    tr = np.trace(R, axis1=1, axis2=2)
    ang = np.arccos(np.clip((tr - 1) / 2, -1, 1))
    assert ang.max() <= max_angle + 1e-4
    assert ang.max() > max_angle * 0.7  # actually spans the range
    tn = np.linalg.norm(T[:, :3, 3], axis=1)
    assert tn.max() <= 0.25 + 1e-5  # max_trans / 2
    assert tn.max() > 0.15


def test_se3_deterministic_per_seed(available, rng):
    cloud = rng.random((2, 8, 3), dtype=np.float64).astype(np.float32)
    a = native.se3_augment_batch(cloud, cloud, np.pi, 0.5, seed=11)
    b = native.se3_augment_batch(cloud, cloud, np.pi, 0.5, seed=11)
    c = native.se3_augment_batch(cloud, cloud, np.pi, 0.5, seed=12)
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])


def test_dataset_uses_native_path(available):
    from mvp_benchmark_tpu.data.mvp import BatchSpec, MVPRegistrationDataset

    ds = MVPRegistrationDataset("train", max_angle=45.0, max_trans=0.5,
                                num_points=32, synthetic_size=8)
    batch = next(ds.batches(BatchSpec(4, shuffle=False)))
    assert batch["src"].shape == (4, 32, 3)
    assert batch["transform"].shape == (4, 4, 4)
    R = batch["transform"][:, :3, :3]
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
