"""Real-HDF5 data-path tests.

The loaders' h5 branches (``data/mvp.py``) mirror the reference datasets
(``completion/dataset.py:21-33``, ``registration/dataset.py:53-91``). Every
other test/bench rides the synthetic fallback, so these fixtures are the only
contact with the actual file format: exact key names, the idx//26 gt mapping,
the category filter, and the no-gt test splits. A wrong key/dtype/mapping
fails here instead of on first contact with the downloaded MVP files.

Fixtures are written with the reference's exact schema:
- CP: ``incomplete_pcds`` (M*26, N, 3) f32, ``complete_pcds`` (M, 2048, 3)
  f32, ``labels`` (M*26,) — test split has only ``incomplete_pcds``.
- RG train: ``src``/``tgt`` (P, N, 3) f32, ``cat_labels``, ``match_level``,
  ``match_id`` (a GROUP of string-indexed variable-length datasets — present
  in the real files, loaded-but-unused by the reference's __getitem__).
- RG val: ``rotated_src``/``rotated_tgt``/``transforms``/``rot_level`` plus
  the train keys; RG test: ``rotated_src``/``rotated_tgt``/``cat_labels``.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mvp_benchmark_tpu.data.mvp import (  # noqa: E402
    BatchSpec,
    MVPCompletionDataset,
    MVPRegistrationDataset,
)

N_PTS = 64  # tiny clouds; the loader takes shapes from the file


def _write_cp(path, n_models, prefix):
    n_part = n_models * 26
    rng = np.random.default_rng(3)
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "incomplete_pcds",
            data=rng.random((n_part, N_PTS, 3)).astype(np.float32),
        )
        if prefix != "test":
            # Mark each complete cloud with its model id in coordinate 0 so
            # the idx//26 mapping is checkable per element.
            gt = rng.random((n_models, 2 * N_PTS, 3)).astype(np.float32)
            gt[:, :, 0] = np.arange(n_models, dtype=np.float32)[:, None]
            f.create_dataset("complete_pcds", data=gt)
            f.create_dataset(
                "labels", data=(np.arange(n_part) % 16).astype(np.int64)
            )


def _write_rg(path, n, prefix, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.random((n, N_PTS, 3)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("cat_labels", data=(np.arange(n) % 4).astype(np.int64))
        if prefix == "test":
            f.create_dataset("rotated_src", data=src)
            f.create_dataset("rotated_tgt", data=src[::-1].copy())
            return src, None, None
        f.create_dataset(
            "match_level", data=(np.arange(n) % 2).astype(np.int64)
        )
        grp = f.create_group("match_id")  # present in the real files
        for i in range(n):
            grp.create_dataset(str(i), data=np.arange(i % 3 + 1, dtype=np.int64))
        if prefix == "train":
            # tgt == src so the augmentation identity tgt' == T(src') is
            # checkable (partial-overlap pairs differ in the real data).
            f.create_dataset("src", data=src)
            f.create_dataset("tgt", data=src.copy())
            return src, None, None
        # val: precomputed poses
        transforms = np.stack(
            [np.eye(4, dtype=np.float32) for _ in range(n)]
        )
        transforms[:, 0, 3] = np.arange(n, dtype=np.float32)  # recognizable
        f.create_dataset("rotated_src", data=src)
        tgt = src + transforms[:, None, :3, 3]
        f.create_dataset("rotated_tgt", data=tgt.astype(np.float32))
        f.create_dataset("transforms", data=transforms)
        f.create_dataset(
            "rot_level", data=(np.arange(n) % 2).astype(np.int64)
        )
        return src, tgt, transforms


# ---------------------------------------------------------------------------
# Completion (MVP_CP)
# ---------------------------------------------------------------------------


def test_cp_train_h5_idx_div_26(tmp_path):
    _write_cp(tmp_path / "MVP_Train_CP.h5", n_models=3, prefix="train")
    ds = MVPCompletionDataset("train", str(tmp_path))
    assert not ds.synthetic
    assert len(ds) == 78
    assert ds.input_data.dtype == np.float32
    assert ds.gt_data.shape == (3, 2 * N_PTS, 3)

    batch = next(iter(ds.batches(BatchSpec(batch_size=30))))
    assert set(batch) == {"inputs", "gt", "label", "count"}
    assert batch["inputs"].shape == (30, N_PTS, 3)
    assert batch["gt"].shape == (30, 2 * N_PTS, 3)
    # gt for partial i is complete_pcds[i // 26] (completion/dataset.py:42)
    want_model = np.arange(30) // 26
    np.testing.assert_array_equal(batch["gt"][:, 0, 0], want_model)
    np.testing.assert_array_equal(batch["label"], np.arange(30) % 16)


def test_cp_val_and_test_h5(tmp_path):
    _write_cp(tmp_path / "MVP_Test_CP.h5", n_models=2, prefix="val")
    _write_cp(tmp_path / "MVP_ExtraTest_Shuffled_CP.h5", n_models=2,
              prefix="test")
    val = MVPCompletionDataset("val", str(tmp_path))
    assert not val.synthetic and len(val) == 52
    b = next(iter(val.batches(BatchSpec(batch_size=52))))
    np.testing.assert_array_equal(b["gt"][:, 0, 0], np.arange(52) // 26)

    # extra-test split has no gt (completion/dataset.py:26-29,41-46)
    test = MVPCompletionDataset("test", str(tmp_path))
    assert not test.synthetic and len(test) == 52
    b = next(iter(test.batches(BatchSpec(batch_size=8))))
    assert set(b) == {"inputs", "count"}
    assert b["inputs"].dtype == np.float32


# ---------------------------------------------------------------------------
# Registration (MVP_RG)
# ---------------------------------------------------------------------------


def test_rg_train_h5_augmentation(tmp_path):
    src, _, _ = _write_rg(tmp_path / "MVP_Train_RG.h5", 8, "train")
    ds = MVPRegistrationDataset("train", max_angle=45.0, max_trans=0.5,
                                data_dir=str(tmp_path), seed=0)
    assert not ds.synthetic
    assert len(ds) == 8
    assert ds.rot_level == 0  # max_angle <= 45 (registration/dataset.py:69-72)
    b = next(iter(ds.batches(BatchSpec(batch_size=8))))
    assert set(b) == {"src", "tgt", "transform", "match_level", "rot_level",
                      "count"}
    assert b["src"].dtype == np.float32 and b["transform"].shape == (8, 4, 4)
    # the fixture has tgt == src, so the augmented pair must satisfy
    # tgt' == transform(src') exactly (registration/dataset.py:102-107)
    T = b["transform"]
    moved = np.einsum("bij,bnj->bni", T[:, :3, :3], b["src"]) + T[:, None, :3, 3]
    np.testing.assert_allclose(moved, b["tgt"], atol=1e-5)
    # augmentation actually moved the clouds
    assert np.abs(b["src"] - src).max() > 1e-3
    np.testing.assert_array_equal(b["match_level"], np.arange(8) % 2)
    np.testing.assert_array_equal(b["rot_level"], np.zeros(8))

    high = MVPRegistrationDataset("train", max_angle=180.0, max_trans=0.5,
                                  data_dir=str(tmp_path), seed=0)
    assert high.rot_level == 1


def test_rg_val_h5(tmp_path):
    src, tgt, transforms = _write_rg(tmp_path / "MVP_Test_RG.h5", 6, "val")
    ds = MVPRegistrationDataset("val", max_angle=180.0, max_trans=0.5,
                                data_dir=str(tmp_path))
    assert not ds.synthetic and len(ds) == 6
    b = next(iter(ds.batches(BatchSpec(batch_size=4))))
    np.testing.assert_allclose(b["src"], src[:4])
    np.testing.assert_allclose(b["tgt"], tgt[:4], atol=1e-6)
    np.testing.assert_array_equal(b["transform"][:, 0, 3], np.arange(4))
    np.testing.assert_array_equal(b["rot_level"], np.arange(4) % 2)
    np.testing.assert_array_equal(b["match_level"], np.arange(4) % 2)


def test_rg_test_h5_no_gt(tmp_path):
    _write_rg(tmp_path / "MVP_ExtraTest_RG.h5", 4, "test")
    ds = MVPRegistrationDataset("test", data_dir=str(tmp_path))
    assert not ds.synthetic and len(ds) == 4
    b = next(iter(ds.batches(BatchSpec(batch_size=4))))
    assert set(b) == {"src", "tgt", "count"}


def test_rg_category_filter(tmp_path):
    _write_rg(tmp_path / "MVP_Test_RG.h5", 8, "val")
    ds = MVPRegistrationDataset("val", max_angle=180.0, max_trans=0.5,
                                category=2, data_dir=str(tmp_path))
    # cat_labels = arange(8) % 4 -> indices {2, 6}
    assert len(ds) == 2
    b = next(iter(ds.batches(BatchSpec(batch_size=2))))
    # transforms filtered consistently with src (the reference's val-branch
    # filter is dead code — `prefix == False`, dataset.py:88 — ours filters)
    np.testing.assert_array_equal(b["transform"][:, 0, 3], [2.0, 6.0])
