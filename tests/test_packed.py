"""Packed-dataset format + native C++ loader tests."""

import os

import numpy as np
import pytest

pytest.importorskip("cv2")

from unet_image_segmentation_tpu.data.loader import DirectoryDataset
from unet_image_segmentation_tpu.data.packed import (
    PackedDataset,
    native_available,
    pack_directory_dataset,
    write_pack,
)
from unet_image_segmentation_tpu.data.synthetic import write_synthetic_dataset

HW = 32


@pytest.fixture(scope="module")
def pack_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("pack")
    root = str(d / "ds")
    write_synthetic_dataset(root, n_train=10, n_val=2, image_size=(HW, HW))
    dir_ds = DirectoryDataset(
        frames_dir=os.path.join(root, "train_frames", "image"),
        masks_dir=os.path.join(root, "train_masks", "image"),
        image_size=(HW, HW),
    )
    path = str(d / "train.upk")
    pack_directory_dataset(dir_ds, path)
    return path, dir_ds


def test_pack_roundtrip_matches_directory(pack_path):
    path, dir_ds = pack_path
    ds = PackedDataset(path, shuffle=False, force_numpy=True)
    assert len(ds) == 10
    assert ds.image_size == (HW, HW)
    imgs, masks = next(ds.batches(4, epoch=0))
    assert imgs.shape == (4, HW, HW, 3) and imgs.dtype == np.float32
    assert masks.shape == (4, HW, HW, 1)
    # identical (within u8 quantization) to the directory loader's samples
    img0, mask0 = dir_ds.load_sample(0)
    np.testing.assert_allclose(imgs[0], img0, atol=1 / 255.0 + 1e-6)
    np.testing.assert_allclose(masks[0], mask0, atol=1 / 255.0 + 1e-6)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_matches_numpy_fallback(pack_path):
    path, _ = pack_path
    nat = PackedDataset(path, horizontal_flip=True, seed=5)
    ref = PackedDataset(path, horizontal_flip=True, seed=5, force_numpy=True)
    assert nat._handle, "native path not active"
    for (ai, am), (bi, bm) in zip(
        nat.batches(4, epoch=3), ref.batches(4, epoch=3)
    ):
        np.testing.assert_allclose(ai, bi, atol=1e-6)
        np.testing.assert_allclose(am, bm, atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_flip_semantics(pack_path):
    path, _ = pack_path
    ds = PackedDataset(path, shuffle=False)
    no_flip_i, no_flip_m = ds._fill(
        np.asarray([1], np.int64), np.asarray([0], np.uint8)
    )
    flip_i, flip_m = ds._fill(
        np.asarray([1], np.int64), np.asarray([1], np.uint8)
    )
    np.testing.assert_allclose(flip_i[0], no_flip_i[0][:, ::-1])
    np.testing.assert_allclose(flip_m[0], no_flip_m[0][:, ::-1])


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_rejects_bad_index(pack_path):
    path, _ = pack_path
    ds = PackedDataset(path)
    with pytest.raises(RuntimeError):
        ds._fill(np.asarray([999], np.int64), np.asarray([0], np.uint8))


def test_class_id_pack(tmp_path):
    imgs = np.random.RandomState(0).randint(0, 255, (4, 8, 8, 3), np.uint8)
    masks = np.random.RandomState(1).randint(0, 3, (4, 8, 8, 1)).astype(np.uint8)
    path = str(tmp_path / "mc.upk")
    write_pack(path, imgs, masks, mask_is_class_id=True)
    ds = PackedDataset(path, shuffle=False, force_numpy=True)
    assert ds.mask_is_class_id
    _, m = next(ds.batches(4))
    assert set(np.unique(m)).issubset({0.0, 1.0, 2.0})  # ids NOT rescaled


def test_epoch_shuffle_determinism(pack_path):
    path, _ = pack_path
    a = PackedDataset(path, seed=11, force_numpy=True)
    b = PackedDataset(path, seed=11, force_numpy=True)
    np.testing.assert_array_equal(a.epoch_order(2), b.epoch_order(2))
    assert not np.array_equal(a.epoch_order(2), a.epoch_order(3))


def test_bad_magic_rejected(tmp_path):
    p = str(tmp_path / "junk.upk")
    with open(p, "wb") as f:
        f.write(b"\0" * 256)
    with pytest.raises(ValueError):
        PackedDataset(p, force_numpy=True)


def test_fit_runs_on_packed_dataset(pack_path, tmp_path):
    """PackedDataset drops into the training loop unchanged."""
    from unet_image_segmentation_tpu.config import Config
    from unet_image_segmentation_tpu.train.loop import fit

    path, _ = pack_path
    train = PackedDataset(path, horizontal_flip=True)
    val = PackedDataset(path, shuffle=False)
    cfg = Config().override(
        model__image_height=HW, model__image_width=HW,
        model__filters=(8,), model__dropout_rate=0.0,
        train__epochs=2, train__batch_size=8,
        train__model_out=str(tmp_path / "m"),
        train__log_dir=str(tmp_path / "logs"),
    )
    result = fit(cfg, train_ds=train, val_ds=val, verbose=False)
    assert result.epochs_run == 2
    assert np.isfinite(result.history["loss"][-1])
