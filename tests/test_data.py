"""Data pipeline tests: directory contract, pairing, augmentation, prefetch."""

import numpy as np
import pytest

from unet_image_segmentation_tpu.data.loader import DirectoryDataset, Prefetcher
from unet_image_segmentation_tpu.data.synthetic import (
    synthetic_batch,
    write_synthetic_dataset,
)

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    write_synthetic_dataset(str(root), n_train=8, n_val=3, image_size=(32, 32))
    return str(root)


def _train_ds(root, **kw):
    import os

    return DirectoryDataset(
        frames_dir=os.path.join(root, "train_frames", "image"),
        masks_dir=os.path.join(root, "train_masks", "image"),
        image_size=(32, 32),
        **kw,
    )


def test_listing_and_pairing(dataset_root):
    ds = _train_ds(dataset_root)
    assert len(ds) == 8
    img, mask = ds.load_sample(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert mask.shape == (32, 32, 1)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # masks binary after /255
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_batches_shapes_and_determinism(dataset_root):
    ds = _train_ds(dataset_root, shuffle=True, seed=11)
    b1 = list(ds.batches(batch_size=4, epoch=0, num_workers=2))
    b2 = list(ds.batches(batch_size=4, epoch=0, num_workers=2))
    assert len(b1) == 2
    assert b1[0][0].shape == (4, 32, 32, 3)
    assert b1[0][1].shape == (4, 32, 32, 1)
    np.testing.assert_array_equal(b1[0][0], b2[0][0])  # same epoch = same order
    b3 = list(ds.batches(batch_size=4, epoch=1, num_workers=2))
    assert not np.array_equal(b1[0][0], b3[0][0])  # reshuffled across epochs


def test_flip_is_paired(dataset_root):
    ds = _train_ds(dataset_root, horizontal_flip=True, shuffle=False, seed=3)
    img0, mask0 = ds.load_sample(0, flip=False)
    img1, mask1 = ds.load_sample(0, flip=True)
    np.testing.assert_array_equal(img1, img0[:, ::-1])
    np.testing.assert_array_equal(mask1, mask0[:, ::-1])


def test_small_dataset_wraps_to_full_batch(dataset_root):
    ds = _train_ds(dataset_root, shuffle=False)
    batches = list(ds.batches(batch_size=5, epoch=0, num_workers=1))
    assert len(batches) == 1  # max(1, 8//5)
    assert batches[0][0].shape[0] == 5


def test_prefetcher_order_and_error():
    items = [1, 2, 3]
    assert list(Prefetcher(iter(items), depth=2)) == items

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    p = Prefetcher(boom(), depth=2)
    assert next(p) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(p)


def test_synthetic_batch_ranges(rng_np):
    imgs, masks = synthetic_batch(rng_np, 2, (32, 32))
    assert imgs.shape == (2, 32, 32, 3)
    assert masks.shape == (2, 32, 32, 1)
    assert masks.max() == 1.0 and masks.min() == 0.0
    # document occupies 30-80% of frame
    frac = masks.mean()
    assert 0.05 < frac < 0.9
