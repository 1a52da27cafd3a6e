"""End-to-end training tests: convergence, callbacks, checkpoint/resume.

CPU-runnable mini-train mirroring BASELINE.json configs[0] at reduced size
(SURVEY.md §4 prescription).
"""

import os

import jax
import numpy as np
import pytest

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.data.loader import DirectoryDataset
from unet_image_segmentation_tpu.data.synthetic import write_synthetic_dataset
from unet_image_segmentation_tpu.models.unet import build_unet
from unet_image_segmentation_tpu.train.callbacks import (
    EarlyStopping,
    ReduceLROnPlateau,
)
from unet_image_segmentation_tpu.train.checkpoint import (
    load_inference_variables,
    restore_state,
    save_state,
)
from unet_image_segmentation_tpu.train.loop import fit
from unet_image_segmentation_tpu.train.state import create_train_state
from unet_image_segmentation_tpu.train.steps import make_predict_fn, make_train_step

pytest.importorskip("cv2")

HW = 32


def tiny_config(tmp_dir: str, **overrides) -> Config:
    base = dict(
        model__image_height=HW,
        model__image_width=HW,
        model__filters=(8, 16),
        model__dropout_rate=0.1,
        data__root=os.path.join(tmp_dir, "ds"),
        data__num_workers=2,
        train__epochs=3,
        train__batch_size=8,
        train__model_out=os.path.join(tmp_dir, "model"),
        train__log_dir=os.path.join(tmp_dir, "logs"),
    )
    base.update(overrides)
    return Config().override(**base)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("train"))
    write_synthetic_dataset(
        os.path.join(d, "ds"), n_train=16, n_val=8, image_size=(HW, HW)
    )
    return d


def test_fit_converges_and_saves(workdir):
    cfg = tiny_config(workdir)
    result = fit(cfg, verbose=False)
    hist = result.history
    assert result.epochs_run == 3
    # loss decreases from the first to the last epoch on this easy task
    assert hist["loss"][-1] < hist["loss"][0]
    for key in (
        "loss", "dice_coef", "mean_io_u", "mean_io_u_thresh",
        "val_loss", "val_dice_coef", "val_mean_io_u", "val_mean_io_u_thresh",
        "learning_rate",
    ):
        assert key in hist, key
    # artifacts: best/ + last/ + meta.json + tensorboard events
    out = cfg.train.model_out
    assert os.path.isdir(os.path.join(out, "best"))
    assert os.path.isdir(os.path.join(out, "last"))
    assert os.path.exists(os.path.join(out, "meta.json"))
    logs_root = cfg.train.log_dir
    runs = os.listdir(logs_root)
    assert runs, "no tensorboard run dir"
    event_files = os.listdir(os.path.join(logs_root, runs[0]))
    assert any(f.startswith("events.out.tfevents") for f in event_files)

    # best checkpoint is loadable and predicts sanely
    variables, kwargs = load_inference_variables(out)
    assert kwargs["filters"] == (8, 16)
    model = build_unet(cfg.model)
    predict = make_predict_fn(model, variables["params"], variables.get("batch_stats"))
    ds = DirectoryDataset(
        frames_dir=os.path.join(cfg.data.root, "val_frames", "image"),
        masks_dir=os.path.join(cfg.data.root, "val_masks", "image"),
        image_size=(HW, HW),
        shuffle=False,
    )
    imgs, masks = next(ds.batches(8, num_workers=1))
    preds = np.asarray(predict(imgs))
    assert preds.shape == (8, HW, HW, 1)
    assert 0 <= preds.min() and preds.max() <= 1


def test_resume_continues_from_checkpoint(workdir):
    base = os.path.join(workdir, "resume")
    os.makedirs(base, exist_ok=True)
    cfg = tiny_config(workdir, train__epochs=2,
                      train__model_out=os.path.join(base, "model"),
                      train__log_dir=os.path.join(base, "logs"))
    r1 = fit(cfg, verbose=False)
    steps_after_2_epochs = int(jax.device_get(r1.state.step))
    assert steps_after_2_epochs == 2 * 2  # 16 imgs / batch 8 = 2 steps/epoch

    cfg2 = cfg.override(train__epochs=4, train__resume=True)
    r2 = fit(cfg2, verbose=False)
    # only epochs 2,3 run in the second call
    assert r2.epochs_run == 4
    assert len(r2.history["loss"]) == 2
    assert int(jax.device_get(r2.state.step)) == 4 * 2


def test_state_checkpoint_roundtrip(workdir, tmp_path):
    cfg = tiny_config(workdir)
    state = create_train_state(cfg)
    model = build_unet(cfg.model)
    step = make_train_step(model, donate=False)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, HW, HW, 3).astype(np.float32)
    masks = (rng.rand(4, HW, HW, 1) > 0.5).astype(np.float32)
    state2, _ = step(state, imgs, masks)
    path = str(tmp_path / "ckpt")
    save_state(path, state2)
    restored = restore_state(path, create_train_state(cfg))
    assert int(jax.device_get(restored.step)) == 1
    orig_leaves = jax.tree_util.tree_leaves(state2.params)
    rest_leaves = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        float(restored.learning_rate), float(state2.learning_rate)
    )


def test_reduce_lr_on_plateau_semantics(workdir):
    cfg = tiny_config(workdir)
    state = create_train_state(cfg)
    cb = ReduceLROnPlateau(monitor="val_m", mode="max", factor=0.5,
                           patience=2, min_lr=1e-5, verbose=False)
    lr0 = float(jax.device_get(state.learning_rate))
    # improving: no reduction
    state = cb.on_epoch_end(0, {"val_m": 0.5}, state)
    state = cb.on_epoch_end(1, {"val_m": 0.6}, state)
    assert float(jax.device_get(state.learning_rate)) == pytest.approx(lr0)
    # two flat epochs -> reduce
    state = cb.on_epoch_end(2, {"val_m": 0.6}, state)
    state = cb.on_epoch_end(3, {"val_m": 0.6}, state)
    assert float(jax.device_get(state.learning_rate)) == pytest.approx(lr0 * 0.5)
    # floor at min_lr
    for e in range(4, 30):
        state = cb.on_epoch_end(e, {"val_m": 0.6}, state)
    assert float(jax.device_get(state.learning_rate)) == pytest.approx(1e-5, rel=1e-5)


def test_early_stopping_restores_best(workdir):
    cfg = tiny_config(workdir)
    state = create_train_state(cfg)
    cb = EarlyStopping(monitor="val_m", mode="max", patience=2,
                       restore_best_weights=True, verbose=False)
    state = cb.on_epoch_end(0, {"val_m": 0.9}, state)
    best_leaf = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    # degrade params and scores
    worse = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    state = state.replace(params=worse)
    state = cb.on_epoch_end(1, {"val_m": 0.1}, state)
    assert not cb.should_stop
    state = cb.on_epoch_end(2, {"val_m": 0.1}, state)
    assert cb.should_stop
    restored_leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(restored_leaf, best_leaf)


def test_rng_impl_rides_in_typed_key(workdir, tmp_path):
    """cfg.train.rng_impl is honored via a typed key on the state — NOT by
    mutating the process-global jax_default_prng_impl (which leaked into
    unrelated code in the same process; round-2 regression)."""
    default_impl = jax.config.jax_default_prng_impl
    cfg = tiny_config(workdir, train__rng_impl="rbg")
    state = create_train_state(cfg)
    assert jax.numpy.issubdtype(state.rng.dtype, jax.dtypes.prng_key)
    assert str(jax.random.key_impl(state.rng)) == "rbg"
    assert jax.config.jax_default_prng_impl == default_impl

    # the typed key survives a checkpoint roundtrip with its impl
    model = build_unet(cfg.model)
    step = make_train_step(model, donate=False)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, HW, HW, 3).astype(np.float32)
    masks = (rng.rand(4, HW, HW, 1) > 0.5).astype(np.float32)
    state2, _ = step(state, imgs, masks)
    path = str(tmp_path / "ckpt_rng")
    save_state(path, state2)
    restored = restore_state(path, create_train_state(cfg))
    assert str(jax.random.key_impl(restored.rng)) == "rbg"
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(state2.rng)),
    )


def test_fit_uses_mesh_from_config(workdir):
    """VERDICT r2 item 7: the config's mesh section drives fit() — a
    spatial=2 training mesh from config, no Python mesh plumbing."""
    cfg = tiny_config(
        workdir,
        train__epochs=1,
        train__model_out=os.path.join(workdir, "model_mesh"),
        mesh__data_axis=4,
        mesh__spatial_axis=2,
    )
    result = fit(cfg, verbose=False)
    assert result.epochs_run == 1
    assert np.isfinite(result.history["loss"][0])


def test_fit_pallas_trains_on_shard_map_mesh(workdir):
    """use_pallas=True under fit() on a multi-device mesh routes through
    the shard_map train step (pallas_call cannot cross GSPMD) and learns."""
    cfg = tiny_config(
        workdir,
        model__use_pallas=True,
        model__dropout_rate=0.0,
        train__epochs=1,
        train__model_out=os.path.join(workdir, "model_pallas"),
    )
    result = fit(cfg, verbose=False)
    assert result.epochs_run == 1
    assert np.isfinite(result.history["loss"][0])
    assert "val_mean_io_u" in result.history


def test_fit_pallas_spatial_mesh_falls_back_loudly(workdir, capsys):
    """Spatially-sharded fused training needs the sums-form loss contract;
    an unsupported config (bce) on a spatial mesh must drop to the
    GSPMD-XLA path with a visible warning, not compute wrong halos.
    (The supported config engaging the fused path is pinned in
    tests/test_spatial_train.py::test_fit_spatial_mesh_uses_fused_path.)"""
    cfg = tiny_config(
        workdir,
        model__use_pallas=True,
        train__epochs=1,
        train__loss="bce",
        train__model_out=os.path.join(workdir, "model_sp"),
        mesh__data_axis=4,
        mesh__spatial_axis=2,
    )
    result = fit(cfg, verbose=False)
    out = capsys.readouterr().out
    assert "GSPMD-XLA path" in out
    assert result.epochs_run == 1
