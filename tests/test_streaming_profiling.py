"""Streaming predictor + profiling/distributed utility tests."""

import os

import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.inference import Predictor
from unet_image_segmentation_tpu.models.unet import UNet, init_unet
from unet_image_segmentation_tpu.ops.preprocess import resize_bilinear
from unet_image_segmentation_tpu.parallel.distributed import (
    initialize,
    is_multihost,
    process_info,
)
from unet_image_segmentation_tpu.parallel.mesh import create_mesh
from unet_image_segmentation_tpu.streaming import StreamingPredictor
from unet_image_segmentation_tpu.train.checkpoint import save_inference_variables
from unet_image_segmentation_tpu.utils.profiling import StepTimer, hard_sync, trace

HW = 32  # model resolution
FRAME = (48, 64)  # native stream resolution


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "ckpt")
    model = UNet(num_classes=1, filters=(8, 16), dropout_rate=0.0)
    variables = init_unet(model, jax.random.PRNGKey(0), (HW, HW, 3))
    save_inference_variables(
        d, variables["params"], variables.get("batch_stats"),
        model_kwargs=dict(num_classes=1, filters=[8, 16], dropout_rate=0.0,
                          use_batch_norm=True, conv_type="separable"),
    )
    return d


def _host_pipeline(predictor, frames_u8, threshold=0.5):
    """Composed host-side oracle for the streamed path."""
    outs = []
    for f in frames_u8:
        x = f.astype(np.float32) / 255.0
        x = cv2.resize(x, (HW, HW), interpolation=cv2.INTER_LINEAR)
        prob = predictor.predict(x[None])[0]
        up = np.asarray(resize_bilinear(prob, FRAME))[..., 0]
        outs.append((up > threshold).astype(np.uint8))
    return np.stack(outs)


def test_streaming_matches_host_pipeline(ckpt, rng_np):
    predictor = Predictor(ckpt, image_size=(HW, HW))
    stream = StreamingPredictor(predictor, FRAME, batch_size=4)
    frames = (rng_np.rand(4, *FRAME, 3) * 255).astype(np.uint8)
    masks = stream(frames)
    assert masks.shape == (4, *FRAME)
    assert masks.dtype == np.uint8
    expected = _host_pipeline(predictor, frames)
    # device resize matches cv2 within tolerance; identical thresholding
    # may flip pixels sitting exactly at the boundary — allow a few.
    mismatch = (masks != expected).mean()
    assert mismatch < 0.01, f"mask mismatch fraction {mismatch}"


def test_streaming_probabilities_and_shape_guard(ckpt, rng_np):
    predictor = Predictor(ckpt, image_size=(HW, HW))
    stream = StreamingPredictor(predictor, FRAME, batch_size=2, threshold=None)
    frames = (rng_np.rand(2, *FRAME, 3) * 255).astype(np.uint8)
    probs = stream(frames)
    assert probs.dtype == np.float32
    assert probs.shape == (2, *FRAME)
    assert 0.0 <= probs.min() and probs.max() <= 1.0
    with pytest.raises(ValueError):
        stream((rng_np.rand(2, 32, 32, 3) * 255).astype(np.uint8))


def test_streaming_on_mesh(ckpt, rng_np):
    predictor = Predictor(ckpt, image_size=(HW, HW))
    mesh = create_mesh(data=2, spatial=4)
    stream = StreamingPredictor(predictor, FRAME, batch_size=4, mesh=mesh)
    single = StreamingPredictor(predictor, FRAME, batch_size=4)
    frames = (rng_np.rand(4, *FRAME, 3) * 255).astype(np.uint8)
    np.testing.assert_array_equal(stream(frames), single(frames))


def test_step_timer_and_hard_sync():
    t = StepTimer(sync_every=2)
    t.start()
    x = jax.numpy.arange(8.0)
    for _ in range(5):
        x = x + 1
        t.lap(x)
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_ms"] >= 0
    hard_sync({"a": x})  # smoke: works on pytrees


def test_trace_context(tmp_path):
    with trace(str(tmp_path / "prof")):
        _ = jax.numpy.ones((4, 4)) @ jax.numpy.ones((4, 4))
    # jax CPU profiler writes a plugins/profile dir when supported; either
    # way the context must not raise.


def test_distributed_single_host_noop():
    initialize()  # autodetect finds nothing -> clean no-op
    assert not is_multihost()
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] == 8


def test_tb_writer_events_readable():
    """Pure-Python event writer output parses with TF's reader (gated)."""
    tf = pytest.importorskip("tensorflow")
    import tempfile

    from unet_image_segmentation_tpu.utils.tb_writer import SummaryWriter

    d = tempfile.mkdtemp()
    w = SummaryWriter(d)
    w.scalar("loss", 0.25, step=1)
    w.scalar("loss", 0.125, step=2)
    w.histogram("weights", np.arange(100, dtype=np.float32), step=1)
    w.close()

    records = list(tf.data.TFRecordDataset(w.path))
    assert len(records) == 4  # file_version + 2 scalars + 1 histogram

    from tensorflow.core.util import event_pb2

    scalars = {}
    histos = 0
    for r in records:
        ev = event_pb2.Event.FromString(r.numpy())
        for v in ev.summary.value:
            if v.HasField("simple_value"):
                scalars[(v.tag, ev.step)] = v.simple_value
            if v.HasField("histo"):
                histos += 1
                assert v.histo.num == 100
    assert scalars[("loss", 1)] == pytest.approx(0.25)
    assert scalars[("loss", 2)] == pytest.approx(0.125)
    assert histos == 1
