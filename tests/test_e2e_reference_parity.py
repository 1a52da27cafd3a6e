"""End-to-end mask parity: the reference's own inference script vs our CLI.

The BASELINE mask-parity requirement ("predicted masks match the TF
reference within fp32 tolerance on samples/test_images") checked at the
strongest possible level: run the *unmodified reference script*
(``/root/reference/scripts/inference.py``) in a subprocess with a Keras
``.h5``, run our inference CLI with the *same* ``.h5`` on the same bundled
sample image, and compare the saved binary masks pixel-for-pixel.

Pixels whose probability sits within fp32 noise of the 0.5 threshold can
legitimately flip between frameworks, so a small mismatch fraction is
allowed; bounding boxes of the crops must agree within a pixel.

Skipped without TF + the reference checkout.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
cv2 = pytest.importorskip("cv2")

REFERENCE = "/root/reference"
SAMPLE = os.path.join(REFERENCE, "samples", "test_images", "chile_id_card.png")
pytestmark = pytest.mark.skipif(
    not os.path.isfile(SAMPLE), reason="reference samples unavailable"
)


@pytest.fixture(scope="module")
def h5_model(tmp_path_factory):
    """Reference-built Keras model, briefly fitted so outputs aren't all
    glued to the 0.5 decision boundary, saved as the interchange .h5."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.u_net import U_NET

    tf.keras.utils.set_random_seed(11)
    model = U_NET(input_size=(256, 256, 3), num_classes=1, dropout_rate=0.0)
    model.compile(optimizer="adam", loss="binary_crossentropy")
    rng = np.random.RandomState(0)
    x = rng.rand(4, 256, 256, 3).astype(np.float32)
    y = np.zeros((4, 256, 256, 1), np.float32)
    y[:, 64:192, 64:192] = 1.0  # teach it *some* structure
    model.fit(x, y, epochs=2, batch_size=2, verbose=0)
    path = str(tmp_path_factory.mktemp("h5") / "model.h5")
    model.save(path)
    return path


def test_reference_script_vs_our_cli(h5_model, tmp_path):
    ref_mask = str(tmp_path / "ref_mask.png")
    ref_crop = str(tmp_path / "ref_crop.png")
    env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REFERENCE, "scripts", "inference.py"),
            SAMPLE,
            "--model", h5_model,
            "--output_mask", ref_mask,
            "--output_cropped", ref_crop,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(ref_mask), proc.stdout[-2000:]

    our_mask = str(tmp_path / "our_mask.png")
    our_crop = str(tmp_path / "our_crop.png")
    from unet_image_segmentation_tpu.cli.inference import main as our_main

    rc = our_main([
        SAMPLE,
        "--model", h5_model,
        "--output_mask", our_mask,
        "--output_cropped", our_crop,
    ])
    assert rc == 0
    assert os.path.exists(our_mask)

    a = cv2.imread(ref_mask, cv2.IMREAD_GRAYSCALE)
    b = cv2.imread(our_mask, cv2.IMREAD_GRAYSCALE)
    assert a is not None and b is not None
    assert a.shape == b.shape
    mismatch = (a != b).mean()
    assert mismatch < 0.01, f"mask mismatch fraction {mismatch:.4f}"

    # if both pipelines cropped, the bounding boxes must agree (mask-driven)
    ref_has = os.path.exists(ref_crop)
    our_has = os.path.exists(our_crop)
    assert ref_has == our_has
    if ref_has:
        ca = cv2.imread(ref_crop)
        cb = cv2.imread(our_crop)
        assert abs(ca.shape[0] - cb.shape[0]) <= 2
        assert abs(ca.shape[1] - cb.shape[1]) <= 2
