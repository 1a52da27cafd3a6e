"""Numerical parity vs the TensorFlow reference implementation.

Builds the *reference's own* Keras U-Net (imported from /root/reference,
never copied), transplants its randomly-initialized weights into our Flax
model via :mod:`unet_image_segmentation_tpu.utils.keras_import`, and checks
the forward passes agree within fp32 tolerance — the BASELINE.json mask
parity requirement, with the model as its own oracle.

Skipped automatically when TF or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

tf = pytest.importorskip("tensorflow")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout unavailable"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_image_segmentation_tpu.models.unet import UNet  # noqa: E402
from unet_image_segmentation_tpu.utils.keras_import import (  # noqa: E402
    load_keras_h5,
    variables_from_keras_model,
)

HW = 64  # fully convolutional: parity at 64 implies parity at 256


@pytest.fixture(scope="module")
def keras_model():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.u_net import U_NET  # the reference's own builder

    tf.keras.utils.set_random_seed(0)
    return U_NET(input_size=(HW, HW, 3), num_classes=1)


def test_forward_parity_with_reference(keras_model):
    variables = variables_from_keras_model(keras_model)
    model = UNet()
    x = np.random.RandomState(7).rand(2, HW, HW, 3).astype(np.float32)
    y_tf = keras_model.predict(x, verbose=0)
    y_jax = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert y_tf.shape == y_jax.shape == (2, HW, HW, 1)
    np.testing.assert_allclose(y_jax, y_tf, atol=2e-5)


def test_variable_tree_matches_flax_init(keras_model):
    """Imported tree must be structurally identical to a fresh Flax init."""
    imported = variables_from_keras_model(keras_model)
    model = UNet()
    fresh = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, HW, HW, 3)), train=False
    )

    flat_fresh = jax.tree_util.tree_leaves_with_path(fresh)
    flat_imported = jax.tree_util.tree_leaves_with_path(imported)
    paths_fresh = {jax.tree_util.keystr(p): v.shape for p, v in flat_fresh}
    paths_imported = {jax.tree_util.keystr(p): v.shape for p, v in flat_imported}
    assert paths_fresh == paths_imported


def test_h5_roundtrip(keras_model, tmp_path):
    """Save reference-style .h5 -> import without TF -> same arrays."""
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path)
    from_h5, kwargs = load_keras_h5(h5_path)
    live = variables_from_keras_model(keras_model)
    assert kwargs["num_classes"] == 1
    assert kwargs["filters"] == (64, 128, 256, 512)
    assert kwargs["conv_type"] == "separable"
    assert kwargs["use_batch_norm"] is True

    flat_a = jax.tree_util.tree_leaves_with_path(from_h5)
    flat_b = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(live)
    )
    assert len(flat_a) == len(flat_b)
    for path, arr in flat_a:
        np.testing.assert_array_equal(arr, flat_b[jax.tree_util.keystr(path)])
