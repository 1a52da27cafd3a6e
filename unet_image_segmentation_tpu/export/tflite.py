"""Optional TFLite bridge (mobile deployment parity).

The reference exports ``.h5 -> .tflite`` with optional default
optimization and fp16 weights (``convert_to_tflite.py:124-140``) and packs
flatbuffer metadata (``add_tflite_metadata.py``).  This module provides the
same capability from our checkpoints via ``jax2tf``; everything is gated on
TensorFlow being importable (it is an optional dependency of the
framework — the serving-native path is :mod:`.stablehlo`).

Metadata: the descriptive fields are written as ``metadata.json`` next to
the ``.tflite`` AND embedded in-file as a hand-assembled metadata
flatbuffer + appended label-file zip (:mod:`.tflite_metadata`) — full
reference ``add_tflite_metadata.py`` parity without ``tflite_support``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple


def tf_available() -> bool:
    try:
        import tensorflow  # noqa: F401

        return True
    except Exception:
        return False


def convert_to_tflite(
    model,
    variables: Dict[str, Any],
    output_path: str,
    batch_size: int = 1,
    image_size: Tuple[int, int] = (256, 256),
    channels: int = 3,
    optimize: bool = False,
    float16: bool = False,
    int8: bool = False,
    representative_images=None,
    labels: Optional[Sequence[str]] = None,
) -> str:
    """Convert the forward pass to a .tflite flatbuffer.

    ``optimize`` maps to ``tf.lite.Optimize.DEFAULT`` and ``float16`` to
    fp16 weight storage, mirroring the reference flags
    (``convert_to_tflite.py:128-140``).  ``int8`` performs full integer
    quantization with a representative dataset — the capability the
    reference left as a commented-out scaffold
    (``convert_to_tflite.py:142-153``); ``representative_images`` is an
    iterable of (H, W, C) float32 [0,1] arrays (a handful of training
    frames), defaulting to random frames when omitted.
    """
    if not tf_available():
        raise RuntimeError(
            "TensorFlow is not available; use export.stablehlo for the "
            "TF-free serving artifact."
        )
    import tensorflow as tf
    from jax.experimental import jax2tf

    h, w = image_size

    def forward(images):
        return model.apply(variables, images, train=False)

    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False),
        input_signature=[
            tf.TensorSpec([batch_size, h, w, channels], tf.float32, name="input_image")
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if optimize:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    if float16:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    if int8:
        import numpy as np

        converter.optimizations = [tf.lite.Optimize.DEFAULT]

        def rep_gen():
            if representative_images is not None:
                for img in representative_images:
                    yield [img[None].astype("float32")]
            else:
                rng = np.random.RandomState(0)
                for _ in range(8):
                    yield [rng.rand(1, h, w, channels).astype("float32")]

        converter.representative_dataset = rep_gen
        # keep float I/O (the pipeline feeds [0,1] floats); weights+math int8
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
    blob = converter.convert()
    out_dir = os.path.dirname(os.path.abspath(output_path))
    os.makedirs(out_dir, exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)

    _write_metadata_sidecar(
        output_path, model, batch_size, image_size, channels, labels
    )
    return output_path


def _write_metadata_sidecar(
    tflite_path: str,
    model,
    batch_size: int,
    image_size: Tuple[int, int],
    channels: int,
    labels: Optional[Sequence[str]],
) -> None:
    from unet_image_segmentation_tpu.export.stablehlo import DEFAULT_LABELS

    labels = list(labels or DEFAULT_LABELS)
    h, w = image_size
    num_classes = getattr(model, "num_classes", 1)
    meta = {
        "name": "unet-image-segmentation-tpu",
        "version": "v1",
        "input": {
            "shape": [batch_size, h, w, channels],
            "color_space": "RGB",
            "normalization": {"mean": [0.0], "std": [255.0]},
        },
        "output": {
            "shape": [batch_size, h, w, num_classes],
            "semantics": "probability mask",
            "binarization_threshold": 0.5,
        },
        "labels": labels,
    }
    sidecar = os.path.splitext(tflite_path)[0] + "_metadata.json"
    with open(sidecar, "w") as f:
        json.dump(meta, f, indent=2)
    labels_path = os.path.join(os.path.dirname(tflite_path) or ".", "labels.txt")
    with open(labels_path, "w") as f:
        f.write("\n".join(labels) + "\n")
    # In-file flatbuffer metadata, hand-assembled — no tflite_support
    # needed (reference add_tflite_metadata.py:203-317 parity; see
    # export.tflite_metadata for the schema-layout notes).
    from unet_image_segmentation_tpu.export.tflite_metadata import (
        build_metadata_flatbuffer,
        embed_metadata,
    )

    blob = build_metadata_flatbuffer(meta, os.path.basename(labels_path))
    embed_metadata(tflite_path, blob, [labels_path])
