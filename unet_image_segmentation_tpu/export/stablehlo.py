"""Serving export: StableHLO artifact + metadata sidecar.

Replaces the reference's TFLite deployment pair
(``scripts/tensorflow_lite/convert_to_tflite.py`` +
``add_tflite_metadata.py``, SURVEY.md §2.2) with the JAX-native
equivalent: the jitted forward pass is serialized via ``jax.export``
(StableHLO bytes, loadable from any JAX process without the Python model
code), and the descriptive metadata the reference packs into TFLite
flatbuffers is written as a JSON sidecar with the same information:
model name/version/author/license, input image properties + normalization
(mean/std), output semantics, and the class labels.

Artifact layout under ``out_dir``:
    model.stablehlo      serialized jax.export artifact
    metadata.json        sidecar (schema below)
    labels.txt           one class name per line (reference scripts/labels.txt)
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_LABELS = ["background", "segmentation"]  # reference scripts/labels.txt


def make_forward_fn(model, variables) -> Callable[[jax.Array], jax.Array]:
    def forward(images: jax.Array) -> jax.Array:
        return model.apply(variables, images, train=False)

    return forward


def export_stablehlo(
    model,
    variables: Dict[str, Any],
    out_dir: str,
    batch_size: int = 1,
    image_size: Tuple[int, int] = (256, 256),
    channels: int = 3,
    labels: Optional[Sequence[str]] = None,
    model_name: str = "unet-image-segmentation-tpu",
    version: str = "v1",
    author: str = "unet_image_segmentation_tpu",
    license_str: str = "MIT",
    platforms: Optional[List[str]] = None,
) -> str:
    """Serialize the forward pass + metadata. Returns the artifact path."""
    from jax import export as jax_export

    os.makedirs(out_dir, exist_ok=True)
    forward = make_forward_fn(model, variables)
    h, w = image_size
    spec = jax.ShapeDtypeStruct((batch_size, h, w, channels), jnp.float32)
    exported = jax_export.export(
        jax.jit(forward),
        platforms=platforms or ["tpu", "cpu"],
    )(spec)
    blob = exported.serialize()
    artifact = os.path.join(out_dir, "model.stablehlo")
    with open(artifact, "wb") as f:
        f.write(blob)

    labels = list(labels or DEFAULT_LABELS)
    with open(os.path.join(out_dir, "labels.txt"), "w") as f:
        f.write("\n".join(labels) + "\n")

    num_classes = getattr(model, "num_classes", 1)
    metadata = {
        "name": model_name,
        "description": (
            "Semantic segmentation U-Net: per-pixel "
            + ("sigmoid probability mask (binary)" if num_classes == 1
               else f"{num_classes}-class softmax map")
        ),
        "version": version,
        "author": author,
        "license": license_str,
        "input": {
            "shape": [batch_size, h, w, channels],
            "dtype": "float32",
            "color_space": "RGB",
            "normalization": {"mean": [0.0], "std": [255.0]},
            "value_range": [0.0, 1.0],
        },
        "output": {
            "shape": [batch_size, h, w, num_classes],
            "dtype": "float32",
            "semantics": "probability mask",
            "binarization_threshold": 0.5,
        },
        "labels_file": "labels.txt",
        "labels": labels,
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    return artifact


def load_stablehlo(out_dir: str):
    """Load an exported artifact; returns (callable, metadata dict)."""
    from jax import export as jax_export

    artifact = os.path.join(out_dir, "model.stablehlo")
    with open(artifact, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta_path = os.path.join(out_dir, "metadata.json")
    metadata = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)

    def call(images: np.ndarray) -> np.ndarray:
        return np.asarray(exported.call(jnp.asarray(images)))

    return call, metadata
