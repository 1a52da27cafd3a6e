"""Single-image / batched inference engine.

Pipeline parity with reference ``scripts/inference.py`` (SURVEY.md §3.2):

* preprocess: ``cv2.imread`` **BGR** -> float32/255 -> bilinear resize to
  model size (normalize-*then*-resize order, ``inference.py:100-110``).
  Note the reference feeds the network BGR at inference time even though
  training used RGB loaders — a fidelity quirk we reproduce by default
  (``channel_order='bgr'``) because the committed golden outputs in
  ``samples/usage/*`` were produced this way; pass ``'rgb'`` to match the
  training distribution instead.
* forward: jitted Flax U-Net forward, (1, H, W, C) -> (1, H, W, 1).
* postprocess: bilinear-resize the *probability* mask back to the original
  resolution, then threshold to {0, 255} (resize-then-threshold order,
  ``inference.py:147-160``), save mask, largest-contour bbox crop of the
  original BGR image when area > min_area (``inference.py:172-197``), or
  the quad-warp crop from :mod:`.utils.image` (``crop_mode='warp'``).

The model is loaded from an Orbax checkpoint directory or a reference
Keras ``.h5`` (via :mod:`.utils.keras_import`) — the same interchange role
``load_model(custom_objects=...)`` plays in the reference.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_image_segmentation_tpu.models.unet import UNet
from unet_image_segmentation_tpu.train.checkpoint import load_inference_variables
from unet_image_segmentation_tpu.utils.image import (
    binarize_mask,
    extract_object_from_mask,
    largest_contour_bbox,
)


class Predictor:
    """Checkpoint-backed jitted forward pass with shape-bucketed compile.

    ``predict`` pads ragged batches up to the next power-of-two bucket so a
    dataset's last partial batch reuses an existing compilation instead of
    triggering a fresh trace per distinct batch size.
    """

    def __init__(
        self,
        model_path: str,
        image_size: Tuple[int, int] = (256, 256),
        model_kwargs: Optional[Dict[str, Any]] = None,
        compute_dtype: str = "float32",
        use_pallas: bool = False,
        quantize: Optional[str] = None,
    ):
        variables, inferred = load_inference_variables(model_path)
        kwargs = dict(inferred or {})
        if model_kwargs:
            kwargs.update(model_kwargs)
        kwargs = {
            k: v
            for k, v in kwargs.items()
            if k in ("num_classes", "filters", "dropout_rate", "use_batch_norm", "conv_type")
        }
        # use_pallas: the hand-scheduled max-fusion serving graph (fused
        # block-pair kernels; +20% at 256px, 2.4x at 1024px vs XLA on
        # v5e); falls back to the Flax module path for non-standard
        # configurations. Variable trees are identical either way.
        self.model = UNet(dtype=jnp.dtype(compute_dtype), **kwargs)
        self.variables = {"params": variables["params"]}
        if "batch_stats" in variables:
            self.variables["batch_stats"] = variables["batch_stats"]
        self.image_size = image_size

        self._predict = None
        # kwargs for (re)building the serving graph — StreamingPredictor
        # uses these to construct the spatially-sharded variant on a mesh.
        self.serving_kwargs = None
        if use_pallas and kwargs.get("conv_type", "separable") == "separable":
            try:
                from unet_image_segmentation_tpu.serving import (
                    build_serving_forward_chained,
                )

                serving_kwargs = dict(
                    num_classes=kwargs.get("num_classes", 1),
                    depth=len(kwargs.get("filters", (64, 128, 256, 512))),
                    compute_dtype=jnp.dtype(compute_dtype),
                )
                # chained-packed graph: stages exchange lane-packed
                # tensors, pools fuse into the pair kernels, and the
                # decoder concat interleaves in VMEM from two streams —
                # 18.7 ms vs the pair graph's 23.7 at 256px/b32 on v5e,
                # bit-identical outputs
                self._predict = build_serving_forward_chained(
                    self.variables, **serving_kwargs
                )
                self.serving_kwargs = serving_kwargs
            except Exception as e:
                import warnings

                warnings.warn(
                    f"use_pallas=True requested but the fused serving graph "
                    f"is unavailable ({type(e).__name__}: {e}); falling back "
                    f"to the XLA module path (slower)",
                    RuntimeWarning,
                    stacklevel=2,
                )
                self._predict = None
        if self._predict is None:
            def _forward(images: jax.Array) -> jax.Array:
                return self.model.apply(self.variables, images, train=False)

            self._predict = jax.jit(_forward)
        # int8-quantized chained serving graph (experimental): calibrated
        # lazily on the first predict() batch, then swapped in.  See
        # serving_quant.py for the quantization contract.
        if quantize not in (None, "int8"):
            raise ValueError(f"unsupported quantize mode {quantize!r}")
        self._quantize = quantize
        if quantize and not (
            use_pallas and self.serving_kwargs is not None
        ):
            import warnings

            warnings.warn(
                "quantize='int8' requires the fused serving graph "
                "(use_pallas=True with a separable-conv model); ignoring",
                RuntimeWarning,
                stacklevel=2,
            )
            self._quantize = None
        # the forward callable (jit-compatible) for composition into larger
        # programs (e.g. streaming pipelines)
        self.forward_fn = self._predict

    @property
    def num_classes(self) -> int:
        return self.model.num_classes

    def predict(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, C) float32 -> (B, H, W, num_classes) probabilities.

        Ragged batch sizes are padded to the next power of two (compile
        bucketing) and the padding rows sliced off the result.
        """
        b = int(images.shape[0])
        bucket = 1 << max(b - 1, 0).bit_length()
        if bucket != b:
            pad = np.zeros((bucket - b, *images.shape[1:]), dtype=images.dtype)
            images = np.concatenate([np.asarray(images), pad], axis=0)
        xb = jnp.asarray(images)
        if self._quantize == "int8":
            # first real batch doubles as the calibration sample; any
            # failure (e.g. an int8 lowering gap on the target backend)
            # falls back LOUDLY to the float serving graph
            try:
                from unet_image_segmentation_tpu.serving_quant import (
                    build_serving_forward_quant,
                    calibrate_chained,
                )

                scales = calibrate_chained(
                    self.variables, xb, **self.serving_kwargs
                )
                quant_fwd = build_serving_forward_quant(
                    self.variables, scales, **self.serving_kwargs
                )
                out = np.asarray(quant_fwd(xb))  # compile + execute now
                self._predict = quant_fwd
                self.forward_fn = self._predict
                self.quant_scales = scales
                self._quantize = None  # built; later batches reuse it
                return out[:b]
            except Exception as e:
                import warnings

                warnings.warn(
                    f"int8 serving graph unavailable "
                    f"({type(e).__name__}: {e}); falling back to the "
                    f"float serving graph",
                    RuntimeWarning,
                    stacklevel=2,
                )
                self._quantize = None
        out = np.asarray(self._predict(xb))
        return out[:b]


def preprocess_image(
    img_bgr: np.ndarray,
    target_hw: Tuple[int, int],
    channel_order: str = "bgr",
) -> np.ndarray:
    """Normalize (1/255) then bilinear-resize; returns (1, H, W, 3) float32.

    Order matters for parity: the reference normalizes *before* resizing
    (reference inference.py:107-109).
    """
    import cv2

    if channel_order == "rgb":
        img_bgr = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    img = img_bgr.astype(np.float32) / 255.0
    th, tw = target_hw
    if img.shape[:2] != (th, tw):
        img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
    return img[None]


def postprocess_mask(
    prob_mask: np.ndarray,
    orig_hw: Tuple[int, int],
    threshold: float = 0.5,
) -> np.ndarray:
    """(H, W, 1) probabilities -> (origH, origW) uint8 {0, 255} mask.

    Bilinear-resizes the probability field to the original resolution and
    thresholds afterwards (reference inference.py:147-160).
    """
    import cv2

    if prob_mask.ndim == 3 and prob_mask.shape[-1] == 1:
        prob_mask = prob_mask[..., 0]
    oh, ow = orig_hw
    if prob_mask.shape != (oh, ow):
        prob_mask = cv2.resize(prob_mask, (ow, oh), interpolation=cv2.INTER_LINEAR)
    return binarize_mask(prob_mask, threshold)


def run_inference(
    predictor: Predictor,
    input_path: str,
    output_mask: str = "./outputs_test/output_mask.png",
    output_cropped: str = "./outputs_test/output_cropped.png",
    threshold: float = 0.5,
    min_contour_area: float = 100.0,
    crop_mode: str = "bbox",
    channel_order: str = "bgr",
    verbose: bool = True,
) -> Dict[str, Any]:
    """Full single-image pipeline. Returns a result summary dict."""
    import cv2

    original_bgr = cv2.imread(input_path, cv2.IMREAD_COLOR)
    if original_bgr is None:
        raise IOError(f"could not read image {input_path}")
    orig_hw = original_bgr.shape[:2]

    batch = preprocess_image(original_bgr, predictor.image_size, channel_order)
    prob = predictor.predict(batch)[0]
    if predictor.num_classes > 1:
        # softmax head: upsample per-class probabilities, argmax to a class
        # map; the saved mask holds raw class ids and the crop uses the
        # foreground (class > 0) region.
        oh, ow = orig_hw
        prob_up = np.stack(
            [
                np.asarray(
                    cv2.resize(prob[..., c], (ow, oh), interpolation=cv2.INTER_LINEAR)
                )
                for c in range(prob.shape[-1])
            ],
            axis=-1,
        )
        class_map = np.argmax(prob_up, axis=-1).astype(np.uint8)
        binary_mask = ((class_map > 0).astype(np.uint8)) * 255
        mask_to_save = class_map
    else:
        binary_mask = postprocess_mask(prob, orig_hw, threshold)
        mask_to_save = binary_mask

    os.makedirs(os.path.dirname(os.path.abspath(output_mask)), exist_ok=True)
    cv2.imwrite(output_mask, mask_to_save)
    if verbose:
        print(f"Saved binary mask -> {output_mask}")

    result: Dict[str, Any] = {
        "mask_path": output_mask,
        "cropped_path": None,
        "bbox": None,
        "mask_area_frac": float((binary_mask > 0).mean()),
        "num_classes": predictor.num_classes,
    }

    cropped = None
    if crop_mode == "warp":
        warped_rgb = extract_object_from_mask(
            binary_mask, original_bgr, min_contour_area=min_contour_area
        )
        if warped_rgb is not None:
            cropped = cv2.cvtColor(warped_rgb, cv2.COLOR_RGB2BGR)
    else:
        bbox = largest_contour_bbox(binary_mask, min_contour_area)
        if bbox is not None:
            x, y, w, h = bbox
            cropped = original_bgr[y : y + h, x : x + w]
            result["bbox"] = bbox
    if cropped is not None and cropped.size:
        os.makedirs(os.path.dirname(os.path.abspath(output_cropped)), exist_ok=True)
        cv2.imwrite(output_cropped, cropped)
        result["cropped_path"] = output_cropped
        if verbose:
            print(f"Saved cropped object -> {output_cropped}")
    elif verbose:
        print("No contour above min area; cropped image not saved.")
    return result
