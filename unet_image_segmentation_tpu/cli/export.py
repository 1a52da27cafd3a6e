"""Export CLI — serving/mobile artifacts from a checkpoint.

Mirrors the reference's converter flags
(``scripts/tensorflow_lite/convert_to_tflite.py:48-76``: INPUT OUTPUT
``--optimize --float16``) and adds the JAX-native StableHLO format:

  python -m unet_image_segmentation_tpu.cli.export stablehlo CKPT OUT_DIR
  python -m unet_image_segmentation_tpu.cli.export tflite CKPT OUT.tflite \
      [--optimize] [--float16]
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Export a trained model for serving.")
    sub = p.add_subparsers(dest="format", required=True)

    common = dict(add_help=False)
    shared = argparse.ArgumentParser(**common)
    shared.add_argument("model", type=str,
                        help="Orbax checkpoint dir or Keras .h5 file.")
    shared.add_argument("--image-size", type=int, default=256)
    shared.add_argument("--batch-size", type=int, default=1)
    shared.add_argument("--labels", type=str, default=None,
                        help="Labels file (one class per line).")

    sp = sub.add_parser("stablehlo", parents=[shared],
                        help="jax.export StableHLO artifact + metadata sidecar.")
    sp.add_argument("out_dir", type=str)

    tp = sub.add_parser("tflite", parents=[shared],
                        help=".tflite flatbuffer (requires TensorFlow).")
    tp.add_argument("output", type=str)
    tp.add_argument("--optimize", action="store_true",
                    help="Apply tf.lite.Optimize.DEFAULT.")
    tp.add_argument("--float16", action="store_true",
                    help="Store weights as float16.")
    tp.add_argument("--int8", action="store_true",
                    help="Full integer quantization (random representative "
                         "data unless --rep-images points at a directory).")
    tp.add_argument("--rep-images", type=str, default=None,
                    help="Directory of images for int8 calibration.")
    return p.parse_args(argv)


def _load(args):
    from unet_image_segmentation_tpu.models.unet import UNet
    from unet_image_segmentation_tpu.train.checkpoint import load_inference_variables

    variables, kwargs = load_inference_variables(args.model)
    kwargs = {
        k: v
        for k, v in (kwargs or {}).items()
        if k in ("num_classes", "filters", "dropout_rate", "use_batch_norm", "conv_type")
    }
    model = UNet(**kwargs)
    labels = None
    if args.labels:
        with open(args.labels) as f:
            labels = [line.strip() for line in f if line.strip()]
    return model, variables, labels


def main(argv=None) -> int:
    args = parse_args(argv)
    if not os.path.exists(args.model):
        print(f"Error: checkpoint not found -> {args.model}")
        return 1
    model, variables, labels = _load(args)
    size = (args.image_size, args.image_size)

    if args.format == "stablehlo":
        from unet_image_segmentation_tpu.export.stablehlo import export_stablehlo

        artifact = export_stablehlo(
            model, variables, args.out_dir,
            batch_size=args.batch_size, image_size=size, labels=labels,
        )
        print(f"StableHLO artifact written: {artifact}")
        print(f"Metadata sidecar: {os.path.join(args.out_dir, 'metadata.json')}")
        return 0

    from unet_image_segmentation_tpu.export.tflite import convert_to_tflite, tf_available

    if not tf_available():
        print("Error: TensorFlow unavailable; 'tflite' export needs it. "
              "Use 'stablehlo' for the TF-free artifact.")
        return 1
    rep = None
    if getattr(args, "rep_images", None):
        import cv2
        import numpy as np

        from unet_image_segmentation_tpu.data.loader import list_images

        rep = []
        for path in list_images(args.rep_images)[:16]:
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            img = cv2.resize(img, size[::-1]).astype(np.float32) / 255.0
            rep.append(img)
    out = convert_to_tflite(
        model, variables, args.output,
        batch_size=args.batch_size, image_size=size,
        optimize=args.optimize, float16=args.float16,
        int8=args.int8, representative_images=rep, labels=labels,
    )
    size_kb = os.path.getsize(out) / 1024
    print(f"TFLite model written: {out} ({size_kb:.0f} KiB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
