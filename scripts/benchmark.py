#!/usr/bin/env python3
"""Wrapper: python scripts/benchmark.py == python -m unet_image_segmentation_tpu.cli.benchmark"""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
from unet_image_segmentation_tpu.cli.benchmark import main
if __name__ == "__main__":
    sys.exit(main())
