"""Install smoke test (reference ``scripts/troubleshoot/check_tf_install.py``).

Checks, in order: JAX import + version, visible devices (TPU/CPU), a tiny
jitted model forward pass with output-range validation, and gradient
computation.  Exit code 0 = healthy, 1 = broken.

Usage: python -m unet_image_segmentation_tpu.troubleshoot.check_install
"""

from __future__ import annotations

import sys


def check_devices() -> bool:
    import jax

    print(f"JAX version : {jax.__version__}")
    try:
        devices = jax.devices()
    except Exception as e:
        print(f"FAIL: no JAX backend available: {e}")
        return False
    print(f"Devices     : {devices}")
    platform = devices[0].platform
    if platform in ("tpu", "axon"):
        print("TPU detected — accelerated path active.")
    else:
        print(f"No TPU detected (platform={platform}); running on {platform}.")
    return True


def check_model_basic() -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_image_segmentation_tpu.config import ModelConfig
    from unet_image_segmentation_tpu.models.unet import build_unet, init_unet
    from unet_image_segmentation_tpu.ops.losses import dice_loss

    print("Building a tiny U-Net and running a jitted forward pass ...")
    cfg = ModelConfig(image_height=32, image_width=32, filters=(8, 16))
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(0), cfg.input_shape)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    y = np.asarray(y)
    if y.shape != (2, 32, 32, 1):
        print(f"FAIL: unexpected output shape {y.shape}")
        return False
    if not ((y >= 0.0).all() and (y <= 1.0).all()):
        print("FAIL: sigmoid output out of [0, 1]")
        return False
    print(f"Forward OK: shape {y.shape}, range [{y.min():.3f}, {y.max():.3f}]")

    grads = jax.grad(
        lambda p: dice_loss(
            jnp.ones_like(y), model.apply({**variables, "params": p}, x, train=False)
        )
    )(variables["params"])
    n_params = sum(g.size for g in jax.tree_util.tree_leaves(grads))
    print(f"Gradients OK: {n_params} parameters differentiable")
    return True


def main() -> int:
    ok = check_devices() and check_model_basic()
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
