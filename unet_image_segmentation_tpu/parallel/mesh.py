"""Device-mesh runtime.

The reference is strictly single-process/single-device (SURVEY.md §2.3: no
tf.distribute, no collectives anywhere).  This module is the TPU-native
replacement: a ``jax.sharding.Mesh`` over the slice with

* a ``data`` axis — batch-sharded DP; XLA inserts the gradient all-reduce
  (psum) over ICI when the jitted train step consumes a batch sharded on
  this axis and produces replicated grads;
* a ``spatial`` axis — image-row sharding for the halo-exchange high-res
  configs (see :mod:`.halo`).

On a v5e-8 slice the default is ``(data=8, spatial=1)``.  Tests exercise
the same code on 8 virtual CPU devices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh. ``data=-1`` = all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial > n:
        raise ValueError(f"mesh {data}x{spatial} needs more than {n} devices")
    devices = devices[: data * spatial]
    if len(devices) == jax.device_count():
        arr = mesh_utils.create_device_mesh((data, spatial), devices=devices)
    else:
        arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """NHWC batch sharding: batch on 'data', optionally rows on 'spatial'."""
    if spatial:
        return NamedSharding(mesh, P("data", "spatial", None, None))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, spatial: bool = False) -> Any:
    """Device-put a host batch (pytree of arrays) with batch sharding."""
    sharding = batch_sharding(mesh, spatial)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def pad_batch_to_devices(images: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis to a multiple of ``n`` (returns pad count).

    Needed because sharded batch dims must divide evenly; padded rows are
    masked out of metrics by callers.
    """
    b = images.shape[0]
    pad = (-b) % n
    if pad:
        images = np.concatenate([images, np.repeat(images[-1:], pad, 0)], 0)
    return images, pad
