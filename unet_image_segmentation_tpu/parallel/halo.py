"""Halo-exchange spatial partitioning (shard_map + ppermute).

The conv-world counterpart of ring attention (SURVEY.md §5 long-context
analog): for high-resolution inputs (BASELINE configs[4], 1024x1024) the
image's row dimension is sharded across the mesh's ``spatial`` axis and
3x3 receptive fields at shard boundaries are satisfied by exchanging
1-row halos with mesh neighbours over ICI via ``jax.lax.ppermute``.

Two entry points:

* :func:`halo_exchange` — the communication primitive (tested on the
  8-device CPU mesh): pads each local shard with its neighbours' boundary
  rows (zeros at the global image edge).
* :func:`spatial_sharded_forward` — jit + sharding-annotation forward of
  the full U-Net with the batch on ``data`` and rows on ``spatial``; XLA
  GSPMD inserts the equivalent halo collectives for every conv/pool
  automatically.  This is the idiomatic production path; the explicit
  shard_map primitive exists for custom kernels (e.g. feeding the Pallas
  fused block per-shard) and for testing the communication pattern.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(x: jax.Array, axis_name: str, halo: int = 1) -> jax.Array:
    """Pad local rows with ``halo`` boundary rows from mesh neighbours.

    Inside ``shard_map``: x is the local (B, H_local, W, C) shard; returns
    (B, H_local + 2*halo, W, C).  The first shard's top halo and the last
    shard's bottom halo are zeros ('same'-padding semantics at the global
    image edge, matching the reference's padding="same" convs).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = x[:, :halo]       # my first rows -> previous neighbour's bottom halo
    bot_rows = x[:, -halo:]      # my last rows  -> next neighbour's top halo

    # Send my bottom rows "down" (to idx+1): they become that shard's top halo.
    down = [(i, i + 1) for i in range(n - 1)]
    top_halo = jax.lax.ppermute(bot_rows, axis_name, down)
    # Send my top rows "up" (to idx-1): they become that shard's bottom halo.
    up = [(i + 1, i) for i in range(n - 1)]
    bot_halo = jax.lax.ppermute(top_rows, axis_name, up)

    zero = jnp.zeros_like(top_rows)
    top_halo = jnp.where(idx == 0, zero, top_halo)
    bot_halo = jnp.where(idx == n - 1, zero, bot_halo)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def sharded_conv3x3_rows(
    kernel_apply: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis_name: str = "spatial",
) -> Callable[[jax.Array], jax.Array]:
    """Wrap a 'same'-padding row-local op needing 1-row halos in shard_map.

    ``kernel_apply`` maps (B, H_local + 2, W, C) -> (B, H_local + 2, W, C')
    (e.g. a 3x3 conv with 'same' padding); the wrapper trims the halo rows
    afterwards so composition stays row-aligned.
    """

    def local_fn(x_local: jax.Array) -> jax.Array:
        padded = halo_exchange(x_local, axis_name, halo=1)
        out = kernel_apply(padded)
        return out[:, 1:-1]

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )


def spatial_sharded_forward(
    model,
    variables,
    mesh: Mesh,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
) -> Callable[[jax.Array], jax.Array]:
    """Jit the model forward with batch+row sharding over the mesh.

    GSPMD propagates the input sharding through every conv/pool/transpose
    and inserts halo exchanges over ICI where receptive fields cross shard
    boundaries — the production path for 512/1024-res configs.
    """
    in_sharding = NamedSharding(mesh, P(batch_axis, spatial_axis, None, None))
    out_sharding = NamedSharding(mesh, P(batch_axis, spatial_axis, None, None))

    @partial(jax.jit, in_shardings=(in_sharding,), out_shardings=out_sharding)
    def forward(images: jax.Array) -> jax.Array:
        return model.apply(variables, images, train=False)

    return forward
