"""Multi-host (multi-slice / DCN) initialization.

Single-host v5e-8 is the primary target (SURVEY.md §2.3); this module is
the documented scale-out path beyond one host: ``jax.distributed``
coordination over DCN while each host drives its local chips over ICI.
After :func:`initialize`, ``jax.devices()`` spans the whole job and the
same ``create_mesh`` / sharded train step work unchanged — XLA routes
intra-slice collectives over ICI and inter-slice traffic over DCN based
on the mesh's device order (``mesh_utils.create_device_mesh`` puts
ICI-adjacent devices on the fastest-varying axes).

Typical launch (one process per host):

    python -m unet_image_segmentation_tpu.cli.train ... \
        --coordinator 10.0.0.2:9000 --num-processes 4 --process-id $ID

On Cloud TPU runtimes metadata autodetection usually suffices:
``initialize()`` with no arguments.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op when already initialized or when
    called with no arguments outside a recognized multi-host environment."""
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already initialized" in msg:
            return
        if coordinator_address is None and (
            "environment" in msg
            or "could not" in msg
            or "unable" in msg
            or "must be called before" in msg  # backend already up: single-host
        ):
            return  # single-host run / autodetection found nothing — fine
        raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
