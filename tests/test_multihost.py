"""Multi-host initialization actually executed (SURVEY §2.3 multi-host row).

Round 1 shipped ``parallel.distributed.initialize`` without ever running it
with ``process_count > 1``. This test launches a REAL 2-process
``jax.distributed`` job on CPU (localhost coordinator over gRPC — the same
coordination path a DCN multi-host TPU job uses), builds a global mesh
spanning both processes, and runs a psum across it.
"""

import os
import socket
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from unet_image_segmentation_tpu.parallel.distributed import (
    initialize, is_multihost, process_info,
)

initialize("localhost:{port}", num_processes=2, process_id={pid})
assert is_multihost(), process_info()
info = process_info()
assert info["process_count"] == 2, info
assert info["global_device_count"] == 4, info  # 2 local per process

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
sharding = NamedSharding(mesh, P("data"))
# Each process contributes its addressable shards of a global (4, 8) array.
global_np = np.arange(32, dtype=np.float32).reshape(4, 8)
arr = jax.make_array_from_callback((4, 8), sharding, lambda idx: global_np[idx])

total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
got = float(np.asarray(total.addressable_shards[0].data))
assert got == float(global_np.sum()), (got, global_np.sum())
print("MULTIHOST_OK", {pid}, got, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _CHILD.format(repo=REPO_ROOT, port=port, pid=pid),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO_ROOT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
