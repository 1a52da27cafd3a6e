"""Driver entry-point regression tests.

Round-1's only harness FAIL was ``dryrun_multichip`` raising when the
process sees fewer devices than requested (one real TPU chip) instead of
bootstrapping itself onto a virtual CPU mesh. These tests pin both paths:

- in-process: enough devices already visible (the test suite's 8-CPU mesh)
- bootstrap: subprocess re-exec that forces CPU via ``jax.config`` before
  backend init (env vars alone are ignored by the tunneled TPU backend)
"""

import os
import subprocess
import sys

import jax
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_in_process():
    # The suite runs on an 8-device CPU mesh, so this exercises the direct
    # path: real mesh creation, sharded train step, one executed step.
    __graft_entry__.dryrun_multichip(8)


def test_bootstrap_subprocess_forces_cpu_mesh():
    # Simulate the driver's environment: a process whose backend came up
    # with too few devices. The bootstrap must succeed from a clean env
    # (no JAX_PLATFORMS/XLA_FLAGS help from the caller).
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    snippet = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"  # 1-device CPU parent
        f"import sys; sys.path.insert(0, {REPO_ROOT!r})\n"
        "import __graft_entry__\n"
        "assert jax.device_count() == 1, jax.devices()\n"
        "__graft_entry__.dryrun_multichip(4)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", snippet],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_returns_jittable():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*args)  # compile-check without full execution
    del out


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="set RUN_SLOW=1")
def test_entry_executes():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 256, 1)
