"""CPU-vs-TPU matmul micro-benchmark.

Equivalent of ``scripts/troubleshoot/check_gpu_benchmark.py`` (4096x4096
matmul, warmups + repeated trials, speedup classification bands >1.1x
faster / <0.9x slower), rebuilt for JAX device placement.  Also reports
achieved TFLOP/s against the chip's MXU peak — the number that matters on
TPU (bf16 matmuls should sit near peak; fp32 runs at a fraction).

Usage: python -m unet_image_segmentation_tpu.troubleshoot.check_tpu_benchmark
"""

from __future__ import annotations

import statistics
import sys
import time
from typing import List, Optional

MATRIX = 4096
TRIALS = 20
WARMUP = 3
RUNS = 3


def benchmark_matmul(device, dtype_name: str = "float32") -> Optional[List[float]]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.dtype(dtype_name)
    x = jax.device_put(
        np.random.RandomState(0).randn(MATRIX, MATRIX).astype(np.float32), device
    ).astype(dtype)

    @jax.jit
    def mm(a):
        return jnp.dot(a, a, preferred_element_type=jnp.float32)

    times = []
    for run in range(RUNS):
        for _ in range(WARMUP):
            mm(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(TRIALS):
            out = mm(x)
        out.block_until_ready()
        times.append((time.perf_counter() - t0) / TRIALS)
    return times


def main() -> int:
    import jax

    devices = jax.devices()
    cpu_devices = [d for d in devices if d.platform == "cpu"]
    accel = [d for d in devices if d.platform != "cpu"]
    if not cpu_devices:
        try:
            cpu_devices = jax.devices("cpu")
        except Exception:
            cpu_devices = []

    flops = 2 * MATRIX**3
    results = {}
    for label, device, dtype in (
        [("cpu/fp32", cpu_devices[0], "float32")] if cpu_devices else []
    ) + (
        [
            (f"{accel[0].platform}/fp32", accel[0], "float32"),
            (f"{accel[0].platform}/bf16", accel[0], "bfloat16"),
        ]
        if accel
        else []
    ):
        print(f"Benchmarking {MATRIX}x{MATRIX} matmul on {label} ...")
        times = benchmark_matmul(device, dtype)
        mean = statistics.mean(times)
        std = statistics.stdev(times) if len(times) > 1 else 0.0
        tflops = flops / mean / 1e12
        results[label] = mean
        print(f"  {label}: {mean * 1e3:.2f} ms ± {std * 1e3:.2f} "
              f"({tflops:.1f} TFLOP/s)")

    cpu_key = next((k for k in results if k.startswith("cpu")), None)
    accel_keys = [k for k in results if not k.startswith("cpu")]
    if cpu_key and accel_keys:
        best = min(accel_keys, key=lambda k: results[k])
        speedup = results[cpu_key] / results[best]
        if speedup > 1.1:
            verdict = f"accelerator is {speedup:.1f}x FASTER than CPU"
        elif speedup < 0.9:
            verdict = f"accelerator is {1 / speedup:.1f}x SLOWER than CPU (!)"
        else:
            verdict = "accelerator and CPU perform similarly (!)"
        print(verdict)
    elif not accel_keys:
        print("No accelerator found; CPU-only environment.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
