"""Per-link backward-kernel floor table (VERDICT r4 item 2).

The 256px/b32 fused train step runs ~2.6x the whole-step modeled HBM
floor.  This tool measures each backward LINK kernel of the fused
training chains in isolation at its real stage shape, computes its DMA
floor (stream bytes / datasheet bandwidth), measures the chip's VPU
elementwise rate with a resident-data probe kernel, and attributes each
link's residual over its DMA floor to the counted VPU ALU work of the
kernel body (gy combine, 9-tap dz correlation, z recompute, 9-tap m
accumulation, reduction products) — the named wall.

Writes ``LINK_FLOORS.json`` and prints the table.  Run on the TPU::

    python -m unet_image_segmentation_tpu.troubleshoot.link_floors
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HW = 256
BATCH = 32


def _sync(x) -> float:
    import jax

    return float(jax.device_get(jax.numpy.asarray(x).reshape(-1)[0]))


def _time_fn(fn, *args, warmup=5, iters=20):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def measure_dispatch_ms() -> float:
    """Per-dispatch overhead: a trivial kernel, timed like the links."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jax.device_put(np.zeros((8, 128), np.float32))
    return _time_fn(run, x)


def measure_vpu_rate(dtype="float32") -> float:
    """Elementwise FMA rate (Gop/s) on VMEM-resident data.

    K is large enough that one dispatch carries ~2 GFLOP — per-dispatch
    overhead (~1.5 ms through this environment's tunnel) stays <10%.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.dtype(dtype)
    K = 2048
    shape = (1024, 512)

    def kernel(x_ref, o_ref):
        one_eps = jnp.asarray(1.000001, dt)

        def body(i, acc):
            return acc * one_eps + x_ref[...]  # 2 flops/elem/iter

        o_ref[...] = jax.lax.fori_loop(0, K, body, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jax.device_put(
        (np.random.rand(*shape).astype(np.float32) * 1e-3)
    ).astype(dt)
    ms = _time_fn(run, x, warmup=3, iters=10)
    return 2 * K * shape[0] * shape[1] / (ms * 1e-3) / 1e9


def stage_table(filters=(64, 128, 256, 512)):
    """(name, H, c_in, f1, f2, has_in_affine) for each chain at 256px.

    Encoder stage s: chain input c -> f, f -> f; decoder mirrors with the
    2f concat input.  The first chain (enc1) takes the zero-padded
    16-channel image (no input affine); every other chain input arrives
    in pre-affine form (in_affine on its first link).
    """
    rows = []
    h, c = HW, 16  # image padded 3 -> 16 for lane packing
    for i, f in enumerate(filters):
        rows.append((f"enc{i+1}", h, c, f, f, i > 0))
        h, c = h // 2, f
    rows.append(("bneck", h, c, 2 * filters[-1], 2 * filters[-1], True))
    h, c = h, 2 * filters[-1]
    for i, f in enumerate(reversed(filters)):
        h = h * 2
        rows.append((f"dec{len(filters)-i}", h, 2 * f, f, f, True))
        c = f
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            "LINK_FLOORS.json",
        ),
    )
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unet_image_segmentation_tpu.ops.pallas import fused_train as ft
    from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
        _pick_pack,
    )
    from bench import datasheet_hbm_peak_gbps  # repo-root bench helpers

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))

    bw = datasheet_hbm_peak_gbps() * 1e9
    dispatch_ms = measure_dispatch_ms()
    vpu_gops = measure_vpu_rate("float32")
    vpu_gops_bf16 = measure_vpu_rate("bfloat16")
    print(
        f"dispatch overhead ~{dispatch_ms:.3f} ms; VPU probe: "
        f"{vpu_gops:.0f} Gop/s f32, {vpu_gops_bf16:.0f} Gop/s bf16 "
        "(resident FMA)"
    )

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    rows = []
    for name, h, c_in, f1, f2, in_affine in stage_table():
        w = h
        for link, (c, f, has_aff, combine) in enumerate(
            [(c_in, f1, in_affine, False), (f1, f2, True, True)]
        ):
            pch = _pick_pack(c, f, w)
            if pch is None:
                continue
            pk = pch
            wp, pc, pf = w // pk, pk * c, pk * f
            xp = jax.device_put(
                rng.rand(BATCH, h, wp, pc).astype(np.float32)
            ).astype(dt)
            gp = jax.device_put(
                rng.rand(BATCH, h, wp, pf).astype(np.float32)
            ).astype(dt)
            yp = gp if combine else None
            dwk = jnp.asarray(rng.randn(3, 3, c).astype(np.float32) * 0.2)
            pww = jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.2)
            in_aff = (
                jnp.asarray(rng.rand(4, c).astype(np.float32) + 0.2)
                if has_aff
                else None
            )
            comb = (
                jnp.asarray(rng.rand(6, f).astype(np.float32) * 0.1)
                if combine
                else None
            )

            def run(xp, gp, yp):
                return ft._bwd_train_packed(
                    xp, gp, yp, dwk, pww, in_aff, comb,
                    mask_combine=combine, p=pk, c=c,
                )

            fn = jax.jit(run)
            ms = _time_fn(fn, xp, gp, yp, iters=args.iters)

            # DMA floor: reads x, g (+y when combine) + writes dx
            n_bytes = (
                xp.size * 2
                + gp.size * 2
                + (gp.size * 2 if combine else 0)
                + xp.size * 2
            )
            dma_ms = n_bytes / bw * 1e3
            # VPU ALU model (ops per element of the (H, Wp) x lanes body):
            #   pc-lane work: dz 9-tap (18) + m 9-tap (18) + products (11)
            #     + z recompute (3) + masks/xhat (6) + shifts (~4 copies)
            #   pf-lane work: gy combine (~7) when combine else 0
            el_pc = BATCH * h * wp * pc
            el_pf = BATCH * h * wp * pf
            alu_ops = el_pc * 60 + (el_pf * 7 if combine else 0)
            alu_ms = alu_ops / (vpu_gops * 1e9) * 1e3
            # MXU work: dm matmul + dpw matmul + the wide colsum matvec
            mxu_flops = (
                2 * BATCH * h * wp * pf * pc * 2  # dm + dpw
                + 2 * BATCH * h * wp * 12 * pc    # colsum matvec
            )
            mxu_ms = mxu_flops / 197e12 * 1e3
            adj = max(ms - dispatch_ms, 1e-3)
            rows.append(
                {
                    "stage": name,
                    "link": link + 1,
                    "shape": f"{h}x{w} {c}->{f} p{pk}",
                    "measured_ms": round(ms, 3),
                    "minus_dispatch_ms": round(adj, 3),
                    "dma_floor_ms": round(dma_ms, 3),
                    "x_dma": round(adj / dma_ms, 2),
                    "vpu_model_ms": round(alu_ms, 3),
                    "mxu_model_ms": round(mxu_ms, 3),
                    "model_ms": round(max(dma_ms, alu_ms + mxu_ms), 3),
                }
            )
            r = rows[-1]
            print(
                f"{name} link{link+1:d} {r['shape']:>22s}: "
                f"{adj:7.3f} ms (-disp)  dma {dma_ms:6.3f} "
                f"({r['x_dma']:5.2f}x)  vpu~{alu_ms:6.3f}  "
                f"mxu~{mxu_ms:6.3f}",
                flush=True,
            )

    total = sum(r["minus_dispatch_ms"] for r in rows)
    dma_total = sum(r["dma_floor_ms"] for r in rows)
    model_total = sum(r["model_ms"] for r in rows)
    summary = {
        "config": f"{HW}px b{BATCH} bf16, backward links in isolation",
        "hbm_peak_gbps": bw / 1e9,
        "dispatch_overhead_ms": round(dispatch_ms, 3),
        "vpu_probe_gops_f32": round(vpu_gops, 1),
        "vpu_probe_gops_bf16": round(vpu_gops_bf16, 1),
        "links": rows,
        "total_measured_ms": round(total, 3),
        "total_dma_floor_ms": round(dma_total, 3),
        "total_model_ms": round(model_total, 3),
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(
        f"\nTOTAL {total:.2f} ms vs DMA floor {dma_total:.2f} "
        f"({total / dma_total:.2f}x); max(dma, vpu+mxu) model "
        f"{model_total:.2f} ms -> {args.out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
