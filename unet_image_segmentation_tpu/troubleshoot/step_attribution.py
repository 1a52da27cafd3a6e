"""In-step kernel attribution for the flagship train step (VERDICT r4 #2).

Profiles the 256px/b32 fused train step on the attached TPU, parses the
XSpace trace (``profile_summary``), maps every hot op to its kernel
source site through the compiled HLO's metadata (``source_file:line``),
and emits ``STEP_ATTRIBUTION.json``: per-site device time, per-site DMA
floors, and the step-level rollup (forward / backward / XLA glue).

This replaces isolated per-kernel microbenches, which on this tunneled
environment are dominated by ~1.5-2.5 ms per-dispatch overhead (smaller
kernels measure as pure dispatch) — in-step device times from the
profiler are the trustworthy per-kernel signal.

Usage::

    python -m unet_image_segmentation_tpu.troubleshoot.step_attribution
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import tempfile

import numpy as np

HW = 256
BATCH = 32
STEPS = 10


def build_step():
    from unet_image_segmentation_tpu.config import Config
    from unet_image_segmentation_tpu.models.unet import build_unet
    from unet_image_segmentation_tpu.train.state import create_train_state
    from unet_image_segmentation_tpu.train.steps import make_train_step

    cfg = Config().override(
        model__image_height=HW,
        model__image_width=HW,
        model__compute_dtype="bfloat16",
        model__use_pallas=True,
        train__batch_size=BATCH,
    )
    model = build_unet(cfg.model)
    state = create_train_state(cfg)
    step = make_train_step(model, "dice", donate=True)
    return state, step


def hlo_source_map(hlo_text: str):
    """{hlo_op_name: 'file.py:line'} for custom calls (pallas kernels)."""
    out = {}
    pat = re.compile(
        r"%([\w.\-]+) = [^\n]*?custom-call[^\n]*?"
        r'source_file="([^"]+)" source_line=(\d+)'
    )
    for name, f, ln in pat.findall(hlo_text):
        out[name] = f"{os.path.basename(f)}:{ln}"
    return out


def hlo_op_info(hlo_text: str):
    """{hlo_op_name: (result_shape, 'file.py:line'|None)} for EVERY op.

    Used by ``--glue-detail`` to name the non-kernel ops (reshapes,
    copies, fusions) the profiler reports: the result shape says which
    tensor is being repacked/relaid, the source line says which jnp op
    emitted it.
    """
    out = {}
    head = re.compile(r"%([\w.\-]+) = (\(?[a-z0-9]+\[[^\]=]*\])")
    src_pat = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
    for line in hlo_text.splitlines():
        m = head.search(line)
        if m is None:
            continue
        name, shape = m.groups()
        sm = src_pat.search(line)
        src = f"{os.path.basename(sm.group(1))}:{sm.group(2)}" if sm else None
        out[name] = (shape, src)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "STEP_ATTRIBUTION.json",
        ),
    )
    p.add_argument(
        "--glue-detail", action="store_true",
        help="also report the top non-kernel ops individually "
        "(shape + emitting source line) instead of only family rollups",
    )
    args = p.parse_args(argv)

    import jax

    from unet_image_segmentation_tpu.troubleshoot.profile_summary import (
        summarize,
    )

    state, step = build_step()
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.rand(BATCH, HW, HW, 3).astype(np.float32))
    y = jax.device_put(
        (rng.rand(BATCH, HW, HW, 1) > 0.5).astype(np.float32)
    )
    # compiled text BEFORE donation consumes the state
    hlo = (
        jax.jit(lambda s, a, b: step(s, a, b))
        .lower(state, x, y)
        .compile()
        .as_text()
    )
    srcmap = hlo_source_map(hlo)

    for _ in range(12):
        state, metrics = step(state, x, y)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    tdir = tempfile.mkdtemp(prefix="unet_tpu_attr_")
    jax.profiler.start_trace(tdir)
    for _ in range(STEPS):
        state, metrics = step(state, x, y)
    float(jax.device_get(metrics["loss"]))
    jax.profiler.stop_trace()

    ops = summarize(tdir, line_filter="XLA Ops", exact=True)
    dev = next(v for k, v in ops.items() if "TPU" in k)
    per_site = collections.defaultdict(float)
    glue = collections.defaultdict(float)
    glue_ops = []
    opinfo = hlo_op_info(hlo) if args.glue_detail else {}
    for name, ms in dev.items():
        site = srcmap.get(name)
        if site is not None:
            per_site[site] += ms / STEPS
        else:
            fam = re.sub(r"[._-]?\d+$", "", name)
            glue[fam] += ms / STEPS
            if args.glue_detail and ms / STEPS >= 0.03:
                shape, src = opinfo.get(name, (None, None))
                glue_ops.append(
                    (round(ms / STEPS, 3), name, shape, src)
                )
    total = sum(dev.values()) / STEPS
    kern = sum(per_site.values())
    record = {
        "config": f"{HW}px b{BATCH} bf16 fused train step, {STEPS} steps",
        "device_ms_per_step": round(total, 2),
        "kernel_ms_per_step": round(kern, 2),
        "glue_ms_per_step": round(total - kern, 2),
        "per_site_ms": {
            k: round(v, 3)
            for k, v in sorted(per_site.items(), key=lambda kv: -kv[1])
        },
        "glue_ms": {
            k: round(v, 3)
            for k, v in sorted(glue.items(), key=lambda kv: -kv[1])
            if v >= 0.05
        },
    }
    if args.glue_detail:
        record["glue_ops"] = [
            {"ms": ms, "op": name, "shape": shape, "src": src}
            for ms, name, shape, src in sorted(glue_ops, reverse=True)
        ]
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
