"""Summarize a ``jax.profiler`` trace without TensorFlow tooling.

``jax.profiler.start_trace`` writes ``plugins/profile/<ts>/<host>.xplane.pb``
(an XSpace protobuf).  The usual readers (TensorBoard's profile plugin)
drag in TF-version-pinned native wrappers that do not work in this image,
so this parses the wire format directly — the few message shapes needed
are stable public protos (tensorflow/core/profiler/protobuf/xplane.proto).

Usage::

    python -m unet_image_segmentation_tpu.troubleshoot.profile_summary \
        /tmp/tprof [--top 30] [--line "XLA Ops"]

Prints per-op total device time aggregated over the trace, the tool this
repo's kernel work is steered by (fusion names identify XLA's generated
fusions; ``fusion`` rows with ``copy``/``transpose`` in them are the
layout copies the packed Pallas chain exists to eliminate).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import struct
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
            yield fnum, wt, v
        elif wt == 1:  # fixed64
            yield fnum, wt, struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            yield fnum, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            yield fnum, wt, struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:  # pragma: no cover - groups unused by xplane
            raise ValueError(f"unsupported wire type {wt}")


def _parse_event(buf: bytes) -> Tuple[int, int]:
    """XEvent -> (metadata_id, duration_ps)."""
    mid = dur = 0
    for fnum, _, v in fields(buf):
        if fnum == 1:
            mid = v
        elif fnum == 3:
            dur = v
    return mid, dur


def _parse_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    """XLine -> (name, [(metadata_id, duration_ps)]).

    The events field number differs between xplane.proto revisions (4 in
    the libtpu shipping here, 6 upstream); both are length-delimited
    XEvent messages, so accept either."""
    name = ""
    events = []
    for fnum, wt, v in fields(buf):
        if fnum == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fnum in (4, 6) and wt == 2:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    eid = 0
    name = ""
    for fnum, wt, v in fields(buf):
        if fnum == 1 and wt == 0:
            eid = v
        elif fnum == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
    # device-plane metadata carries the whole HLO instruction text; the
    # op name proper is the token before " = "
    if " = " in name:
        name = name.split(" = ", 1)[0].lstrip("%")
    return eid, name


def parse_plane(buf: bytes):
    """XPlane -> (name, {metadata_id: name}, [(line_name, events)])."""
    name = ""
    meta: Dict[int, str] = {}
    lines = []
    for fnum, wt, v in fields(buf):
        if fnum == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines.append(_parse_line(v))
        elif fnum == 4 and wt == 2:  # map<int64, XEventMetadata>
            key = 0
            val = b""
            for mf, mw, mv in fields(v):
                if mf == 1:
                    key = mv
                elif mf == 2:
                    val = mv
            eid, ename = _parse_event_metadata(val)
            meta[key or eid] = ename
    return name, meta, lines


def iter_planes(path: str):
    with open(path, "rb") as f:
        space = f.read()
    for fnum, wt, v in fields(space):
        if fnum == 1 and wt == 2:  # XSpace.planes
            yield parse_plane(v)


def summarize(
    logdir: str, line_filter: str = "XLA Ops", exact: bool = False
) -> Dict[str, Dict[str, float]]:
    """{plane_name: {op_name: total_ms}} across every xplane file under
    ``logdir`` (a ``start_trace`` directory or a single .xplane.pb).

    ``exact`` matches the line name exactly — NB the default substring
    match merges 'Async XLA Ops' (overlapping DMA spans) into 'XLA Ops',
    which inflates totals well past wall time."""
    if os.path.isfile(logdir):
        paths = [logdir]
    else:
        paths = sorted(
            glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
        )
    out: Dict[str, Dict[str, float]] = {}
    for path in paths:
        for pname, meta, lines in iter_planes(path):
            dest = out.setdefault(pname, collections.defaultdict(float))
            for lname, events in lines:
                if exact:
                    if lname != line_filter:
                        continue
                elif line_filter and line_filter not in lname:
                    continue
                for mid, dur_ps in events:
                    dest[meta.get(mid, f"#{mid}")] += dur_ps / 1e9
    return {k: dict(v) for k, v in out.items()}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", default="XLA Ops", help="line-name substring")
    ap.add_argument(
        "--plane", default="TPU", help="plane-name substring (device plane)"
    )
    ap.add_argument(
        "--exact", action="store_true",
        help="match the line name exactly (avoids merging 'Async XLA Ops')",
    )
    args = ap.parse_args()

    planes = summarize(args.logdir, args.line, exact=args.exact)
    for pname, ops in planes.items():
        if args.plane and args.plane not in pname:
            continue
        total = sum(ops.values())
        if not total:
            continue
        print(f"== {pname} — line '{args.line}', total {total:.1f} ms ==")
        ranked = sorted(ops.items(), key=lambda kv: -kv[1])
        for name, ms in ranked[: args.top]:
            print(f"{ms:9.2f} ms  {100 * ms / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
