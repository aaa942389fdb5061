#!/usr/bin/env python
"""Per-op profile of the flagship fused train step (TPU xplane trace).

Builds the same workload as bench.py, traces N steps with jax.profiler, and
prints a per-op device-time table parsed straight from the ``*.xplane.pb``
(hand-rolled protobuf wire parser — the tensorboard_plugin_profile converter
in this image is broken against its bundled TF).

Usage:
  python tools/profile_step.py [--steps 5] [--out /tmp/gdt_trace]
  python tools/profile_step.py --parse-only /tmp/gdt_trace   # reuse a trace

Env knobs are bench.py's (GDT_BENCH_BS, GDT_BENCH_DTYPE, GDT_USE_PALLAS...).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# -- minimal protobuf wire parsing (schema: tsl/profiler/protobuf/xplane.proto)


def _varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _varint(buf, pos)
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def parse_xplane(path):
    """-> list of planes: {name, lines: [{name, events: [(metadata_id,
    duration_ps)]}], event_names: {id: name}}."""
    data = open(path, "rb").read()
    planes = []
    for f, wt, val in _fields(data):
        if f != 1 or wt != 2:  # XSpace.planes
            continue
        plane = {"name": "", "lines": [], "event_names": {}}
        for pf, pwt, pval in _fields(val):
            if pf == 2 and pwt == 2:  # XPlane.name
                plane["name"] = pval.decode("utf-8", "replace")
            elif pf == 3 and pwt == 2:  # XPlane.lines
                line = {"name": "", "events": []}
                for lf, lwt, lval in _fields(pval):
                    if lf == 2 and lwt == 2:
                        line["name"] = lval.decode("utf-8", "replace")
                    elif lf == 4 and lwt == 2:  # XLine.events
                        mid = dur = 0
                        for ef, ewt, eval_ in _fields(lval):
                            if ef == 1 and ewt == 0:
                                mid = eval_
                            elif ef == 3 and ewt == 0:
                                dur = eval_
                        line["events"].append((mid, dur))
                plane["lines"].append(line)
            elif pf == 4 and pwt == 2:  # XPlane.event_metadata (map entry)
                k = None
                name = disp = None
                for mf, mwt, mval in _fields(pval):
                    if mf == 1 and mwt == 0:
                        k = mval
                    elif mf == 2 and mwt == 2:  # XEventMetadata value
                        for vf, vwt, vval in _fields(mval):
                            if vf == 2 and vwt == 2:
                                name = vval.decode("utf-8", "replace")
                            elif vf == 4 and vwt == 2:
                                disp = vval.decode("utf-8", "replace")
                if k is not None:
                    plane["event_names"][k] = disp or name or str(k)
        planes.append(plane)
    return planes


_CANON = [
    # (regex on op name, group label)
    (r"flash_attention.*dkv|flash_attention.*dq", "attention backward"),
    (r"flash_attention", "attention forward"),
    (r"^%?fusion|convolution", "conv/other fusions"),
    (r"copy", "copy"),
    (r"reduce", "reduce"),
    (r"broadcast", "broadcast"),
]


def _base_name(name: str) -> str:
    """Strip %, .N suffixes: %multiply_reduce_fusion.13 -> multiply_reduce_fusion."""
    name = name.lstrip("%")
    return re.sub(r"\.\d+$", "", name)


def summarize(trace_dir: str, steps: int, top: int = 40):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    path = paths[-1]
    sys.stderr.write(f"parsing {path}\n")
    planes = parse_xplane(path)
    device_planes = [p for p in planes if "TPU" in p["name"] or "/device" in p["name"].lower()]
    if not device_planes:
        sys.stderr.write(
            "no TPU device plane; planes: %s\n" % [p["name"] for p in planes]
        )
        device_planes = planes

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    for p in device_planes:
        names = p["event_names"]
        for line in p["lines"]:
            # XLA op lines carry per-op events; step lines etc. are coarser.
            if "step" in line["name"].lower():
                continue
            for mid, dur in line["events"]:
                nm = _base_name(names.get(mid, str(mid)))
                per_op[nm] += dur
                per_op_n[nm] += 1

    total_ps = sum(per_op.values())
    print(f"\ntotal device time: {total_ps/1e9/steps:.1f} ms/step over {steps} steps")
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for nm, ps in per_op.most_common(top):
        print(f"{ps/1e9/steps:9.2f}  {per_op_n[nm]//steps:6d}  {nm}")
    return per_op, total_ps


def run_trace(out_dir: str, steps: int):
    import numpy as np
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from generative_detection_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()
    import bench

    bs = int(os.environ.get("GDT_BENCH_BS", "16"))
    dtype = os.environ.get("GDT_BENCH_DTYPE", "bfloat16")
    phase = os.environ.get("GDT_BENCH_PHASE", "full")
    mesh, state, step_fn, batch = bench.build(bs, dtype, phase)
    with mesh:
        for _ in range(3):  # compile + warm
            state, metrics = step_fn(state, batch)
        float(np.asarray(metrics["aeloss"]))
        jax.profiler.start_trace(out_dir)
        for _ in range(steps):
            state, metrics = step_fn(state, batch)
        float(np.asarray(metrics["aeloss"]))
        jax.profiler.stop_trace()
    sys.stderr.write(f"trace written to {out_dir}\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--out", default="/tmp/gdt_trace")
    p.add_argument("--parse-only", default=None)
    p.add_argument("--top", type=int, default=40)
    opt = p.parse_args()
    if opt.parse_only:
        summarize(opt.parse_only, opt.steps, opt.top)
        return
    run_trace(opt.out, opt.steps)
    summarize(opt.out, opt.steps, opt.top)


if __name__ == "__main__":
    main()
