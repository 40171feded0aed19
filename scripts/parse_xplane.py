#!/usr/bin/env python
"""Aggregate a jax.profiler xplane trace into a per-op time table.

Usage:
  python scripts/parse_xplane.py /tmp/mmvc_trace [--top 40] [--json]

Reads the TPU device plane of the newest <host>.xplane.pb under the trace
dir's plugins/profile/ tree and prints total device time per op (XLA
fusions, Pallas custom calls, copies, dynamic-update-slices...), sorted by
total duration.  This is the tool behind the decode-step roofline table in
README.md (VERDICT r4 item 3): capture with `bench.py --trace DIR`, then
aggregate here — no tensorboard needed (the image lacks
tensorboard_plugin_profile; tensorflow's bundled xplane_pb2 suffices).
"""
import argparse
import collections
import glob
import json
import os
import re
import sys


def load_xplane(trace_dir):
    pats = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pats:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501  (bundled proto)

    space = xplane_pb2.XSpace()
    with open(pats[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def device_planes(space):
    for plane in space.planes:
        n = plane.name.lower()
        if "tpu" in n or "/device:" in n or "gpu" in n:
            yield plane


GROUPS = [
    ("pallas: decode gen attention", r"gen_attention|_kernel\b.*anc|ancestor"),
    ("pallas: decode prompt attention", r"prompt_attention|_prompt_kernel"),
    ("pallas: flash attention", r"flash|_attn_kernel"),
    ("pallas: int8/int4 matmul", r"int8_matmul|int4|quant_matmul|_mm_kernel"),
    ("pallas: beam topk", r"beam_topk|_topk"),
    ("pallas: beam gather", r"beam_gather"),
    ("pallas: stft", r"stft"),
    ("fusion: matmul/conv", r"^(%?)(fusion|convolution|dot|cublas|custom-call.*conv)"),
    ("copy / transpose", r"copy|transpose"),
    ("dynamic-update-slice", r"dynamic.update.slice|dynamic_update_slice"),
    ("gather / scatter", r"gather|scatter"),
    ("sort / topk (xla)", r"sort|top.?k"),
    ("reduce", r"reduce"),
]


def classify(name):
    for label, pat in GROUPS:
        if re.search(pat, name, re.I):
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--line-filter", default=None,
        help="only aggregate trace lines whose name matches this regex "
        "(e.g. 'XLA Ops' to skip host lines)",
    )
    args = ap.parse_args()
    space = load_xplane(args.trace_dir)

    per_op = collections.Counter()  # name -> total ps
    per_op_count = collections.Counter()
    plane_names = []
    for plane in device_planes(space):
        plane_names.append(plane.name)
        meta = plane.event_metadata
        for line in plane.lines:
            if args.line_filter and not re.search(args.line_filter, line.name, re.I):
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else f"id{ev.metadata_id}"
                per_op[name] += ev.duration_ps
                per_op_count[name] += 1
    if not per_op:
        sys.exit(f"no device events (planes seen: {plane_names})")

    total_ps = sum(per_op.values())
    rows = []
    grouped = collections.Counter()
    for name, ps in per_op.most_common():
        grouped[classify(name)] += ps
        rows.append(
            {
                "op": name[:110],
                "ms": round(ps / 1e9, 3),
                "count": per_op_count[name],
                "pct": round(100.0 * ps / total_ps, 2),
            }
        )
    out = {
        "planes": plane_names,
        "total_device_ms": round(total_ps / 1e9, 3),
        "groups": [
            {"group": g, "ms": round(ps / 1e9, 3), "pct": round(100.0 * ps / total_ps, 2)}
            for g, ps in grouped.most_common()
        ],
        "top_ops": rows[: args.top],
    }
    if args.json:
        print(json.dumps(out, indent=1))
        return
    print(f"planes: {plane_names}")
    print(f"total device time: {out['total_device_ms']:.1f} ms")
    print("\n-- groups --")
    for g in out["groups"]:
        print(f"{g['pct']:6.2f}%  {g['ms']:10.2f} ms  {g['group']}")
    print(f"\n-- top {args.top} ops --")
    for r in out["top_ops"]:
        print(f"{r['pct']:6.2f}%  {r['ms']:9.2f} ms  x{r['count']:<5d} {r['op']}")


if __name__ == "__main__":
    main()
