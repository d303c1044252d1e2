"""Summarize a framework_op_stats dump (scripts/profile_int8.py PROF_TRACE=1)
into the table PROFILE.md wants: top ops by device self-time with achieved
FLOP/s and HBM bytes, plus a category rollup (conv vs elementwise-fusion vs
reduction vs copy).

    python scripts/analyze_opstats.py /tmp/int8_framework_op_stats.json [N]
"""

from __future__ import annotations

import json
import sys


def load_rows(path: str):
    with open(path) as f:
        blob = json.load(f)
    # tensorboard_plugin_profile "framework_op_stats" JSON: either a GViz
    # table ({cols:[{label}..], rows:[{c:[{v}..]}..]}) or a list of dicts.
    if isinstance(blob, dict) and "rows" in blob and "cols" in blob:
        labels = [c.get("label") or c.get("id") for c in blob["cols"]]
        out = []
        for r in blob["rows"]:
            out.append({labels[i]: (cell or {}).get("v")
                        for i, cell in enumerate(r["c"])})
        return out
    if isinstance(blob, list) and blob and isinstance(blob[0], dict):
        return blob
    raise SystemExit(f"unrecognized schema: {type(blob)} keys "
                     f"{list(blob)[:8] if isinstance(blob, dict) else ''}")


def f(row, *names, default=0.0):
    for n in names:
        for k, v in row.items():
            if k and k.lower().replace(" ", "_").replace("-", "_") == n:
                try:
                    return float(v)
                except (TypeError, ValueError):
                    return default
    return default


def s(row, *names):
    for n in names:
        for k, v in row.items():
            if k and k.lower().replace(" ", "_").replace("-", "_") == n:
                return str(v)
    return ""


def categorize(op_name: str, op_type: str) -> str:
    t = (op_type or "").lower()
    n = (op_name or "").lower()
    if "conv" in t or "conv" in n:
        return "conv"
    if "dot" in t or "dot" in n:
        return "dot"
    if any(w in t for w in ("reduce", "sum", "mean", "max", "min")):
        return "reduce"
    if any(w in t for w in ("copy", "transpose", "reshape", "broadcast",
                            "concatenate", "slice", "pad", "gather")):
        return "data-movement"
    if "fusion" in t or "fusion" in n:
        return "fusion(elementwise)"
    return t or "other"


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rows = load_rows(path)
    # Keep device-side ops only when a host/device column exists.
    dev = [r for r in rows
           if s(r, "host/device", "host_or_device", "device").lower()
           not in ("host",)]
    stats = []
    for r in dev:
        t_us = f(r, "total_self_time_(us)", "self_time_(us)", "self_time",
                 "total_self_time")
        if t_us <= 0:
            continue
        stats.append({
            "op": s(r, "operation", "op_name", "name")[:90],
            "type": s(r, "type", "op_type", "category"),
            "self_us": t_us,
            "occ": int(f(r, "#occurrences", "occurrences", default=1) or 1),
            "gflops_s": f(r, "gflops/s", "gflop/s", "flop_rate"),
            "gbytes_s": f(r, "gb/s", "gbytes/s", "memory_bw",
                          "gigabytes/sec"),
        })
    stats.sort(key=lambda x: -x["self_us"])
    total = sum(x["self_us"] for x in stats)
    print(f"total device self-time: {total/1e3:.2f} ms over {len(stats)} ops")
    print(f"{'%':>5} {'self ms':>8} {'occ':>4} {'GF/s':>8} {'GB/s':>7}  op")
    for x in stats[:top_n]:
        print(f"{100*x['self_us']/total:5.1f} {x['self_us']/1e3:8.2f} "
              f"{x['occ']:4d} {x['gflops_s']:8.1f} {x['gbytes_s']:7.1f}  "
              f"[{x['type']}] {x['op']}")
    cats = {}
    for x in stats:
        c = categorize(x["op"], x["type"])
        cats[c] = cats.get(c, 0.0) + x["self_us"]
    print("\ncategory rollup:")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {100*t/total:5.1f}%  {t/1e3:8.2f} ms  {c}")


if __name__ == "__main__":
    main()
