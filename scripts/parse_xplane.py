"""Parse a jax.profiler xplane.pb directly into per-op device time totals.

The tensorboard_plugin_profile converter in this image is broken against
the installed protobuf/TF pair (descriptor-version clash, and the
pure-python fallback hits a missing pywrap symbol), so this goes straight
at the XSpace proto via tensorflow.tsl.profiler.protobuf.xplane_pb2 —
aggregating XEvent durations by event name on the TPU device plane gives
the same op-level totals the "framework_op_stats" tool would.

    python scripts/parse_xplane.py /tmp/int8_trace [--top 40] [--steps 4]

--steps divides the totals by the number of traced executions so the
printed times are per-forward.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_totals(xspace, plane_filter=("/device:TPU", "TPU")):
    """{event_name: total_ps} over all lines of TPU device planes
    (XLA ops land on the per-core op lines)."""
    totals = collections.Counter()
    counts = collections.Counter()
    planes = [p for p in xspace.planes
              if any(s in p.name for s in plane_filter)]
    for p in planes:
        meta = {m.id: m.name for m in p.event_metadata.values()}
        for line in p.lines:
            # Keep ONLY the synchronous op line: "XLA Modules" double-counts
            # its children and "Async XLA Ops" (weight prefetch copy-starts)
            # overlaps compute — both inflate totals past wall-clock.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps
                counts[name] += 1
    return totals, counts, [p.name for p in planes]


GROUPS = [
    ("conv int8 (s8xs8)", re.compile(r"^%?convolution.*s8|^%?conv.*int8")),
    ("conv (all)", re.compile(r"conv")),
    ("fusion", re.compile(r"^%?(loop_|input_|output_)?fusion")),
    ("copy/transpose", re.compile(r"copy|transpose")),
    ("dot", re.compile(r"^%?dot")),
    ("reduce", re.compile(r"reduce")),
]


def load_hlo_info(hlo_path: str):
    """{instr_name: (op_name, file:line)} from an HLO text dump — joins
    trace events (named by HLO instruction) back to model source lines."""
    info = {}
    with open(hlo_path) as f:
        hlo = f.read()
    for m in re.finditer(
            r'%([\w.\-]+) = [^\n]*?metadata=\{op_name="([^"]+)"'
            r'(?: source_file="([^"]+)" source_line=(\d+))?', hlo):
        name, opn, sf, sl = m.groups()
        opn = re.sub(r"^jit\([^)]*\)/", "", opn)
        info[name] = (opn, f"{(sf or '?').split('/')[-1]}:{sl or '?'}")
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=1,
                    help="number of traced executions (divide totals)")
    ap.add_argument("--hlo", default=None,
                    help="HLO text dump of the traced program: aggregate by "
                         "(op_name, source line) instead of raw op names")
    a = ap.parse_args()

    pbs = sorted(glob.glob(os.path.join(a.trace_dir, "**", "*.xplane.pb"),
                           recursive=True))
    if not pbs:
        sys.exit(f"no xplane.pb under {a.trace_dir}")
    xs = load_xspace(pbs[-1])
    totals, counts, planes = device_op_totals(xs)
    if a.hlo:
        info = load_hlo_info(a.hlo)
        agg, cnt = collections.Counter(), collections.Counter()
        unmatched = 0
        for name, ps in totals.items():
            m = re.match(r"%([\w.\-]+)", name)
            key = info.get(m.group(1)) if m else None
            if key is None:
                key = ("<unmatched>", "?")
                unmatched += ps
            agg[f"{key[0]:34s} {key[1]}"] += ps
            cnt[f"{key[0]:34s} {key[1]}"] += counts[name]
        totals, counts = agg, cnt
    if not totals:
        # fall back: dump plane/line names so the filter can be fixed
        for p in xs.planes:
            print("plane:", p.name, [ln.name for ln in p.lines][:6])
        sys.exit("no events matched the TPU op-line filter")
    print("planes:", planes)
    grand = sum(totals.values())
    print(f"total device op time: {grand/1e12/a.steps*1e3:.2f} ms/step "
          f"over {a.steps} step(s)\n")
    print(f"{'ms/step':>9} {'%':>5} {'count':>6}  op")
    for name, ps in totals.most_common(a.top):
        print(f"{ps/1e12/a.steps*1e3:9.3f} {100*ps/grand:5.1f} "
              f"{counts[name]//a.steps:6d}  {name[:110]}")

    print("\nby group (regex over op names, first match wins):")
    gtot = collections.Counter()
    for name, ps in totals.items():
        for g, rx in GROUPS:
            if rx.search(name):
                gtot[g] += ps
                break
        else:
            gtot["other"] += ps
    for g, ps in gtot.most_common():
        print(f"{ps/1e12/a.steps*1e3:9.3f} ms {100*ps/grand:5.1f}%  {g}")


if __name__ == "__main__":
    main()
