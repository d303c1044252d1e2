"""Fold a full_map_benchmark stats.json into the repo's BENCH_FULLMAP.json.

    python scripts/fold_fullmap_stats.py /tmp/fullmap_bf16/stats.json

Appends the run entry (deduplicating on (quantize, streaming, raster)) and,
when the entry carries the hardened per-run ``projection_v5e8`` block
(streaming runs instrumented with prep_wall_s / device_busy_s), surfaces it
in the top-level ``v5e8_projection_s`` map keyed by quantize mode so both
production modes' compositions sit side by side in the record.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    src = sys.argv[1]
    with open(src) as f:
        run = json.load(f)
    path = os.path.join(REPO, "BENCH_FULLMAP.json")
    with open(path) as f:
        rec = json.load(f)

    key = (run.get("quantize"), bool(run.get("streaming")),
           tuple(run.get("raster", [])))
    rec["runs"] = [r for r in rec["runs"]
                   if (r.get("quantize"), bool(r.get("streaming")),
                       tuple(r.get("raster", []))) != key] + [run]

    proj = run.get("projection_v5e8")
    if proj is not None:
        top = rec.get("v5e8_projection_s")
        # migrate the legacy single-mode block to a per-mode map
        if top is not None and "projected_wall" in top:
            top = {top.get("quantize", "int8_static"): top}
        top = top or {}
        top[run["quantize"]] = {
            "projected_wall": round(proj["seconds"], 1),
            "formula": proj["formula"],
            "assumed_host_cores": proj["assumed_host_cores"],
            "synthetic_rasters_hole_free": True,
        }
        rec["v5e8_projection_s"] = top

    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec.get("v5e8_projection_s"), indent=1))


if __name__ == "__main__":
    main()
