"""Fold a full_map_benchmark.py stats.json into BENCH_FULLMAP.json and
recompute the composed v5e-8 projection from measured numbers.

    python scripts/update_fullmap_record.py /path/to/stats.json

Projection composition (stated assumptions, no hidden scaling):
- On a real v5e-8 the streaming engine runs in ONE process with the tile
  program sharded tile-per-device (shard_map; bit-exact per
  tests/test_sharding.py), so the device phase divides by 8 and no shard
  merge is needed.
- The host pipeline (incremental LR synth, windowed ortho fill, LZW strip
  writes) is unchanged and overlaps device compute; it was measured on a
  1-core box here, so the projection's host floor uses the measured
  producer-limited wall-clock as an upper bound, not a parallel-host
  estimate.
- Projected wall = tiles_s / 8 + host_exclusive_s.  host_exclusive_s is
  the measured wall-clock NOT hidden under the tile phase (preprocess
  head + save tail + any producer stalls) — a conservative sum, since on
  a real v5e-8 host those phases would also shrink.
"""

from __future__ import annotations

import json
import os
import sys


def main():
    stats_path = sys.argv[1]
    rec_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_FULLMAP.json")
    with open(stats_path) as f:
        stats = json.load(f)
    with open(rec_path) as f:
        rec = json.load(f)

    # Replace only a run with the SAME (streaming, quantize) signature —
    # folding a non-streaming stats file must not delete the streaming
    # record for that quantize mode (ADVICE r3).
    rec["runs"] = [r for r in rec["runs"]
                   if not (bool(r.get("streaming")) ==
                           bool(stats.get("streaming")) and
                           r.get("quantize") == stats.get("quantize"))]
    rec["runs"].append(stats)

    if stats.get("streaming"):
        tiles_s = stats["tiles_s"]
        tails = stats.get("preprocess_s", 0.0) + stats.get("save_s", 0.0)
        host_excl = stats.get("host_exclusive_s", tails)
        # host floor: if the device finished bands faster than the host
        # pipeline could feed/drain them, tiles_s itself is host-limited;
        # we cannot separate the two on one chip, so the projection uses
        # tiles_s/8 for the device and reports the measured single-chip
        # host-side exposure unchanged (conservative: a v5e-8 host has
        # ~100x the cores of this 1-core box).
        rec["v5e8_projection_s"] = {
            "device_tiles_over_8": round(tiles_s / 8, 1),
            "host_exposed_measured": round(host_excl, 1),
            "projected_wall": round(tiles_s / 8 + host_excl, 1),
            "quantize": stats.get("quantize"),
            "comment": (
                "streaming row-band pipeline measured end-to-end on the "
                "production raster with all host phases overlapped; device "
                "phase divides across 8 chips via the tile-per-device "
                "shard_map (bit-exact, tests/test_sharding.py); host "
                "exposure is the measured single-chip value (1-core box — "
                "a real v5e-8 host would shrink it further)"),
        }

    with open(rec_path, "w") as f:
        json.dump(rec, f, indent=1)
    proj = rec.get("v5e8_projection_s")
    if proj is not None:
        print(json.dumps(proj, indent=1))


if __name__ == "__main__":
    main()
