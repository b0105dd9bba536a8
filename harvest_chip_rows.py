#!/usr/bin/env python
"""Assemble round-5 perf artifacts from banked chip-session rows.

CHIP_SESSION_r05.jsonl accumulates every successful measurement across
sessions (append + fsync at bank time). This script folds them into:
  BENCH_MICRO_r05.json — best (lowest-ms) row per micro metric
  BENCH_SESSION_r05.json — every Q1/Q3 macro row, in order
Run at any time; idempotent.
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "CHIP_SESSION_r05.jsonl")


def main():
    micro = {}
    macros = []
    notes = []
    if os.path.exists(SRC):
        for line in open(SRC):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            m = rec.get("metric")
            if not m:
                if rec.get("phase") in ("watchdog_exit",):
                    notes.append(rec)
                continue
            if m.startswith("tpch_"):
                if "value" in rec:
                    macros.append(rec)
                continue
            if "ms" in rec:
                best = micro.get(m)
                if best is None or rec["ms"] < best["ms"]:
                    micro[m] = rec
    with open(os.path.join(HERE, "BENCH_MICRO_r05.json"), "w") as f:
        json.dump({"source": "CHIP_SESSION_r05.jsonl",
                   "hardware": "v5e via axon tunnel (1 chip)",
                   "rows": sorted(micro.values(),
                                  key=lambda r: r["metric"]),
                   "watchdog_exits": notes}, f, indent=1)
    with open(os.path.join(HERE, "BENCH_SESSION_r05.json"), "w") as f:
        json.dump({"source": "CHIP_SESSION_r05.jsonl",
                   "rows": macros}, f, indent=1)
    print(f"micro metrics: {len(micro)}; macro rows: {len(macros)}")


if __name__ == "__main__":
    main()
