#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace: device time by op, transport gap.

Why: wall-clock timings on this serving backend include a large and
highly variable host/transport component (measured 2–3× swings within a
session — BASELINE.md), so kernel-vs-kernel comparisons must use DEVICE
time from the profile, which is immune to host jitter.

Usage:
  scripts/analyze_xplane.py <profile_dir> [--top N]

Prints total device-busy time, the top-N HLO ops by self time, and the
per-category rollup, as one JSON object.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def find_xplane(profile_dir: str) -> str:
    hits = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        sys.exit(f"no *.xplane.pb under {profile_dir}")
    return hits[-1]


def load_hlo_stats(xplane_path: str):
    from xprof.convert import raw_to_tool_data as rtd  # ships in this image

    data, _ = rtd.xspace_to_tool_data([xplane_path], "hlo_stats", {})
    obj = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in obj["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    rows = []
    for r in obj["rows"]:
        v = [c.get("v") for c in r["c"]]
        rows.append(
            dict(
                category=v[idx["category"]],
                name=v[idx["hlo_op_name"]],
                occurrences=v[idx["occurrences"]],
                total_us=v[idx["total_time"]],
                self_us=v[idx["total_self_time"]],
                bound_by=v[idx.get("bound_by", 0)] if "bound_by" in idx else "",
            )
        )
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("profile_dir")
    p.add_argument("--top", type=int, default=12)
    args = p.parse_args()

    path = find_xplane(args.profile_dir)
    rows = load_hlo_stats(path)
    total_us = sum(r["self_us"] or 0.0 for r in rows)
    by_cat = {}
    for r in rows:
        by_cat[r["category"]] = by_cat.get(r["category"], 0.0) + (r["self_us"] or 0.0)
    top = sorted(rows, key=lambda r: -(r["self_us"] or 0.0))[: args.top]
    print(
        json.dumps(
            {
                "xplane": path,
                "device_busy_ms": round(total_us / 1e3, 3),
                "by_category_ms": {
                    k: round(v / 1e3, 3)
                    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
                },
                "top_ops": [
                    {
                        "name": r["name"],
                        "category": r["category"],
                        "occurrences": r["occurrences"],
                        "self_ms": round((r["self_us"] or 0.0) / 1e3, 3),
                    }
                    for r in top
                ],
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
