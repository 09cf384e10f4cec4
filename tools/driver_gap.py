"""Driver-gap analysis from a Spark event log: how much of the wall clock
had ZERO tasks running?

The scaling gate divides end-to-end suite walls, so time the DRIVER spends
between stages (catalyst analysis, AQE re-optimization, py4j, job
submission) is a fixed cost that does not shrink with cores — at the large
level it caps the measurable speedup. This tool makes that share visible:

    python tools/driver_gap.py <eventlog-file-or-dir> [...]

For each application log it merges all task [launch, finish] intervals and
reports total wall, busy wall (>=1 task running), gap wall (no task
running), and the gap share — plus the largest individual gaps with the
stage that follows each (what the driver was preparing).
"""

from __future__ import annotations

import json
import os
import sys


def analyze(path: str) -> dict:
    tasks: list[tuple[int, int]] = []
    stage_starts: list[tuple[int, str]] = []
    t_app0 = t_app1 = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerApplicationStart":
                t_app0 = ev.get("Timestamp")
            elif kind == "SparkListenerApplicationEnd":
                t_app1 = ev.get("Timestamp")
            elif kind == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                t0, t1 = ti.get("Launch Time"), ti.get("Finish Time")
                if t0 and t1 and t1 > t0:
                    tasks.append((t0, t1))
            elif kind == "SparkListenerStageSubmitted":
                si = ev.get("Stage Info", {})
                sub = si.get("Submission Time")
                if sub:
                    stage_starts.append((sub, si.get("Stage Name", "?")))
    if not tasks:
        return {"log": os.path.basename(path), "error": "no tasks"}
    tasks.sort()
    merged: list[list[int]] = []
    for t0, t1 in tasks:
        if merged and t0 <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], t1)
        else:
            merged.append([t0, t1])
    lo = t_app0 or merged[0][0]
    hi = t_app1 or merged[-1][1]
    busy = sum(b - a for a, b in merged)
    # gaps between merged busy intervals (inside the app window)
    gaps: list[tuple[int, int]] = []
    prev = lo
    for a, b in merged:
        if a > prev:
            gaps.append((prev, a))
        prev = max(prev, b)
    if hi > prev:
        gaps.append((prev, hi))
    gaps.sort(key=lambda g: g[0] - g[1])
    stage_starts.sort()

    def next_stage(t: int) -> str:
        for sub, name in stage_starts:
            if sub >= t:
                return name[:60]
        return "(end of app)"

    wall = (hi - lo) / 1000.0
    gap_total = sum(b - a for a, b in gaps) / 1000.0
    return {
        "log": os.path.basename(path),
        "wall_sec": round(wall, 1),
        "busy_sec": round(busy / 1000.0, 1),
        "gap_sec": round(gap_total, 1),
        "gap_share": round(gap_total / wall, 3) if wall else None,
        "n_gaps": len(gaps),
        "top_gaps": [
            {"sec": round((b - a) / 1000.0, 2), "next_stage": next_stage(b)}
            for a, b in gaps[:8]
        ],
    }


def main() -> None:
    paths: list[str] = []
    for arg in sys.argv[1:]:
        if os.path.isdir(arg):
            paths.extend(os.path.join(arg, p) for p in sorted(os.listdir(arg))
                         if not p.startswith("."))
        else:
            paths.append(arg)
    if not paths:
        raise SystemExit(__doc__)
    for p in paths:
        print(json.dumps(analyze(p)))


if __name__ == "__main__":
    main()
