"""Stage-level scaling profile: suite vs calibration at two parallelism levels.

VERDICT r2 #1's corroboration path: beyond the end-to-end timings in
BENCH/scaling.json, profile WHERE parallel efficiency is won or lost. Runs
the identical suite job (tools/scaling_bench.py) at --small and --large
cores with Spark event logs on, then parses the logs into a per-stage
table:

    achieved parallelism = sum(task executor-run-time) / stage wall time

A stage that achieves ~7x parallelism on 8 cores and ~28x on 32 scales; a
stage stuck at the same parallelism on both levels is the bottleneck. GC
fraction and shuffle bytes are reported next to each stage so the CAUSE
(allocation pressure vs shuffle vs skew) is visible, not guessed.

    python tools/stage_profile.py [--small 8] [--large 32] [--n-images 8000000]

Writes BENCH/stage_profile.md and prints a JSON summary. Stages are
aggregated by stage name over the whole application (warm-up + timed run
share plan shapes; the per-stage ratios are what matter, not absolute
walls).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, n_images: int, logdir: str) -> None:
    shutil.rmtree(logdir, ignore_errors=True)
    cmd = [os.path.join(ROOT, "tools", "scaling_bench.py"),
           "--cores", str(cores), "--runs", "1", "--warmups", "1",
           "--n-images", str(n_images), "--eventlog", logdir]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cores - 1}", sys.executable] + cmd
    else:
        cmd = [sys.executable] + cmd
    print(f"[stage_profile] {' '.join(cmd)}", flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise SystemExit(f"scaling_bench --cores {cores} failed rc={out.returncode}")


def parse_eventlog(logdir: str) -> dict[str, dict]:
    """Aggregate per stage NAME: wall, task time, GC, shuffle, task count."""
    stages: dict[int, dict] = {}
    tasks = collections.defaultdict(lambda: {"run_ms": 0, "gc_ms": 0, "cpu_ms": 0,
                                             "sh_read": 0, "sh_write": 0, "n": 0})
    # Spark 4 event logs are rolling DIRECTORIES (eventlog_v2_<app>/
    # events_1_<app>); plain files appear with rolling disabled.
    files = []
    for entry in glob.glob(os.path.join(logdir, "*")):
        if os.path.isdir(entry):
            files.extend(f for f in glob.glob(os.path.join(entry, "events_*"))
                         if not f.endswith(".inprogress"))
        elif not os.path.basename(entry).startswith("appstatus_"):
            files.append(entry)
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                t = ev.get("Event")
                if t == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub, comp = si.get("Submission Time"), si.get("Completion Time")
                    if sub is None or comp is None:
                        continue
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"],
                        "wall_ms": comp - sub,
                        "n_tasks": si["Number of Tasks"],
                    }
                elif t == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    agg = tasks[ev["Stage ID"]]
                    agg["run_ms"] += m.get("Executor Run Time", 0)
                    agg["gc_ms"] += m.get("JVM GC Time", 0)
                    agg["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                    sr = m.get("Shuffle Read Metrics") or {}
                    agg["sh_read"] += (sr.get("Remote Bytes Read", 0)
                                       + sr.get("Local Bytes Read", 0))
                    sw = m.get("Shuffle Write Metrics") or {}
                    agg["sh_write"] += sw.get("Shuffle Bytes Written", 0)
                    agg["n"] += 1
    byname: dict[str, dict] = {}
    for sid, st in stages.items():
        tk = tasks.get(sid)
        if tk is None:
            continue
        b = byname.setdefault(st["name"], {"wall_ms": 0, "run_ms": 0, "gc_ms": 0,
                                           "cpu_ms": 0, "sh_read": 0, "sh_write": 0,
                                           "n_tasks": 0, "n_stages": 0})
        b["wall_ms"] += st["wall_ms"]
        b["n_tasks"] += tk["n"]
        b["n_stages"] += 1
        for k in ("run_ms", "gc_ms", "cpu_ms", "sh_read", "sh_write"):
            b[k] += tk[k]
    for b in byname.values():
        b["parallelism"] = round(b["run_ms"] / max(b["wall_ms"], 1), 2)
        b["gc_frac"] = round(b["gc_ms"] / max(b["run_ms"], 1), 3)
    return byname


def short(name: str, width: int = 48) -> str:
    return name if len(name) <= width else name[: width - 1] + "…"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--n-images", type=int, default=8_000_000)
    ap.add_argument("--skip-run", action="store_true",
                    help="parse existing logs in BENCH/eventlogs/{small,large}")
    args = ap.parse_args()

    logbase = os.path.join(ROOT, "BENCH", "eventlogs")
    small_dir = os.path.join(logbase, "small")
    large_dir = os.path.join(logbase, "large")
    if not args.skip_run:
        run_level(args.small, args.n_images, small_dir)
        run_level(args.large, args.n_images, large_dir)

    small = parse_eventlog(small_dir)
    large = parse_eventlog(large_dir)

    rows = []
    for name in sorted(set(small) & set(large),
                       key=lambda n: -large[n]["wall_ms"]):
        s, l = small[name], large[name]
        # how much of the ideal large/small parallelism gain this stage kept
        ratio = l["parallelism"] / max(s["parallelism"], 0.01)
        rows.append({
            "stage": name,
            "wall_small_s": round(s["wall_ms"] / 1000, 2),
            "wall_large_s": round(l["wall_ms"] / 1000, 2),
            "par_small": s["parallelism"],
            "par_large": l["parallelism"],
            "par_ratio": round(ratio, 2),
            "scaling_eff": round(ratio / (args.large / args.small), 3),
            "gc_small": s["gc_frac"],
            "gc_large": l["gc_frac"],
            "shuffle_mb": round((l["sh_read"] + l["sh_write"]) / 2 ** 20, 1),
        })

    md = ["# BENCH/stage_profile.md — per-stage parallel efficiency, "
          f"{args.small} vs {args.large} cores",
          "",
          f"Suite + calibration jobs at {args.n_images:,} images; achieved "
          "parallelism = sum(task run time)/stage wall. `par_ratio` = "
          "large/small parallelism (ideal "
          f"{args.large // args.small}x); `eff` = ratio/ideal. Stages "
          "aggregated by name across the app (warm-up + timed run). GC "
          "fraction and shuffle volume locate the cause of any loss.",
          "",
          "Caveats: stages that run CONCURRENTLY under one name (the three "
          "sink jobs are submitted in parallel) have overlapping walls, so "
          "their summed-wall parallelism is a LOWER bound — the ratio "
          "column compares like-for-like across levels and is the signal. "
          "A stage whose ratio tracks the ideal scales with cores; a "
          "bottleneck stage would pin its parallelism at both levels "
          "(ratio ~1x).",
          "",
          "| stage | wall 8c | wall 32c | par 8c | par 32c | ratio | eff | "
          "gc 8c | gc 32c | shuffle MB (32c) |",
          "|---|---|---|---|---|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {short(r['stage'])} | {r['wall_small_s']}s | "
                  f"{r['wall_large_s']}s | {r['par_small']} | {r['par_large']} | "
                  f"{r['par_ratio']}x | {r['scaling_eff']} | {r['gc_small']} | "
                  f"{r['gc_large']} | {r['shuffle_mb']} |")
    md.append("")
    worst = [r for r in rows if r["wall_large_s"] >= 1.0]
    worst.sort(key=lambda r: r["scaling_eff"])
    if worst:
        md.append(f"**Worst-scaling material stage (>=1s at {args.large}c): "
                  f"`{short(worst[0]['stage'])}` — eff {worst[0]['scaling_eff']}, "
                  f"GC {worst[0]['gc_large']}, "
                  f"shuffle {worst[0]['shuffle_mb']} MB.**")
    out_md = os.path.join(ROOT, "BENCH", "stage_profile.md")
    with open(out_md, "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"stages": rows[:20], "out": out_md}, indent=2))


if __name__ == "__main__":
    main()
