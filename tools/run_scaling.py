"""Orchestrate the two-parallelism scaling protocol and write BENCH/BASELINE.md.

North rule (BASELINE.json): "run at two cluster sizes (N and 4N executors)
with throughput scaling efficiency >=0.8 between them". No real cluster
exists in this sandbox, so the criterion is evidenced per the driver's
protocol: the IDENTICAL full-suite job at two parallelism levels (own JVM
each, like separate cluster submissions) on the SAME parquet input.

    python tools/run_scaling.py [--small 8] [--large 32] [--runs 3]
                                [--n-images 2000000]

Each level shells out to tools/scaling_bench.py (fresh JVM per level);
efficiency = (thr_large / thr_small) / (large / small). Results land in
BENCH/BASELINE.md and BENCH/scaling.json.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, runs: int, n_images: int) -> dict:
    cmd = [sys.executable, os.path.join(ROOT, "tools", "scaling_bench.py"),
           "--cores", str(cores), "--runs", str(runs), "--n-images", str(n_images)]
    print(f"[run_scaling] {' '.join(cmd)}", flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not last:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise SystemExit(f"scaling_bench --cores {cores} failed rc={out.returncode}")
    return json.loads(last[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n-images", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "2000000")))
    args = ap.parse_args()

    small = run_level(args.small, args.runs, args.n_images)
    large = run_level(args.large, args.runs, args.n_images)

    ratio = args.large / args.small
    speedup = small["median_sec"] / large["median_sec"]
    eff = speedup / ratio
    result = {
        "protocol": f"local[{args.small}] vs local[{args.large}], same parquet input, "
                    f"fresh JVM per level, median of {args.runs} (1 warm-up discarded)",
        "n_images": args.n_images,
        "small": small,
        "large": large,
        "speedup": round(speedup, 3),
        "cores_ratio": ratio,
        "efficiency": round(eff, 3),
        "gate": "PASS" if eff >= 0.8 else "FAIL",
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
    }

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)

    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence (north rule)

**Criterion** (BASELINE.json): throughput scaling efficiency >=0.8 from N to 4N
executors. No multi-node cluster exists in this sandbox, so per the sandbox
protocol in /root/repo/BASELINE.md the SAME full-suite job (fixture image+caption
table, all four validation passes, noop sinks) runs at two parallelism levels,
each in its own JVM — the local-mode analogue of two cluster submissions.

| level | cores | runs (sec) | median (sec) | images/sec |
|---|---|---|---|---|
| N  | {small['cores']} | {small['runs']} | {small['median_sec']} | {small['images_per_sec']:,} |
| 4N | {large['cores']} | {large['runs']} | {large['median_sec']} | {large['images_per_sec']:,} |

- input: {args.n_images:,} images (deterministic fixture, 256 file partitions,
  parquet on disk — generated once, shared by both levels)
- speedup {small['cores']}->{large['cores']} cores: **{speedup:.2f}x** (ideal {ratio:.0f}x)
- **scaling efficiency = {eff:.3f}** -> gate (>=0.8): **{result['gate']}**
- shuffle partitions per level: {small['shuffle_partitions']} / {large['shuffle_partitions']}
  (recommended_conf scales them with parallelism, as a per-cluster submission would)
- measured: {result['date']}

Reproduce: `python tools/run_scaling.py` (or each level alone:
`python tools/scaling_bench.py --cores {{8,32}}`).
"""
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
