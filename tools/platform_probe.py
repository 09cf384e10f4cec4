"""Platform scaling probes: what CAN this host deliver from N to 4N cores?

Two hardware ceilings bound any single-box scaling measurement (a real
cluster raises both linearly with node count; one box does not):

- CPU: turbo/steal effects — measured with multiprocessing sha256 (no
  memory traffic beyond L1/L2).
- DRAM bandwidth: measured with per-process 64 MB stream multiplies;
  aggregate bandwidth typically SATURATES (or degrades) well below 4x.

Usage: python tools/platform_probe.py [--small 8] [--large 32]
Prints one JSON line consumed by tools/run_scaling.py.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

import numpy as np
from multiprocessing import Pool


def _cpu_work(_):
    h = b"x" * 64
    for _ in range(400_000):
        h = hashlib.sha256(h).digest()
    return 1


def cpu_rate(n_proc: int) -> float:
    tasks = n_proc * 4
    with Pool(n_proc) as p:
        p.map(_cpu_work, range(n_proc))  # warm-up
        t0 = time.time()
        p.map(_cpu_work, range(tasks))
        dt = time.time() - t0
    return tasks * 400_000 / dt


def _bw_work(_):
    # Preallocated out= buffer: `b = a * c` would malloc/mmap a fresh 64 MB
    # array every pass, timing page faults and allocator churn instead of
    # DRAM (measured swings of 0.1-45 GB/s at the same level). One untimed
    # pass warms both buffers' pages.
    a = np.ones(64_000_000 // 8, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    np.multiply(a, 1.000001, out=b)  # warm-up: fault b's pages
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3.0:
        np.multiply(a, 1.000001, out=b)  # 64 MB read + 64 MB write
        a, b = b, a
        n += 1
    return n * 128e6 / (time.time() - t0)


def bw_rate(n_proc: int) -> float:
    with Pool(n_proc) as p:
        return sum(p.map(_bw_work, range(n_proc)))


def pinned(cores: int, fn_name: str) -> float:
    """Re-exec self under taskset so the probe is bound to exactly `cores`."""
    out = subprocess.run(
        ["/usr/bin/taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.abspath(__file__), "--one", fn_name, "--procs", str(cores)],
        capture_output=True, text=True)
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--one", choices=["cpu", "bw"], default=None)
    ap.add_argument("--procs", type=int, default=8)
    args = ap.parse_args()

    if args.one:  # child mode (taskset-pinned)
        print(cpu_rate(args.procs) if args.one == "cpu" else bw_rate(args.procs))
        return

    cpu_s, cpu_l = pinned(args.small, "cpu"), pinned(args.large, "cpu")
    bw_s, bw_l = pinned(args.small, "bw"), pinned(args.large, "bw")
    ratio = args.large / args.small
    print(json.dumps({
        "small_cores": args.small, "large_cores": args.large,
        "cpu_hashes_per_sec": {"small": round(cpu_s), "large": round(cpu_l)},
        "cpu_speedup": round(cpu_l / cpu_s, 3),
        "cpu_efficiency": round(cpu_l / cpu_s / ratio, 3),
        "dram_gb_per_sec": {"small": round(bw_s / 1e9, 1), "large": round(bw_l / 1e9, 1)},
        "dram_speedup": round(bw_l / bw_s, 3),
    }))


if __name__ == "__main__":
    main()
