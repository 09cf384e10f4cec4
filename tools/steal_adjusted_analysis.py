"""POST-HOC secondary analysis of a run_scaling.py log: steal-adjusted ratios.

The registered round-4 gate (SCALING_NOTES_r04 §3b) DISCARDS any round in
which any of the 16 timed regions saw hypervisor steal or foreign-process
load >= 2%. On a host with *continuous* neighbor steal (the 2026-08-19
measurement window: 20 protocol rounds, 0 clean), that rule starves — it
can never emit a figure, even though every round carries an instrument
reading that quantifies exactly how contaminated each region was.

This tool is the declared SECONDARY analysis: instead of discarding
contaminated rounds, it corrects each timed region's wall time by its own
in-region gauges and recomputes the per-round ratios over ALL rounds.

Model (first-order, stated so it can be audited):

    t_quiet ~= t_measured * (1 - steal/100 - other/100)

/proc/stat steal is the fraction of the region's ticks the hypervisor
withheld the vCPUs; the own-load gauge is the fraction burned by processes
outside the benchmark tree. For a CPU-bound region at full slot
occupancy, useful work per wall-second is proportional to the CPU actually
delivered to the tree, so the quiet-host time is the measured time scaled
by the delivered fraction. This correction is exact for pure-CPU regions,
conservative for regions with idle slack (an 8-wide level on a 32-thread
host can absorb steal without losing wall time — adjusting it anyway
SHRINKS the numerator of the suite speedup, i.e. biases the adjusted
efficiency figure DOWN, never up).

Known residual, disclosed: neighbor *memory* contention (the §1 third
instrument) is not correctable by this model — no per-region counter
linearly maps bandwidth loss to wall time. The DRAM gauge readings are
therefore reported alongside, not corrected for; rounds the mem gauge
flags are listed so the reader can recompute the medians without them.

Usage:
    python tools/steal_adjusted_analysis.py LOG [LOG ...] \
        [--json OUT.json] [--md OUT.md]

LOG files are run_scaling.py logs ('[run_scaling] round N: {...}' lines).
Later logs may repeat earlier rounds (resume seeds); rounds are de-duped
by round number, last occurrence wins.
"""

from __future__ import annotations

import argparse
import ast
import json
import statistics


_MEM_KEYS = ("small_mem", "large_mem", "calib_small_mem", "calib_large_mem",
             "agg_small_mem", "agg_large_mem", "mix_small_mem",
             "mix_large_mem")


def parse_rounds(paths: list[str], mem_frac: float = 0.75) -> list[dict]:
    rounds: dict[int, dict] = {}
    for path in paths:
        with open(path) as f:
            for line in f:
                if "] round " in line and ": {" in line:
                    rd = ast.literal_eval(line.split(": ", 1)[1].strip())
                    rounds[rd["round"]] = rd
    out = [rounds[k] for k in sorted(rounds)]
    # Re-apply the mem rule over the COMPLETE set (logged flags were
    # computed with a running max), same rule as run_scaling._apply_mem_rule.
    best = {k: max((r.get(k, 0.0) for r in out), default=0.0)
            for k in _MEM_KEYS}
    for r in out:
        if any(r.get(k, 0.0) > 0.0 for k in _MEM_KEYS):
            r["mem_clean"] = all(
                best[k] <= 0.0 or r.get(k, 0.0) >= mem_frac * best[k]
                for k in _MEM_KEYS if k in r)
    return out


def _adj(rd: dict, prefix: str, level: str) -> float | None:
    """Steal+other-adjusted wall time for one region, None if absent."""
    sec = rd.get(f"{prefix}{level}_sec", 0.0)
    if not sec:
        return None
    steal = rd.get(f"{prefix}{level}_steal", 0.0) or 0.0
    other = rd.get(f"{prefix}{level}_other", 0.0) or 0.0
    frac = max(0.05, 1.0 - steal / 100.0 - other / 100.0)
    return sec * frac


def analyze(rounds: list[dict]) -> dict:
    per_round = []
    for rd in rounds:
        s_small = _adj(rd, "", "small")
        s_large = _adj(rd, "", "large")
        m_small = _adj(rd, "mix_", "small")
        m_large = _adj(rd, "mix_", "large")
        row = {
            "round": rd["round"],
            "suite_speedup_raw": rd.get("suite_speedup"),
            "mix_ratio_raw": rd.get("normalized_ratio_mix"),
            "mem_clean": rd.get("mem_clean"),
        }
        if s_small and s_large:
            row["suite_speedup_adj"] = round(s_small / s_large, 3)
        if m_small and m_large:
            row["mix_speedup_adj"] = round(m_small / m_large, 3)
        if "suite_speedup_adj" in row and "mix_speedup_adj" in row:
            row["mix_ratio_adj"] = round(
                row["suite_speedup_adj"] / row["mix_speedup_adj"], 3)
        per_round.append(row)

    def med(key: str, rows: list[dict]) -> float | None:
        vals = [r[key] for r in rows if r.get(key)]
        return round(statistics.median(vals), 3) if vals else None

    mem_ok = [r for r in per_round if r.get("mem_clean")]
    return {
        "analysis": "steal_adjusted_secondary",
        "model": "t_adj = t * (1 - steal% - other%); see module docstring",
        "n_rounds": len(per_round),
        "n_mem_clean": len(mem_ok),
        "median_mix_ratio_raw_all": med("mix_ratio_raw", per_round),
        "median_mix_ratio_adj_all": med("mix_ratio_adj", per_round),
        "median_mix_ratio_adj_mem_clean": med("mix_ratio_adj", mem_ok),
        "median_suite_speedup_raw": med("suite_speedup_raw", per_round),
        "median_suite_speedup_adj": med("suite_speedup_adj", per_round),
        "median_mix_speedup_adj": med("mix_speedup_adj", per_round),
        "rounds": per_round,
    }


def to_markdown(res: dict) -> str:
    lines = [
        "# Steal-adjusted secondary analysis (post-hoc, declared)",
        "",
        f"Model: `{res['model']}`. Rounds: {res['n_rounds']} "
        f"(mem-gauge-clean: {res['n_mem_clean']}).",
        "",
        "| figure | value |",
        "|---|---|",
        f"| median normalized mix ratio, RAW, all rounds "
        f"| {res['median_mix_ratio_raw_all']} |",
        f"| median normalized mix ratio, ADJUSTED, all rounds "
        f"| {res['median_mix_ratio_adj_all']} |",
        f"| median normalized mix ratio, ADJUSTED, mem-clean rounds only "
        f"| {res['median_mix_ratio_adj_mem_clean']} |",
        f"| median suite speedup raw / adjusted "
        f"| {res['median_suite_speedup_raw']} / "
        f"{res['median_suite_speedup_adj']} |",
        f"| median mix-control speedup adjusted "
        f"| {res['median_mix_speedup_adj']} |",
        "",
        "| round | suite spdup raw→adj | mix ratio raw→adj | mem_clean |",
        "|---|---|---|---|",
    ]
    for r in res["rounds"]:
        lines.append(
            f"| {r['round']} | {r.get('suite_speedup_raw')}→"
            f"{r.get('suite_speedup_adj')} | {r.get('mix_ratio_raw')}→"
            f"{r.get('mix_ratio_adj')} | {r.get('mem_clean')} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--md", dest="md_out", default=None)
    args = ap.parse_args()
    res = analyze(parse_rounds(args.logs))
    print(json.dumps({k: v for k, v in res.items() if k != "rounds"},
                     indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(res, f, indent=2)
    if args.md_out:
        with open(args.md_out, "w") as f:
            f.write(to_markdown(res))


if __name__ == "__main__":
    main()
