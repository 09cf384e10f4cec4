"""Re-apply the current DRAM-floor cleanliness rule to a prior run's log.

Reads the `[run_scaling] round N: {...}` lines of a run_scaling.py log,
recomputes mem_clean/clean under the rule as currently implemented in
run_scaling._apply_mem_rule (v2: guarded reference — only CPU-clean rounds
contribute to the cross-round best), and writes a JSON re-classification
artifact alongside a short stdout summary. The original artifact is never
modified; this exists so that a rule fix can be applied to already-collected
evidence transparently, with both classifications on file.

Usage:
    python tools/reapply_mem_rule.py BENCH/scaling_quiet4_r04.log \
        --mem-frac 0.75 --out BENCH/scaling_quiet4_r04_v2.json
"""
import argparse
import ast
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import (  # noqa: E402
    _apply_mem_rule, _apply_time_rule, _apply_time_rule_v4)


def load_rounds(path: str) -> list[dict]:
    rounds = []
    with open(path) as f:
        for line in f:
            if "] round " in line and ": {" in line:
                rounds.append(ast.literal_eval(line.split(": ", 1)[1].strip()))
    return rounds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    # Required, no default (ADVICE r4 #3): run_scaling's live default is
    # v4, and a re-analysis that silently bound a DIFFERENT rule than the
    # run it re-analyzes would produce an artifact nobody chose. Every
    # re-analysis artifact now records a deliberate --rule choice.
    ap.add_argument("--rule", choices=("v2", "v3", "v4"), required=True,
                    help="v2 = DRAM-probe floor; v3 = region wall-time "
                         "anomaly (<= --time-headroom x per-region MEDIAN "
                         "over CPU-clean rounds); v4 = same vs the "
                         "per-region MIN (run_scaling's live default)")
    ap.add_argument("--time-headroom", type=float, default=1.3)
    ap.add_argument("--mem-frac", type=float, default=0.75)
    ap.add_argument("--steal-cut", type=float, default=2.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--baseline-json", default=None,
                    help="the run's final scaling.json artifact; its clean "
                         "flags (the authoritative v1 classification, "
                         "computed over the complete round set at run end) "
                         "are diffed against v2. Without it the diff is "
                         "against the log lines' in-flight running-max "
                         "flags, which can differ from the final artifact.")
    args = ap.parse_args()

    rounds = load_rounds(args.log)
    if not rounds:
        raise SystemExit(f"no round lines found in {args.log}")
    if args.baseline_json:
        with open(args.baseline_json) as f:
            v1 = [(r["round"], bool(r.get("clean")))
                  for r in json.load(f)["rounds"]]
    else:
        v1 = [(r["round"], bool(r.get("clean"))) for r in rounds]
    for r in rounds:
        r.pop("mem_clean", None)
        r.pop("time_clean", None)
        r.pop("clean", None)
    _apply_mem_rule(rounds, frac=args.mem_frac, steal_cut=args.steal_cut)
    if args.rule == "v3":
        _apply_time_rule(rounds, headroom=args.time_headroom)
    elif args.rule == "v4":
        _apply_time_rule_v4(rounds, headroom=args.time_headroom)
    clean = [r for r in rounds if r["clean"]]
    reclassified = [r["round"] for r in rounds
                    if bool(r["clean"]) != dict(v1)[r["round"]]]
    result = {
        "source_log": args.log,
        "baseline_json": args.baseline_json,
        "mem_rule": ("v2 guarded-reference (see tools/run_scaling.py)"
                     if args.rule == "v2" else
                     f"{args.rule} time-anomaly "
                     f"({'min' if args.rule == 'v4' else 'median'} anchor; "
                     "binding; v2 probe floor recorded per round as "
                     "mem_clean diagnostics)"),
        "rule": args.rule,
        "time_headroom": (args.time_headroom
                          if args.rule in ("v3", "v4") else None),
        "mem_frac": args.mem_frac,
        "steal_cut_pct": args.steal_cut,
        "n_rounds": len(rounds),
        "n_clean_rounds": len(clean),
        "clean_rounds": [r["round"] for r in clean],
        "reclassified_rounds": reclassified,
        "clean_mix_normalized": [r.get("normalized_ratio_mix")
                                 for r in clean],
        "median_clean_mix_normalized": (
            statistics.median(r["normalized_ratio_mix"] for r in clean
                              if r.get("normalized_ratio_mix"))
            if any(r.get("normalized_ratio_mix") for r in clean) else None),
        "rounds": rounds,
    }
    print(f"{args.log}: {len(clean)}/{len(rounds)} clean under {args.rule} "
          f"(was {sum(c for _, c in v1)} under recorded flags); "
          f"reclassified: {reclassified}; "
          f"clean mix-normalized: {result['clean_mix_normalized']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
