"""Headline benchmark (driver contract): run the engine's representative
queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Covers every operator family from SURVEY.md §2: P1 row checks + fused
stats, P2 salted uniqueness, P3 broadcast & shuffle-hash referential,
P4 histogram/KS/PSI drift, dedup (exact, MinHash-LSH), similarity top-k,
text analysis, and the full six-pass image suite over the deterministic
fixture table (the north-rule flagship, images/sec reported separately).

Each query is forced end-to-end with a noop sink (full materialization,
nothing collected to the driver). One warm-up query runs first so JVM/
codegen startup isn't billed to the first measurement.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Round 4 (VERDICT r3 #5): time the ENTIRE driver registry — every gate
# query gets a per-round median so regressions stay visible. The registry's
# small images_full_suite (2k-row fixture) is excluded here because bench
# times the 8M-image flagship under that same key below.
def headline_names(qs: dict) -> list[str]:
    return [n for n in qs if n != "images_full_suite"]

# 8M-image flagship (round 2): at 2M the full suite is dominated by
# fixed stage-scheduling latency (~15 s of its ~30 s wall) and the
# throughput number understates the engine by ~4x; 8M is compute-dominated
# while still generating in minutes on first run (cached thereafter).
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "8000000"))
# Generated once, reused across bench runs. Parquet (not a cached DataFrame)
# so every pass exercises the production path: vectorized columnar scan with
# column pruning — the same shape as the Iceberg table at north scale.
BENCH_DATA = os.environ.get(
    "SPARK_GRAFT_BENCH_DATA", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchdata")
)


# Median-of-N per query (round 3): single-shot timings on this steal-prone
# host could not distinguish a 12-67% "regression" from interference
# (VERDICT r2); the median of 3 is robust to one bad run per query.
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _read_steal() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from the host-wide /proc/stat cpu line —
    per-measurement interference context (this host shows up to 11% CPU
    steal; a timing without its steal figure cannot be interpreted)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


STEALS: dict[str, float] = {}
OTHERS: dict[str, float] = {}   # CPU%% burned outside this process tree
MEMS: dict[str, float] = {}     # in-region DRAM-probe bandwidth, GB/s
PER_REP: dict[str, list[float]] = {}

# The scaling protocol's two extra contamination instruments (VERDICT r4
# #3): hypervisor steal is blind to both self-inflicted load (a concurrent
# pytest run) and neighbor DRAM contention — the r4 flagship number could
# not be adjudicated against the builder's quiet-host run because the
# driver artifact carried only the steal figure. Import is best-effort so
# bench.py still runs standalone if tools/ is absent.
try:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from scaling_bench import MemProbe, other_load_pct, read_load
    _PROBE = MemProbe()
except Exception:  # pragma: no cover - instrumentation is optional
    _PROBE = None


def timed_median(fn, name: str | None = None, warmup: int = 0) -> float:
    """Median of REPS full executions (plan construction + run billed).
    Records the steal%%, other-load%% and DRAM-gauge GB/s observed across
    all reps under ``name``, plus the raw per-rep wall times.

    ``warmup``: unbilled executions first. The flagship needs one — its
    first run pays JVM codegen + a page-cache-cold read of the multi-GB
    fixture (measured 212-241s cold vs 44-64s steady-state on this host, a
    4-5x one-off), which is a property of the local cache, not the engine;
    steady-state is the cross-round-comparable number."""
    for _ in range(warmup):
        fn()
    ts = []
    s0 = _read_steal()
    l0 = read_load() if _PROBE is not None else None
    if _PROBE is not None:
        _PROBE.region_start()
    for _ in range(REPS):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    if name is not None:
        s1 = _read_steal()
        if s1[1] > s0[1]:
            STEALS[name] = round(100.0 * (s1[0] - s0[0]) / (s1[1] - s0[1]), 2)
        if _PROBE is not None:
            MEMS[name] = _PROBE.region_end()
            OTHERS[name] = other_load_pct(l0, read_load())
        PER_REP[name] = [round(t, 3) for t in ts]
    elif _PROBE is not None:
        _PROBE.region_end()
    return round(statistics.median(ts), 3)


def main() -> None:
    from jsonschema_spark.engine import get_session
    import __spark_entry__ as entrymod

    spark = get_session("jsonschema-spark-bench", parallelism=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm-up (JVM, codegen, parquet footer caches) — not billed
    sink(qs["row_checks_lineitem"](spark, SF_DIR).limit(1000))

    for name in headline_names(qs):
        timings[name] = timed_median(lambda: sink(qs[name](spark, SF_DIR)), name)

    # flagship: full six-pass suite over the deterministic image table
    from jsonschema_spark import fixtures as FX
    from jsonschema_spark.engine import validate_table
    from jsonschema_spark.passes.drift import baseline_profile

    cfg = FX.FixtureConfig(n=N_IMAGES, n_parts=256, with_bytes=False)
    table_dir = os.path.join(BENCH_DATA, f"images_{N_IMAGES}")
    base_dir = os.path.join(BENCH_DATA, f"baseline_{N_IMAGES}")
    if not os.path.exists(os.path.join(table_dir, "_SUCCESS")):
        FX.generate_images_df(spark, cfg).write.mode("overwrite").parquet(table_dir)
    if not os.path.exists(os.path.join(base_dir, "_SUCCESS")):
        clean_cfg = FX.FixtureConfig(n=N_IMAGES, n_parts=256, plants=False,
                                     with_bytes=False, drift_part=-1)
        baseline_profile(
            FX.generate_images_df(spark, clean_cfg), FX.drift_columns()
        ).write.mode("overwrite").parquet(base_dir)
    fact = spark.read.parquet(table_dir)
    baseline = spark.read.parquet(base_dir)

    # WITH-BYTES fixture table: generating 8M rows of encoded bytes (~50 GB)
    # is not sensible locally, so a bounded bytes table stands in for the
    # binary column of the big table — (a) a SAMPLED slice of it runs inside
    # the flagship timing as pass P5 (so the north metric covers all five
    # passes), (b) a full scan of it is timed separately for a stable
    # decode-throughput number.
    from jsonschema_spark.passes.fidelity import fidelity_violations

    n_fid = int(os.environ.get("SPARK_GRAFT_BENCH_FIDELITY_IMAGES", "200000"))
    fcfg = FX.FixtureConfig(n=n_fid, n_parts=64, with_bytes=True)
    # Hive-partitioned by part_id so the P5 two-stage sample's partition
    # predicate prunes FILES — row-sampling alone would read every bytes
    # page of the table to decode 4% of it (at north scale: a full scan of
    # the heaviest column).
    fid_dir = os.path.join(BENCH_DATA, f"images_bytes_{n_fid}_p")
    if not os.path.exists(os.path.join(fid_dir, "_SUCCESS")):
        FX.generate_images_df(spark, fcfg).write.mode("overwrite") \
            .partitionBy("part_id").parquet(fid_dir)
    fid_df = spark.read.parquet(fid_dir)
    # sampled P5 slice = 0.1% of the flagship row count (the north-scale
    # policy: fidelity is sampled, fraction-proportional cost); cluster
    # sampling keeps ~1/6 of partitions, rows resampled inside to hold the
    # overall fraction
    fid_fraction = min(1.0, (0.001 * N_IMAGES) / n_fid)
    fid_parts_fraction = 1 / 6

    from concurrent.futures import ThreadPoolExecutor

    # Dim tables are inputs, built ONCE like production (loading a dim
    # registry per run would bill fixture generation — incl. a driver-side
    # numpy plant-selection pass — to every timed rep).
    dims = {"dim_fmt": FX.dim_fmt_df(spark),
            "dim_license": FX.dim_license_df(spark, cfg)}

    def run_suite() -> None:
        res = validate_table(
            fact, FX.SPEC_IMAGES,
            dims=dims,
            baseline=baseline, drift_columns=FX.drift_columns(),
            fidelity_fn=lambda _: fidelity_violations(
                fid_df, fcfg, fraction=fid_fraction,
                parts_fraction=fid_parts_fraction),
        )
        outs = [df for df in (res.violations, res.verdicts, res.stats)
                if df is not None]
        with ThreadPoolExecutor(len(outs)) as ex:  # independent DAGs
            list(ex.map(sink, outs))
        res.cleanup()

    suite_sec = timed_median(run_suite, "images_full_suite", warmup=1)
    timings["images_full_suite"] = suite_sec

    # full-scan decode throughput (separate from the flagship, see above)
    timings["fidelity_images_bytes"] = timed_median(
        lambda: sink(fidelity_violations(fid_df, fcfg, fraction=1.0)),
        "fidelity_images_bytes")

    total = round(sum(timings.values()), 3)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    full = {
        "metric": "headline suite wall time (validated images/sec in images_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "images_per_sec": round(N_IMAGES / suite_sec, 1),
        "n_images": N_IMAGES,
        "cpus": CPUS,
        "reps_per_query": REPS,  # each timing is the MEDIAN of this many runs
        "per_rep_sec": PER_REP,  # raw wall times behind each median
        "steal_pct": STEALS,     # /proc/stat CPU steal observed per query
        "other_load_pct": OTHERS,  # CPU outside this tree (self-contamination)
        "dram_gb_per_sec": MEMS,   # in-region DRAM probe (neighbor contention)
        "flagship_passes": "P1 rows+stats, P2 uniqueness, P3 referential, "
                           "P4 drift, P5 fidelity (sampled 0.1%), "
                           "P6 partition-anomaly (w,h,phash)",
    }
    # Full per-query record to a file; stdout's LAST line is a compact
    # headline the driver's bounded stdout-tail capture always parses
    # (VERDICT r4 #4: the 51-query single-line JSON exceeded the capture
    # and BENCH_r04.json recorded parsed=null). The compact line keeps the
    # driver contract's "queries" key with the flagship + per-family heads.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "bench_full_latest.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    headline_keys = [
        "images_full_suite", "fidelity_images_bytes", "row_checks_lineitem",
        "stats_lineitem", "uniqueness_orders", "referential_violations",
        "drift_psi_ks", "minhash_dedup_documents", "dup_clusters_documents",
        "cosine_topk_embeddings", "text_metrics_documents", "curate_documents",
    ]
    print(json.dumps({
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in headline_keys if k in timings},
        "sf": sf,
        "images_per_sec": full["images_per_sec"],
        "n_images": N_IMAGES,
        "cpus": CPUS,
        "n_queries": len(timings),
        "flagship_steal_pct": STEALS.get("images_full_suite"),
        "flagship_other_load_pct": OTHERS.get("images_full_suite"),
        "flagship_dram_gb_per_sec": MEMS.get("images_full_suite"),
        "full_record": "BENCH/bench_full_latest.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
