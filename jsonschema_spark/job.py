"""E3 — the operational entry point for ``spark-submit --py-files`` (SURVEY.md §3).

Usage:
    spark-submit --py-files jsonschema_spark.zip -m jsonschema_spark.job \\
        --table /data/images --spec spec.json --manifest /data/manifest \\
        --out /data/violations [--dim name=path ...] [--baseline path] \\
        [--resume] [--sample-fidelity 0.001]

Runs the full constraint suite partition-batch-wise, appending per-partition
manifest rows after each batch so a killed run resumes where it left off
(BASELINE.json:14). Prints a one-line JSON summary with images/sec (the
north metric, BASELINE.json:2).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .engine import get_session, validate_table
from .manifest import Manifest
from .spec import parse
from .passes.drift import DriftColumn


def parse_drift_columns(spec) -> list[DriftColumn]:
    """Build DriftColumn configs from the spec's drift block: numeric columns
    get 32 buckets over the spec-declared [minimum, maximum] range."""
    d = spec.table_checks.drift
    if not d:
        return []
    out = []
    for entry in d.get("columns", []):
        name = entry.replace("length(", "len_").rstrip(")") if "(" in entry else entry
        prop = spec.root.properties.get(entry)
        if prop is not None and prop.type and "string" in prop.type and "(" not in entry:
            out.append(DriftColumn(name, entry, "categorical"))
        else:
            lo = prop.minimum if prop and prop.minimum is not None else 0.0
            hi = prop.maximum if prop and prop.maximum is not None else 1 << 20
            out.append(DriftColumn(name, entry, "numeric", float(lo), float(hi), 32))
    return out


def run(argv: list[str] | None = None, spark: SparkSession | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--spec", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dim", action="append", default=[], help="name=path, repeatable")
    ap.add_argument("--baseline", default=None)
    ap.add_argument("--key-col", default="image_id")
    ap.add_argument("--part-col", default="part_id")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args(argv)

    own_session = spark is None
    if spark is None:
        spark = get_session("jsonschema-spark-job", parallelism=args.parallelism)

    with open(args.spec) as f:
        spec = parse(json.load(f))

    fact_full = spark.read.parquet(args.table)
    fact = fact_full
    man = Manifest(spark, args.manifest)
    if args.resume:
        fact = man.filter_pending(fact_full, "full", part_col=args.part_col)

    dims = {}
    for d in args.dim:
        name, path = d.split("=", 1)
        dims[name] = spark.read.parquet(path)
    baseline = spark.read.parquet(args.baseline) if args.baseline else None

    t0 = time.time()
    pending_parts = [r[0] for r in fact.select(args.part_col).distinct().collect()]
    if not pending_parts:
        summary = {"status": "nothing-to-do", "images_per_sec": 0.0, "n_rows": 0}
        man.write_summary(summary)
        print(json.dumps(summary))
        return summary

    res = validate_table(
        fact, spec, dims=dims, baseline=baseline,
        key_col=args.key_col, part_col=args.part_col, top_k=args.top_k,
        drift_columns=parse_drift_columns(spec),
        # uniqueness is table-global: a dup can span a done and a pending
        # partition, so P2 always scans the full table's key columns
        uniqueness_scope=fact_full,
    )
    # Sinks partitioned by (pass_id, part_id): with dynamic partition
    # overwrite, a resumed run rewrites exactly the cells it recomputed —
    # pending partitions for the per-partition passes, all partitions for
    # the global uniqueness pass — and completed cells survive (B4).
    # The three outputs are independent DAGs: submit concurrently so one
    # job's stage gaps are filled by another's tasks.
    from concurrent.futures import ThreadPoolExecutor

    writes = [
        lambda: (
            res.violations.repartition("pass_id", "part_id")
            .write.mode("overwrite").partitionBy("pass_id", "part_id")
            .parquet(args.out + "/violations")
        ),
        lambda: (
            res.verdicts.write.mode("overwrite").partitionBy("pass_id", "part_id")
            .parquet(args.out + "/verdicts")
        ),
    ]
    if res.stats is not None:
        writes.append(
            lambda: res.stats.write.mode("overwrite").partitionBy("part_id")
            .parquet(args.out + "/stats")
        )
    with ThreadPoolExecutor(len(writes)) as ex:
        for f in ex.map(lambda w: w(), writes):
            pass

    global_distinct = {}
    if res.stats is not None:
        # B15: the stats sink keeps every partition's HLL sketch (dynamic
        # overwrite preserves completed parts across resumes), so the
        # table-wide distinct estimate merges sketches over ALL partitions —
        # including ones validated before a kill — via hll_union_agg.
        from .passes.stats import merge_sketches

        global_distinct = {
            r.column: int(r.n_distinct_merged)
            for r in merge_sketches(spark.read.parquet(args.out + "/stats")).collect()
        }

    # lineage rows: per-partition row + violation counts from the written outputs
    vc = {
        r.part_id: r.n
        for r in spark.read.parquet(args.out + "/violations")
        .groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rc = {
        r.part_id: r.n
        for r in fact.groupBy(args.part_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wall_ms = (time.time() - t0) * 1000
    man.record(
        [
            {"part_id": p, "pass_id": "full", "status": "done",
             "n_rows": rc.get(p, 0), "n_violations": vc.get(p, 0),
             "wall_ms": wall_ms / max(len(pending_parts), 1)}
            for p in pending_parts
        ]
    )
    n_rows = sum(rc.values())
    elapsed = time.time() - t0
    summary = {
        "status": "ok",
        "n_rows": n_rows,
        "n_violations": sum(vc.values()),
        "n_partitions": len(pending_parts),
        "wall_sec": round(elapsed, 3),
        "images_per_sec": round(n_rows / elapsed, 1) if elapsed > 0 else 0.0,
        "global_distinct": global_distinct,
    }
    man.write_summary(summary)
    print(json.dumps(summary))
    if own_session:
        spark.stop()
    return summary


if __name__ == "__main__":
    run(sys.argv[1:])
