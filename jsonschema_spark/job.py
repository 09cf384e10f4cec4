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
from .io.tables import load_fact_table
from .manifest import Manifest
from .spec import parse
from .passes.drift import DriftColumn


def _drift_name(expr: str) -> str:
    """Metric name for a drift expression without an explicit "name":
    any SQL expression sanitizes to an identifier-ish slug — e.g.
    ``length(caption)`` -> ``length_caption``, ``w * h`` -> ``w_h`` —
    so sink paths and verdict keys never carry raw SQL."""
    import re

    slug = re.sub(r"[^A-Za-z0-9]+", "_", expr).strip("_")
    return slug or "expr"


def parse_drift_columns(spec) -> list[DriftColumn]:
    """Build DriftColumn configs from the spec's drift block.

    Two entry forms:
    - object: ``{"expr": "length(caption)", "name": "caption_len",
      "kind": "numeric", "lo": 0, "hi": 1024, "buckets": 32}`` — explicit
      ranges, required for expression columns (a guessed range like
      [0, 2^20) collapses every value into one bucket and blinds KS/PSI).
    - bare string: a property name; numeric ranges derive from the
      spec-declared minimum/maximum, strings become categorical. An entry
      with no derivable range is an error, not a degenerate histogram.

    The SAME config must drive both the observed histograms and the
    baseline profile — ranges define the bucket grid they share.
    """
    d = spec.table_checks.drift
    if not d:
        return []
    out = []
    for entry in d.get("columns", []):
        if isinstance(entry, dict):
            expr = entry["expr"]
            name = entry.get("name") or _drift_name(expr)
            if entry.get("kind", "numeric") == "categorical":
                out.append(DriftColumn(name, expr, "categorical"))
            else:
                out.append(DriftColumn(
                    name, expr, "numeric", float(entry.get("lo", 0.0)),
                    float(entry["hi"]), int(entry.get("buckets", 32))))
            continue
        name = _drift_name(entry)
        prop = spec.root.properties.get(entry)
        if prop is not None and prop.type and "string" in prop.type and "(" not in entry:
            out.append(DriftColumn(name, entry, "categorical"))
            continue
        lo = prop.minimum if prop and prop.minimum is not None else 0.0
        hi = prop.maximum if prop and prop.maximum is not None else None
        if hi is None:
            raise ValueError(
                f"drift column {entry!r} has no derivable numeric range "
                "(no matching property with minimum/maximum); use the object "
                'form {"expr": ..., "lo": ..., "hi": ..., "buckets": ...}')
        out.append(DriftColumn(name, entry, "numeric", float(lo), float(hi), 32))
    return out


def run(argv: list[str] | None = None, spark: SparkSession | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--table-format", default=None,
                    help="fact-table format (parquet default; 'iceberg' on a "
                         "cluster with the runtime jar — io/tables.py is the "
                         "only code that sees this)")
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
    # B28: sampled decoded-pixel fidelity pass (the only pass that reads
    # `bytes`). Three modes:
    #   phash     — recompute the perceptual hash from bytes and compare to
    #               the table's own stored phash column. No reference input;
    #               runs on ARBITRARY tables (the production default).
    #   ref       — join a reference table of the same shape on image_id;
    #               decoded-pixel PSNR>=40dB + caption equality vs it.
    #   generator — expected pixels re-derive from the deterministic fixture
    #               generator via image_id index (golden tests; needs the
    #               generator layout knobs below).
    ap.add_argument("--sample-fidelity", type=float, default=None,
                    help="sampling fraction for the decoded-pixel fidelity pass")
    ap.add_argument("--fidelity-parts-fraction", type=float, default=None,
                    help="two-stage cluster sample: keep this fraction of "
                         "partitions (hash-pruned at the scan on part-"
                         "partitioned tables), row-sample inside so the "
                         "overall fraction is unchanged; rotate --fidelity-"
                         "seed across scheduled runs for coverage")
    ap.add_argument("--fidelity-seed", type=int, default=7)
    ap.add_argument("--fidelity-mode", choices=["generator", "phash", "ref"],
                    default=None,
                    help="default: ref when --fidelity-ref is given, else "
                         "generator (fixture-table compatibility)")
    ap.add_argument("--fidelity-ref", default=None,
                    help="reference-table path for --fidelity-mode ref")
    ap.add_argument("--fidelity-nparts", type=int, default=16)
    ap.add_argument("--fidelity-driftpart", type=int, default=7)
    ap.add_argument("--check-headers", action="store_true",
                    help="add the container-header sniff pass (B53): magic "
                         "bytes / header dims / raw byte-length checked "
                         "against the declared fmt/w/h columns on EVERY row "
                         "— pure Column exprs, no pixel decode")
    ap.add_argument("--scratch", default=None,
                    help="materialize the fused scan as a parquet scratch table "
                         "at this path instead of the SQL columnar cache "
                         "(shared storage on a cluster, tmpfs locally)")
    ap.add_argument("--quantile-sketches", action="store_true",
                    help="fuse a mergeable KLL quantile sketch per numeric "
                         "spec'd column into the stats pass; the summary "
                         "gains global_quantiles (p50/p90/p99 merged over "
                         "ALL partitions — resume-safe like global_distinct)."
                         " Keep the flag consistent across resumes of one "
                         "sink (it changes the stats schema)")
    ap.add_argument("--force-lint", action="store_true",
                    help="run even when spec lint reports error-severity "
                         "findings (unsatisfiable nodes)")
    ap.add_argument("--strict", action="store_true",
                    help="exit non-zero (3) when any check failed "
                         "(table_passed false) — CI gate; handled at the "
                         "__main__ level so library callers are unaffected")
    ap.add_argument("--kll-k", type=int, default=200,
                    help="KLL sketch size parameter (exact below k per "
                         "sketch; ~1.65%% rank error at the default 200)")
    args = ap.parse_args(argv)

    own_session = spark is None
    if spark is None:
        spark = get_session("jsonschema-spark-job", parallelism=args.parallelism)

    with open(args.spec) as f:
        raw_spec = json.load(f)
    # pre-flight lint BEFORE any cluster work: an error-severity finding
    # means a node no value can satisfy — every row would violate, which is
    # a typo'd spec burning a 100 TB scan, not a validation result
    from .lint import lint_spec

    findings = lint_spec(raw_spec)
    for sev, fpath, msg in findings:
        print(f"spec-lint {sev}: {fpath}: {msg}", file=sys.stderr)
    errors = [f for f in findings if f[0] == "error"]
    if errors and not args.force_lint:
        raise SystemExit(
            f"spec fails lint with {len(errors)} error(s) — fix the spec or "
            "pass --force-lint to run anyway")
    spec = parse(raw_spec)

    # The ONE fact-table read in the operational path — io/tables.py is the
    # format swap point (parquet here, `--table-format iceberg` or
    # SPARK_GRAFT_TABLE_FORMAT=iceberg on a real cluster).
    fact_full = load_fact_table(spark, args.table, fmt=args.table_format)
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

    fidelity_fn = None
    if args.sample_fidelity:
        from .passes import fidelity as P5

        mode = args.fidelity_mode or ("ref" if args.fidelity_ref else "generator")
        pf, fseed = args.fidelity_parts_fraction, args.fidelity_seed
        if mode == "phash":
            fidelity_fn = lambda df: P5.fidelity_violations_phash(  # noqa: E731
                df, fraction=args.sample_fidelity, part_col=args.part_col,
                parts_fraction=pf, seed=fseed,
            )
        elif mode == "ref":
            if not args.fidelity_ref:
                raise SystemExit("--fidelity-mode ref needs --fidelity-ref <path>")
            ref = load_fact_table(spark, args.fidelity_ref, fmt=args.table_format)
            fidelity_fn = lambda df: P5.fidelity_violations_ref(  # noqa: E731
                df, ref, fraction=args.sample_fidelity,
                part_col=args.part_col, key_col=args.key_col,
                parts_fraction=pf, seed=fseed,
            )
        else:
            from . import fixtures as FX

            fcfg = FX.FixtureConfig(
                n=0, n_parts=args.fidelity_nparts, drift_part=args.fidelity_driftpart
            )
            fidelity_fn = lambda df: P5.fidelity_violations(  # noqa: E731
                df, fcfg, fraction=args.sample_fidelity, part_col=args.part_col,
                parts_fraction=pf, seed=fseed,
            )

    headers_fn = None
    if args.check_headers:
        from .passes.headers import header_violations as _hv

        need = {"bytes", "fmt", "w", "h"}
        missing = need - set(fact.columns)
        if missing:
            raise SystemExit(
                f"--check-headers needs columns {sorted(need)}; table is "
                f"missing {sorted(missing)}")
        headers_fn = lambda df: _hv(  # noqa: E731
            df, key_col=args.key_col, part_col=args.part_col)

    res = validate_table(
        fact, spec, dims=dims, baseline=baseline,
        key_col=args.key_col, part_col=args.part_col, top_k=args.top_k,
        drift_columns=parse_drift_columns(spec),
        # uniqueness is table-global: a dup can span a done and a pending
        # partition, so P2 always scans the full table's key columns
        uniqueness_scope=fact_full,
        fidelity_fn=fidelity_fn,
        headers_fn=headers_fn,
        fuse_scratch=args.scratch,
        with_quantiles=args.quantile_sketches,
        kll_k=args.kll_k,
    )
    # Sinks partitioned by (pass_id, part_id). Overwrite semantics:
    # - resume: DYNAMIC partition overwrite rewrites exactly the cells this
    #   run recomputed (pending partitions per-partition, all partitions for
    #   the global uniqueness pass) and completed cells survive (B4).
    # - fresh run: STATIC overwrite truncates the whole sink first — dynamic
    #   mode would leave stale cells from a previous run with a different
    #   spec/data (a partition whose violations dropped to zero writes no
    #   rows, so its old rows would survive and pollute the counts).
    # The three outputs are independent DAGs: submit concurrently so one
    # job's stage gaps are filled by another's tasks.
    from concurrent.futures import ThreadPoolExecutor

    ow_mode = "dynamic" if args.resume else "static"

    writes = [
        lambda: (
            res.violations.repartition("pass_id", "part_id")
            .write.mode("overwrite").option("partitionOverwriteMode", ow_mode)
            .partitionBy("pass_id", "part_id")
            .parquet(args.out + "/violations")
        ),
        lambda: (
            res.verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", ow_mode)
            .partitionBy("pass_id", "part_id")
            .parquet(args.out + "/verdicts")
        ),
    ]
    if res.stats is not None:
        writes.append(
            lambda: res.stats.write.mode("overwrite")
            .option("partitionOverwriteMode", ow_mode)
            .partitionBy("part_id")
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

    global_quantiles = {}
    if res.stats is not None and args.quantile_sketches:
        # B42: same resume-safe rollup for the KLL quantile sketches — the
        # sink holds every partition's sketch, so table-wide p50/p90/p99
        # cover completed-before-a-kill partitions too.
        from .passes.stats import merge_quantiles

        global_quantiles = {
            r.column: {"q50": r.q50, "q90": r.q90, "q99": r.q99}
            for r in merge_quantiles(spark.read.parquet(args.out + "/stats")).collect()
        }

    # the one-line answer to "did the table pass": failed-check counts per
    # pass from the (tiny) verdicts sink — covers every check family incl.
    # the table-wide quantile/distinct/null-rate rows
    from pyspark.errors import AnalysisException as _AE

    try:
        failed_checks = {
            r.pass_id: r.n
            for r in spark.read.parquet(args.out + "/verdicts")
            .where(~F.col("passed"))
            .groupBy("pass_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    except _AE:
        # a spec with zero checks writes no verdict rows — the sink then has
        # no data files and schema inference raises; that is a (degenerate)
        # clean table. Any other failure propagates via the sinks above.
        failed_checks = {}

    # lineage rows: per-partition row + violation counts from the written
    # outputs. Row counts come from the stats sink (every column row of a
    # partition carries the same n_rows) — re-scanning the fact table for
    # numbers already on disk would be an entire extra 100 TB read.
    from pyspark.errors import AnalysisException

    try:
        vc = {
            r.part_id: r.n
            for r in spark.read.parquet(args.out + "/violations")
            .groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    except AnalysisException:
        # a fully-clean run writes zero violation rows — the sink then has
        # no data files and schema inference raises AnalysisException; that
        # IS the happy path. Any OTHER failure (corrupted sink, permissions,
        # transient I/O) must propagate — mapping it to vc={} would make a
        # hard failure indistinguishable from a clean run.
        vc = {}
    if res.stats is not None:
        rc = {
            r.part_id: r.n
            for r in spark.read.parquet(args.out + "/stats")
            .groupBy("part_id").agg(F.max("n_rows").alias("n")).collect()
        }
    else:  # no stat columns in the spec — fall back to one narrow count scan
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
    # On resume the sinks (dynamic overwrite) carry EVERY completed
    # partition's rows, but this run only processed the pending ones —
    # n_rows/images_per_sec must reflect the work actually done, with the
    # table-wide totals reported separately.
    pend = set(pending_parts)
    n_rows = sum(n for p, n in rc.items() if p in pend)
    elapsed = time.time() - t0
    summary = {
        "status": "ok",
        "n_rows": n_rows,
        "n_violations": sum(n for p, n in vc.items() if p in pend),
        "n_partitions": len(pending_parts),
        "table_n_rows": sum(rc.values()),
        "table_n_violations": sum(vc.values()),
        "wall_sec": round(elapsed, 3),
        "images_per_sec": round(n_rows / elapsed, 1) if elapsed > 0 else 0.0,
        "global_distinct": global_distinct,
        **({"global_quantiles": global_quantiles} if args.quantile_sketches else {}),
        "n_failed_checks": failed_checks,
        "table_passed": not failed_checks,
    }
    man.write_summary(summary)
    print(json.dumps(summary))
    res.cleanup()  # unpersist run caches — library callers keep their session
    if own_session:
        spark.stop()
    return summary


if __name__ == "__main__":
    _summary = run(sys.argv[1:])
    # --strict: CI-friendly exit code — non-zero when any check failed.
    # Applied only on the CLI path; library callers read the summary dict.
    if "--strict" in sys.argv[1:] and _summary.get("table_passed") is False:
        sys.exit(3)
