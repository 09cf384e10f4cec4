"""E2 — ``validate_table``: the set-oriented DataFrame API (SURVEY.md §3 E2).

Compiles a JSONSchema-style spec and runs the four passes:
  P1 row predicates + fused column stats   (passes/stats.py)
  P2 salted uniqueness                     (passes/uniqueness.py)
  P3 broadcast/shuffle-hash referential    (passes/referential.py)
  P4 histogram + KS/PSI drift              (passes/drift.py)

Violation streams are unioned into one schema (B23); verdicts are assembled
per (partition, check) (B18). Nothing here collects fact-scale data to the
driver — violations/verdicts are returned as DataFrames for the caller to
sink (B3) or aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compile_spark import CompiledTableSpec, compile_table
from .spec import Spec, parse
from .passes import stats as P1
from .passes import uniqueness as P2
from .passes import referential as P3
from .passes import drift as P4


@dataclass
class ValidationResult:
    violations: DataFrame       # (part_id, row_key, keyword, path, value)
    verdicts: DataFrame         # (part_id, check_id, keyword, path, passed, n_violations)
    stats: DataFrame | None     # per-partition column stats (long format)
    drift_metrics: DataFrame | None
    compiled: CompiledTableSpec


def recommended_conf(parallelism: int = 32) -> dict[str, str]:
    """Spark confs the engine is designed around (SURVEY.md §4, BASELINE.md)."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": str(max(parallelism * 4, 32)),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # Resume idempotency (B4): overwrite ONLY the partitions present in a
        # retried write, so completed partitions' violations survive a resume.
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
    }


def get_session(app: str = "jsonschema-spark", master: str | None = None,
                parallelism: int | None = None) -> SparkSession:
    import os

    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = SparkSession.builder.appName(app)
    b = b.master(master or f"local[{cpus}]")
    for k, v in recommended_conf(cpus).items():
        b = b.config(k, v)
    return b.getOrCreate()


def validate_rows(
    df: DataFrame, spec: dict[str, Any] | Spec, keys: list[str]
) -> DataFrame:
    """Generic row-level validation: compile the spec against ``df``'s schema
    and return violation rows keyed by ``keys`` — (keys..., keyword, path,
    value). One projection + explode; no per-row Python (B5/B6)."""
    if not isinstance(spec, Spec):
        spec = parse(spec)
    compiled = compile_table(spec, df.schema)
    narrow = df.select(*keys, compiled.violations_array().alias("viols"))
    return (
        narrow.where(F.size("viols") > 0)
        .select(*keys, F.explode("viols").alias("v"))
        .select(*keys, "v.keyword", "v.path", "v.value")
    )


def validate_table(
    fact: DataFrame,
    spec: dict[str, Any] | Spec,
    dims: dict[str, DataFrame] | None = None,
    baseline: DataFrame | None = None,
    key_col: str = "image_id",
    part_col: str = "part_id",
    top_k: int | None = None,
    with_stats: bool = True,
    drift_columns: list[P4.DriftColumn] | None = None,
    uniqueness_scope: DataFrame | None = None,
) -> ValidationResult:
    """Run the four-pass suite over ``fact``.

    ``uniqueness_scope``: uniqueness (P2) is a whole-table property — a
    duplicate key can span a completed and a pending partition. On resume,
    pass the FULL table here while ``fact`` carries only pending partitions;
    P2 then scans just its key columns table-wide (narrow columnar scan)
    while the per-partition passes stay pruned. Defaults to ``fact``.

    Every violation row carries a ``pass_id`` column ("rows" | "unique" |
    "refs") so sinks can partition by (pass_id, part_id) and a resumed pass
    dynamically overwrites exactly its own cells (B4).
    """
    if not isinstance(spec, Spec):
        spec = parse(spec)
    dims = dims or {}
    compiled = compile_table(spec, fact.schema)
    all_parts = fact.select(F.col(part_col).alias("part_id")).distinct()
    scope = uniqueness_scope if uniqueness_scope is not None else fact
    scope_parts = (
        scope.select(F.col(part_col).alias("part_id")).distinct()
        if uniqueness_scope is not None
        else all_parts
    )

    streams: list[DataFrame] = []
    verdict_streams: list[DataFrame] = []

    # P1 — row predicates
    viol1 = P1.row_violations(fact, compiled, key_col=key_col, part_col=part_col)
    counts1 = P1.violation_counts(viol1)
    verdict_streams.append(
        P1.verdicts_from_violations(counts1, all_parts, compiled.check_ids())
        .withColumn("pass_id", F.lit("rows"))
    )
    sink1 = viol1 if top_k is None else P1.row_violations(
        fact, compiled, key_col=key_col, part_col=part_col, top_k=top_k)
    streams.append(sink1.withColumn("pass_id", F.lit("rows")))

    # P2 — uniqueness (always over the full scope, see docstring)
    for key_cols in spec.table_checks.unique:
        v = P2.uniqueness_violations(scope, list(key_cols), key_col=key_col, part_col=part_col)
        streams.append(v.withColumn("pass_id", F.lit("unique")))
        verdict_streams.append(
            P2.uniqueness_verdicts(v, scope_parts, list(key_cols))
            .withColumn("pass_id", F.lit("unique"))
        )

    # P3 — referential
    for ref in spec.table_checks.references:
        dim_name = ref["dim"]
        if dim_name not in dims:
            raise KeyError(f"referential check needs dim table {dim_name!r}")
        v = P3.referential_violations(
            fact, dims[dim_name], fact_key=ref["column"], dim_key=ref["key"],
            key_col=key_col, part_col=part_col,
            strategy=ref.get("strategy", "broadcast"), dim_name=dim_name,
        )
        streams.append(v.withColumn("pass_id", F.lit("refs")))
        cnt = v.groupBy("part_id").agg(F.count(F.lit(1)).alias("n_violations"))
        path = f"/{ref['column']}->{dim_name}.{ref['key']}"
        verdict_streams.append(
            all_parts.join(cnt, "part_id", "left")
            .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
            .select(
                "part_id",
                F.lit(f"references@{path}").alias("check_id"),
                F.lit("references").alias("keyword"),
                F.lit(path).alias("path"),
                (F.col("n_violations") == 0).alias("passed"),
                "n_violations",
            )
            .withColumn("pass_id", F.lit("refs"))
        )

    # P4 — drift
    drift_df = None
    dcfg = spec.table_checks.drift
    if dcfg is not None and baseline is not None and drift_columns:
        obs = P4.observed_histograms(fact, drift_columns, part_col=part_col)
        drift_df = P4.drift_metrics(obs, baseline)
        verdict_streams.append(
            P4.drift_verdicts(
                drift_df,
                ks_alpha=dcfg.get("ks_alpha", 0.01),
                psi_max=dcfg.get("psi_max", 0.2),
            ).withColumn("pass_id", F.lit("drift"))
        )

    # fused stats (B14/B15) — optional, never scans `bytes`
    stats_df = None
    if with_stats and compiled.columns:
        stat_cols = [c for c in compiled.columns
                     if fact.schema[c].dataType.typeName() != "binary"]
        if stat_cols:
            stats_df = P1.column_stats(fact, stat_cols, part_col=part_col)

    violations = streams[0]
    for s in streams[1:]:
        violations = violations.unionByName(s)
    verdicts = verdict_streams[0]
    for v in verdict_streams[1:]:
        verdicts = verdicts.unionByName(v)

    return ValidationResult(
        violations=violations,
        verdicts=verdicts,
        stats=stats_df,
        drift_metrics=drift_df,
        compiled=compiled,
    )
