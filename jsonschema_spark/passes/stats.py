"""P1 — fused single-scan column-stats pass + row-level violation projection.

SURVEY.md §2 B5/B6/B14/B15/B21; BASELINE.json:6 "single-scan per-partition
column-stats pass (min/max/null-rate/distinct via HLL sketches, type/format/
range predicates compiled from a JSONSchema-style constraint spec)".

Scale notes (100 TB / 10^12 rows):
- The stats pass reads ONLY the spec'd columns (never ``bytes``); Catalyst
  prunes the Parquet/Iceberg scan to that column set.
- All columns' aggregates are fused into ONE ``groupBy(part_id).agg(...)`` —
  Catalyst executes it as map-side partial + final hash aggregation, so the
  shuffle carries one small row per (partition × map-task), not data rows.
- HLL sketches (`hll_sketch_agg`) are mergeable binary state (O(KB)): they
  round-trip through the manifest and roll up table-wide via
  ``hll_union_agg`` across resume boundaries (B15).
- Row violations are a pure projection (whole-stage codegen) + explode;
  the sink is bounded by top-k per (partition, keyword) (B21) while exact
  counts are preserved in the verdicts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..compile_spark import CompiledTableSpec

VIOLATION_COLS = ["part_id", "row_key", "keyword", "path", "value"]


def row_violations(
    df: DataFrame,
    compiled: CompiledTableSpec,
    key_col: str,
    part_col: str = "part_id",
    top_k: int | None = None,
) -> DataFrame:
    """Row-level violations: one narrow projection → explode → (optional)
    top-k per (partition, keyword). Returns VIOLATION_COLS schema."""
    narrow = df.select(
        F.col(part_col).alias("part_id"),
        F.col(key_col).cast("string").alias("row_key"),
        compiled.violations_array().alias("viols"),
    )
    # Cheap pre-filter: rows with no violations never reach the explode.
    v = (
        narrow.where(F.size("viols") > 0)
        .select("part_id", "row_key", F.explode("viols").alias("v"))
        .select("part_id", "row_key", "v.keyword", "v.path", "v.value")
    )
    if top_k is not None:
        v = bound_top_k(v, top_k)
    return v


def bound_top_k(violations: DataFrame, top_k: int) -> DataFrame:
    """Bound a violation stream to ≤k example rows per (partition, check)
    (B21) — exact counts must be taken from the unbounded stream first."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("part_id", "keyword", "path").orderBy("row_key")
    return (
        violations.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def violation_counts(violations: DataFrame) -> DataFrame:
    """Exact per-(partition, check) counts — computed BEFORE top-k bounding."""
    return violations.groupBy("part_id", "keyword", "path").agg(
        F.count(F.lit(1)).alias("n_violations")
    )


STAT_FIELDS = ["n_rows", "n_nulls", "min_val", "max_val", "n_distinct_approx", "hll_sketch"]

_NUMERIC_TYPENAMES = (
    "byte", "short", "integer", "long", "float", "double", "decimal",
)


def numeric_columns(df: DataFrame, columns: list[str]) -> set[str]:
    return {
        c for c in columns
        if df.schema[c].dataType.typeName().startswith(_NUMERIC_TYPENAMES)
    }


def partition_wide_agg(
    df: DataFrame,
    columns: list[str],
    part_col: str = "part_id",
    with_sketches: bool = True,
    with_quantiles: bool = False,
    kll_k: int = 200,
    anomaly_exprs: tuple[str, ...] = (),
) -> DataFrame:
    """THE per-partition aggregation: one ``groupBy(part)`` hash agg
    computing the stats-pass state for every spec'd column and, when
    ``anomaly_exprs`` is non-empty, the partition-anomaly profile
    (mean + null-rate per expression, ``__a{i}_mean``/``__a{i}_nullrate``
    columns) in the SAME pass — the stats sink, the quantile/distinct/
    null-rate check families, and P6 all derive from this one result, so
    the fact table is aggregated exactly once for all of them (at 32M rows
    the un-fused form ran three ~300-600 task-second ObjectHashAggregate
    stages per suite, each re-exchanging ~277 MB of partial sketch state).

    Output: one row per partition; the caller persists it (partitions ×
    columns scale, independent of row count) and projects the long stats
    shape via ``stats_long`` / the anomaly profile via
    ``anomaly.profile_from_wide``."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    numeric = numeric_columns(df, columns)
    for c in columns:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
        aggs.append(F.approx_count_distinct(col).alias(f"{c}__dist"))
        if with_sketches:
            # hll_sketch_agg natively supports int/long/string/binary — pass
            # those through unchanged (a cast("string") on an int column
            # allocates a UTF8String per CELL: measured GC churn at 32
            # cores); only unsupported types (double, date, ...) cast.
            dt = df.schema[c].dataType.typeName()
            sk = col if dt in ("integer", "long", "string") else col.cast("string")
            aggs.append(F.hll_sketch_agg(sk).alias(f"{c}__hll"))
        if with_quantiles and c in numeric:
            aggs.append(
                F.kll_sketch_agg_double(col.cast("double"), F.lit(kll_k))
                .alias(f"{c}__kll"))
    for i, e in enumerate(anomaly_exprs):
        v = F.expr(e)
        aggs.append(F.avg(v.cast("double")).alias(f"__a{i}_mean"))
        aggs.append(F.avg(v.isNull().cast("double")).alias(f"__a{i}_nullrate"))
    # no pre-select: anomaly expressions may reference any input column;
    # Catalyst column-prunes the scan to exactly the referenced set (the
    # single-HashAggregate plan assert pins this)
    return df.groupBy(F.col(part_col).alias("part_id")).agg(*aggs)


def stats_long(
    wide: DataFrame,
    columns: list[str],
    numeric: set[str],
    with_sketches: bool = True,
    with_quantiles: bool = False,
) -> DataFrame:
    """Project ``partition_wide_agg`` output to the stats-sink long format:
    part_id, column, n_rows, n_nulls, min_val, max_val, n_distinct_approx,
    hll_sketch[, kll_sketch]."""
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
            F.col(f"{c}__dist").alias("n_distinct_approx"),
            (F.col(f"{c}__hll") if with_sketches else F.lit(None).cast("binary")).alias("hll_sketch"),
            *([(F.col(f"{c}__kll") if c in numeric else F.lit(None).cast("binary")).alias("kll_sketch")]
              if with_quantiles else []),
        )
        for c in columns
    ]
    out_cols = [
        "part_id", "s.column", "n_rows", "s.n_nulls", "s.min_val", "s.max_val",
        "s.n_distinct_approx", "s.hll_sketch",
    ] + (["s.kll_sketch"] if with_quantiles else [])
    return (
        wide.select("part_id", "n_rows", F.explode(F.array(*structs)).alias("s"))
        .select(*out_cols)
    )


def column_stats(
    df: DataFrame,
    columns: list[str],
    part_col: str = "part_id",
    with_sketches: bool = True,
    with_quantiles: bool = False,
    kll_k: int = 200,
) -> DataFrame:
    """Fused per-partition stats for all spec'd columns in ONE aggregation.

    Output (long format): part_id, column, n_rows, n_nulls, min_val:string,
    max_val:string, n_distinct_approx, hll_sketch:binary[, kll_sketch:binary].

    ``with_quantiles`` adds a mergeable KLL quantile sketch per NUMERIC
    column (Apache DataSketches, same family as the HLL sketches): binary
    state that round-trips through the stats manifest and rolls up
    table-wide via ``kll_merge_agg_double`` across resume boundaries — the
    quantile analogue of B15, giving resumable p50/p90/p99 without a global
    sort or a second fact scan. KLL is exact while a sketch has seen ≤ k
    values (no compaction yet) and carries the published ~1.65%/k=200 rank
    error beyond; raise ``kll_k`` for tighter tails. Opt-in so existing
    stats-sink schemas are unchanged.

    Composition of ``partition_wide_agg`` + ``stats_long``; the engine calls
    those directly so the anomaly pass can share the same aggregation."""
    wide = partition_wide_agg(
        df.select(part_col, *columns), columns, part_col=part_col,
        with_sketches=with_sketches, with_quantiles=with_quantiles, kll_k=kll_k)
    return stats_long(wide, columns, numeric_columns(df, columns),
                      with_sketches=with_sketches, with_quantiles=with_quantiles)


def merge_quantiles(
    stats: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Roll partition-level KLL sketches up table-wide (resume-safe merge —
    the quantile analogue of ``merge_sketches``). Input must come from
    ``column_stats(..., with_quantiles=True)``; non-numeric columns (null
    sketches) are skipped. Output: column, q50, q90, q99, ... (quantile ×100,
    dots becoming underscores: 0.5 → q50, 0.999 → q99_9)."""
    merged = (
        stats.where(F.col("kll_sketch").isNotNull())
        .groupBy("column")
        .agg(F.kll_merge_agg_double("kll_sketch").alias("_m"))
    )

    def _name(q: float) -> str:
        return "q" + f"{q * 100:g}".replace(".", "_")

    return merged.select(
        "column",
        *[F.kll_sketch_get_quantile_double("_m", F.lit(q)).alias(_name(q))
          for q in quantiles],
    )


def merge_sketches(stats: DataFrame) -> DataFrame:
    """Roll partition-level HLL sketches up table-wide (resume-safe union)."""
    return stats.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("n_distinct_merged"),
    )


def verdicts_from_violations(
    counts: DataFrame,
    all_part_ids: DataFrame,
    check_ids: list[str],
) -> DataFrame:
    """B18: fold violation counts into a dense per-(partition, check) verdict
    matrix — parts×checks with zero violations must appear as passed=true.

    ``all_part_ids``: DataFrame with a single ``part_id`` column (distinct).
    """
    spark = counts.sparkSession
    checks = spark.createDataFrame(
        [(cid.split("@", 1)[0], cid.split("@", 1)[1]) for cid in check_ids],
        T.StructType([
            T.StructField("keyword", T.StringType()),
            T.StructField("path", T.StringType()),
        ]),
    )
    # parts × checks grid: both sides are tiny (metadata-scale) — cross join +
    # broadcast is safe and never touches fact-table data.
    grid = all_part_ids.crossJoin(F.broadcast(checks))
    return (
        grid.join(counts, ["part_id", "keyword", "path"], "left")
        .withColumn("n_violations", F.coalesce(F.col("n_violations"), F.lit(0)))
        .withColumn("passed", F.col("n_violations") == 0)
        .withColumn("check_id", F.concat_ws("@", "keyword", "path"))
        .select("part_id", "check_id", "keyword", "path", "passed", "n_violations")
    )
