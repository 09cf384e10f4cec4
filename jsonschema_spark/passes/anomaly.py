"""Partition-anomaly detection: flag ingestion batches whose per-partition
column profile is a robust outlier against the table's partition population.

Validation rationale (north rule: per-partition pass/fail at 10^12 rows):
range/type checks catch per-ROW corruption, drift tests catch distribution
shape changes vs a baseline — but a silently half-null batch, or a batch
whose mean jumped 10x, passes both when the damaged values are individually
legal. The partition profile catches exactly that failure mode.

Scale shape:
- ``partition_profile`` is ONE fact scan → one hash aggregation keyed by
  (partition): output is partitions × columns rows, independent of row
  count. Map-side partial aggregation collapses everything before the
  shuffle.
- ``anomaly_flags`` runs entirely on that tiny profile table: per-column
  median and MAD via window functions, no fact data touched. Robust
  statistics (median/MAD, not mean/stddev) so the outlier batches being
  hunted cannot mask themselves by inflating the spread estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Φ^{-1}(0.75): MAD × 1.4826 estimates σ under normality, making the z
# threshold comparable to a classic z-score cut.
MAD_SIGMA = 1.4826


def partition_profile(
    df: DataFrame, columns: list[str], part_col: str = "part_id"
) -> DataFrame:
    """(part_id, column, metric, value) — per-partition mean and null-rate
    for each requested column (a column name OR any SQL expression, e.g.
    ``length(caption)`` — same surface as the drift columns), one scan, one
    aggregation. The expression string itself is the reported label."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(columns):
        v = F.expr(c)
        aggs.append(F.avg(v.cast("double")).alias(f"m{i}__mean"))
        aggs.append(F.avg(v.isNull().cast("double")).alias(f"m{i}__nullrate"))
    wide = df.groupBy(F.col(part_col).alias("part_id")).agg(*aggs)

    entries = []
    for i, c in enumerate(columns):
        entries.append(F.struct(
            F.lit(c).alias("column"), F.lit("mean").alias("metric"),
            F.col(f"m{i}__mean").alias("value")))
        entries.append(F.struct(
            F.lit(c).alias("column"), F.lit("null_rate").alias("metric"),
            F.col(f"m{i}__nullrate").alias("value")))
    return (
        wide.select("part_id", "n_rows", F.explode(F.array(*entries)).alias("e"))
        .select("part_id", "n_rows", "e.column", "e.metric", "e.value")
    )


def profile_from_wide(wide: DataFrame, exprs: list[str]) -> DataFrame:
    """Derive the (part_id, n_rows, column, metric, value) profile from a
    ``stats.partition_wide_agg(..., anomaly_exprs=exprs)`` result — the
    fused path: P6 then costs zero extra fact-table aggregations (the wide
    agg is partitions-scale and persisted by the engine). Output is
    identical to ``partition_profile`` on the same input."""
    entries = []
    for i, c in enumerate(exprs):
        entries.append(F.struct(
            F.lit(c).alias("column"), F.lit("mean").alias("metric"),
            F.col(f"__a{i}_mean").alias("value")))
        entries.append(F.struct(
            F.lit(c).alias("column"), F.lit("null_rate").alias("metric"),
            F.col(f"__a{i}_nullrate").alias("value")))
    return (
        wide.select("part_id", "n_rows", F.explode(F.array(*entries)).alias("e"))
        .select("part_id", "n_rows", "e.column", "e.metric", "e.value")
    )


def anomaly_flags(profile: DataFrame, z_max: float = 3.5) -> DataFrame:
    """Robust z-score per (part_id, column, metric) against the partition
    population: z = (value − median) / (MAD_SIGMA × MAD). Partitions with
    |z| > z_max are flagged. MAD = 0 (all partitions identical) flags only
    exact deviants via the EPS floor.

    3.5 is the conventional robust-outlier cut (Iglewicz & Hoaglin, "How to
    Detect and Handle Outliers", 1993).
    """
    w = Window.partitionBy("column", "metric")
    med = F.median("value").over(w)
    p = profile.withColumn("med", med)
    mad = F.median(F.abs(F.col("value") - F.col("med"))).over(w)
    p = p.withColumn("mad", mad)
    z = (F.col("value") - F.col("med")) / (
        F.greatest(F.col("mad") * F.lit(MAD_SIGMA), F.lit(1e-12))
    )
    return (
        p.withColumn("robust_z", z)
        .withColumn("is_anomaly", F.abs(F.col("robust_z")) > F.lit(z_max))
    )


def anomaly_verdicts(flags: DataFrame) -> DataFrame:
    """Flagged partitions in the engine verdict schema."""
    return (
        flags.filter(F.col("is_anomaly"))
        .select(
            "part_id",
            F.concat(F.lit("anomaly@/"), F.col("column"), F.lit(":"), F.col("metric"))
            .alias("check_id"),
            F.lit("anomaly").alias("keyword"),
            F.concat(F.lit("/"), F.col("column")).alias("path"),
            F.lit(False).alias("passed"),
            F.lit(1).cast("long").alias("n_violations"),
        )
    )
