"""P4 — distribution-drift tests: histograms + KS + PSI (SURVEY.md B16/B19/B20).

BASELINE.json:6: "KS/PSI distribution-drift tests on w, h, fmt and
caption-length histograms".

Scale design:
- ALL drift columns are histogrammed in ONE scan: per row we build an
  array<struct<col,bucket>> (one entry per drift column), explode it, and do
  a single ``groupBy(part_id, col, bucket).count()``. Map-side partial
  aggregation collapses the explode multiplier before the shuffle; the
  shuffle payload is bounded by partitions × columns × buckets, independent
  of row count.
- KS and PSI are then computed on that tiny histogram table with window
  functions — never touching fact data again.
- The KS p-value uses the asymptotic Kolmogorov series, expressed as a
  literal sum of exp terms so it stays a JVM Column expression (no scipy —
  SURVEY.md §0).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPS = 1e-6  # PSI smoothing for empty buckets


@dataclass(frozen=True)
class DriftColumn:
    name: str               # label, e.g. "caption_len"
    expr: str               # SQL expression, e.g. "length(caption)"
    kind: str = "numeric"   # "numeric" | "categorical"
    lo: float | None = None
    hi: float | None = None
    buckets: int = 32

    def bucket_col(self) -> Column:
        v = F.expr(self.expr)
        if self.kind == "categorical":
            return v.cast("string")
        return F.width_bucket(
            v.cast("double"), F.lit(float(self.lo)), F.lit(float(self.hi)), F.lit(self.buckets)
        ).cast("string")


def observed_histograms(
    df: DataFrame, cols: list[DriftColumn], part_col: str = "part_id"
) -> DataFrame:
    """(part_id, col, bucket, n) for every drift column — one scan."""
    entries = [
        F.struct(F.lit(c.name).alias("col"), c.bucket_col().alias("bucket")) for c in cols
    ]
    return (
        df.select(F.col(part_col).alias("part_id"), F.explode(F.array(*entries)).alias("e"))
        .groupBy("part_id", "e.col", "e.bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def baseline_profile(df: DataFrame, cols: list[DriftColumn]) -> DataFrame:
    """(col, bucket, p_expected) from a clean reference table (global)."""
    entries = [
        F.struct(F.lit(c.name).alias("col"), c.bucket_col().alias("bucket")) for c in cols
    ]
    hist = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .groupBy("e.col", "e.bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("col")
    return hist.select(
        "col", "bucket", (F.col("n") / F.sum("n").over(tot)).alias("p_expected")
    )


def baseline_from_observed(obs: DataFrame) -> DataFrame:
    """(col, bucket, p_expected) derived from an observed-histogram table —
    for self-drift checks where the baseline IS the table-wide distribution
    (each partition tested against the whole table). Algebraically identical
    to ``baseline_profile`` on the same fact table + drift columns: the
    global histogram is the per-partition histogram summed over partitions —
    but costs one aggregation over the TINY histogram table instead of a
    second full fact scan."""
    hist = obs.groupBy("col", "bucket").agg(F.sum("n").alias("n"))
    tot = Window.partitionBy("col")
    return hist.select(
        "col", "bucket", (F.col("n") / F.sum("n").over(tot)).alias("p_expected")
    )


def _kolmogorov_pvalue(lam: Column, terms: int = 40) -> Column:
    """Asymptotic two-sided KS p-value: 2·Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²}."""
    s = reduce(
        lambda a, b: a + b,
        [
            F.lit(2.0 * (1.0 if k % 2 == 1 else -1.0)) * F.exp(F.lit(-2.0 * k * k) * lam * lam)
            for k in range(1, terms + 1)
        ],
    )
    return F.greatest(F.least(s, F.lit(1.0)), F.lit(0.0))


def drift_metrics(obs: DataFrame, baseline: DataFrame) -> DataFrame:
    """Per (part_id, col): PSI, KS D-statistic, asymptotic KS p-value, n.

    ``obs``: (part_id, col, bucket, n); ``baseline``: (col, bucket, p_expected).
    Bucket order for the KS CDF: numeric bucket index (cast) else lexical.
    """
    parts = obs.select("part_id").distinct()
    buckets = (
        obs.select("col", "bucket").union(baseline.select("col", "bucket")).distinct()
    )
    grid = parts.crossJoin(F.broadcast(buckets))

    j = (
        grid.join(obs, ["part_id", "col", "bucket"], "left")
        .join(F.broadcast(baseline), ["col", "bucket"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .withColumn("p_expected", F.coalesce("p_expected", F.lit(0.0)))
    )
    wn = Window.partitionBy("part_id", "col")
    j = j.withColumn("n_tot", F.sum("n").over(wn)).withColumn(
        "p_obs", F.col("n") / F.greatest(F.col("n_tot"), F.lit(1))
    )

    order = F.coalesce(F.col("bucket").try_cast("double"), F.lit(float("inf")))
    wcdf = (
        Window.partitionBy("part_id", "col")
        .orderBy(order, F.col("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = j.withColumn("cdf_obs", F.sum("p_obs").over(wcdf)).withColumn(
        "cdf_exp",
        F.sum(F.col("p_expected") / F.greatest(F.sum("p_expected").over(wn), F.lit(EPS))).over(wcdf),
    )

    p = F.greatest(F.col("p_obs"), F.lit(EPS))
    q = F.greatest(F.col("p_expected"), F.lit(EPS))
    agg = j.groupBy("part_id", "col").agg(
        F.max(F.abs(F.col("cdf_obs") - F.col("cdf_exp"))).alias("ks_d"),
        F.sum((p - q) * F.log(p / q)).alias("psi"),
        F.max("n_tot").alias("n"),
    )
    sqrt_n = F.sqrt(F.col("n").cast("double"))
    lam = (sqrt_n + F.lit(0.12) + F.lit(0.11) / sqrt_n) * F.col("ks_d")
    return agg.withColumn("ks_p", _kolmogorov_pvalue(lam))


def drift_verdicts(
    metrics: DataFrame, ks_alpha: float = 0.01, psi_max: float = 0.2
) -> DataFrame:
    """Per-(partition, column) drift verdicts in the engine verdict schema."""
    return metrics.select(
        "part_id",
        F.concat(F.lit("drift@/"), F.col("col")).alias("check_id"),
        F.lit("drift").alias("keyword"),
        F.concat(F.lit("/"), F.col("col")).alias("path"),
        ((F.col("ks_p") >= F.lit(ks_alpha)) & (F.col("psi") <= F.lit(psi_max))).alias("passed"),
        F.when(
            (F.col("ks_p") < F.lit(ks_alpha)) | (F.col("psi") > F.lit(psi_max)), F.lit(1)
        ).otherwise(F.lit(0)).cast("long").alias("n_violations"),
    )
