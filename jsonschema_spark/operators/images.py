"""Image-table curation operators beyond validation (SURVEY §2 Part B, r4).

Aspect-ratio bucketing is the standard preprocessing step for image training
pipelines (SDXL-style multi-aspect training): every image is assigned the
bucket resolution whose aspect ratio is nearest in log space, so batches can
be formed per bucket without destructive cropping. At 10^12 images this must
be a pure scan-side projection — the bucket list is a tiny literal array and
the arg-min runs inside whole-stage codegen; the per-bucket census is one
hash aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# Default multi-aspect training buckets (w, h) — the SDXL-style 1024^2-area
# ladder from 1:4 to 4:1. Any custom list of (w, h) pairs may be passed.
DEFAULT_BUCKETS: tuple[tuple[int, int], ...] = (
    (512, 2048), (576, 1728), (640, 1536), (704, 1408), (768, 1344),
    (832, 1216), (896, 1152), (960, 1088), (1024, 1024), (1088, 960),
    (1152, 896), (1216, 832), (1344, 768), (1408, 704), (1536, 640),
    (1728, 576), (2048, 512),
)


def _bucket_expr(buckets: tuple[tuple[int, int], ...],
                 w_col: str, h_col: str) -> Column:
    """Arg-min over the literal bucket list by |log(ar) - log(bucket_ar)|,
    ties broken by bucket width (deterministic): an array of (dist, bw, bh)
    structs sorted lexicographically — struct ordering puts the nearest
    bucket first. Pure Column expression, codegen-friendly."""
    ar = F.log(F.col(w_col).cast("double") / F.col(h_col).cast("double"))
    entries = [
        F.struct(
            F.abs(ar - F.lit(math.log(bw / bh))).alias("dist"),
            F.lit(bw).alias("bucket_w"),
            F.lit(bh).alias("bucket_h"),
        )
        for bw, bh in buckets
    ]
    return F.array_sort(F.array(*entries))[0]


def assign_aspect_buckets(
    df: DataFrame,
    buckets: tuple[tuple[int, int], ...] = DEFAULT_BUCKETS,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Append ``bucket_w``/``bucket_h`` (the assigned training resolution)
    and ``bucket_dist`` (log-aspect distance) to every row. Rows with
    non-positive or NULL dims get NULL buckets — they belong to the
    validation passes (w>0 is a rows-pass minimum bound), not silently to
    the square bucket.

    Scale shape: scan-side projection over (w, h); zero exchanges."""
    if not buckets:
        raise ValueError("need at least one (w, h) bucket")
    ok = (F.col(w_col).isNotNull() & F.col(h_col).isNotNull()
          & (F.col(w_col) > 0) & (F.col(h_col) > 0))
    best = _bucket_expr(buckets, w_col, h_col)
    return df.select(
        "*",
        F.when(ok, best["bucket_w"]).alias("bucket_w"),
        F.when(ok, best["bucket_h"]).alias("bucket_h"),
        F.when(ok, F.round(best["dist"], 6)).alias("bucket_dist"),
    )


def aspect_bucket_census(
    df: DataFrame,
    buckets: tuple[tuple[int, int], ...] = DEFAULT_BUCKETS,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Per-bucket census for batch planning: image count, mean source area,
    and the mean log-aspect distance (a high mean distance means the bucket
    ladder fits the corpus poorly). One hash aggregation over the projection
    — the output is bucket-list-cardinality rows (tiny)."""
    assigned = assign_aspect_buckets(df, buckets, w_col, h_col)
    return (
        assigned.where(F.col("bucket_w").isNotNull())
        .groupBy("bucket_w", "bucket_h")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.avg(F.col(w_col).cast("double") * F.col(h_col)), 2)
            .alias("avg_src_area"),
            F.round(F.avg("bucket_dist"), 6).alias("avg_dist"),
        )
        .orderBy("bucket_w")
    )


def bucket_for_py(w: int, h: int,
                  buckets: tuple[tuple[int, int], ...] = DEFAULT_BUCKETS,
                  ) -> tuple[int, int] | None:
    """Pure-Python reference twin of :func:`_bucket_expr` for one (w, h):
    arg-min of |log(w/h) − log(bw/bh)|, ties broken by bucket width (the
    struct sort order). Backs the driver-gate oracle census replay and is
    independent of the Spark Column path. Returns None for non-positive or
    missing dims (the rows pass owns those)."""
    if not w or not h or w <= 0 or h <= 0:
        return None
    ar = math.log(w / h)
    return min(buckets, key=lambda b: (abs(ar - math.log(b[0] / b[1])), b[0]))
