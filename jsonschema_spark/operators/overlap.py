"""Sketch-level distinct-set overlap between two datasets (Apache
DataSketches theta sketches, built into Spark 4): estimate |A|, |B|,
|A∩B|, |A∪B|, Jaccard and containment WITHOUT joining the data — one scan
per side producing a single KB-sized sketch row each.

Why this matters at 10^12 rows: the exact question "how many training
image_ids also appear in the eval set / in last month's snapshot?" is a
distinct-count over a join — a full shuffle of both tables on the key. The
theta-sketch form reads each side once (map-side partial aggregation, one
tiny row to the driver-side cross join) and answers set-algebra questions
(intersection, union, difference) on the sketches. Estimates are EXACT
while a side's distinct count stays below the sketch's nominal capacity
(2^lg_k; default lg_k=16 → exact to ~65k, the oracle regime) and carry the
published ~1/sqrt(2^lg_k) relative error beyond — raise ``lg_k`` for
tighter bounds at higher cardinalities.

This is the sketch-level companion to ``operators/decontam.py`` (which
finds the CONTENT-level contaminated docs); overlap answers the cheap
"how much id-level leakage is there at all?" triage question first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def set_overlap(
    a: DataFrame,
    b: DataFrame,
    col_a: str,
    col_b: str | None = None,
    lg_k: int = 16,
) -> DataFrame:
    """One-row DataFrame: n_a, n_b, n_intersection, n_union, n_a_only,
    n_b_only, jaccard, containment_a_in_b — all from two theta sketches."""
    col_b = col_b or col_a
    sa = a.agg(F.theta_sketch_agg(F.col(col_a), F.lit(lg_k)).alias("_sa"))
    sb = b.agg(F.theta_sketch_agg(F.col(col_b), F.lit(lg_k)).alias("_sb"))
    # both sides are single sketch rows — the cross join is 1×1, metadata-scale
    j = sa.crossJoin(sb)
    inter = F.theta_sketch_estimate(F.theta_intersection("_sa", "_sb"))
    union = F.theta_sketch_estimate(F.theta_union("_sa", "_sb"))
    na = F.theta_sketch_estimate(F.col("_sa"))
    nb = F.theta_sketch_estimate(F.col("_sb"))
    return j.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        inter.alias("n_intersection"),
        union.alias("n_union"),
        F.theta_sketch_estimate(F.theta_difference("_sa", "_sb")).alias("n_a_only"),
        F.theta_sketch_estimate(F.theta_difference("_sb", "_sa")).alias("n_b_only"),
        F.round(inter / union, 6).alias("jaccard"),
        F.round(inter / na, 6).alias("containment_a_in_b"),
    )
