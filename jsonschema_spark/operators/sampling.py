"""Deterministic content-hash sampling and dataset splits.

``DataFrame.sample`` draws per-partition pseudo-random numbers, so its output
changes under repartition/AQE re-planning and across reruns — at 10^12 rows a
curation pipeline needs the SAME row to stay in (or out of) the sample across
incremental reruns, backfills, and cluster-size changes. Content-hash
sampling gives that: keep a row iff the first 12 hex digits of
md5(key || salt) fall below a threshold encoding the fraction. Pure Column
expressions (codegen, pushdown-friendly — the filter sits directly on the
scan), no shuffle, no UDF, engine-portable (DuckDB computes the identical
predicate, which is what makes these operators oracle-checkable).

48 bits of hash → fraction granularity 2^-48; md5's avalanche makes the kept
set an unbiased uniform sample regardless of key distribution or ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12  # 48 bits of md5 — granularity 2^-48, exact string compare


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(round(fraction * (16 ** _HEX_DIGITS)))
    if v >= 16 ** _HEX_DIGITS:
        # 'g' sorts after every hex digit — keep-all without a 13-char
        # threshold (which would compare lexicographically wrong)
        return "g"
    return format(v, f"0{_HEX_DIGITS}x")


def _hash_slot(key: Column, salt: str) -> Column:
    """Lowercase hex prefix of md5(key || salt) — lexicographic comparison on
    hex is order-isomorphic to the numeric value, so no int conversion is
    needed (and none of the engines' hex-parse quirks leak in)."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _HEX_DIGITS)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per row by
    md5(key||salt) — stable across reruns, repartitioning, and engines.
    Change ``salt`` to draw an independent sample."""
    return df.where(_hash_slot(F.col(key_col), salt) < F.lit(_threshold_hex(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``sampleBy``: per-stratum keep fractions (e.g. rebalance
    a language-skewed corpus). Compiles to one CASE expression over the
    stratum column — still a single scan-side filter, no join, no shuffle."""
    expr = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold_hex(frac))
        ).otherwise(expr)
    return df.where(_hash_slot(F.col(key_col), salt) < expr)


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the split whose
    cumulative-weight interval contains its hash slot. Disjoint and exhaustive
    by construction; a row's split never changes when the corpus grows —
    the property that prevents eval-set contamination across dataset
    versions. ``weights`` need not sum to 1 (they are normalized)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    slot = _hash_slot(F.col(key_col), salt)
    expr = None
    cum = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = slot < F.lit(_threshold_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)
