"""P3 — referential checks against dimension tables (SURVEY.md B9–B11).

BASELINE.json:6: "broadcast/shuffle-hash referential checks against
dimension tables". A foreign-key check is a LEFT ANTI join: fact rows whose
key has no match in the dimension are the violations.

Join-strategy selection (the 100 TB lever):
- ``strategy="broadcast"`` (default for small dims, e.g. a 4-row fmt
  registry): the dim ships to every executor, the fact table never shuffles.
- ``strategy="shuffle_hash"``: for large dims (e.g. an all-licensed-ids
  registry with 10^11 keys) a broadcast is impossible and Catalyst's default
  sort-merge join would sort 10^12 fact rows; a shuffle-hash join avoids both
  sorts (hash the dim per task). AQE may still override if sizes allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    strategy: str = "broadcast",
) -> DataFrame:
    """Fact rows whose key is absent from the dim (NULL keys are not
    orphans — `required` owns null-ness, matching SQL FK semantics)."""
    d = dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates([fact_key])
    if strategy == "broadcast":
        d = F.broadcast(d)
        j = fact.join(d, on=fact_key, how="left_anti")
    elif strategy == "shuffle_hash":
        j = fact.join(d.hint("shuffle_hash"), on=fact_key, how="left_anti")
    else:  # sort-merge fallback
        j = fact.join(d.hint("merge"), on=fact_key, how="left_anti")
    return j.where(F.col(fact_key).isNotNull())


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    key_col: str,
    part_col: str = "part_id",
    strategy: str = "broadcast",
    dim_name: str = "dim",
) -> DataFrame:
    """Violation rows (part_id, row_key, keyword, path, value) for FK orphans."""
    orphans = orphan_rows(
        fact.select(part_col, key_col, fact_key), dim, fact_key, dim_key, strategy
    )
    return orphans.select(
        F.col(part_col).alias("part_id"),
        F.col(key_col).cast("string").alias("row_key"),
        F.lit("references").alias("keyword"),
        F.lit(f"/{fact_key}->{dim_name}.{dim_key}").alias("path"),
        F.col(fact_key).cast("string").alias("value"),
    )
