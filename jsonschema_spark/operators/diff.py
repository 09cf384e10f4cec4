"""Snapshot diffing: what changed between two versions of a table — the
data-versioning companion to the validation passes (validate answers "is
this snapshot healthy", diff answers "what did the new snapshot change").

Scale shape: one full outer join co-partitioned on the key columns (the
single unavoidable shuffle — both sides hash-partition by key, no broadcast
assumption since both snapshots are fact-scale) over a NARROW projection:
each side is reduced to (keys..., xxhash64 of the compared columns) at the
scan, so the join carries two longs per row instead of whole rows. Row
status is derived from null-side + hash inequality; unchanged rows can be
dropped before any sink ever sees them (`include_unchanged=False`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(keys..., status, old_hash, new_hash) with status in
    added | removed | changed [| unchanged]. ``compare_cols`` defaults to
    the non-key columns present in BOTH schemas (sorted for determinism)."""
    if compare_cols is None:
        shared = {f.name for f in old.schema.fields} & {f.name for f in new.schema.fields}
        compare_cols = sorted(shared - set(key_cols))
    if not compare_cols:
        raise ValueError("no columns to compare")

    def narrow(df: DataFrame, alias: str) -> DataFrame:
        # cast to string first so 1 (int) == 1 (bigint) across snapshot
        # schema widenings; NULLs distinguished from empty via a sentinel
        h = F.xxhash64(*[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in compare_cols
        ])
        return df.select(*key_cols, h.alias(f"{alias}_hash"))

    o = narrow(old, "old")
    n = narrow(new, "new")
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(*key_cols, status.alias("status"), "old_hash", "new_hash")
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) — the one-line regression report."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Driver-side (metadata-scale) schema comparison: added / removed /
    type-changed columns between two snapshots."""
    ot = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    nt = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out: list[dict] = []
    for c in sorted(nt.keys() - ot.keys()):
        out.append({"column": c, "change": "added", "new_type": nt[c]})
    for c in sorted(ot.keys() - nt.keys()):
        out.append({"column": c, "change": "removed", "old_type": ot[c]})
    for c in sorted(ot.keys() & nt.keys()):
        if ot[c] != nt[c]:
            out.append({"column": c, "change": "type_changed",
                        "old_type": ot[c], "new_type": nt[c]})
    return out

