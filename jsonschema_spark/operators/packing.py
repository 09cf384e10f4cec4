"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "pack short docs together so a 4k-context batch wastes no
tokens" step of an LLM data pipeline).

Exact greedy bin-packing is inherently sequential — a 10^12-doc corpus
cannot thread one running bin state through every row. The scalable,
deterministic form used here packs WITHIN each partition: docs are ordered
by (id) inside their partition, a window cumulative token sum assigns
``pack_id = floor((cumsum - tokens) / budget)`` — i.e. a document starts a
new pack when the running total would cross the budget boundary. Each
window is partitioned by the table's partition column, so the sort is
partition-local (no global sort, no single-reducer window; the same
parallelism shape as every per-partition pass in this engine).

The boundary-straddling document is charged to the pack it starts in, so a
pack may overflow by at most one document — the standard streaming-packing
approximation; ``packing_stats`` reports the realized waste/overflow so the
trade-off is measured, not assumed. Deterministic and engine-portable
(DuckDB window-function oracle twin).

When ``part_col`` is omitted the packing partition defaults to
``spark_partition_id()`` — each input split packs independently, so the
window never routes the whole corpus through one reducer (a plan test pins
that the default invocation contains no SinglePartition exchange). The
default is deterministic only for a fixed input partitioning; pass
``part_col`` when packs must be reproducible across layouts (the oracle
query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    part_col: str | None = None,
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Output: (part, id_col, n_tokens, pack_id, pack_pos). ``pack_id`` is
    unique within a partition (globally: (part, pack_id)). ``token_col``
    supplies precomputed token counts; otherwise whitespace tokens of
    ``text_col`` are counted on the fly."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = (F.col(token_col) if token_col is not None
            else F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    part = (F.col(part_col) if part_col is not None
            else F.spark_partition_id().cast("long"))
    base = df.select(
        part.alias("part"),
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens").isNotNull())
    w = Window.partitionBy("part").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    out = base.withColumn("_cum", F.sum("n_tokens").over(w))
    out = out.withColumn(
        "pack_id", F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget)))
    wp = Window.partitionBy("part", "pack_id").orderBy(id_col)
    return out.withColumn("pack_pos", F.row_number().over(wp)) \
        .select("part", id_col, "n_tokens", "pack_id", "pack_pos")


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Realized packing quality: per (part, pack_id) token totals, plus the
    doc count — feed to an agg for waste (budget - tokens of full packs)
    and overflow (tokens beyond budget charged to the straddling doc)."""
    return (
        packed.groupBy("part", "pack_id")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("pack_tokens"))
        .withColumn("overflow_tokens",
                    F.greatest(F.col("pack_tokens") - budget, F.lit(0)))
    )
