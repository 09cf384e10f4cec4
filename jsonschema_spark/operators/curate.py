"""End-to-end corpus curation: the composition every training-data pipeline
runs before a corpus ships — language filter, quality filter, PII redaction,
deduplication, deterministic train/val/test splits — built entirely from
this package's operators so each stage keeps its individual scale shape:

- langid / quality / PII / splits: pure Column expressions on the scan
- exact dedup: one fingerprint hash-agg, canonical = min id per fingerprint
- near-dup (opt-in): MinHash-LSH candidates + exact verify (dedup.py)

The funnel report (docs surviving each stage) is the artifact a data-quality
review reads; it is deterministic, so the driver query has an exact DuckDB
oracle twin (`curate_documents`).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import pii as P
from . import sampling as S
from . import text as T


def curate(
    df: DataFrame,
    lang: str | None = "en",
    quality: bool = True,
    redact_pii: bool = True,
    near_dup_threshold: float | None = None,
    split_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated, funnel).

    ``curated``: the surviving rows of ``df`` with ``text_col`` redacted
    (when ``redact_pii``) and a ``split`` column (when ``split_weights``).
    ``funnel``: (stage_idx, stage, n_docs) — doc counts after each stage.

    Stage order is fixed (filters first so later, costlier stages see fewer
    rows; redaction before fingerprinting so dedup keys match what ships):
    input -> lang -> quality -> redact -> exact-dedup -> near-dup -> split.
    """
    stages: list[tuple[str, DataFrame]] = [("input", df)]
    cur = df

    if lang is not None:
        keep = T.language_id(cur, text_col, id_col) \
            .where(F.col("predicted_lang") == lang).select(id_col)
        cur = cur.join(keep, id_col, "left_semi")
        stages.append(("lang", cur))

    if quality:
        keep = T.quality_scores(cur, text_col, id_col) \
            .where(F.col("passes_quality")).select(id_col)
        cur = cur.join(keep, id_col, "left_semi")
        stages.append(("quality", cur))

    if redact_pii:
        cur = (P.redact(cur, text_col=text_col)
               .drop(text_col).withColumnRenamed("redacted", text_col))
        stages.append(("redact", cur))

    # exact dedup: canonical = min id per normalized-content fingerprint
    fp = T.fingerprints(cur, text_col, id_col)
    canon = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col)) \
        .select(id_col)
    cur = cur.join(canon, id_col, "left_semi")
    stages.append(("exact_dedup", cur))

    if near_dup_threshold is not None:
        pairs = D.minhash_dedup(cur, threshold=near_dup_threshold,
                                id_col=id_col, text_col=text_col)
        cur = D.keep_canonical(cur, pairs, id_col=id_col)
        stages.append(("near_dedup", cur))

    if split_weights:
        cur = S.assign_splits(cur, split_weights, key_col=id_col)
        stages.append(("split", cur))

    funnel = reduce(
        DataFrame.unionByName,
        [s.agg(F.lit(i).alias("stage_idx"), F.lit(name).alias("stage"),
               F.count(F.lit(1)).alias("n_docs"))
         for i, (name, s) in enumerate(stages)],
    )
    return cur, funnel
