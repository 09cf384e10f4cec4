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

    Scale shape (round 5 — the r4 composition re-scanned the fact table
    once per stage and shuffled it twice for predicates that are pure
    Column expressions):
    - lang/quality gate with scan-side filters (``language_id_cols`` /
      ``quality_score_cols``) — no score frame, no semi-join, no shuffle;
    - the funnel's input/lang/quality/redact/exact-dedup/split counts come
      from ONE conditional aggregation over a single scan (stage
      predicates as ``sum(cond)``, the dedup count as
      ``count_distinct(when(keep, fingerprint))``) instead of one
      re-executed count per staged frame;
    - only the opt-in near-dup stage still counts from the composed frame
      (its survivor set needs the LSH join); callers enabling it at scale
      should persist ``curated`` before materializing both outputs.
    """
    lang_ok = F.lit(True)
    if lang is not None:
        lang_ok = T.language_id_cols(text_col)[0] == F.lit(lang)
    keep_ok = lang_ok
    if quality:
        keep_ok = lang_ok & T.quality_score_cols(text_col)[-1]
    red_expr = P.redact_col(text_col) if redact_pii else F.col(text_col)
    # fingerprint of the text as it SHIPS (post-redaction); null-fp docs
    # collapse to one canonical like the groupBy form, hence the sentinel
    fp_expr = F.coalesce(T.fingerprint_cols(red_expr)[0], F.lit("\x00null"))

    # --- curated rows: filters and redaction fold into the scan ---------
    cur = df
    if lang is not None:
        cur = cur.where(lang_ok)
    if quality:
        cur = cur.where(T.quality_score_cols(text_col)[-1])
    if redact_pii:
        cur = cur.withColumn(text_col, P.redact_col(text_col))
    # exact dedup: canonical = min id per normalized-content fingerprint
    fp = T.fingerprints(cur, text_col, id_col)
    canon = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col)) \
        .select(id_col)
    cur = cur.join(canon, id_col, "left_semi")
    if near_dup_threshold is not None:
        pairs = D.minhash_dedup(cur, threshold=near_dup_threshold,
                                id_col=id_col, text_col=text_col)
        cur = D.keep_canonical(cur, pairs, id_col=id_col)
        near_base = cur  # funnel counts this frame (pre-split)
    if split_weights:
        cur = S.assign_splits(cur, split_weights, key_col=id_col)

    # --- funnel: one conditional-aggregation pass over the scan ---------
    aggs = [F.count(F.lit(1)).alias("input")]
    if lang is not None:
        aggs.append(F.sum(lang_ok.cast("long")).alias("lang"))
    if quality:
        aggs.append(F.sum(keep_ok.cast("long")).alias("quality"))
    aggs.append(F.count_distinct(F.when(keep_ok, fp_expr)).alias("exact_dedup"))
    wide = df.agg(*aggs)

    names = ["input"]
    if lang is not None:
        names.append("lang")
    if quality:
        names.append("quality")
    if redact_pii:
        names.append("redact")      # redaction drops nothing
    names.append("exact_dedup")
    if near_dup_threshold is None and split_weights:
        names.append("split")       # split assignment drops nothing
    prev = "input"
    entries = []
    for i, nm in enumerate(names):
        src = nm if nm in ("input", "lang", "quality", "exact_dedup") else prev
        entries.append(F.struct(
            F.lit(i).alias("stage_idx"), F.lit(nm).alias("stage"),
            F.col(src).cast("long").alias("n_docs")))
        prev = src
    funnel = wide.select(F.explode(F.array(*entries)).alias("s")).select("s.*")

    if near_dup_threshold is not None:
        i = len(names)
        tail = [near_base.agg(F.lit(i).alias("stage_idx"),
                              F.lit("near_dedup").alias("stage"),
                              F.count(F.lit(1)).alias("n_docs"))]
        if split_weights:
            tail.append(near_base.agg(F.lit(i + 1).alias("stage_idx"),
                                      F.lit("split").alias("stage"),
                                      F.count(F.lit(1)).alias("n_docs")))
        funnel = reduce(DataFrame.unionByName, [funnel, *tail])
    return cur, funnel


def curate_images(
    fact: DataFrame,
    spec: dict | object,
    dims: dict[str, DataFrame] | None = None,
    max_hamming: int | None = 3,
    split_weights: dict[str, float] | None = None,
    key_col: str = "image_id",
    part_col: str = "part_id",
    phash_col: str = "phash",
) -> tuple[DataFrame, DataFrame]:
    """Image-table curation, validation-gated: the loop between the engine's
    two halves — Part-A validation decides WHICH rows are healthy, Part-B
    curation decides WHICH healthy rows ship.

    Stages: input -> valid (drop every row a row-addressable violation
    names: row checks, uniqueness examples, referential orphans — partition-
    level drift/anomaly verdicts gate deploys, not rows) -> phash near-dup
    dedup (pigeonhole Hamming pairs, keep-lowest-key canonical) ->
    deterministic splits. Returns (curated, funnel) like ``curate``.

    Scale shape: the violation keys are a narrow (pass, key) projection of
    the violations stream — the anti-join is key-only; phash dedup is the
    B48 pigeonhole equi-join; splits are scan-side hash intervals.
    """
    from ..engine import validate_table

    stages: list[tuple[str, DataFrame]] = [("input", fact)]
    res = validate_table(fact, spec, dims=dims, key_col=key_col,
                         part_col=part_col)
    bad_keys = (res.violations.where(F.col("row_key").isNotNull())
                .select(F.col("row_key")).distinct())
    cur = fact.join(
        bad_keys.withColumnRenamed("row_key", "__bk"),
        fact[key_col].cast("string") == F.col("__bk"), "left_anti")
    stages.append(("valid", cur))

    if max_hamming is not None:
        sig = cur.select(F.col(key_col).alias("id"),
                         F.col(phash_col).alias("simhash"))
        pairs = D.hamming_near_duplicates(sig, max_hamming=max_hamming)
        cur = D.keep_canonical(cur, pairs, id_col=key_col)
        stages.append(("phash_dedup", cur))

    if split_weights:
        cur = S.assign_splits(cur, split_weights, key_col=key_col)
        stages.append(("split", cur))

    funnel = reduce(
        DataFrame.unionByName,
        [s.agg(F.lit(i).alias("stage_idx"), F.lit(name).alias("stage"),
               F.count(F.lit(1)).alias("n_docs"))
         for i, (name, s) in enumerate(stages)],
    )
    return cur, funnel
