"""PII / sensitive-pattern scanning and redaction for text corpora.

Training-data curation must find and strip emails, IPs, phone numbers, UUIDs
and SSN-shaped strings BEFORE the corpus ships. Everything here is pure
Column expressions — `regexp_extract_all` / `regexp_replace` run inside
whole-stage codegen on the scan projection (no UDF, no shuffle; counts
aggregate map-side). The detector regexes stay inside the Java-regex ∩ RE2
common subset (no backreferences, no lookaround), which is what makes the
operators oracle-checkable against DuckDB and keeps them portable to any
RE2-based scanner.

Detection is pattern-level (shape, not semantics): a string that LOOKS like
an SSN is flagged. That is the right default for a redaction pass — false
positives cost a few masked tokens, false negatives leak PII.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: earlier patterns are redacted first, so composite shapes (an email
# containing digits) are masked before the looser numeric detectors run
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "uuid": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
            r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9][0-9()\- ]{7,14}[0-9]\b",
}


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document match counts, one column per detector, plus n_pii_total;
    only documents with at least one finding are returned (at corpus scale
    the clean majority must not leave the scan stage)."""
    pats = patterns or PII_PATTERNS
    t = F.col(text_col)
    out = df.select(
        id_col,
        *[
            F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0))).alias(f"n_{name}")
            for name, rx in pats.items()
        ],
    )
    total = None
    for name in pats:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total).where(F.col("n_pii_total") > 0)


def pii_findings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Exploded findings (id, kind, match) — the violations-row shape, one
    output row per matched span. Built as one stacked array per row
    (struct(kind, matches) per detector) then a single explode, so the text
    column is scanned once."""
    pats = patterns or PII_PATTERNS
    t = F.col(text_col)
    stacked = F.array(
        *[
            F.struct(
                F.lit(name).alias("kind"),
                F.regexp_extract_all(t, F.lit(rx), F.lit(0)).alias("matches"),
            )
            for name, rx in pats.items()
        ]
    )
    return (
        df.select(F.col(id_col), F.explode(stacked).alias("f"))
        .select(id_col, F.col("f.kind").alias("kind"), F.explode("f.matches").alias("match"))
    )


def redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str = "redacted",
) -> DataFrame:
    """Replace every detected span with ``[KIND]``, in PII_PATTERNS order
    (composite shapes first). One chained regexp_replace projection — still
    a single codegen stage over the scan."""
    return df.withColumn(out_col, redact_col(text_col, patterns))


def redact_col(text_col="text", patterns: dict[str, str] | None = None):
    """The redaction as a bare Column expression (str name or Column), so
    composing pipelines (operators/curate.py) can fold it into their own
    scan projection instead of a separate withColumn stage."""
    pats = patterns or PII_PATTERNS
    expr = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, rx in pats.items():
        expr = F.regexp_replace(expr, rx, f"[{name.upper()}]")
    return expr
