"""Round-4 regression tests: VERDICT r3 items #2/#8 and every ADVICE r3
finding (packing default partitioning, stats-check-family guards,
contentSchema scalar subschemas, dependencies merging, nested unevaluated*
annotation flow, fidelity-ref join strategies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.local import is_valid, validate
from jsonschema_spark.engine import validate_rows, validate_table


# ----------------------------------------------------- packing default (V#2)

def test_pack_sequences_default_part_has_no_single_partition(spark):
    """VERDICT r3 #2: the DEFAULT invocation (no part_col) must NOT route
    the corpus through one window partition — pack per input split via
    spark_partition_id, plan-asserted no SinglePartition exchange."""
    from jsonschema_spark.operators.packing import pack_sequences

    df = spark.range(0, 2000, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"))
    packed = pack_sequences(df, budget=50)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rows = packed.collect()
    assert len(rows) == 2000
    # packs actually fill: more than one doc per pack somewhere
    assert max(r["pack_pos"] for r in rows) > 1
    # multiple independent packing partitions were used
    assert len({r["part"] for r in rows}) > 1


def test_pack_sequences_explicit_part_col_unchanged(spark):
    from jsonschema_spark.operators.packing import pack_sequences

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).alias("grp"),
        F.lit("a b c").alias("text"))
    packed = pack_sequences(df, budget=9, part_col="grp")
    rows = {(r["part"], r["doc_id"]): (r["pack_id"], r["pack_pos"])
            for r in packed.collect()}
    # 3 tokens per doc, budget 9 -> 3 docs per pack within each grp
    assert rows[(0, 0)] == (0, 1)
    assert rows[(0, 4)] == (0, 2)
    assert rows[(0, 8)] == (0, 3)
    assert rows[(0, 12)] == (1, 1)


# ------------------------------------- stats-check family guards (ADVICE #2)

def test_stats_checks_require_with_stats(spark):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    spec = {"properties": {"id": {}},
            "x-table-checks": {"distinct": [{"column": "id", "min": 1}]}}
    with pytest.raises(ValueError, match="with_stats"):
        validate_table(df, spec, key_col="id", part_col="s", with_stats=False)


def test_stats_checks_require_spec_columns(spark):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    spec = {"x-table-checks": {"null-rates": [{"column": "id", "max_rate": 0.1}]}}
    with pytest.raises(ValueError, match="no properties"):
        validate_table(df, spec, key_col="id", part_col="s")


def test_quantile_check_on_non_numeric_column_rejected(spark):
    """ADVICE r3 low: a quantile bound on a string column must be a config
    error, not a silently-failing data verdict."""
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    spec = {"properties": {"s": {}},
            "x-table-checks": {"quantiles": [{"column": "s", "q": 0.5, "min": 0}]}}
    with pytest.raises(ValueError, match="non-numeric"):
        validate_table(df, spec, key_col="id", part_col="s")


# --------------------------------------- contentSchema scalar (ADVICE #3)

def test_content_schema_scalar_subschema_compiles(spark):
    """A scalar contentSchema ({"type":"integer"}) used to crash from_json
    (BIGINT is not a container type); now it parses {"v": <text>} into a
    wrapped struct. E1 and E2 agree."""
    spec = {"properties": {"p": {
        "type": "string",
        "contentMediaType": "application/json",
        "contentSchema": {"type": "integer", "minimum": 10},
    }}}
    rows = [("a", "42"), ("b", "5"), ("c", '"x"'), ("d", "not json"), ("e", None)]
    df = spark.createDataFrame(rows, "k string, p string")
    viols = validate_rows(df, spec, keys=["k"])
    got = {(r["k"], r["keyword"]) for r in viols.collect()}
    assert ("b", "contentSchema") in got           # 5 < 10
    assert ("c", "contentSchema") in got           # string, not integer
    assert not any(k == "a" for k, _ in got)       # 42 valid
    # unparseable text is contentMediaType's violation, not contentSchema's
    assert ("d", "contentMediaType") in got
    assert not any(k == "d" and kw == "contentSchema" for k, kw in got)
    assert not any(k == "e" for k, _ in got)       # null forgiven
    # E1 agreement on the same instances
    for k, p in rows:
        doc = {"p": p} if p is not None else {}
        e1 = is_valid(doc, spec)
        e2 = not any(kk == k for kk, _ in got)
        assert e1 == e2, (k, p)


# --------------------------------------- dependencies merging (ADVICE #5)

def test_dependent_required_merges_with_dependencies():
    """draft-2019: `dependencies` and `dependentRequired` are independent
    keywords that AND together — a shared property name must not overwrite."""
    spec = {
        "dependencies": {"a": ["b"]},
        "dependentRequired": {"a": ["c"]},
    }
    assert is_valid({"a": 1, "b": 2, "c": 3}, spec)
    assert not is_valid({"a": 1, "b": 2}, spec)      # dependentRequired lost before
    assert not is_valid({"a": 1, "c": 3}, spec)      # dependencies still applies
    assert is_valid({"x": 1}, spec)                  # trigger absent


def test_dependent_schemas_merges_with_dependencies():
    spec = {
        "dependencies": {"a": ["b"]},
        "dependentSchemas": {"a": {"properties": {"c": {"type": "integer"}}}},
    }
    assert is_valid({"a": 1, "b": 2, "c": 3}, spec)
    assert not is_valid({"a": 1, "c": 3}, spec)          # names still required
    assert not is_valid({"a": 1, "b": 2, "c": "x"}, spec)  # schema still applies


# --------------------------- nested unevaluated* annotation flow (ADVICE #1)

def test_unevaluated_properties_in_applied_branch_covers_all():
    """ADVICE r3 medium: a VALIDATED allOf branch carrying its own
    unevaluatedProperties evaluates every name (draft-2019 annotation flow),
    so the outer unevaluatedProperties:false sees nothing unevaluated."""
    spec = {"allOf": [{"unevaluatedProperties": True}],
            "unevaluatedProperties": False}
    assert is_valid({"foo": 1}, spec)
    # schema-form nested unevaluatedProperties: same rule
    spec2 = {"allOf": [{"unevaluatedProperties": {"type": "integer"}}],
             "unevaluatedProperties": False}
    assert is_valid({"foo": 1}, spec2)
    # but a FAILING branch contributes nothing
    spec3 = {"anyOf": [{"required": ["nope"], "unevaluatedProperties": True},
                       {"required": ["foo"]}],
             "unevaluatedProperties": False}
    assert not is_valid({"foo": 1}, spec3)


def test_unevaluated_items_in_applied_branch_covers_all():
    spec = {"allOf": [{"unevaluatedItems": True}], "unevaluatedItems": False}
    assert is_valid([1, 2, 3], spec)
    spec2 = {"allOf": [{"maxItems": 100}], "unevaluatedItems": False}
    assert not is_valid([1], spec2)  # branch without unevaluatedItems: unchanged


def test_unevaluated_nested_branch_compiled_map_runtime(spark):
    """The compiled (E2) mirror of the nested-unevaluated* rule, exercised
    through the map-typed JSON path where coverage guards are runtime
    Columns."""
    spec = {"allOf": [{"unevaluatedProperties": True}],
            "unevaluatedProperties": False}
    df = spark.createDataFrame([("a", '{"foo": 1}')], "k string, p string")
    from jsonschema_spark.engine import validate_json_rows

    viols = validate_json_rows(df, "p", spec, keys=["k"]).collect()
    assert viols == []


# ------------------------------------------ x-table-checks lint (round 4)

def test_lint_x_table_checks():
    from jsonschema_spark.lint import lint_spec

    spec = {
        "properties": {"w": {}, "fmt": {}},
        "x-table-checks": {
            "quantiles": [
                {"column": "w", "q": 1.5, "max": 10},      # q out of range
                {"column": "nope", "q": 0.5, "min": 0},    # undeclared column
                {"column": "w", "q": 0.5},                 # no bound
                {"column": "w", "q": 0.9, "min": 10, "max": 5},  # inverted
            ],
            "distinct": [{"column": "fmt", "min": 5, "max": 2}],
            "null-rates": [{"column": "w", "max_rate": 1.5}],
            "references": [{"column": "fmt"}],             # missing dim/key
        },
    }
    findings = lint_spec(spec)
    msgs = {(sev, p) for sev, p, _ in findings}
    assert ("error", "/x-table-checks/quantiles/0") in msgs
    assert ("error", "/x-table-checks/quantiles/1") in msgs
    assert ("error", "/x-table-checks/quantiles/2") in msgs
    assert ("error", "/x-table-checks/quantiles/3") in msgs
    assert ("error", "/x-table-checks/distinct/0") in msgs
    assert ("error", "/x-table-checks/null-rates/0") in msgs
    assert ("error", "/x-table-checks/references/0") in msgs


def test_lint_flagship_spec_clean():
    """The shipped flagship spec must lint clean (no errors)."""
    from jsonschema_spark.lint import lint_spec
    from jsonschema_spark import fixtures as FX

    errors = [f for f in lint_spec(FX.SPEC_IMAGES) if f[0] == "error"]
    assert errors == []


# --------------------------------- fidelity-ref join strategies (V#8)

def test_fidelity_ref_join_strategies_agree(spark):
    """strategy='auto' (AQE), 'broadcast_sample' and 'shuffle_hash' must
    produce identical violation sets — strategy is a physical choice only.
    The ref table is a distinct DataFrame standing in for a fact-scale
    reference (AQE path)."""
    from jsonschema_spark import fixtures as FX
    from jsonschema_spark.passes.fidelity import fidelity_violations_ref

    cfg = FX.FixtureConfig(n=200, n_parts=4, with_bytes=True)
    fact = FX.generate_images_df(spark, cfg)
    # reference = clean regeneration (no plants) => planted rows mismatch
    ref = FX.generate_images_df(
        spark, FX.FixtureConfig(n=200, n_parts=4, plants=False, with_bytes=True))
    outs = {}
    for strat in ("auto", "broadcast_sample", "shuffle_hash"):
        v = fidelity_violations_ref(fact, ref, fraction=1.0, strategy=strat)
        outs[strat] = {tuple(r) for r in v.collect()}
    assert outs["auto"] == outs["broadcast_sample"] == outs["shuffle_hash"]


# ------------------------------------------- boilerplate removal (B52, r4)

def _bp_docs(spark):
    rows = [
        (1, "COOKIE\nalpha\nbeta\nCOOKIE", "a"),
        (2, "COOKIE\ngamma", "a"),
        (3, "COOKIE\ndelta\nepsilon", "a"),
        (4, "COOKIE", "b"),          # all-boilerplate doc (in group a runs)
        (5, "zeta\nCOOKIE", "b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_boilerplate_lines_threshold(spark):
    from jsonschema_spark.operators.text import boilerplate_lines

    df = _bp_docs(spark)
    bp = boilerplate_lines(df, min_doc_frac=0.9)
    assert {r["line"] for r in bp.collect()} == {"COOKIE"}  # 5/5 docs
    bp2 = boilerplate_lines(df, min_doc_frac=0.3)
    assert {r["line"] for r in bp2.collect()} == {"COOKIE"}  # next is 1/5
    with pytest.raises(ValueError):
        boilerplate_lines(df, min_doc_frac=0.0)


def test_remove_boilerplate_preserves_order_and_empty_docs(spark):
    from jsonschema_spark.operators.text import boilerplate_lines, remove_boilerplate

    df = _bp_docs(spark)
    bp = boilerplate_lines(df, min_doc_frac=0.9)
    out = {r["doc_id"]: r for r in remove_boilerplate(df, bp).collect()}
    assert len(out) == 5  # every doc survives
    assert out[1]["text_clean"] == "alpha\nbeta"  # order kept, both COOKIEs gone
    assert out[1]["n_lines_removed"] == 2 and out[1]["n_lines_kept"] == 2
    assert out[4]["text_clean"] == "" and out[4]["n_lines_kept"] == 0
    assert out[5]["text_clean"] == "zeta"


def test_remove_boilerplate_group_scoped(spark):
    from jsonschema_spark.operators.text import boilerplate_lines, remove_boilerplate

    df = _bp_docs(spark)
    # per-source: COOKIE is 3/3 in a but 2/2 in b -> both qualify at 0.9;
    # at 1.0 within-group both still qualify; make a group-divergent line:
    df2 = df.union(df.sparkSession.createDataFrame(
        [(6, "alpha\nonly-b", "b")], ["doc_id", "text", "source"]))
    bp = boilerplate_lines(df2, min_doc_frac=0.6, group_col="source")
    got = {(r["source"], r["line"]) for r in bp.collect()}
    assert ("a", "COOKIE") in got and ("b", "COOKIE") in got
    assert ("a", "alpha") not in got  # 1/3 in a
    out = {r["doc_id"]: r["text_clean"]
           for r in remove_boilerplate(df2, bp, group_col="source").collect()}
    assert out[6] == "alpha\nonly-b"  # alpha is not boilerplate in group b


def test_remove_boilerplate_strategies_agree_and_broadcast_plan(spark):
    from jsonschema_spark.operators.text import boilerplate_lines, remove_boilerplate

    df = _bp_docs(spark)
    bp = boilerplate_lines(df, min_doc_frac=0.9)
    a = remove_boilerplate(df, bp, strategy="broadcast")
    b = remove_boilerplate(df, bp, strategy="shuffle")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    plan = a._jdf.queryExecution().executedPlan().toString()
    # broadcast path: line join builds on the small boilerplate side; the
    # reassembly agg exchanges on doc_id (per-doc keys, never a global sort).
    # (The 1-row _n_total count agg legitimately carries a SinglePartition
    # exchange over two longs per partition — that is not a scale hazard.)
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(doc_id" in plan
    assert "Sort" not in plan.split("== Initial Plan ==")[0]
    with pytest.raises(ValueError):
        remove_boilerplate(df, bp, strategy="nope")


def test_remove_boilerplate_literal_metachar_separator(spark):
    """line_sep is LITERAL: a regex metachar like '|' must not be
    interpreted as alternation by the split."""
    from jsonschema_spark.operators.text import boilerplate_lines, remove_boilerplate

    df = spark.createDataFrame(
        [(1, "AD|keep one|AD"), (2, "AD|other text")], ["doc_id", "text"])
    bp = boilerplate_lines(df, min_doc_frac=0.9, line_sep="|")
    assert {r["line"] for r in bp.collect()} == {"AD"}
    out = {r["doc_id"]: r["text_clean"]
           for r in remove_boilerplate(df, bp, line_sep="|").collect()}
    assert out[1] == "keep one" and out[2] == "other text"
