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
