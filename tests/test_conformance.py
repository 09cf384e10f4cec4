"""Replay the authored JSTS-shape corpus through the E1 evaluator
(reference-parity path, SURVEY.md §5.1). Every (file, group, case) is one
parametrized test so failures name the exact case."""

from __future__ import annotations

import json
import os

import pytest

from jsonschema_spark.local import is_valid, validate

HERE = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(HERE, "conformance")


def load_cases():
    cases = []
    for draft in sorted(os.listdir(CORPUS)):
        ddir = os.path.join(CORPUS, draft)
        for fname in sorted(os.listdir(ddir)):
            with open(os.path.join(ddir, fname)) as f:
                groups = json.load(f)
            for g in groups:
                for t in g["tests"]:
                    cid = f"{draft}/{fname}::{g['description']}::{t['description']}"
                    cases.append(pytest.param(g["schema"], t["data"], t["valid"], id=cid))
    return cases


CASES = load_cases()


def test_corpus_is_nonempty():
    assert len(CASES) >= 120


@pytest.mark.parametrize("schema,data,valid", CASES)
def test_conformance(schema, data, valid):
    assert is_valid(data, schema) == valid


def test_violation_paths_point_into_instance():
    schema = {
        "properties": {
            "a": {"items": {"type": "integer"}},
            "b": {"properties": {"c": {"minimum": 5}}},
        },
        "required": ["missing"],
    }
    doc = {"a": [1, "x", 3], "b": {"c": 2}}
    viols = validate(doc, schema)
    got = {(v.keyword, v.path) for v in viols}
    assert ("type", "/a/1") in got
    assert ("minimum", "/b/c") in got
    assert ("required", "/missing") in got
    assert len(viols) == 3


def test_recursive_ref_unrolls_permissively():
    """Round 2 (A22): a degenerate self-ref loop no longer errors — cyclic
    refs unroll RECURSIVE_UNROLL times then truncate to the permissive
    empty schema (a pure loop imposes no constraint at all). Non-cyclic
    over-deep nesting keeps the hard depth error."""
    from jsonschema_spark.spec import SpecError, parse

    schema = {"definitions": {"loop": {"$ref": "#/definitions/loop"}},
              "$ref": "#/definitions/loop"}
    assert validate(1, schema) == []

    deep = {"type": "object"}
    cur = deep
    for _ in range(200):  # 200 non-ref nesting levels > MAX_REF_DEPTH
        cur["properties"] = {"x": {"type": "object"}}
        cur = cur["properties"]["x"]
    with pytest.raises(SpecError):
        parse(deep)
