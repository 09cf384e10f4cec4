"""Author the JSTS-shape conformance corpus (SURVEY.md §5.1).

The public JSON-Schema-Test-Suite is unreachable offline, so the corpus is
authored here in exactly its shape — ``tests/conformance/draft4/*.json`` and
``draft3/*.json``, each file an array of
``{description, schema, tests: [{description, data, valid}]}`` groups —
and checked in. Re-running this script regenerates the JSON files.
"""

from __future__ import annotations

import json
import os

D4 = {
    "type.json": [
        {
            "description": "integer type matches integers",
            "schema": {"type": "integer"},
            "tests": [
                {"description": "an integer is an integer", "data": 1, "valid": True},
                {"description": "1.0 is an integer (pinned SURVEY §5.1)", "data": 1.0, "valid": True},
                {"description": "1.5 is not an integer", "data": 1.5, "valid": False},
                {"description": "a string is not an integer", "data": "1", "valid": False},
                {"description": "true is not an integer", "data": True, "valid": False},
                {"description": "null is not an integer", "data": None, "valid": False},
            ],
        },
        {
            "description": "number type matches numbers",
            "schema": {"type": "number"},
            "tests": [
                {"description": "an integer is a number", "data": 1, "valid": True},
                {"description": "a float is a number", "data": 1.1, "valid": True},
                {"description": "a string is not a number", "data": "1.1", "valid": False},
                {"description": "a bool is not a number", "data": False, "valid": False},
            ],
        },
        {
            "description": "string type matches strings",
            "schema": {"type": "string"},
            "tests": [
                {"description": "a string is a string", "data": "foo", "valid": True},
                {"description": "empty string is a string", "data": "", "valid": True},
                {"description": "a number is not a string", "data": 1, "valid": False},
                {"description": "an array is not a string", "data": ["foo"], "valid": False},
            ],
        },
        {
            "description": "object/array/boolean/null types",
            "schema": {"type": "object"},
            "tests": [
                {"description": "object is object", "data": {"a": 1}, "valid": True},
                {"description": "array is not object", "data": [1], "valid": False},
            ],
        },
        {
            "description": "array type",
            "schema": {"type": "array"},
            "tests": [
                {"description": "array is array", "data": [1, 2], "valid": True},
                {"description": "object is not array", "data": {"a": 1}, "valid": False},
            ],
        },
        {
            "description": "null type",
            "schema": {"type": "null"},
            "tests": [
                {"description": "null is null", "data": None, "valid": True},
                {"description": "zero is not null", "data": 0, "valid": False},
                {"description": "false is not null", "data": False, "valid": False},
            ],
        },
        {
            "description": "boolean type",
            "schema": {"type": "boolean"},
            "tests": [
                {"description": "true is boolean", "data": True, "valid": True},
                {"description": "1 is not boolean", "data": 1, "valid": False},
            ],
        },
        {
            "description": "union type list (draft-4 array of names)",
            "schema": {"type": ["string", "null"]},
            "tests": [
                {"description": "string ok", "data": "x", "valid": True},
                {"description": "null ok", "data": None, "valid": True},
                {"description": "number not ok", "data": 3, "valid": False},
            ],
        },
    ],
    "enum.json": [
        {
            "description": "simple enum",
            "schema": {"enum": [1, 2, 3]},
            "tests": [
                {"description": "member", "data": 1, "valid": True},
                {"description": "1.0 equals 1 (JSON numeric equality)", "data": 1.0, "valid": True},
                {"description": "non-member", "data": 4, "valid": False},
                {"description": "true is not 1", "data": True, "valid": False},
                {"description": "string '1' is not 1", "data": "1", "valid": False},
            ],
        },
        {
            "description": "heterogeneous enum with deep equality",
            "schema": {"enum": [[1, 2], {"a": "b"}, "x", None]},
            "tests": [
                {"description": "array member deep-equal", "data": [1, 2], "valid": True},
                {"description": "object member deep-equal", "data": {"a": "b"}, "valid": True},
                {"description": "null member", "data": None, "valid": True},
                {"description": "reordered array differs", "data": [2, 1], "valid": False},
                {"description": "extra key differs", "data": {"a": "b", "c": 1}, "valid": False},
            ],
        },
    ],
    "const.json": [
        {
            "description": "const validation (draft-6 convenience)",
            "schema": {"const": 2},
            "tests": [
                {"description": "same value", "data": 2, "valid": True},
                {"description": "2.0 equals 2", "data": 2.0, "valid": True},
                {"description": "other value", "data": 3, "valid": False},
                {"description": "true is not 1-ish const", "data": True, "valid": False},
            ],
        },
        {
            "description": "const null",
            "schema": {"const": None},
            "tests": [
                {"description": "null ok", "data": None, "valid": True},
                {"description": "zero not ok", "data": 0, "valid": False},
            ],
        },
    ],
    "minimum.json": [
        {
            "description": "minimum inclusive",
            "schema": {"minimum": 1.1},
            "tests": [
                {"description": "above", "data": 2.6, "valid": True},
                {"description": "boundary is valid", "data": 1.1, "valid": True},
                {"description": "below", "data": 0.6, "valid": False},
                {"description": "ignores non-numbers", "data": "x", "valid": True},
                {"description": "ignores null", "data": None, "valid": True},
            ],
        },
        {
            "description": "exclusiveMinimum boolean modifier (draft-4)",
            "schema": {"minimum": 1.1, "exclusiveMinimum": True},
            "tests": [
                {"description": "above", "data": 1.2, "valid": True},
                {"description": "boundary is invalid", "data": 1.1, "valid": False},
                {"description": "below", "data": 0.6, "valid": False},
            ],
        },
    ],
    "maximum.json": [
        {
            "description": "maximum inclusive",
            "schema": {"maximum": 3.0},
            "tests": [
                {"description": "below", "data": 2.6, "valid": True},
                {"description": "boundary is valid", "data": 3.0, "valid": True},
                {"description": "above", "data": 3.5, "valid": False},
                {"description": "ignores non-numbers", "data": "x", "valid": True},
            ],
        },
        {
            "description": "exclusiveMaximum boolean modifier (draft-4)",
            "schema": {"maximum": 3.0, "exclusiveMaximum": True},
            "tests": [
                {"description": "below", "data": 2.2, "valid": True},
                {"description": "boundary is invalid", "data": 3.0, "valid": False},
                {"description": "integer boundary invalid too", "data": 3, "valid": False},
            ],
        },
    ],
    "multipleOf.json": [
        {
            "description": "multipleOf int",
            "schema": {"multipleOf": 2},
            "tests": [
                {"description": "multiple", "data": 10, "valid": True},
                {"description": "zero is a multiple", "data": 0, "valid": True},
                {"description": "not a multiple", "data": 7, "valid": False},
                {"description": "ignores strings", "data": "7", "valid": True},
            ],
        },
        {
            "description": "multipleOf fractional",
            "schema": {"multipleOf": 0.5},
            "tests": [
                {"description": "4.5 is multiple of 0.5", "data": 4.5, "valid": True},
                {"description": "4.55 is not", "data": 4.55, "valid": False},
            ],
        },
    ],
    "maxLength.json": [
        {
            "description": "maxLength",
            "schema": {"maxLength": 2},
            "tests": [
                {"description": "shorter", "data": "f", "valid": True},
                {"description": "exact", "data": "fo", "valid": True},
                {"description": "longer", "data": "foo", "valid": False},
                {"description": "ignores non-strings", "data": 100, "valid": True},
                {"description": "counts code points not bytes", "data": "éé", "valid": True},
            ],
        }
    ],
    "minLength.json": [
        {
            "description": "minLength",
            "schema": {"minLength": 2},
            "tests": [
                {"description": "longer", "data": "foo", "valid": True},
                {"description": "exact", "data": "fo", "valid": True},
                {"description": "shorter", "data": "f", "valid": False},
                {"description": "empty fails", "data": "", "valid": False},
                {"description": "ignores non-strings", "data": 1, "valid": True},
                {"description": "one supplementary code point is length 1", "data": "\U0001f600", "valid": False},
            ],
        }
    ],
    "pattern.json": [
        {
            "description": "pattern is a partial match (search, not fullmatch)",
            "schema": {"pattern": "a+"},
            "tests": [
                {"description": "match at start", "data": "aaa", "valid": True},
                {"description": "match inside", "data": "xaay", "valid": True},
                {"description": "no match", "data": "xyz", "valid": False},
                {"description": "ignores non-strings", "data": True, "valid": True},
            ],
        },
        {
            "description": "anchored pattern",
            "schema": {"pattern": "^img-[0-9]{12}$"},
            "tests": [
                {"description": "well-formed id", "data": "img-000000000042", "valid": True},
                {"description": "too short", "data": "img-42", "valid": False},
                {"description": "wrong prefix", "data": "IMG-000000000042", "valid": False},
            ],
        },
    ],
    "items.json": [
        {
            "description": "items single schema",
            "schema": {"items": {"type": "integer"}},
            "tests": [
                {"description": "all valid", "data": [1, 2, 3], "valid": True},
                {"description": "one invalid", "data": [1, "x", 3], "valid": False},
                {"description": "empty array valid", "data": [], "valid": True},
                {"description": "ignores non-arrays", "data": {"a": 1}, "valid": True},
            ],
        },
        {
            "description": "tuple items with additionalItems schema",
            "schema": {"items": [{"type": "integer"}, {"type": "string"}],
                       "additionalItems": {"type": "boolean"}},
            "tests": [
                {"description": "matching tuple", "data": [1, "a"], "valid": True},
                {"description": "extra matching additional", "data": [1, "a", True], "valid": True},
                {"description": "extra violating additional", "data": [1, "a", 3], "valid": False},
                {"description": "wrong positional type", "data": ["a", 1], "valid": False},
                {"description": "shorter tuple valid", "data": [1], "valid": True},
            ],
        },
        {
            "description": "additionalItems false forbids extras",
            "schema": {"items": [{}], "additionalItems": False},
            "tests": [
                {"description": "no extras", "data": [1], "valid": True},
                {"description": "extras forbidden", "data": [1, 2], "valid": False},
            ],
        },
    ],
    "maxItems.json": [
        {
            "description": "maxItems",
            "schema": {"maxItems": 2},
            "tests": [
                {"description": "shorter", "data": [1], "valid": True},
                {"description": "exact", "data": [1, 2], "valid": True},
                {"description": "longer", "data": [1, 2, 3], "valid": False},
                {"description": "ignores non-arrays", "data": "foobar", "valid": True},
            ],
        }
    ],
    "minItems.json": [
        {
            "description": "minItems",
            "schema": {"minItems": 1},
            "tests": [
                {"description": "longer", "data": [1, 2], "valid": True},
                {"description": "exact", "data": [1], "valid": True},
                {"description": "empty fails", "data": [], "valid": False},
                {"description": "ignores non-arrays", "data": "", "valid": True},
            ],
        }
    ],
    "uniqueItems.json": [
        {
            "description": "uniqueItems true",
            "schema": {"uniqueItems": True},
            "tests": [
                {"description": "unique", "data": [1, 2], "valid": True},
                {"description": "duplicate", "data": [1, 1], "valid": False},
                {"description": "1 and 1.0 are equal", "data": [1, 1.0], "valid": False},
                {"description": "1 and true differ", "data": [1, True], "valid": True},
                {"description": "deep object duplicates", "data": [{"a": [1]}, {"a": [1]}], "valid": False},
                {"description": "deep object distinct", "data": [{"a": [1]}, {"a": [2]}], "valid": True},
                {"description": "empty array unique", "data": [], "valid": True},
            ],
        }
    ],
    "contains.json": [
        {
            "description": "contains (draft-6 convenience)",
            "schema": {"contains": {"minimum": 5}},
            "tests": [
                {"description": "one element matches", "data": [1, 9], "valid": True},
                {"description": "none match", "data": [1, 2], "valid": False},
                {"description": "empty array has none", "data": [], "valid": False},
            ],
        }
    ],
    "required.json": [
        {
            "description": "required (draft-4 array form)",
            "schema": {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]},
            "tests": [
                {"description": "present", "data": {"foo": 1}, "valid": True},
                {"description": "absent", "data": {"bar": 1}, "valid": False},
                {"description": "ignores non-objects", "data": 12, "valid": True},
                {"description": "present with null value counts as present", "data": {"foo": None}, "valid": True},
            ],
        },
        {
            "description": "empty required array",
            "schema": {"required": []},
            "tests": [
                {"description": "anything passes", "data": {}, "valid": True},
            ],
        },
    ],
    "properties.json": [
        {
            "description": "nested property schemas",
            "schema": {"properties": {
                "n": {"type": "integer", "minimum": 0},
                "s": {"type": "string", "maxLength": 3},
            }},
            "tests": [
                {"description": "both valid", "data": {"n": 1, "s": "ab"}, "valid": True},
                {"description": "missing props allowed without required", "data": {}, "valid": True},
                {"description": "bad number", "data": {"n": -1, "s": "ab"}, "valid": False},
                {"description": "bad string", "data": {"n": 1, "s": "abcd"}, "valid": False},
                {"description": "extra props allowed by default", "data": {"n": 1, "z": 9}, "valid": True},
            ],
        },
        {
            "description": "doubly nested objects",
            "schema": {"properties": {"a": {"properties": {"b": {"type": "integer"}}}}},
            "tests": [
                {"description": "deep valid", "data": {"a": {"b": 1}}, "valid": True},
                {"description": "deep invalid", "data": {"a": {"b": "x"}}, "valid": False},
            ],
        },
    ],
    "patternProperties.json": [
        {
            "description": "patternProperties",
            "schema": {"patternProperties": {"^x_": {"type": "integer"}}},
            "tests": [
                {"description": "matching key valid value", "data": {"x_a": 1}, "valid": True},
                {"description": "matching key bad value", "data": {"x_a": "s"}, "valid": False},
                {"description": "non-matching key ignored", "data": {"y_a": "s"}, "valid": True},
            ],
        }
    ],
    "additionalProperties.json": [
        {
            "description": "additionalProperties false",
            "schema": {"properties": {"foo": {}}, "additionalProperties": False},
            "tests": [
                {"description": "known only", "data": {"foo": 1}, "valid": True},
                {"description": "unknown forbidden", "data": {"foo": 1, "bar": 2}, "valid": False},
                {"description": "empty ok", "data": {}, "valid": True},
            ],
        },
        {
            "description": "additionalProperties schema",
            "schema": {"properties": {"foo": {}}, "additionalProperties": {"type": "boolean"}},
            "tests": [
                {"description": "extra boolean ok", "data": {"foo": 1, "bar": True}, "valid": True},
                {"description": "extra non-boolean bad", "data": {"foo": 1, "bar": 2}, "valid": False},
            ],
        },
        {
            "description": "patternProperties exempt from additionalProperties",
            "schema": {"patternProperties": {"^v": {}}, "additionalProperties": False},
            "tests": [
                {"description": "pattern-matched key allowed", "data": {"vroom": 1}, "valid": True},
                {"description": "other key forbidden", "data": {"broom": 1}, "valid": False},
            ],
        },
    ],
    "maxProperties.json": [
        {
            "description": "maxProperties",
            "schema": {"maxProperties": 2},
            "tests": [
                {"description": "fewer", "data": {"a": 1}, "valid": True},
                {"description": "exact", "data": {"a": 1, "b": 2}, "valid": True},
                {"description": "more", "data": {"a": 1, "b": 2, "c": 3}, "valid": False},
                {"description": "ignores arrays", "data": [1, 2, 3], "valid": True},
            ],
        }
    ],
    "minProperties.json": [
        {
            "description": "minProperties",
            "schema": {"minProperties": 1},
            "tests": [
                {"description": "enough", "data": {"a": 1}, "valid": True},
                {"description": "empty fails", "data": {}, "valid": False},
                {"description": "ignores strings", "data": "", "valid": True},
            ],
        }
    ],
    "dependencies.json": [
        {
            "description": "property dependency",
            "schema": {"dependencies": {"bar": ["foo"]}},
            "tests": [
                {"description": "neither present", "data": {}, "valid": True},
                {"description": "both present", "data": {"foo": 1, "bar": 2}, "valid": True},
                {"description": "dependent without dependency", "data": {"bar": 2}, "valid": False},
            ],
        },
        {
            "description": "schema dependency",
            "schema": {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"}},
                                                "required": ["foo"]}}},
            "tests": [
                {"description": "satisfied", "data": {"foo": 1, "bar": 2}, "valid": True},
                {"description": "unsatisfied", "data": {"foo": "x", "bar": 2}, "valid": False},
                {"description": "no trigger", "data": {"foo": "x"}, "valid": True},
            ],
        },
    ],
    "allOf.json": [
        {
            "description": "allOf",
            "schema": {"allOf": [{"minimum": 2}, {"maximum": 5}]},
            "tests": [
                {"description": "both pass", "data": 3, "valid": True},
                {"description": "first fails", "data": 1, "valid": False},
                {"description": "second fails", "data": 6, "valid": False},
            ],
        },
        {
            "description": "allOf with base keywords",
            "schema": {"type": "integer", "allOf": [{"minimum": 0}]},
            "tests": [
                {"description": "both levels pass", "data": 1, "valid": True},
                {"description": "base fails", "data": "x", "valid": False},
                {"description": "branch fails", "data": -1, "valid": False},
            ],
        },
    ],
    "anyOf.json": [
        {
            "description": "anyOf",
            "schema": {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
            "tests": [
                {"description": "first matches", "data": 1, "valid": True},
                {"description": "second matches", "data": 2.5, "valid": True},
                {"description": "both match", "data": 3, "valid": True},
                {"description": "neither matches", "data": 1.5, "valid": False},
            ],
        }
    ],
    "oneOf.json": [
        {
            "description": "oneOf — exactly one",
            "schema": {"oneOf": [{"minimum": 40}, {"maximum": 10}]},
            "tests": [
                {"description": "first only", "data": 50, "valid": True},
                {"description": "second only", "data": 5, "valid": True},
                {"description": "zero matches invalid", "data": 25, "valid": False},
            ],
        },
        {
            "description": "oneOf with two matches",
            "schema": {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
            "tests": [
                {"description": "both match → invalid", "data": 3, "valid": False},
                {"description": "one match → valid", "data": 1, "valid": True},
            ],
        },
    ],
    "not.json": [
        {
            "description": "not",
            "schema": {"not": {"type": "integer"}},
            "tests": [
                {"description": "allowed", "data": "foo", "valid": True},
                {"description": "disallowed", "data": 1, "valid": False},
            ],
        },
        {
            "description": "not on subschema",
            "schema": {"not": {"minimum": 1800}},
            "tests": [
                {"description": "below bound valid", "data": 100, "valid": True},
                {"description": "at bound invalid", "data": 1800, "valid": False},
            ],
        },
    ],
    "ref.json": [
        {
            "description": "$ref to definitions",
            "schema": {"definitions": {"pos": {"type": "integer", "minimum": 0}},
                       "properties": {"n": {"$ref": "#/definitions/pos"}}},
            "tests": [
                {"description": "resolved and valid", "data": {"n": 3}, "valid": True},
                {"description": "resolved and invalid", "data": {"n": -3}, "valid": False},
            ],
        },
        {
            "description": "nested $ref chain",
            "schema": {"definitions": {"a": {"$ref": "#/definitions/b"},
                                       "b": {"type": "string"}},
                       "properties": {"s": {"$ref": "#/definitions/a"}}},
            "tests": [
                {"description": "chain resolves", "data": {"s": "x"}, "valid": True},
                {"description": "chain detects violation", "data": {"s": 1}, "valid": False},
            ],
        },
        {
            "description": "escaped pointer tokens ~0 ~1",
            "schema": {"definitions": {"a/b": {"type": "integer"}},
                       "properties": {"v": {"$ref": "#/definitions/a~1b"}}},
            "tests": [
                {"description": "escaped ref works", "data": {"v": 1}, "valid": True},
                {"description": "escaped ref catches", "data": {"v": "x"}, "valid": False},
            ],
        },
    ],
    "format.json": [
        {
            "description": "format date-time",
            "schema": {"format": "date-time"},
            "tests": [
                {"description": "valid rfc3339", "data": "1963-06-19T08:30:06Z", "valid": True},
                {"description": "valid with offset", "data": "1963-06-19T08:30:06.283+01:00", "valid": True},
                {"description": "missing time", "data": "1963-06-19", "valid": False},
                {"description": "ignores non-strings", "data": 12, "valid": True},
            ],
        },
        {
            "description": "format email",
            "schema": {"format": "email"},
            "tests": [
                {"description": "valid", "data": "joe.bloggs@example.com", "valid": True},
                {"description": "no at-sign", "data": "not-an-email", "valid": False},
            ],
        },
        {
            "description": "format ipv4",
            "schema": {"format": "ipv4"},
            "tests": [
                {"description": "valid quad", "data": "192.168.0.1", "valid": True},
                {"description": "octet too big", "data": "256.0.0.1", "valid": False},
                {"description": "too few octets", "data": "127.0.0", "valid": False},
            ],
        },
        {
            "description": "format hostname",
            "schema": {"format": "hostname"},
            "tests": [
                {"description": "valid", "data": "www.example.com", "valid": True},
                {"description": "underscore invalid", "data": "not_a_host", "valid": False},
            ],
        },
        {
            "description": "format uri",
            "schema": {"format": "uri"},
            "tests": [
                {"description": "valid", "data": "http://example.com/x", "valid": True},
                {"description": "no scheme", "data": "//example.com", "valid": False},
            ],
        },
        {
            "description": "unknown format is ignored (spec: formats optional)",
            "schema": {"format": "no-such-format"},
            "tests": [
                {"description": "anything passes", "data": "whatever", "valid": True},
            ],
        },
    ],
}

D3 = {
    "extends.json": [
        {
            "description": "extends ≙ allOf (draft-3 §5.26)",
            "schema": {"minimum": 2, "extends": {"maximum": 5}},
            "tests": [
                {"description": "both pass", "data": 3, "valid": True},
                {"description": "base fails", "data": 1, "valid": False},
                {"description": "extension fails", "data": 6, "valid": False},
            ],
        },
        {
            "description": "extends list form",
            "schema": {"extends": [{"minimum": 2}, {"maximum": 5}]},
            "tests": [
                {"description": "both pass", "data": 3, "valid": True},
                {"description": "one fails", "data": 7, "valid": False},
            ],
        },
    ],
    "disallow.json": [
        {
            "description": "disallow type name (draft-3 §5.25)",
            "schema": {"disallow": "integer"},
            "tests": [
                {"description": "string allowed", "data": "x", "valid": True},
                {"description": "integer disallowed", "data": 1, "valid": False},
            ],
        },
        {
            "description": "disallow list with schema",
            "schema": {"disallow": ["string", {"minimum": 10}]},
            "tests": [
                {"description": "small number ok", "data": 5, "valid": True},
                {"description": "string disallowed", "data": "x", "valid": False},
                {"description": "schema-matched disallowed", "data": 11, "valid": False},
            ],
        },
    ],
    "divisibleBy.json": [
        {
            "description": "divisibleBy ≙ multipleOf (draft-3 §5.24)",
            "schema": {"divisibleBy": 3},
            "tests": [
                {"description": "multiple", "data": 9, "valid": True},
                {"description": "not a multiple", "data": 10, "valid": False},
            ],
        }
    ],
    "required-boolean.json": [
        {
            "description": "draft-3 boolean required on property",
            "schema": {"properties": {"foo": {"required": True}, "bar": {}}},
            "tests": [
                {"description": "present", "data": {"foo": 1}, "valid": True},
                {"description": "absent", "data": {"bar": 1}, "valid": False},
            ],
        }
    ],
    "type-union.json": [
        {
            "description": "draft-3 union with embedded schema",
            "schema": {"type": ["integer", {"properties": {"a": {"type": "string"}},
                                            "required": ["a"]}]},
            "tests": [
                {"description": "integer branch", "data": 3, "valid": True},
                {"description": "schema branch", "data": {"a": "x"}, "valid": True},
                {"description": "neither branch", "data": {"b": 1}, "valid": False},
            ],
        },
        {
            "description": "draft-3 any type",
            "schema": {"type": "any"},
            "tests": [
                {"description": "number", "data": 1, "valid": True},
                {"description": "object", "data": {}, "valid": True},
                {"description": "null", "data": None, "valid": True},
            ],
        },
    ],
    "format-d3.json": [
        {
            "description": "draft-3 date format",
            "schema": {"format": "date"},
            "tests": [
                {"description": "valid", "data": "1963-06-19", "valid": True},
                {"description": "invalid", "data": "06/19/1963", "valid": False},
            ],
        },
        {
            "description": "draft-3 time format",
            "schema": {"format": "time"},
            "tests": [
                {"description": "valid", "data": "08:30:06", "valid": True},
                {"description": "invalid", "data": "8:3:6am", "valid": False},
            ],
        },
        {
            "description": "draft-3 utc-millisec",
            "schema": {"format": "utc-millisec"},
            "tests": [
                {"description": "digit string accepted", "data": "1234567890", "valid": True},
                {"description": "non-digit string rejected", "data": "x", "valid": False},
                {"description": "numbers pass trivially (format is a string check)", "data": 12, "valid": True},
            ],
        },
        {
            "description": "draft-3 ip-address alias",
            "schema": {"format": "ip-address"},
            "tests": [
                {"description": "valid", "data": "10.0.0.1", "valid": True},
                {"description": "invalid", "data": "10.0.0.999", "valid": False},
            ],
        },
        {
            "description": "draft-3 color",
            "schema": {"format": "color"},
            "tests": [
                {"description": "hex", "data": "#ff0000", "valid": True},
                {"description": "name", "data": "red", "valid": True},
                {"description": "garbage", "data": "#12", "valid": False},
            ],
        },
    ],
}


# Draft-06/07 extension keywords (round 3): conditionals, propertyNames,
# contains counting, dependencies split. Same authored-corpus caveat as D4/D3.
D7 = {
    "if-then-else.json": [
        {
            "description": "if/then with required",
            "schema": {
                "if": {"properties": {"fmt": {"const": "raw"}}, "required": ["fmt"]},
                "then": {"required": ["w", "h"]},
            },
            "tests": [
                {"description": "if matches, then holds", "data": {"fmt": "raw", "w": 1, "h": 2}, "valid": True},
                {"description": "if matches, then fails", "data": {"fmt": "raw", "w": 1}, "valid": False},
                {"description": "if fails, then is not applied", "data": {"fmt": "png"}, "valid": True},
                {"description": "if fails (fmt absent)", "data": {}, "valid": True},
            ],
        },
        {
            "description": "if/else branch",
            "schema": {
                "if": {"properties": {"fmt": {"const": "raw"}}, "required": ["fmt"]},
                "else": {"properties": {"w": {"maximum": 100}}},
            },
            "tests": [
                {"description": "if matches, else not applied", "data": {"fmt": "raw", "w": 5000}, "valid": True},
                {"description": "if fails, else holds", "data": {"fmt": "png", "w": 50}, "valid": True},
                {"description": "if fails, else fails", "data": {"fmt": "png", "w": 5000}, "valid": False},
            ],
        },
        {
            "description": "then/else without if are inert (spec §6.6)",
            "schema": {"then": {"required": ["zzz"]}, "else": {"required": ["zzz"]}},
            "tests": [
                {"description": "no if => no conditional applies", "data": {}, "valid": True},
            ],
        },
        {
            "description": "if/then on scalars",
            "schema": {"if": {"type": "integer"}, "then": {"minimum": 10}},
            "tests": [
                {"description": "integer below bound fails then", "data": 5, "valid": False},
                {"description": "integer at bound passes", "data": 10, "valid": True},
                {"description": "non-integer skips then", "data": "x", "valid": True},
            ],
        },
    ],
    "propertyNames.json": [
        {
            "description": "propertyNames pattern + maxLength",
            "schema": {"propertyNames": {"pattern": "^[a-z_]+$", "maxLength": 5}},
            "tests": [
                {"description": "all names conform", "data": {"abc": 1, "de_f": 2}, "valid": True},
                {"description": "uppercase name fails", "data": {"Abc": 1}, "valid": False},
                {"description": "too-long name fails", "data": {"abcdef": 1}, "valid": False},
                {"description": "empty object has no names", "data": {}, "valid": True},
                {"description": "non-object ignores propertyNames", "data": [1, 2], "valid": True},
            ],
        },
    ],
    "contains-bounds.json": [
        {
            "description": "minContains/maxContains counting",
            "schema": {"contains": {"minimum": 10}, "minContains": 2, "maxContains": 3},
            "tests": [
                {"description": "one match is too few", "data": [10, 1], "valid": False},
                {"description": "two matches ok", "data": [10, 11, 1], "valid": True},
                {"description": "three matches ok", "data": [10, 11, 12], "valid": True},
                {"description": "four matches exceeds max", "data": [10, 11, 12, 13], "valid": False},
            ],
        },
        {
            "description": "minContains 0 permits empty arrays",
            "schema": {"contains": {"minimum": 10}, "minContains": 0},
            "tests": [
                {"description": "empty array valid with minContains 0", "data": [], "valid": True},
                {"description": "minContains 0 satisfies contains with zero matches", "data": [1, 2], "valid": True},
            ],
        },
    ],
    "dependent.json": [
        {
            "description": "dependentRequired (draft-2019 split of dependencies)",
            "schema": {"dependentRequired": {"a": ["b"]}},
            "tests": [
                {"description": "trigger present, dep present", "data": {"a": 1, "b": 2}, "valid": True},
                {"description": "trigger present, dep missing", "data": {"a": 1}, "valid": False},
                {"description": "trigger absent", "data": {"b": 2}, "valid": True},
            ],
        },
        {
            "description": "dependentSchemas",
            "schema": {"dependentSchemas": {"c": {"properties": {"d": {"minimum": 5}}}}},
            "tests": [
                {"description": "trigger present, schema holds", "data": {"c": 1, "d": 7}, "valid": True},
                {"description": "trigger present, schema fails", "data": {"c": 1, "d": 3}, "valid": False},
                {"description": "trigger absent", "data": {"d": 3}, "valid": True},
            ],
        },
    ],
    "content.json": [
        {
            "description": "contentEncoding base64 (asserting mode)",
            "schema": {"contentEncoding": "base64"},
            "tests": [
                {"description": "valid base64", "data": "aGVsbG8=", "valid": True},
                {"description": "bad alphabet", "data": "aGVsbG8!", "valid": False},
                {"description": "bad padding length", "data": "aGVsbG8", "valid": False},
                {"description": "empty string is valid base64", "data": "", "valid": True},
                {"description": "non-string ignores contentEncoding", "data": 7, "valid": True},
            ],
        },
        {
            "description": "contentMediaType image/png over base64",
            "schema": {"contentEncoding": "base64", "contentMediaType": "image/png"},
            "tests": [
                # iVBORw0KGgo= is base64 of the 8-byte PNG signature
                {"description": "png magic", "data": "iVBORw0KGgo=", "valid": True},
                {"description": "valid base64, wrong magic", "data": "aGVsbG8gd29ybGQ=", "valid": False},
                {"description": "invalid base64 reports encoding not media type",
                 "data": "iVBORw0KGgo!", "valid": False},
            ],
        },
        {
            "description": "contentMediaType application/json on raw string",
            "schema": {"contentMediaType": "application/json"},
            "tests": [
                {"description": "object payload", "data": "{\"a\": 1}", "valid": True},
                {"description": "array payload", "data": "[1, 2]", "valid": True},
                {"description": "not json", "data": "nope", "valid": False},
            ],
        },
    ],
    "content-schema.json": [
        {
            "description": "contentSchema re-validates decoded JSON (d2019 §8.5)",
            "schema": {"contentMediaType": "application/json",
                       "contentSchema": {"required": ["k"],
                                         "properties": {"k": {"minimum": 5}}}},
            "tests": [
                {"description": "content satisfies schema", "data": "{\"k\": 7}", "valid": True},
                {"description": "content violates schema", "data": "{\"k\": 2}", "valid": False},
                {"description": "required key missing in content", "data": "{\"z\": 1}", "valid": False},
                {"description": "unparseable is mediaType's violation only", "data": "nope", "valid": False},
            ],
        },
        {
            "description": "contentSchema inert without application/json",
            "schema": {"contentSchema": {"required": ["k"]}},
            "tests": [
                {"description": "no media type declared -> annotation only", "data": "{}", "valid": True},
            ],
        },
    ],
    "formats7.json": [
        {
            "description": "draft-6/7 format additions",
            "schema": {"properties": {
                "u": {"format": "uuid"}, "d": {"format": "duration"},
                "jp": {"format": "json-pointer"}, "rjp": {"format": "relative-json-pointer"},
                "ur": {"format": "uri-reference"}, "ut": {"format": "uri-template"},
            }},
            "tests": [
                {"description": "all valid",
                 "data": {"u": "123e4567-e89b-12d3-a456-426614174000", "d": "P1DT2H",
                          "jp": "/a/b~1c", "rjp": "1/a", "ur": "/rel?q=1", "ut": "/users/{id}"},
                 "valid": True},
                {"description": "bad uuid", "data": {"u": "xyz"}, "valid": False},
                {"description": "bad duration (bare P)", "data": {"d": "P"}, "valid": False},
                {"description": "bad pointer (no leading slash)", "data": {"jp": "a/b"}, "valid": False},
                {"description": "bad relative pointer", "data": {"rjp": "/a"}, "valid": False},
                {"description": "uri-reference rejects whitespace", "data": {"ur": "has space"}, "valid": False},
                {"description": "unclosed template brace", "data": {"ut": "/users/{id"}, "valid": False},
            ],
        },
    ],
    "defs-ref.json": [
        {
            "description": "$defs (draft-2019 spelling of definitions) resolves via $ref",
            "schema": {"$defs": {"posint": {"type": "integer", "minimum": 1}},
                       "properties": {"n": {"$ref": "#/$defs/posint"}}},
            "tests": [
                {"description": "valid per def", "data": {"n": 5}, "valid": True},
                {"description": "below minimum", "data": {"n": 0}, "valid": False},
                {"description": "wrong type", "data": {"n": "x"}, "valid": False},
            ],
        },
    ],
    "anchor-ref.json": [
        {
            "description": "$anchor plain-name fragment resolves via $ref (d2019 §8.2.3)",
            "schema": {"$defs": {"p": {"$anchor": "posint", "type": "integer", "minimum": 1}},
                       "properties": {"n": {"$ref": "#posint"}}},
            "tests": [
                {"description": "valid per anchored def", "data": {"n": 5}, "valid": True},
                {"description": "below minimum", "data": {"n": 0}, "valid": False},
                {"description": "wrong type", "data": {"n": "x"}, "valid": False},
            ],
        },
    ],
    "unevaluated.json": [
        {
            "description": "unevaluatedProperties false, properties only",
            "schema": {"properties": {"a": {}}, "unevaluatedProperties": False},
            "tests": [
                {"description": "only declared property", "data": {"a": 1}, "valid": True},
                {"description": "extra property fails", "data": {"a": 1, "b": 2}, "valid": False},
                {"description": "empty object", "data": {}, "valid": True},
                {"description": "non-object ignores keyword", "data": 7, "valid": True},
            ],
        },
        {
            "description": "unevaluatedProperties sees validating anyOf branch annotations",
            "schema": {"properties": {"a": {}},
                       "anyOf": [{"required": ["b"], "properties": {"b": {"type": "integer"}}},
                                 {"required": ["c"], "properties": {"c": {}}}],
                       "unevaluatedProperties": False},
            "tests": [
                {"description": "b evaluated by valid branch", "data": {"a": 1, "b": 2}, "valid": True},
                {"description": "b unevaluated when its branch fails",
                 "data": {"a": 1, "b": "str", "c": 3}, "valid": False},
                {"description": "d evaluated by nothing", "data": {"a": 1, "b": 2, "d": 4}, "valid": False},
            ],
        },
        {
            "description": "unevaluatedProperties schema form",
            "schema": {"properties": {"a": {}}, "unevaluatedProperties": {"type": "integer"}},
            "tests": [
                {"description": "extra validates", "data": {"a": "s", "z": 3}, "valid": True},
                {"description": "extra fails subschema", "data": {"a": "s", "z": "no"}, "valid": False},
            ],
        },
        {
            "description": "if/then annotations flow into unevaluatedProperties",
            "schema": {"if": {"required": ["k"], "properties": {"k": {"const": 1}}},
                       "then": {"properties": {"t": {}}},
                       "unevaluatedProperties": False},
            "tests": [
                {"description": "then evaluated t when if matched", "data": {"k": 1, "t": 5}, "valid": True},
                {"description": "if failed: k and t unevaluated", "data": {"k": 2, "t": 5}, "valid": False},
            ],
        },
        {
            "description": "unevaluatedItems over tuple prefix",
            "schema": {"items": [{"type": "integer"}], "unevaluatedItems": False},
            "tests": [
                {"description": "prefix only", "data": [1], "valid": True},
                {"description": "extra item fails", "data": [1, 2], "valid": False},
                {"description": "empty array", "data": [], "valid": True},
            ],
        },
        {
            "description": "unevaluatedItems schema form + allOf prefix extension",
            "schema": {"items": [{}], "allOf": [{"items": [{}, {}]}],
                       "unevaluatedItems": {"type": "integer"}},
            "tests": [
                {"description": "allOf extends evaluated prefix to 2", "data": ["a", "b"], "valid": True},
                {"description": "third item must be integer", "data": ["a", "b", 3], "valid": True},
                {"description": "third item wrong type", "data": ["a", "b", "c"], "valid": False},
            ],
        },
        {
            "description": "single-schema items evaluates everything",
            "schema": {"items": {"type": "integer"}, "unevaluatedItems": False},
            "tests": [
                {"description": "all items evaluated", "data": [1, 2, 3], "valid": True},
            ],
        },
        {
            "description": "contains-matched items are evaluated (d2019 annotation)",
            "schema": {"contains": {"type": "string"}, "unevaluatedItems": False},
            "tests": [
                {"description": "all items match contains", "data": ["a", "b"], "valid": True},
                {"description": "non-matching item unevaluated", "data": ["a", 1], "valid": False},
                {"description": "empty array fails contains itself", "data": [], "valid": False},
            ],
        },
        {
            "description": "contains annotations flow from validated allOf branch",
            "schema": {"allOf": [{"contains": {"type": "string"}}],
                       "unevaluatedItems": {"type": "integer"}},
            "tests": [
                {"description": "strings via contains, ints via schema", "data": ["a", 1, "b"], "valid": True},
                {"description": "bool neither contained nor integer", "data": ["a", True], "valid": False},
            ],
        },
        {
            "description": "nested unevaluatedProperties in validated branch covers all",
            "schema": {"allOf": [{"unevaluatedProperties": True}],
                       "unevaluatedProperties": False},
            "tests": [
                {"description": "branch evaluates everything", "data": {"foo": 1}, "valid": True},
            ],
        },
    ],
    "exclusive-numeric.json": [
        {
            "description": "draft-6 numeric exclusiveMinimum/exclusiveMaximum",
            "schema": {"exclusiveMinimum": 0, "exclusiveMaximum": 10},
            "tests": [
                {"description": "strictly inside", "data": 5, "valid": True},
                {"description": "at lower bound fails", "data": 0, "valid": False},
                {"description": "at upper bound fails", "data": 10, "valid": False},
                {"description": "non-number ignores bounds", "data": "x", "valid": True},
            ],
        },
    ],
}


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for draft, corpus in (("draft4", D4), ("draft3", D3), ("draft7", D7)):
        d = os.path.join(here, "tests", "conformance", draft)
        os.makedirs(d, exist_ok=True)
        for fname, groups in corpus.items():
            with open(os.path.join(d, fname), "w") as f:
                json.dump(groups, f, indent=1)
                f.write("\n")
    n4 = sum(len(t["tests"]) for gs in D4.values() for t in gs)
    n3 = sum(len(t["tests"]) for gs in D3.values() for t in gs)
    n7 = sum(len(t["tests"]) for gs in D7.values() for t in gs)
    print(f"wrote {len(D4)} draft4 files ({n4} cases), {len(D3)} draft3 files "
          f"({n3} cases), {len(D7)} draft7 files ({n7} cases)")


if __name__ == "__main__":
    main()
