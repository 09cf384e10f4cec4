"""Bundled meta-schemas + dialect selection for spec meta-validation.

``lint.py`` validates a constraint spec AGAINST ITS META-SCHEMA using the
engine's own E1 evaluator (``local.validate``) — the validator validating
its inputs. This catches the malformed-keyword-shape class the parser
handles worst: some junk raises a raw ``TypeError`` deep in ``parse_node``
(``{"pattern": 5}``), and some is silently accepted and then checks
nothing or the wrong thing (``{"minimum": "5"}``, ``{"enum": "x"}``) —
at 10^12 rows a silently-inert bound is the most expensive kind of typo.

Three bundled metas (spec content from the public JSON Schema drafts,
json-schema.org):

- ``DRAFT4`` — for specs declaring ``$schema: .../draft-04/schema``.
- ``DRAFT7`` — drafts 06/07 (06 is a subset surface; unknown keys are
  legal in both, so validating 06 specs against 07 adds no false
  positives).
- ``DIALECT`` — this engine's draft-3..2020-12 UNION surface, used when
  ``$schema`` is absent or names 2019-09/2020-12: a single-resource meta
  that admits every form the parser accepts (d3 ``required: true``,
  ``type`` arrays embedding schemas, d4 boolean ``exclusiveMinimum``
  next to d6 numeric, string-form ``dependencies``, ``prefixItems``,
  ``unevaluated*``, ``dependent*``, ``x-*`` extensions) while pinning
  each keyword's SHAPE. It is deliberately not any published draft's
  meta — it is the published dialect of THIS engine, checked in so the
  accepted surface is inspectable.

All metas keep the drafts' open-world stance (no
``additionalProperties: false``): unknown keywords are legal JSON Schema
annotations; the typo detector in ``lint.py`` handles near-miss names.

The metas are recursive (``$ref: "#"``); ``spec.py`` unrolls cycles
``RECURSIVE_UNROLL`` (8) times then truncates PERMISSIVELY, so meta
findings can only be missed below depth 8, never invented — lint stays
false-positive-free on deeply nested specs.
"""

from __future__ import annotations

from typing import Any

_SIMPLE_TYPES = ["array", "boolean", "integer", "null", "number", "object",
                 "string"]

DRAFT4: dict[str, Any] = {
    "id": "http://json-schema.org/draft-04/schema#",
    "$schema": "http://json-schema.org/draft-04/schema#",
    "description": "Core schema meta-schema",
    "definitions": {
        "schemaArray": {"type": "array", "minItems": 1, "items": {"$ref": "#"}},
        "positiveInteger": {"type": "integer", "minimum": 0},
        "positiveIntegerDefault0": {
            "allOf": [{"$ref": "#/definitions/positiveInteger"}, {"default": 0}]},
        "simpleTypes": {"enum": _SIMPLE_TYPES},
        "stringArray": {"type": "array", "items": {"type": "string"},
                        "minItems": 1, "uniqueItems": True},
    },
    "type": "object",
    "properties": {
        "id": {"type": "string"},
        "$schema": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": {},
        "multipleOf": {"type": "number", "minimum": 0, "exclusiveMinimum": True},
        "maximum": {"type": "number"},
        "exclusiveMaximum": {"type": "boolean", "default": False},
        "minimum": {"type": "number"},
        "exclusiveMinimum": {"type": "boolean", "default": False},
        "maxLength": {"$ref": "#/definitions/positiveInteger"},
        "minLength": {"$ref": "#/definitions/positiveIntegerDefault0"},
        "pattern": {"type": "string", "format": "regex"},
        "additionalItems": {"anyOf": [{"type": "boolean"}, {"$ref": "#"}],
                            "default": {}},
        "items": {"anyOf": [{"$ref": "#"},
                            {"$ref": "#/definitions/schemaArray"}],
                  "default": {}},
        "maxItems": {"$ref": "#/definitions/positiveInteger"},
        "minItems": {"$ref": "#/definitions/positiveIntegerDefault0"},
        "uniqueItems": {"type": "boolean", "default": False},
        "maxProperties": {"$ref": "#/definitions/positiveInteger"},
        "minProperties": {"$ref": "#/definitions/positiveIntegerDefault0"},
        "required": {"$ref": "#/definitions/stringArray"},
        "additionalProperties": {"anyOf": [{"type": "boolean"}, {"$ref": "#"}],
                                 "default": {}},
        "definitions": {"type": "object",
                        "additionalProperties": {"$ref": "#"}, "default": {}},
        "properties": {"type": "object",
                       "additionalProperties": {"$ref": "#"}, "default": {}},
        "patternProperties": {"type": "object",
                              "additionalProperties": {"$ref": "#"},
                              "default": {}},
        "dependencies": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [{"$ref": "#"},
                          {"$ref": "#/definitions/stringArray"}]}},
        "enum": {"type": "array", "minItems": 1, "uniqueItems": True},
        "type": {"anyOf": [
            {"$ref": "#/definitions/simpleTypes"},
            {"type": "array", "items": {"$ref": "#/definitions/simpleTypes"},
             "minItems": 1, "uniqueItems": True}]},
        "format": {"type": "string"},
        "allOf": {"$ref": "#/definitions/schemaArray"},
        "anyOf": {"$ref": "#/definitions/schemaArray"},
        "oneOf": {"$ref": "#/definitions/schemaArray"},
        "not": {"$ref": "#"},
    },
    "dependencies": {"exclusiveMaximum": ["maximum"],
                     "exclusiveMinimum": ["minimum"]},
    "default": {},
}

DRAFT7: dict[str, Any] = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "http://json-schema.org/draft-07/schema#",
    "title": "Core schema meta-schema",
    "definitions": {
        "schemaArray": {"type": "array", "minItems": 1, "items": {"$ref": "#"}},
        "nonNegativeInteger": {"type": "integer", "minimum": 0},
        "nonNegativeIntegerDefault0": {
            "allOf": [{"$ref": "#/definitions/nonNegativeInteger"},
                      {"default": 0}]},
        "simpleTypes": {"enum": _SIMPLE_TYPES},
        "stringArray": {"type": "array", "items": {"type": "string"},
                        "uniqueItems": True, "default": []},
    },
    "type": ["object", "boolean"],
    "properties": {
        "$id": {"type": "string", "format": "uri-reference"},
        "$schema": {"type": "string", "format": "uri"},
        "$ref": {"type": "string", "format": "uri-reference"},
        "$comment": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "readOnly": {"type": "boolean", "default": False},
        "writeOnly": {"type": "boolean", "default": False},
        "examples": {"type": "array", "items": True},
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": "number"},
        "exclusiveMaximum": {"type": "number"},
        "minimum": {"type": "number"},
        "exclusiveMinimum": {"type": "number"},
        "maxLength": {"$ref": "#/definitions/nonNegativeInteger"},
        "minLength": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
        "pattern": {"type": "string", "format": "regex"},
        "additionalItems": {"$ref": "#"},
        "items": {"anyOf": [{"$ref": "#"},
                            {"$ref": "#/definitions/schemaArray"}],
                  "default": True},
        "maxItems": {"$ref": "#/definitions/nonNegativeInteger"},
        "minItems": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
        "uniqueItems": {"type": "boolean", "default": False},
        "contains": {"$ref": "#"},
        "maxProperties": {"$ref": "#/definitions/nonNegativeInteger"},
        "minProperties": {"$ref": "#/definitions/nonNegativeIntegerDefault0"},
        "required": {"$ref": "#/definitions/stringArray"},
        "additionalProperties": {"$ref": "#"},
        "definitions": {"type": "object",
                        "additionalProperties": {"$ref": "#"}, "default": {}},
        "properties": {"type": "object",
                       "additionalProperties": {"$ref": "#"}, "default": {}},
        "patternProperties": {"type": "object",
                              "additionalProperties": {"$ref": "#"},
                              "propertyNames": {"format": "regex"},
                              "default": {}},
        "dependencies": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [{"$ref": "#"},
                          {"$ref": "#/definitions/stringArray"}]}},
        "propertyNames": {"$ref": "#"},
        "const": True,
        "enum": {"type": "array", "items": True},
        "type": {"anyOf": [
            {"$ref": "#/definitions/simpleTypes"},
            {"type": "array", "items": {"$ref": "#/definitions/simpleTypes"},
             "minItems": 1, "uniqueItems": True}]},
        "format": {"type": "string"},
        "contentMediaType": {"type": "string"},
        "contentEncoding": {"type": "string"},
        "if": {"$ref": "#"},
        "then": {"$ref": "#"},
        "else": {"$ref": "#"},
        "allOf": {"$ref": "#/definitions/schemaArray"},
        "anyOf": {"$ref": "#/definitions/schemaArray"},
        "oneOf": {"$ref": "#/definitions/schemaArray"},
        "not": {"$ref": "#"},
    },
    "default": True,
}

# The engine's union surface: every form spec.py actually parses, with each
# keyword's SHAPE pinned. Differences from DRAFT7, each tied to a parser
# behavior (tests pin both sides):
#   - simpleTypes adds d3 "any"; type arrays may EMBED schemas (d3 union
#     types: {"type": ["string", {...}]}).
#   - required: stringArray OR d3 boolean.
#   - exclusiveMinimum/Maximum: d6 number OR d4 boolean modifier.
#   - dependencies values: schema, stringArray, or d3 single string.
#   - adds prefixItems/$defs/dependent*/unevaluated*/min-maxContains/
#     contentSchema/$anchor/$dynamicRef/$dynamicAnchor/divisibleBy/
#     disallow/extends.
DIALECT: dict[str, Any] = {
    "$id": "tag:jsonschema-spark,2026:dialect-meta",
    "title": "jsonschema_spark union-surface meta-schema",
    "definitions": {
        "schemaArray": {"type": "array", "minItems": 1, "items": {"$ref": "#"}},
        "nonNegativeInteger": {"type": "integer", "minimum": 0},
        "simpleTypes": {"enum": ["any"] + _SIMPLE_TYPES},
        "stringArray": {"type": "array", "items": {"type": "string"},
                        "uniqueItems": True},
    },
    "type": ["object", "boolean"],
    "properties": {
        "$id": {"type": "string"},
        "id": {"type": "string"},
        "$schema": {"type": "string"},
        "$ref": {"type": "string"},
        "$dynamicRef": {"type": "string"},
        "$anchor": {"type": "string"},
        "$dynamicAnchor": {"type": "string"},
        "$comment": {"type": "string"},
        "$vocabulary": {"type": "object",
                        "additionalProperties": {"type": "boolean"}},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "examples": {"type": "array"},
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "divisibleBy": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": "number"},
        "minimum": {"type": "number"},
        "exclusiveMaximum": {"type": ["number", "boolean"]},
        "exclusiveMinimum": {"type": ["number", "boolean"]},
        "maxLength": {"$ref": "#/definitions/nonNegativeInteger"},
        "minLength": {"$ref": "#/definitions/nonNegativeInteger"},
        "pattern": {"type": "string", "format": "regex"},
        "format": {"type": "string"},
        "contentEncoding": {"type": "string"},
        "contentMediaType": {"type": "string"},
        "contentSchema": {"$ref": "#"},
        "items": {"anyOf": [{"$ref": "#"},
                            {"$ref": "#/definitions/schemaArray"}]},
        "prefixItems": {"$ref": "#/definitions/schemaArray"},
        "additionalItems": {"$ref": "#"},
        "maxItems": {"$ref": "#/definitions/nonNegativeInteger"},
        "minItems": {"$ref": "#/definitions/nonNegativeInteger"},
        "uniqueItems": {"type": "boolean"},
        "contains": {"$ref": "#"},
        "minContains": {"$ref": "#/definitions/nonNegativeInteger"},
        "maxContains": {"$ref": "#/definitions/nonNegativeInteger"},
        "unevaluatedItems": {"$ref": "#"},
        "maxProperties": {"$ref": "#/definitions/nonNegativeInteger"},
        "minProperties": {"$ref": "#/definitions/nonNegativeInteger"},
        "required": {"anyOf": [{"$ref": "#/definitions/stringArray"},
                               {"type": "boolean"}]},
        "properties": {"type": "object",
                       "additionalProperties": {"$ref": "#"}},
        "patternProperties": {"type": "object",
                              "additionalProperties": {"$ref": "#"},
                              "propertyNames": {"format": "regex"}},
        "additionalProperties": {"$ref": "#"},
        "propertyNames": {"$ref": "#"},
        "unevaluatedProperties": {"$ref": "#"},
        "definitions": {"type": "object",
                        "additionalProperties": {"$ref": "#"}},
        "$defs": {"type": "object", "additionalProperties": {"$ref": "#"}},
        "dependencies": {
            "type": "object",
            "additionalProperties": {
                "anyOf": [{"$ref": "#"},
                          {"$ref": "#/definitions/stringArray"},
                          {"type": "string"}]}},
        "dependentRequired": {
            "type": "object",
            "additionalProperties": {"$ref": "#/definitions/stringArray"}},
        "dependentSchemas": {"type": "object",
                             "additionalProperties": {"$ref": "#"}},
        "const": True,
        "enum": {"type": "array"},
        "type": {"anyOf": [
            {"$ref": "#/definitions/simpleTypes"},
            {"type": "array", "minItems": 1,
             "items": {"anyOf": [{"$ref": "#/definitions/simpleTypes"},
                                 {"$ref": "#"}]}}]},
        "allOf": {"$ref": "#/definitions/schemaArray"},
        "anyOf": {"$ref": "#/definitions/schemaArray"},
        "oneOf": {"$ref": "#/definitions/schemaArray"},
        "not": {"$ref": "#"},
        "if": {"$ref": "#"},
        "then": {"$ref": "#"},
        "else": {"$ref": "#"},
        "extends": {"anyOf": [{"$ref": "#"},
                              {"$ref": "#/definitions/schemaArray"}]},
        "disallow": {"anyOf": [
            {"$ref": "#/definitions/simpleTypes"},
            {"type": "array",
             "items": {"anyOf": [{"$ref": "#/definitions/simpleTypes"},
                                 {"$ref": "#"}]}}]},
        "x-table-checks": {"type": "object"},
        "x-json": {"type": "object"},
    },
    "default": True,
}


def meta_for(schema: dict[str, Any]) -> tuple[dict[str, Any], str]:
    """(meta, display-name) for a spec, selected by its ``$schema``.

    draft-04 → DRAFT4; draft-06/07 → DRAFT7; anything else (2019-09,
    2020-12, absent, unrecognized) → DIALECT, the engine's own surface —
    the honest meta when the spec does not pin a published draft."""
    decl = schema.get("$schema", "")
    if isinstance(decl, str):
        if "draft-04" in decl or "draft-03" in decl:
            return (DRAFT4, "draft-04") if "draft-04" in decl \
                else (DIALECT, "engine-dialect")
        if "draft-06" in decl or "draft-07" in decl:
            return DRAFT7, "draft-07"
    return DIALECT, "engine-dialect"
