"""Spec linting: authoring-time diagnostics for constraint specs — the
checks a reviewer runs BEFORE a 10^12-row job does (a contradictory bound
silently fails every row; an inert keyword silently checks nothing).

Pure driver-side tree walk over the RAW schema document (pre-$ref-inlining,
so messages point at what the author wrote). Each finding is
(severity, path, message) with severity in {"error", "warning"}:

- error: the spec is satisfiable by NO value at that node (inverted bounds,
  empty enum) — every row would violate.
- warning: legal but almost certainly not what the author meant (inert
  then/else, unknown format, redundant unevaluatedProperties, required
  names never declared).
"""

from __future__ import annotations

import re
from typing import Any

from .formats import FORMAT_CHECKERS

Finding = tuple[str, str, str]  # (severity, json-pointer path, message)

_APPLICATORS = ("allOf", "anyOf", "oneOf")
_SUBSCHEMA_KEYS = ("not", "if", "then", "else", "contains", "propertyNames",
                   "additionalProperties", "additionalItems", "items",
                   "unevaluatedProperties", "unevaluatedItems", "contentSchema")


def lint_spec(schema: dict[str, Any] | bool) -> list[Finding]:
    out: list[Finding] = []
    _walk(schema, "", out)
    return out


def _walk(s: Any, path: str, out: list[Finding]) -> None:
    if not isinstance(s, dict):
        return

    def err(msg: str) -> None:
        out.append(("error", path or "/", msg))

    def warn(msg: str) -> None:
        out.append(("warning", path or "/", msg))

    # --- unsatisfiable bounds (errors) -----------------------------------
    for lo, hi, excl in (("minimum", "maximum", False),):
        a, b = s.get(lo), s.get(hi)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a > b:
            err(f"{lo} ({a}) > {hi} ({b}): no number satisfies this node")
    em, ex = s.get("exclusiveMinimum"), s.get("exclusiveMaximum")
    if (isinstance(em, (int, float)) and not isinstance(em, bool)
            and isinstance(ex, (int, float)) and not isinstance(ex, bool) and em >= ex):
        err(f"exclusiveMinimum ({em}) >= exclusiveMaximum ({ex}): empty range")
    for lo, hi in (("minLength", "maxLength"), ("minItems", "maxItems"),
                   ("minProperties", "maxProperties"),
                   ("minContains", "maxContains")):
        a, b = s.get(lo), s.get(hi)
        if isinstance(a, int) and isinstance(b, int) and a > b:
            err(f"{lo} ({a}) > {hi} ({b}): unsatisfiable")
    if s.get("enum") == []:
        err("enum is empty: no value can validate")
    if "const" in s and isinstance(s.get("enum"), list) and s["const"] not in s["enum"]:
        err("const is not a member of enum: unsatisfiable conjunction")

    # --- inert / suspicious (warnings) -----------------------------------
    if ("then" in s or "else" in s) and "if" not in s:
        warn("then/else without if are inert (draft-7 §6.6)")
    if ("minContains" in s or "maxContains" in s) and "contains" not in s:
        warn("minContains/maxContains without contains are inert")
    fmt = s.get("format")
    if isinstance(fmt, str) and fmt not in FORMAT_CHECKERS:
        warn(f"unknown format {fmt!r}: not validated by this engine")
    pat = s.get("pattern")
    if isinstance(pat, str):
        try:
            re.compile(pat)
        except re.error as e:
            err(f"pattern does not compile: {e}")
    if "unevaluatedProperties" in s and "additionalProperties" in s:
        warn("unevaluatedProperties is dead code: additionalProperties "
             "already evaluates every property at this node")
    if "contentSchema" in s and s.get("contentMediaType") != "application/json":
        warn("contentSchema is inert without contentMediaType: application/json")
    req = s.get("required")
    props = s.get("properties")
    if isinstance(req, list) and isinstance(props, dict):
        # name never declared anywhere reachable is legal but usually a typo
        declared = set(props)
        for sub in (x for k in _APPLICATORS for x in s.get(k, []) if isinstance(x, dict)):
            declared |= set(sub.get("properties", {}) or {})
        for sub in (s.get(k) for k in ("if", "then", "else")):
            if isinstance(sub, dict):
                declared |= set(sub.get("properties", {}) or {})
        for name in req:
            if isinstance(name, str) and name not in declared:
                warn(f"required name {name!r} is never declared in properties "
                     "(typo?)")

    # --- recurse ---------------------------------------------------------
    for key in ("properties", "patternProperties", "$defs", "definitions",
                "dependentSchemas"):
        block = s.get(key)
        if isinstance(block, dict):
            for name, sub in block.items():
                _walk(sub, f"{path}/{key}/{name}", out)
    for key in _APPLICATORS:
        block = s.get(key)
        if isinstance(block, list):
            for i, sub in enumerate(block):
                _walk(sub, f"{path}/{key}/{i}", out)
    for key in _SUBSCHEMA_KEYS:
        sub = s.get(key)
        if isinstance(sub, dict):
            _walk(sub, f"{path}/{key}", out)
    items = s.get("items")
    if isinstance(items, list):
        for i, sub in enumerate(items):
            _walk(sub, f"{path}/items/{i}", out)
    deps = s.get("dependencies")
    if isinstance(deps, dict):
        for name, sub in deps.items():
            if isinstance(sub, dict):
                _walk(sub, f"{path}/dependencies/{name}", out)
