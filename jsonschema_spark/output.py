"""Standard JSON-Schema output formats over the E1 evaluator.

Draft 2019-09 / 2020-12 define interoperable validation output
(§10 "Output formats"): ``flag``, ``basic``, ``detailed`` and ``verbose``
structures built from *output units* carrying ``keywordLocation`` (the
dynamic evaluation path into the schema), ``instanceLocation`` (a JSON
Pointer into the instance) and a human-readable ``error``. The reference
validator's ``validate(doc) -> violations`` shape maps 1:1 onto the
``basic`` format's error list; this module is the adapter.

Supported: ``flag``, ``basic``, ``detailed``, ``verbose``. Documented
divergences:

- ``keywordLocation`` elides ``$ref`` hops: ``spec.py`` resolves
  references at parse time, so locations are post-resolution paths
  (the spec's ``absoluteKeywordLocation`` without a base URI). Schemas
  without ``$ref`` match the spec exactly.
- ``detailed`` nests leaf errors under their common applicator prefixes
  (single-child chains collapsed, the spec's condensation rule); it does
  not re-emit per-branch ``anyOf``/``oneOf`` sub-errors the evaluator
  already folded into one combinator violation. ``verbose`` keeps the
  same stance: ``anyOf``/``oneOf``/``not`` are leaf units (their branch
  evaluations are quiet probes in E1, not annotation-bearing
  applications).
- ``verbose`` emits one unit per keyword CHECK the evaluator actually
  performs (a ``maximum`` unit appears only when the instance is a
  number, mirroring E1's type-gated checks), not one per declared
  keyword — unapplied keywords are omitted rather than emitted as
  vacuously valid, which §10.4.4 permits.
"""

from __future__ import annotations

import json
import re
from typing import Any

from .formats import FORMAT_CHECKERS
from .local import (Violation, _contains_evaluators, _eval, _eval_quiet,
                    _is_num, _items_cover, _names_cover, validate)
from .spec import Spec, SpecNode, parse_node

_MESSAGES = {
    "type": "instance does not match the expected type",
    "enum": "value is not one of the enumerated values",
    "const": "value does not equal the constant",
    "minimum": "value is less than the minimum",
    "exclusiveMinimum": "value is not greater than the exclusive minimum",
    "maximum": "value is greater than the maximum",
    "exclusiveMaximum": "value is not less than the exclusive maximum",
    "multipleOf": "value is not a multiple of the divisor",
    "minLength": "string is shorter than minLength",
    "maxLength": "string is longer than maxLength",
    "pattern": "string does not match the pattern",
    "format": "string does not conform to the format",
    "contentEncoding": "string is not valid for the content encoding",
    "contentMediaType": "content does not parse as the declared media type",
    "contentSchema": "decoded content does not validate against contentSchema",
    "minItems": "array has fewer items than minItems",
    "maxItems": "array has more items than maxItems",
    "uniqueItems": "array items are not unique",
    "additionalItems": "item is not allowed by additionalItems",
    "contains": "no array item matches the contains schema",
    "minContains": "too few array items match the contains schema",
    "maxContains": "too many array items match the contains schema",
    "required": "required property is missing",
    "minProperties": "object has fewer properties than minProperties",
    "maxProperties": "object has more properties than maxProperties",
    "additionalProperties": "property is not allowed by additionalProperties",
    "propertyNames": "property name does not validate against propertyNames",
    "dependencies": "property dependency is not satisfied",
    "unevaluatedProperties": "property was not evaluated by any keyword",
    "unevaluatedItems": "item was not evaluated by any keyword",
    "allOf": "instance does not validate against all subschemas",
    "anyOf": "instance does not validate against any subschema",
    "oneOf": "instance does not validate against exactly one subschema",
    "not": "instance validates against the not schema",
    "then": "instance matched if but does not validate against then",
    "else": "instance did not match if and does not validate against else",
    "disallow": "instance matches a disallowed type or schema",
}


def _unit(v: Violation) -> dict[str, Any]:
    msg = _MESSAGES.get(v.keyword, f"fails the {v.keyword} constraint")
    return {
        "valid": False,
        "keywordLocation": v.kloc,
        "instanceLocation": v.path,
        "error": msg,
    }


def output(doc: Any, schema: Any, format: str = "basic") -> dict[str, Any]:
    """Validate ``doc`` and return a draft-2019 output structure.

    ``format`` is one of ``"flag"``, ``"basic"``, ``"detailed"``,
    ``"verbose"``.
    """
    if format not in ("flag", "basic", "detailed", "verbose"):
        raise ValueError(f"unsupported output format: {format!r} "
                         "(supported: flag, basic, detailed, verbose)")
    if format == "verbose":
        return verbose(doc, schema)
    viols = validate(doc, schema)
    if format == "flag":
        return {"valid": not viols}
    if not viols:
        return {"valid": True}
    units = [_unit(v) for v in viols]
    if format == "basic":
        return {"valid": False, "errors": units}
    return _detailed(units)


def _detailed(units: list[dict[str, Any]]) -> dict[str, Any]:
    """Nest leaf error units under common keywordLocation prefixes.

    Builds a trie over the keywordLocation segments, collapses
    single-child chains (the spec's condensation rule: a node with one
    child is replaced by that child), and emits container units with
    ``errors`` lists at branch points."""
    if len(units) == 1:
        return units[0]

    root: dict[str, Any] = {"kids": {}, "leaves": []}
    for u in units:
        segs = [s for s in u["keywordLocation"].split("/") if s != ""]
        node = root
        for s in segs:
            node = node["kids"].setdefault(s, {"kids": {}, "leaves": []})
        # the same keywordLocation can fire at several instance locations
        # (e.g. items/type for two bad array elements) — keep every leaf
        node["leaves"].append(u)

    def emit(node: dict[str, Any], prefix: str) -> dict[str, Any]:
        # collapse single-child chains with no leaves at this node
        while not node["leaves"] and len(node["kids"]) == 1:
            (seg, child), = node["kids"].items()
            prefix = f"{prefix}/{seg}"
            node = child
        if len(node["leaves"]) == 1 and not node["kids"]:
            return node["leaves"][0]
        children = list(node["leaves"])
        children += [emit(c, f"{prefix}/{s}")
                     for s, c in sorted(node["kids"].items())]
        inst = _common_instance(children)
        return {"valid": False, "keywordLocation": prefix,
                "instanceLocation": inst, "errors": children}

    return emit(root, "")


def _common_instance(children: list[dict[str, Any]]) -> str:
    """Longest common JSON-Pointer prefix of the children's
    instanceLocations (the container unit's instanceLocation)."""
    paths = [c["instanceLocation"].split("/") for c in children]
    common = paths[0]
    for p in paths[1:]:
        i = 0
        while i < min(len(common), len(p)) and common[i] == p[i]:
            i += 1
        common = common[:i]
    return "/".join(common)


def output_json(doc: Any, schema: Any, format: str = "basic") -> str:
    """``output`` serialized as canonical JSON (sorted keys)."""
    return json.dumps(output(doc, schema, format), sort_keys=True)


# ---------------------------------------------------------------------------
# verbose (§10.4.4): every applied unit, valid ones included
# ---------------------------------------------------------------------------

def verbose(doc: Any, schema: Any) -> dict[str, Any]:
    """Full evaluation tree: one output unit per keyword check E1 performs,
    nested under the applicator units that performed them.

    Single source of truth: every validity flag is derived from the
    violation set ``_eval`` itself produced for the enclosing subtree —
    this function only ENUMERATES which (keywordLocation,
    instanceLocation) units that evaluation applied, mirroring
    ``local._eval``'s type-gated dispatch step for step, so the two
    cannot disagree on outcomes (a mismatch could only drop or duplicate
    a unit, which the test corpus pins)."""
    if isinstance(schema, Spec):
        node = schema.root
    elif isinstance(schema, SpecNode):
        node = schema
    else:
        node = parse_node(schema)
    return _verbose(doc, node, "", "")


def _leaf(errs: list[Violation], kw: str, kloc: str, iloc: str) -> dict[str, Any]:
    bad = any(e.kloc == kloc and e.path == iloc for e in errs)
    u: dict[str, Any] = {"valid": not bad, "keywordLocation": kloc,
                         "instanceLocation": iloc}
    if bad:
        u["error"] = _MESSAGES.get(kw, f"fails the {kw} constraint")
    return u


def _verbose(v: Any, n: SpecNode, path: str, sp: str) -> dict[str, Any]:  # noqa: C901
    errs: list[Violation] = []
    _eval(v, n, path, errs, sp)
    kids: list[dict[str, Any]] = []

    def leaf(kw: str, iloc: str | None = None, seg: str | None = None) -> None:
        kids.append(_leaf(errs, kw, f"{sp}/{seg or kw}",
                          path if iloc is None else iloc))

    if n.type is not None:
        leaf("type")
    if n.disallow is not None:
        leaf("disallow")
    if n.enum is not None:
        leaf("enum")
    if n.has_const:
        leaf("const")

    if _is_num(v):
        if n.minimum is not None:
            leaf("exclusiveMinimum" if n.exclusive_minimum else "minimum")
        if n.maximum is not None:
            leaf("exclusiveMaximum" if n.exclusive_maximum else "maximum")
        if n.multiple_of is not None:
            leaf("multipleOf")

    if isinstance(v, str):
        if n.min_length is not None:
            leaf("minLength")
        if n.max_length is not None:
            leaf("maxLength")
        if n.pattern is not None:
            leaf("pattern")
        if n.format is not None and n.format in FORMAT_CHECKERS:
            leaf("format")
        enc_bad = False
        if n.content_encoding == "base64":
            leaf("contentEncoding")
            enc_bad = any(e.kloc == f"{sp}/contentEncoding" for e in errs)
        if n.content_media_type is not None and not enc_bad:
            leaf("contentMediaType")
            media_bad = any(e.kloc == f"{sp}/contentMediaType" for e in errs)
            if (n.content_schema is not None and not media_bad
                    and n.content_media_type == "application/json"):
                leaf("contentSchema")

    if isinstance(v, list):
        if n.min_items is not None:
            leaf("minItems")
        if n.max_items is not None:
            leaf("maxItems")
        if n.unique_items:
            leaf("uniqueItems")
        if n.items is not None:
            for i, x in enumerate(v):
                kids.append(_verbose(x, n.items, f"{path}/{i}", f"{sp}/items"))
        if n.tuple_items is not None:
            for i, x in enumerate(v):
                if i < len(n.tuple_items):
                    kids.append(_verbose(x, n.tuple_items[i], f"{path}/{i}",
                                         f"{sp}/items/{i}"))
                elif n.additional_items is False:
                    leaf("additionalItems", iloc=f"{path}/{i}")
                elif isinstance(n.additional_items, SpecNode):
                    kids.append(_verbose(x, n.additional_items, f"{path}/{i}",
                                         f"{sp}/additionalItems"))
        if n.contains is not None:
            leaf("contains" if n.min_contains is None else "minContains")
            if n.max_contains is not None:
                leaf("maxContains")

    if isinstance(v, dict):
        if n.required is not None:
            for name in n.required:
                leaf("required", iloc=f"{path}/{name}")
        if n.min_properties is not None:
            leaf("minProperties")
        if n.max_properties is not None:
            leaf("maxProperties")
        matched: set[str] = set()
        for name, sub in n.properties.items():
            if name in v:
                matched.add(name)
                kids.append(_verbose(v[name], sub, f"{path}/{name}",
                                     f"{sp}/properties/{name}"))
            elif sub.d3_required:
                leaf("required", iloc=f"{path}/{name}",
                     seg=f"properties/{name}/required")
        for pat, sub in n.pattern_properties.items():
            for name in v:
                if re.search(pat, name):
                    matched.add(name)
                    kids.append(_verbose(v[name], sub, f"{path}/{name}",
                                         f"{sp}/patternProperties/{pat}"))
        if n.additional_properties is not None:
            extras = [k for k in v if k not in matched and k not in n.properties]
            if n.additional_properties is False:
                for k in extras:
                    leaf("additionalProperties", iloc=f"{path}/{k}")
            elif isinstance(n.additional_properties, SpecNode):
                for k in extras:
                    kids.append(_verbose(v[k], n.additional_properties,
                                         f"{path}/{k}",
                                         f"{sp}/additionalProperties"))
        if n.property_names is not None:
            for k in v:
                leaf("propertyNames", iloc=f"{path}/{k}")
        for name, dep in n.dependencies.items():
            if name in v:
                if isinstance(dep, tuple):
                    for d in dep:
                        leaf("dependencies", iloc=f"{path}/{d}",
                             seg=f"dependencies/{name}")
                else:
                    leaf("dependencies", seg=f"dependencies/{name}")
        if n.unevaluated_properties is not None \
                and n.unevaluated_properties is not True:
            acc: set = set()
            if not _names_cover(v, n, acc):
                for k in v:
                    if k in acc:
                        continue
                    if n.unevaluated_properties is False:
                        leaf("unevaluatedProperties", iloc=f"{path}/{k}")
                    else:
                        kids.append(_verbose(v[k], n.unevaluated_properties,
                                             f"{path}/{k}",
                                             f"{sp}/unevaluatedProperties"))

    if isinstance(v, list) and n.unevaluated_items is not None \
            and n.unevaluated_items is not True:
        cov = _items_cover(v, n)
        cevals = _contains_evaluators(v, n)
        for i in range(min(cov, len(v)), len(v)):
            if any(_eval_quiet(v[i], c) for c in cevals):
                continue
            if n.unevaluated_items is False:
                leaf("unevaluatedItems", iloc=f"{path}/{i}")
            else:
                kids.append(_verbose(v[i], n.unevaluated_items, f"{path}/{i}",
                                     f"{sp}/unevaluatedItems"))

    if n.all_of is not None:
        for i, sub in enumerate(n.all_of):
            kids.append(_verbose(v, sub, path, f"{sp}/allOf/{i}"))
    if n.any_of is not None:
        leaf("anyOf")
    if n.one_of is not None:
        leaf("oneOf")
    if n.not_ is not None:
        leaf("not")
    if n.if_ is not None:
        if_ok = _eval_quiet(v, n.if_)
        # the `if` unit's validity records the branch outcome but never
        # carries an error — §10.4.4 shows exactly this shape
        kids.append({"valid": if_ok, "keywordLocation": f"{sp}/if",
                     "instanceLocation": path})
        if if_ok:
            if n.then_ is not None:
                leaf("then")
        elif n.else_ is not None:
            leaf("else")

    unit: dict[str, Any] = {"valid": not errs, "keywordLocation": sp,
                            "instanceLocation": path}
    if kids:
        unit["errors" if errs else "annotations"] = kids
    elif errs:
        # failures with no enumerated child (cannot happen while the
        # walker mirrors _eval; belt-and-braces for future keywords)
        unit["errors"] = [_unit(e) for e in errs]
    return unit
