"""E1: single-document ``validate(doc, spec) -> [Violation]`` evaluator.

The reference-parity path (SURVEY.md §3 E1, BASELINE.json:6
"validate(doc)->violations"). Pure Python, driver-side, no Spark imports.
Exists to (a) pass the authored JSTS-shape conformance corpus
(tests/conformance/) and (b) differentially cross-check the Spark backend:
both consume the same SpecNode tree from ``spec.py``.

Semantics are draft-04 with these documented choices (SURVEY.md §5.1):
- ``1.0`` counts as an integer (draft-6 alignment; the corpus pins this).
- Python ``bool`` is NOT a number/integer (JSON true/false are a distinct type).
- ``minimum``/``maximum`` etc. ignore instances of non-matching type.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from .spec import Spec, SpecNode, parse_node
from . import formats
from .formats import FORMAT_CHECKERS


@dataclass(frozen=True)
class Violation:
    keyword: str
    path: str      # JSON-Pointer into the instance ("" = root)
    value: Any     # the offending value
    # JSON-Pointer into the schema: the dynamic evaluation path to the
    # failing keyword (draft-2019 §10.4.1 "keywordLocation"), e.g.
    # "/properties/a/anyOf/1/minimum". $ref hops are ELIDED (documented
    # divergence: spec.py resolves references at parse time, so the path
    # is the post-resolution one — closer to absoluteKeywordLocation
    # without the base URI). Default "" keeps the 3-field reference shape
    # (keyword, path, value) intact for every existing consumer.
    kloc: str = ""

    def as_tuple(self) -> tuple[str, str, Any]:
        return (self.keyword, self.path, self.value)


def json_type(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(v).__name__}")


def _type_matches(v: Any, t: str) -> bool:
    jt = json_type(v)
    if t == "any":
        return True
    if t == "number":
        return jt in ("number", "integer")
    if t == "integer":
        # 1.0 is an integer (pinned: SURVEY.md §5.1)
        return jt == "integer" or (jt == "number" and float(v).is_integer())
    return jt == t


def _json_eq(a: Any, b: Any) -> bool:
    """Deep JSON equality: 1 == 1.0 but True != 1."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) and not isinstance(a, bool):
        return a == b
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(_json_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(_json_eq(a[k], b[k]) for k in a)
    return a == b


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def validate(doc: Any, schema: dict | bool | Spec | SpecNode) -> list[Violation]:
    """The reference API: validate one JSON document, return violations."""
    if isinstance(schema, Spec):
        node = schema.root
    elif isinstance(schema, SpecNode):
        node = schema
    else:
        node = parse_node(schema)
    out: list[Violation] = []
    _eval(doc, node, "", out)
    return out


def is_valid(doc: Any, schema: dict | bool | Spec | SpecNode) -> bool:
    return not validate(doc, schema)


def _eval(v: Any, n: SpecNode, path: str, out: list[Violation],
          sp: str = "") -> None:  # noqa: C901
    # ``sp`` is the dynamic schema path (keywordLocation prefix) — "" for
    # callers that don't need locations; every recursion extends it with
    # the applicator segment, every violation records f"{sp}/{keyword}".
    if n.type is not None and not any(_type_matches(v, t) for t in n.type):
        out.append(Violation("type", path, v, f"{sp}/type"))
    if n.disallow is not None:
        for d in n.disallow:
            # disallowed when the instance DOES match the type/schema (d3 §5.25)
            bad = _type_matches(v, d) if isinstance(d, str) else _eval_quiet(v, d)
            if bad:
                out.append(Violation("disallow", path, v, f"{sp}/disallow"))
                break
    if n.enum is not None and not any(_json_eq(v, e) for e in n.enum):
        out.append(Violation("enum", path, v, f"{sp}/enum"))
    if n.has_const and not _json_eq(v, n.const):
        out.append(Violation("const", path, v, f"{sp}/const"))

    if _is_num(v):
        if n.minimum is not None:
            ok = v > n.minimum if n.exclusive_minimum else v >= n.minimum
            if not ok:
                kw = "exclusiveMinimum" if n.exclusive_minimum else "minimum"
                out.append(Violation(kw, path, v, f"{sp}/{kw}"))
        if n.maximum is not None:
            ok = v < n.maximum if n.exclusive_maximum else v <= n.maximum
            if not ok:
                kw = "exclusiveMaximum" if n.exclusive_maximum else "maximum"
                out.append(Violation(kw, path, v, f"{sp}/{kw}"))
        if n.multiple_of is not None:
            q = v / n.multiple_of
            if abs(q - round(q)) > 1e-9:
                out.append(Violation("multipleOf", path, v, f"{sp}/multipleOf"))

    if isinstance(v, str):
        if n.min_length is not None and len(v) < n.min_length:
            out.append(Violation("minLength", path, v, f"{sp}/minLength"))
        if n.max_length is not None and len(v) > n.max_length:
            out.append(Violation("maxLength", path, v, f"{sp}/maxLength"))
        if n.pattern is not None and not re.search(n.pattern, v):
            out.append(Violation("pattern", path, v, f"{sp}/pattern"))
        if n.format is not None:
            chk = FORMAT_CHECKERS.get(n.format)
            if chk is not None and not chk(v):
                out.append(Violation("format", path, v, f"{sp}/format"))
        # draft-7 §8 content keywords (asserting mode — formats.py rationale)
        if n.content_encoding == "base64" and not formats.check_base64(v):
            out.append(Violation("contentEncoding", path, v,
                                 f"{sp}/contentEncoding"))
        elif n.content_media_type is not None:
            data: bytes | str = v
            if n.content_encoding == "base64":
                import base64
                data = base64.b64decode(v)
            if not formats.check_media_type(data, n.content_media_type):
                out.append(Violation("contentMediaType", path, v,
                                     f"{sp}/contentMediaType"))
            elif n.content_schema is not None \
                    and n.content_media_type == "application/json":
                import json as _json
                doc = _json.loads(data if isinstance(data, str)
                                  else data.decode("utf-8"))
                if not _eval_quiet(doc, n.content_schema):
                    out.append(Violation("contentSchema", path, v,
                                         f"{sp}/contentSchema"))

    if isinstance(v, list):
        if n.min_items is not None and len(v) < n.min_items:
            out.append(Violation("minItems", path, v, f"{sp}/minItems"))
        if n.max_items is not None and len(v) > n.max_items:
            out.append(Violation("maxItems", path, v, f"{sp}/maxItems"))
        if n.unique_items:
            seen: list[Any] = []
            for x in v:
                if any(_json_eq(x, y) for y in seen):
                    out.append(Violation("uniqueItems", path, v,
                                         f"{sp}/uniqueItems"))
                    break
                seen.append(x)
        if n.items is not None:
            for i, x in enumerate(v):
                _eval(x, n.items, f"{path}/{i}", out, f"{sp}/items")
        if n.tuple_items is not None:
            for i, x in enumerate(v):
                if i < len(n.tuple_items):
                    _eval(x, n.tuple_items[i], f"{path}/{i}", out,
                          f"{sp}/items/{i}")
                elif n.additional_items is False:
                    out.append(Violation("additionalItems", f"{path}/{i}", x,
                                         f"{sp}/additionalItems"))
                elif isinstance(n.additional_items, SpecNode):
                    _eval(x, n.additional_items, f"{path}/{i}", out,
                          f"{sp}/additionalItems")
        if n.contains is not None:
            cnt = sum(_eval_quiet(x, n.contains) for x in v)
            minc = 1 if n.min_contains is None else n.min_contains
            if cnt < minc:
                kw = "contains" if n.min_contains is None else "minContains"
                out.append(Violation(kw, path, v, f"{sp}/{kw}"))
            if n.max_contains is not None and cnt > n.max_contains:
                out.append(Violation("maxContains", path, v,
                                     f"{sp}/maxContains"))

    if isinstance(v, dict):
        if n.required is not None:
            for name in n.required:
                if name not in v:
                    out.append(Violation("required", f"{path}/{name}", None,
                                         f"{sp}/required"))
        if n.min_properties is not None and len(v) < n.min_properties:
            out.append(Violation("minProperties", path, v,
                                 f"{sp}/minProperties"))
        if n.max_properties is not None and len(v) > n.max_properties:
            out.append(Violation("maxProperties", path, v,
                                 f"{sp}/maxProperties"))
        matched: set[str] = set()
        for name, sub in n.properties.items():
            if name in v:
                matched.add(name)
                _eval(v[name], sub, f"{path}/{name}", out,
                      f"{sp}/properties/{name}")
            elif sub.d3_required:
                out.append(Violation("required", f"{path}/{name}", None,
                                     f"{sp}/properties/{name}/required"))
        for pat, sub in n.pattern_properties.items():
            for name in v:
                if re.search(pat, name):
                    matched.add(name)
                    _eval(v[name], sub, f"{path}/{name}", out,
                          f"{sp}/patternProperties/{pat}")
        if n.additional_properties is not None:
            extras = [k for k in v if k not in matched and k not in n.properties]
            if n.additional_properties is False:
                for k in extras:
                    out.append(Violation("additionalProperties",
                                         f"{path}/{k}", v[k],
                                         f"{sp}/additionalProperties"))
            elif isinstance(n.additional_properties, SpecNode):
                for k in extras:
                    _eval(v[k], n.additional_properties, f"{path}/{k}", out,
                          f"{sp}/additionalProperties")
        if n.property_names is not None:
            for k in v:
                if not _eval_quiet(k, n.property_names):
                    out.append(Violation("propertyNames", f"{path}/{k}", k,
                                         f"{sp}/propertyNames"))
        for name, dep in n.dependencies.items():
            if name in v:
                if isinstance(dep, tuple):
                    for d in dep:
                        if d not in v:
                            out.append(Violation("dependencies",
                                                 f"{path}/{d}", None,
                                                 f"{sp}/dependencies/{name}"))
                else:
                    if not _eval_quiet(v, dep):
                        out.append(Violation("dependencies", path, v,
                                             f"{sp}/dependencies/{name}"))
        if n.unevaluated_properties is not None and n.unevaluated_properties is not True:
            acc: set = set()
            if not _names_cover(v, n, acc):
                for k in v:
                    if k in acc:
                        continue
                    if n.unevaluated_properties is False:
                        out.append(Violation("unevaluatedProperties",
                                             f"{path}/{k}", v[k],
                                             f"{sp}/unevaluatedProperties"))
                    else:
                        _eval(v[k], n.unevaluated_properties, f"{path}/{k}",
                              out, f"{sp}/unevaluatedProperties")

    if isinstance(v, list) and n.unevaluated_items is not None \
            and n.unevaluated_items is not True:
        cov = _items_cover(v, n)
        cevals = _contains_evaluators(v, n)
        for i in range(min(cov, len(v)), len(v)):
            # d2019 §9.3.1.4: items matched by an applicable `contains`
            # (this schema's or a validated applied branch's) are evaluated
            if any(_eval_quiet(v[i], c) for c in cevals):
                continue
            if n.unevaluated_items is False:
                out.append(Violation("unevaluatedItems", f"{path}/{i}", v[i],
                                     f"{sp}/unevaluatedItems"))
            else:
                _eval(v[i], n.unevaluated_items, f"{path}/{i}", out,
                      f"{sp}/unevaluatedItems")

    if n.all_of is not None:
        for i, sub in enumerate(n.all_of):
            _eval(v, sub, path, out, f"{sp}/allOf/{i}")
    if n.any_of is not None and not any(_eval_quiet(v, s) for s in n.any_of):
        out.append(Violation("anyOf", path, v, f"{sp}/anyOf"))
    if n.one_of is not None and sum(_eval_quiet(v, s) for s in n.one_of) != 1:
        out.append(Violation("oneOf", path, v, f"{sp}/oneOf"))
    if n.not_ is not None and _eval_quiet(v, n.not_):
        out.append(Violation("not", path, v, f"{sp}/not"))
    if n.if_ is not None:
        if _eval_quiet(v, n.if_):
            if n.then_ is not None and not _eval_quiet(v, n.then_):
                out.append(Violation("then", path, v, f"{sp}/then"))
        elif n.else_ is not None and not _eval_quiet(v, n.else_):
            out.append(Violation("else", path, v, f"{sp}/else"))


def _eval_quiet(v: Any, n: SpecNode) -> bool:
    tmp: list[Violation] = []
    _eval(v, n, "", tmp)
    return not tmp


def _applied_subschemas(v: Any, n: SpecNode) -> list[SpecNode]:
    """In-place applicator branches whose annotations apply to ``v`` under
    draft-2019 semantics: only branches that VALIDATE contribute (a failing
    allOf/anyOf branch's annotations are dropped); if/then/else contribute
    per the if outcome; schema-form dependencies when triggered + valid."""
    subs: list[SpecNode] = []
    for br in (n.all_of or ()) + (n.any_of or ()) + (n.one_of or ()):
        if _eval_quiet(v, br):
            subs.append(br)
    if n.if_ is not None:
        if _eval_quiet(v, n.if_):
            subs.append(n.if_)
            if n.then_ is not None and _eval_quiet(v, n.then_):
                subs.append(n.then_)
        elif n.else_ is not None and _eval_quiet(v, n.else_):
            subs.append(n.else_)
    if isinstance(v, dict):
        for name, dep in n.dependencies.items():
            if name in v and isinstance(dep, SpecNode) and _eval_quiet(v, dep):
                subs.append(dep)
    return subs


def _names_cover(v: dict, n: SpecNode, acc: set) -> bool:
    """Collect into ``acc`` the property names of ``v`` evaluated by ``n``
    and its applied applicator branches (recursively). Returns True when
    ALL names are evaluated (additionalProperties present at some applied
    level)."""
    if n.additional_properties is not None:
        return True
    acc.update(k for k in v if k in n.properties)
    for rx in n.pattern_properties:
        acc.update(k for k in v if re.search(rx, k))
    for sub in _applied_subschemas(v, n):
        # a VALIDATED applied branch carrying its own unevaluatedProperties
        # evaluates every name (d2019 annotation flow): a schema/true applies
        # to all names not otherwise evaluated there, and false could only
        # validate if no name was left unevaluated
        if sub.unevaluated_properties is not None:
            return True
        if _names_cover(v, sub, acc):
            return True
    return False


def _contains_evaluators(v: list, n: SpecNode) -> list[SpecNode]:
    """`contains` subschemas whose annotations apply to ``v`` (this schema's
    own plus those of validated applied branches, recursively) — items they
    match count as evaluated for unevaluatedItems (d2019 §9.3.1.4)."""
    subs = [n.contains] if n.contains is not None else []
    for sub in _applied_subschemas(v, n):
        subs.extend(_contains_evaluators(v, sub))
    return subs


def _items_cover(v: list, n: SpecNode) -> int:
    """Number of leading items of ``v`` evaluated by ``n`` and its applied
    branches. Single-schema ``items`` (or any ``additionalItems``) evaluates
    everything; tuple form evaluates its prefix. ``contains``-matched items
    are handled separately (per-item, ``_contains_evaluators``)."""
    if n.items is not None:
        return len(v)
    cov = 0
    if n.tuple_items is not None:
        if n.additional_items is not None:
            return len(v)
        cov = min(len(n.tuple_items), len(v))
    for sub in _applied_subschemas(v, n):
        # mirror of _names_cover: a validated applied branch with its own
        # unevaluatedItems evaluates the whole array
        if sub.unevaluated_items is not None:
            return len(v)
        cov = max(cov, _items_cover(v, sub))
        if cov >= len(v):
            return len(v)
    return cov
