"""Constraint-spec front-end: parse a JSONSchema-style dict into a SpecNode tree.

Shared by the local evaluator (``local.py``, reference-parity path E1) and the
Spark compiler (``compile_spark.py``, set-oriented path E2) so both backends
have identical semantics by construction (SURVEY.md §3).

Covers the draft-03 ∪ draft-04 keyword surface inventoried in SURVEY.md §2
Part A, plus the draft-06 conveniences ``const`` / ``contains`` and the
engine's table-level extension block ``x-table-checks`` (uniqueness /
referential / drift — SURVEY.md §2 Part B, BASELINE.json north_rule).

``$ref`` / ``definitions`` are resolved at parse time by inlining (SURVEY.md
§2 A22): the data plane never sees a ref. Cyclic refs finitely unroll
(``RECURSIVE_UNROLL``); non-cyclic chains are capped at ``MAX_REF_DEPTH``.
"""

from __future__ import annotations

import json as _json
import re
from dataclasses import dataclass, field
from typing import Any

# Keywords that are pure metadata (SURVEY.md A31) — retained, never validated.
METADATA_KEYWORDS = {"title", "description", "default", "id", "$schema", "x-table-checks",
                     "x-json"}

# JSON type names (draft-04 §3.5; draft-03 §5.1 adds "any").
JSON_TYPES = {"object", "array", "string", "number", "integer", "boolean", "null", "any"}

MAX_REF_DEPTH = 128

# Cyclic $refs (e.g. a linked-list/tree schema referencing itself) are
# finitely UNROLLED this many times; beyond that the cycle truncates to the
# permissive empty schema. Documents nested deeper than the unroll limit are
# accepted permissively past that depth (complete, not sound, below the cut
# — documented delta; erroring out on valid recursive schemas would be
# worse). Non-cyclic ref chains keep the hard MAX_REF_DEPTH error.
RECURSIVE_UNROLL = 8


class SpecError(ValueError):
    """Malformed constraint spec."""


# Memo for $ref expansion, active during one top-level parse()/parse_node()
# call (driver-side, single-threaded). Without it a schema with R ref sites
# back to a cycle unrolls as an R^RECURSIVE_UNROLL node TREE (a meta-schema
# with ~35 "#" sites would need 35^8 nodes); with it, expansion is keyed by
# (target identity, merged siblings, per-pointer cycle COUNTS) and the
# result is a shared DAG — SpecNodes are frozen, so sharing is safe. Stack
# ORDER is irrelevant to semantics: truncation tests ref_stack.count(ptr)
# and depth equals the count sum, both order-insensitive.
_REF_MEMO: dict[tuple, "SpecNode"] | None = None


@dataclass(frozen=True)
class SpecNode:
    """One schema object, normalized. Children are SpecNodes; keyword values
    are plain Python literals. Immutable so it is safe to close over when
    building Spark Column expressions on the driver."""

    # validation keywords (None = absent)
    type: tuple[str, ...] | None = None          # normalized to tuple of type names
    enum: tuple[Any, ...] | None = None
    const: Any = None
    has_const: bool = False
    minimum: float | None = None
    exclusive_minimum: bool = False              # draft-4 boolean modifier form
    maximum: float | None = None
    exclusive_maximum: bool = False
    multiple_of: float | None = None             # d4 multipleOf / d3 divisibleBy
    min_length: int | None = None
    max_length: int | None = None
    pattern: str | None = None
    items: "SpecNode | None" = None              # single-schema form
    tuple_items: tuple["SpecNode", ...] | None = None   # positional form
    additional_items: "SpecNode | bool | None" = None
    min_items: int | None = None
    max_items: int | None = None
    unique_items: bool = False
    contains: "SpecNode | None" = None
    min_contains: int | None = None             # draft-2019 refinement of contains
    max_contains: int | None = None
    required: tuple[str, ...] | None = None      # d4 array form
    d3_required: bool = False                    # d3 boolean-on-property form
    properties: dict[str, "SpecNode"] = field(default_factory=dict)
    pattern_properties: dict[str, "SpecNode"] = field(default_factory=dict)
    additional_properties: "SpecNode | bool | None" = None
    min_properties: int | None = None
    max_properties: int | None = None
    dependencies: dict[str, Any] = field(default_factory=dict)  # name -> tuple[str,...] | SpecNode
    all_of: tuple["SpecNode", ...] | None = None
    any_of: tuple["SpecNode", ...] | None = None
    one_of: tuple["SpecNode", ...] | None = None
    not_: "SpecNode | None" = None
    if_: "SpecNode | None" = None                # draft-7 conditionals
    then_: "SpecNode | None" = None
    else_: "SpecNode | None" = None
    property_names: "SpecNode | None" = None     # draft-6
    content_encoding: str | None = None          # draft-7 §8 (asserting mode)
    content_media_type: str | None = None
    content_schema: "SpecNode | None" = None     # d2019 §8.5: schema for decoded JSON
    # draft-2019 §9.3.2.4/§9.3.1.3 — apply to properties/items not evaluated
    # by this schema or a SUCCESSFULLY-validating in-place applicator branch
    unevaluated_properties: "SpecNode | bool | None" = None
    unevaluated_items: "SpecNode | bool | None" = None
    disallow: tuple[Any, ...] | None = None      # d3 §5.25: type names or schemas
    format: str | None = None
    # metadata passthrough for reporting
    meta: dict[str, Any] = field(default_factory=dict)

    def is_trivial(self) -> bool:
        """True if this node imposes no constraint (empty schema)."""
        return self == SpecNode()


@dataclass(frozen=True)
class TableChecks:
    """Engine extension block ``x-table-checks`` (SURVEY.md §2 Part B)."""

    unique: tuple[tuple[str, ...], ...] = ()
    references: tuple[dict[str, Any], ...] = ()
    drift: dict[str, Any] | None = None
    # cross-field row predicates — SQL invariants JSON Schema cannot express
    # (e.g. "fmt <> 'raw' OR length(bytes) = w*h*3"); each entry:
    # {"name": str, "test": <SQL bool expr>, "show"?: <SQL value expr>,
    #  "columns"?: [str, ...]}  (columns override the identifier scan used
    # for fused-scan pruning)
    row_predicates: tuple[dict[str, Any], ...] = ()
    # partition-anomaly pass: {"columns": [str, ...], "z_max"?: float} —
    # robust median/MAD z-score of per-partition mean/null-rate profiles
    anomaly: dict[str, Any] | None = None
    # quantile-bound checks on merged KLL sketches (B42): each entry
    # {"column": str, "q": float, "min"?: num, "max"?: num} — verdict is
    # table-wide (the merged sketch), resume-safe like the HLL rollup
    quantiles: tuple[dict[str, Any], ...] = ()
    # distinct-cardinality bounds on the merged HLL sketches (B15): each
    # entry {"column": str, "min"?: int, "max"?: int} — catches collapsed
    # or exploded cardinality (e.g. fmt suddenly 1 distinct); table-wide
    distinct: tuple[dict[str, Any], ...] = ()
    # null-rate bounds: {"column": str, "max_rate": float} — "required" is
    # too strict at web scale; this bounds the rate instead. Verdicts per
    # partition AND table-wide, both free from the stats pass
    null_rates: tuple[dict[str, Any], ...] = ()


@dataclass(frozen=True)
class Spec:
    root: SpecNode
    table_checks: TableChecks
    raw: dict[str, Any] = field(default_factory=dict, compare=False)


def _as_tuple_of_types(v: Any) -> tuple[str, ...]:
    """Normalize d4 string / d3 union-list of type names (d3 also allows
    embedded schemas in the union; those are handled by the caller)."""
    if isinstance(v, str):
        vals = (v,)
    elif isinstance(v, list):
        vals = tuple(x for x in v if isinstance(x, str))
    else:
        raise SpecError(f"bad 'type' value: {v!r}")
    for t in vals:
        if t not in JSON_TYPES:
            raise SpecError(f"unknown type name: {t!r}")
    return vals


def _find_anchor(doc: Any, name: str, key: str = "$anchor") -> Any:
    """Depth-first search for a subschema carrying ``$anchor: name``
    (draft-2019 §8.2.3 plain-name fragments, same-document). A
    ``$dynamicAnchor`` also registers as a plain anchor (d2020 §8.2.2), so
    plain-$ref resolution accepts either; pass key="$dynamicAnchor" to
    require the dynamic flavor."""
    if isinstance(doc, dict):
        if doc.get(key) == name or (key == "$anchor" and doc.get("$dynamicAnchor") == name):
            return doc
        for v in doc.values():
            hit = _find_anchor(v, name, key)
            if hit is not None:
                return hit
    elif isinstance(doc, list):
        for v in doc:
            hit = _find_anchor(v, name, key)
            if hit is not None:
                return hit
    return None


def _resolve_pointer(doc: Any, pointer: str) -> Any:
    """Resolve a '#/a/b' JSON-Pointer fragment — or a '#name' plain-name
    $anchor fragment (d2019) — against the root schema doc."""
    if not pointer.startswith("#"):
        raise SpecError(f"only same-document $refs supported, got {pointer!r}")
    if len(pointer) > 1 and not pointer[1:].startswith("/"):
        hit = _find_anchor(doc, pointer[1:])
        if hit is None:
            raise SpecError(f"unresolvable $anchor ref: {pointer!r}")
        return hit
    cur = doc
    frag = pointer[1:].lstrip("/")
    if not frag:
        return cur
    for token in frag.split("/"):
        token = token.replace("~1", "/").replace("~0", "~")
        if isinstance(cur, dict) and token in cur:
            cur = cur[token]
        elif isinstance(cur, list) and token.isdigit() and int(token) < len(cur):
            cur = cur[int(token)]
        else:
            raise SpecError(f"unresolvable $ref: {pointer!r}")
    return cur


def _build_id_registry(doc: Any, base: str = "", reg: dict[str, Any] | None = None) -> dict[str, Any]:
    """Collect every embedded schema resource declared via ``$id`` (draft 6+)
    or draft-4 ``id`` into a URI → subschema registry (d2020 §8.2.1 bundling).

    Base-URI chaining follows the lexical nesting rule: a relative ``$id``
    resolves against the nearest ancestor resource's id (RFC 3986 via
    ``urljoin``). Each resource registers under BOTH its raw ``$id`` string
    and its resolved absolute form, so ``{"$ref": "item.json"}`` and
    ``{"$ref": "https://ex.com/item.json"}`` both hit a resource declared as
    ``{"$id": "item.json"}`` under a root ``$id`` of ``https://ex.com/root``.
    Fragment-only ids (``"#foo"``, legal in draft 4/6) are anchors, not
    resources — they are already handled by ``_find_anchor`` and skipped here.
    """
    if reg is None:
        reg = {}
    if isinstance(doc, dict):
        idv = doc.get("$id", doc.get("id"))
        if isinstance(idv, str) and idv and not idv.startswith("#"):
            from urllib.parse import urljoin

            resolved = urljoin(base, idv) if base else idv
            reg.setdefault(idv, doc)
            reg.setdefault(resolved, doc)
            base = resolved
        for v in doc.values():
            _build_id_registry(v, base, reg)
    elif isinstance(doc, list):
        for v in doc:
            _build_id_registry(v, base, reg)
    return reg


def _resolve_id_ref(ptr: str, doc_root: dict[str, Any]) -> tuple[dict[str, Any], Any]:
    """Resolve a non-fragment ``$ref`` (``"item.json"``, ``"urn:x"``,
    ``"https://…/s.json#/a/b"``, ``"other.json#anchor"``) against the
    same-document ``$id`` registry. Returns ``(resource, target)`` — the
    embedded resource the base URI named (fragments inside the target must
    resolve against it, not the whole document) and the final target
    subschema. Raises SpecError when no embedded resource matches (true
    cross-document retrieval is out of scope — the engine never fetches
    URLs)."""
    from urllib.parse import urljoin

    base, _, frag = ptr.partition("#")
    reg = _build_id_registry(doc_root)
    root_id = doc_root.get("$id", doc_root.get("id", ""))
    resource = reg.get(base)
    if resource is None and isinstance(root_id, str) and root_id:
        resource = reg.get(urljoin(root_id, base))
        if resource is None and urljoin(root_id, base) == root_id.split("#")[0]:
            resource = doc_root  # ref points back at the root resource itself
    if resource is None:
        raise SpecError(
            f"unresolvable $ref {ptr!r}: no embedded $id matches and remote "
            "retrieval is unsupported (same-document resolution only)")
    if frag:
        if frag.startswith("/"):
            return resource, _resolve_pointer(resource, "#" + frag)
        hit = _find_anchor(resource, frag)
        if hit is None:
            raise SpecError(f"unresolvable anchor {frag!r} inside $id resource {base!r}")
        return resource, hit
    return resource, resource


def parse(schema: dict[str, Any] | bool) -> Spec:
    """Parse a full spec document (root schema + optional x-table-checks)."""
    if schema is True:
        schema = {}
    if schema is False:
        schema = {"not": {}}
    if not isinstance(schema, dict):
        raise SpecError(f"schema must be an object, got {type(schema).__name__}")
    global _REF_MEMO
    fresh_memo = _REF_MEMO is None
    if fresh_memo:
        _REF_MEMO = {}
    try:
        root = _parse_node(schema, schema, depth=0, ref_stack=())
    finally:
        if fresh_memo:
            _REF_MEMO = None
    tc = schema.get("x-table-checks", {}) or {}
    table_checks = TableChecks(
        unique=tuple(tuple(k) for k in tc.get("unique", [])),
        references=tuple(dict(r) for r in tc.get("references", [])),
        drift=dict(tc["drift"]) if "drift" in tc else None,
        row_predicates=tuple(dict(p) for p in tc.get("row-predicates", [])),
        anomaly=dict(tc["anomaly"]) if "anomaly" in tc else None,
        quantiles=tuple(dict(q) for q in tc.get("quantiles", [])),
        distinct=tuple(dict(d) for d in tc.get("distinct", [])),
        null_rates=tuple(dict(n) for n in tc.get("null-rates", [])),
    )
    for d in table_checks.distinct:
        if not isinstance(d.get("column"), str) or not d["column"]:
            raise SpecError(f"distinct check needs a 'column': {d!r}")
        if "min" not in d and "max" not in d:
            raise SpecError(f"distinct check needs a 'min' or 'max' bound: {d!r}")
    for nr in table_checks.null_rates:
        if not isinstance(nr.get("column"), str) or not nr["column"]:
            raise SpecError(f"null-rate check needs a 'column': {nr!r}")
        if not isinstance(nr.get("max_rate"), (int, float)) or not 0 <= nr["max_rate"] <= 1:
            raise SpecError(f"null-rate check needs 0 <= max_rate <= 1: {nr!r}")
    for q in table_checks.quantiles:
        if not isinstance(q.get("column"), str) or not q["column"]:
            raise SpecError(f"quantile check needs a 'column': {q!r}")
        if not isinstance(q.get("q"), (int, float)) or not 0 < q["q"] < 1:
            raise SpecError(f"quantile check needs 0 < q < 1: {q!r}")
        if "min" not in q and "max" not in q:
            raise SpecError(f"quantile check needs a 'min' or 'max' bound: {q!r}")
    if table_checks.anomaly is not None and not table_checks.anomaly.get("columns"):
        raise SpecError("x-table-checks/anomaly needs a non-empty 'columns' list")
    for p in table_checks.row_predicates:
        if not isinstance(p.get("name"), str) or not p["name"]:
            raise SpecError(f"row-predicate needs a non-empty 'name': {p!r}")
        if not isinstance(p.get("test"), str) or not p["test"]:
            raise SpecError(f"row-predicate {p['name']!r} needs a SQL 'test' string")
    return Spec(root=root, table_checks=table_checks, raw=schema)


def parse_node(schema: dict[str, Any] | bool) -> SpecNode:
    """Parse a bare (sub)schema with itself as the $ref root."""
    if schema is True:
        return SpecNode()
    if schema is False:
        return SpecNode(not_=SpecNode())
    global _REF_MEMO
    fresh_memo = _REF_MEMO is None
    if fresh_memo:
        _REF_MEMO = {}
    try:
        return _parse_node(schema, schema, depth=0, ref_stack=())
    finally:
        if fresh_memo:
            _REF_MEMO = None


def _sub(v: Any, root: dict, depth: int, ref_stack: tuple[str, ...] = (),
         doc_root: dict | None = None) -> SpecNode:
    if v is True:
        return SpecNode()
    if v is False:
        return SpecNode(not_=SpecNode())
    if not isinstance(v, dict):
        raise SpecError(f"subschema must be an object/bool, got {v!r}")
    return _parse_node(v, root, depth, ref_stack, doc_root)


def _parse_node(
    s: dict[str, Any], root: dict[str, Any], depth: int,
    ref_stack: tuple[str, ...] = (),
    doc_root: dict[str, Any] | None = None,
) -> SpecNode:
    # ``root`` is the CURRENT RESOURCE root (pointer/anchor fragments resolve
    # against it); ``doc_root`` is the whole document (the $id registry spans
    # it). They differ only after a $ref crossed into an embedded $id resource.
    if doc_root is None:
        doc_root = root
    if depth > MAX_REF_DEPTH:
        raise SpecError(f"$ref nesting exceeds depth cap {MAX_REF_DEPTH}")

    # --- $ref: inline the target, merging sibling keywords (d4: siblings
    # ignored, but merging is a strict superset and harmless for our corpus).
    # Cyclic refs unroll RECURSIVE_UNROLL times, then truncate permissively
    # (A22 — a recursive schema must parse, not error; see RECURSIVE_UNROLL).
    if "$ref" in s or "$dynamicRef" in s:
        # $dynamicRef (d2020 §8.2.3.2): resolves like $ref, except that when
        # the target carries a matching $dynamicAnchor the reference re-binds
        # to the OUTERMOST dynamic scope defining that anchor. We support
        # same-document schemas only, where the outermost scope is the root
        # document itself — so the document-order-first $dynamicAnchor from
        # the root IS the correct binding. (Cross-resource dynamic rebinding
        # would need an $id registry; out of scope, documented in SURVEY.)
        ptr = s.get("$ref", s.get("$dynamicRef"))
        if ref_stack.count(ptr) >= RECURSIVE_UNROLL:
            return SpecNode()
        new_root = root
        if not ptr.startswith("#"):
            # non-fragment ref: resolve via the same-document $id registry
            # (d2020 §8.2.1 bundled resources, A42); subsequent fragments
            # inside the target resolve against THAT resource, not the
            # whole document, so the resource becomes the new root.
            new_root, target = _resolve_id_ref(ptr, doc_root)
        elif "$ref" not in s and not ptr[1:].startswith("/"):
            target = _find_anchor(root, ptr[1:], key="$dynamicAnchor")
            if target is None:  # no dynamic anchor anywhere: plain-$ref fallback
                target = _resolve_pointer(root, ptr)
        else:
            target = _resolve_pointer(root, ptr)
        merged = {k: v for k, v in s.items() if k not in ("$ref", "$dynamicRef")}
        if isinstance(target, dict):
            for k, v in target.items():
                # the target's own $id must not re-register the merged node
                # as a resource (it would shadow the real one in reports)
                if k in ("$id", "id"):
                    continue
                merged.setdefault(k, v)
        # memoized expansion (see _REF_MEMO): key by resolved target +
        # sibling keywords + per-pointer cycle counts. id() keys are stable
        # here because the parse holds strong references to both roots for
        # the memo's whole lifetime (one top-level parse call).
        key = None
        if _REF_MEMO is not None:
            counts = tuple(sorted(
                (p, ref_stack.count(p)) for p in set(ref_stack + (ptr,))))
            sibs = {k: v for k, v in s.items() if k not in ("$ref", "$dynamicRef")}
            sib_key = _json.dumps(sibs, sort_keys=True, default=repr) if sibs else ""
            key = (id(root), id(doc_root), ptr, sib_key, counts)
            hit = _REF_MEMO.get(key)
            if hit is not None:
                return hit
        node = _parse_node(merged, new_root, depth + 1, ref_stack + (ptr,), doc_root)
        if key is not None:
            _REF_MEMO[key] = node
        return node

    kw: dict[str, Any] = {}
    meta = {k: s[k] for k in METADATA_KEYWORDS & s.keys() if k != "x-table-checks"}
    if meta:
        kw["meta"] = meta

    if "type" in s:
        tv = s["type"]
        # d3 union types may embed schemas: {"type": ["string", {...}]}
        if isinstance(tv, list) and any(isinstance(x, dict) for x in tv):
            alts = []
            for x in tv:
                if isinstance(x, str):
                    alts.append(SpecNode(type=_as_tuple_of_types(x)))
                else:
                    alts.append(_sub(x, root, depth + 1, ref_stack, doc_root))
            kw["any_of"] = tuple(alts) + (kw.get("any_of") or ())
        else:
            kw["type"] = _as_tuple_of_types(tv)
    if "enum" in s:
        kw["enum"] = tuple(s["enum"])
    if "const" in s:
        kw["const"] = s["const"]
        kw["has_const"] = True
    if "minimum" in s:
        kw["minimum"] = s["minimum"]
        em = s.get("exclusiveMinimum")
        if isinstance(em, bool):
            kw["exclusive_minimum"] = em
    if isinstance(s.get("exclusiveMinimum"), (int, float)) and not isinstance(s.get("exclusiveMinimum"), bool):
        # draft-6 numeric form
        kw["minimum"] = s["exclusiveMinimum"]
        kw["exclusive_minimum"] = True
    if "maximum" in s:
        kw["maximum"] = s["maximum"]
        em = s.get("exclusiveMaximum")
        if isinstance(em, bool):
            kw["exclusive_maximum"] = em
    if isinstance(s.get("exclusiveMaximum"), (int, float)) and not isinstance(s.get("exclusiveMaximum"), bool):
        kw["maximum"] = s["exclusiveMaximum"]
        kw["exclusive_maximum"] = True
    if "multipleOf" in s or "divisibleBy" in s:
        k = s.get("multipleOf", s.get("divisibleBy"))
        if not isinstance(k, (int, float)) or isinstance(k, bool) or k <= 0:
            raise SpecError(f"multipleOf must be a number > 0, got {k!r}")
        kw["multiple_of"] = k
    if "minLength" in s:
        kw["min_length"] = int(s["minLength"])
    if "maxLength" in s:
        kw["max_length"] = int(s["maxLength"])
    if "pattern" in s:
        re.compile(s["pattern"])  # fail fast at compile time (A9)
        kw["pattern"] = s["pattern"]
    if "prefixItems" in s:
        # draft-2020-12 §10.3.1.1: the tuple form moved from `items` to
        # `prefixItems`; a sibling `items` then constrains only the elements
        # PAST the prefix (exactly draft-4 additionalItems), so both map onto
        # the existing tuple machinery with identical semantics.
        pi = s["prefixItems"]
        if not isinstance(pi, list):
            raise SpecError(f"prefixItems must be an array, got {pi!r}")
        kw["tuple_items"] = tuple(_sub(x, root, depth + 1, ref_stack, doc_root) for x in pi)
        if "items" in s:
            it = s["items"]
            kw["additional_items"] = (
                it if isinstance(it, bool) else _sub(it, root, depth + 1, ref_stack, doc_root))
    elif "items" in s:
        it = s["items"]
        if isinstance(it, list):
            kw["tuple_items"] = tuple(_sub(x, root, depth + 1, ref_stack, doc_root) for x in it)
        else:
            kw["items"] = _sub(it, root, depth + 1, ref_stack, doc_root)
    if "additionalItems" in s and "prefixItems" not in s:
        # d2020 removed additionalItems; alongside prefixItems the sibling
        # `items` above already owns the tail, so a stray additionalItems is
        # ignored exactly as the 2020-12 core spec prescribes.
        ai = s["additionalItems"]
        kw["additional_items"] = ai if isinstance(ai, bool) else _sub(ai, root, depth + 1, ref_stack, doc_root)
    if "minItems" in s:
        kw["min_items"] = int(s["minItems"])
    if "maxItems" in s:
        kw["max_items"] = int(s["maxItems"])
    if "uniqueItems" in s:
        kw["unique_items"] = bool(s["uniqueItems"])
    if "contains" in s:
        kw["contains"] = _sub(s["contains"], root, depth + 1, ref_stack, doc_root)
    if "minContains" in s:
        kw["min_contains"] = int(s["minContains"])
    if "maxContains" in s:
        kw["max_contains"] = int(s["maxContains"])
    if "required" in s:
        rq = s["required"]
        if isinstance(rq, bool):           # draft-3 boolean-on-property form
            kw["d3_required"] = rq
        else:
            kw["required"] = tuple(rq)
    if "properties" in s:
        kw["properties"] = {k: _sub(v, root, depth + 1, ref_stack, doc_root) for k, v in s["properties"].items()}
    if "patternProperties" in s:
        for p in s["patternProperties"]:
            re.compile(p)
        kw["pattern_properties"] = {k: _sub(v, root, depth + 1, ref_stack, doc_root) for k, v in s["patternProperties"].items()}
    if "additionalProperties" in s:
        ap = s["additionalProperties"]
        kw["additional_properties"] = ap if isinstance(ap, bool) else _sub(ap, root, depth + 1, ref_stack, doc_root)
    if "minProperties" in s:
        kw["min_properties"] = int(s["minProperties"])
    if "maxProperties" in s:
        kw["max_properties"] = int(s["maxProperties"])
    # d4 `dependencies` plus its draft-2019 split into dependentRequired
    # (name -> [names]) and dependentSchemas (name -> schema); all three
    # normalize into the same dependencies map. A name appearing under more
    # than one keyword ANDs its constraints (draft-2019: the keywords are
    # independent) — name lists union, schemas wrap in a synthetic allOf.
    if "dependencies" in s or "dependentRequired" in s or "dependentSchemas" in s:
        raw_deps: dict[str, list[Any]] = {}
        for name, d in s.get("dependencies", {}).items():
            raw_deps.setdefault(name, []).append((d,) if isinstance(d, str) else d)
        for name, d in s.get("dependentRequired", {}).items():
            raw_deps.setdefault(name, []).append(list(d))
        for name, d in s.get("dependentSchemas", {}).items():
            raw_deps.setdefault(name, []).append(d)
        deps: dict[str, Any] = {}
        for name, entries in raw_deps.items():
            names: list[str] = []
            schemas: list[Any] = []
            for d in entries:
                if isinstance(d, (list, tuple)):
                    names.extend(n for n in d if n not in names)
                else:
                    schemas.append(d)
            if not schemas:
                deps[name] = tuple(names)
            else:
                if names:
                    schemas.append({"required": names})
                merged = schemas[0] if len(schemas) == 1 else {"allOf": schemas}
                deps[name] = _sub(merged, root, depth + 1, ref_stack, doc_root)
        kw["dependencies"] = deps
    if "allOf" in s or "extends" in s:     # d3 extends ≙ allOf (A18)
        ext = s.get("allOf", s.get("extends"))
        if isinstance(ext, dict):
            ext = [ext]
        kw["all_of"] = tuple(_sub(x, root, depth + 1, ref_stack, doc_root) for x in ext)
    if "anyOf" in s:
        kw["any_of"] = tuple(_sub(x, root, depth + 1, ref_stack, doc_root) for x in s["anyOf"]) + (kw.get("any_of") or ())
    if "oneOf" in s:
        kw["one_of"] = tuple(_sub(x, root, depth + 1, ref_stack, doc_root) for x in s["oneOf"])
    if "not" in s:
        kw["not_"] = _sub(s["not"], root, depth + 1, ref_stack, doc_root)
    # draft-7 conditionals: then/else are inert without if (spec §6.6)
    if "if" in s:
        kw["if_"] = _sub(s["if"], root, depth + 1, ref_stack, doc_root)
        if "then" in s:
            kw["then_"] = _sub(s["then"], root, depth + 1, ref_stack, doc_root)
        if "else" in s:
            kw["else_"] = _sub(s["else"], root, depth + 1, ref_stack, doc_root)
    if "propertyNames" in s:
        kw["property_names"] = _sub(s["propertyNames"], root, depth + 1, ref_stack, doc_root)
    if "unevaluatedProperties" in s:
        up = s["unevaluatedProperties"]
        kw["unevaluated_properties"] = up if isinstance(up, bool) else _sub(up, root, depth + 1, ref_stack, doc_root)
    if "unevaluatedItems" in s:
        ui = s["unevaluatedItems"]
        kw["unevaluated_items"] = ui if isinstance(ui, bool) else _sub(ui, root, depth + 1, ref_stack, doc_root)
    if "contentEncoding" in s:
        kw["content_encoding"] = s["contentEncoding"]
    if "contentMediaType" in s:
        kw["content_media_type"] = s["contentMediaType"]
    if "contentSchema" in s and s.get("contentMediaType") == "application/json":
        # d2019 §8.5: contentSchema only applies alongside contentMediaType;
        # JSON is the one media type whose decoded form we can re-validate
        kw["content_schema"] = _sub(s["contentSchema"], root, depth + 1, ref_stack, doc_root)
    if "disallow" in s:                    # d3 §5.25: type name | schema | list
        dv = s["disallow"]
        if not isinstance(dv, list):
            dv = [dv]
        kw["disallow"] = tuple(
            x if isinstance(x, str) else _sub(x, root, depth + 1, ref_stack, doc_root) for x in dv
        )
    if "format" in s:
        kw["format"] = s["format"]

    return SpecNode(**kw)
