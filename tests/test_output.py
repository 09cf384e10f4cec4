"""Standard output formats (draft-2019 §10) over the E1 evaluator.

Pure Python — no Spark fixture. Pins the keywordLocation threading in
local._eval (applicator segments, dynamic paths) and the flag/basic/
detailed structures in jsonschema_spark.output."""

import json

from jsonschema_spark.local import validate
from jsonschema_spark.output import output, output_json


def kloc_map(doc, schema):
    return {(v.keyword, v.path): v.kloc for v in validate(doc, schema)}


class TestKeywordLocation:
    def test_root_keyword(self):
        assert kloc_map(3, {"minimum": 5}) == {("minimum", ""): "/minimum"}

    def test_property_nesting(self):
        m = kloc_map({"a": {"b": "x"}},
                     {"properties": {"a": {"properties": {
                         "b": {"minLength": 3}}}}})
        assert m == {("minLength", "/a/b"):
                     "/properties/a/properties/b/minLength"}

    def test_items_and_tuple(self):
        m = kloc_map([1, "x"], {"items": {"type": "integer"}})
        assert m == {("type", "/1"): "/items/type"}
        m = kloc_map(["x"], {"items": [{"type": "integer"}]})
        assert m == {("type", "/0"): "/items/0/type"}

    def test_allof_indexed(self):
        m = kloc_map(3, {"allOf": [{"minimum": 10}, {"multipleOf": 2}]})
        assert m == {("minimum", ""): "/allOf/0/minimum",
                     ("multipleOf", ""): "/allOf/1/multipleOf"}

    def test_combinator_reported_at_its_own_location(self):
        m = kloc_map("x", {"properties": {}, "anyOf": [{"type": "integer"}]})
        assert m == {("anyOf", ""): "/anyOf"}

    def test_required_location(self):
        m = kloc_map({}, {"required": ["a"]})
        assert m == {("required", "/a"): "/required"}

    def test_additional_properties_location(self):
        m = kloc_map({"a": 1, "b": 2},
                     {"properties": {"a": {}}, "additionalProperties": False})
        assert m == {("additionalProperties", "/b"): "/additionalProperties"}

    def test_pattern_properties_location(self):
        m = kloc_map({"xa": "q"},
                     {"patternProperties": {"^x": {"type": "integer"}}})
        assert m == {("type", "/xa"): "/patternProperties/^x/type"}

    def test_dependencies_location_names_trigger(self):
        m = kloc_map({"a": 1},
                     {"dependencies": {"a": ["b"]}})
        assert m == {("dependencies", "/b"): "/dependencies/a"}

    def test_default_kloc_empty_for_untracked_callers(self):
        # Violation's 3-field reference shape is intact: as_tuple and
        # equality by (keyword, path, value) still work for old callers.
        v = validate(3, {"minimum": 5})[0]
        assert v.as_tuple() == ("minimum", "", 3)


class TestOutputFormats:
    SCHEMA = {"properties": {"a": {"minimum": 5},
                             "b": {"properties": {"c": {"type": "string"}}}},
              "required": ["d"]}
    DOC = {"a": 1, "b": {"c": 2}}

    def test_flag(self):
        assert output(self.DOC, self.SCHEMA, "flag") == {"valid": False}
        assert output({"a": 9, "d": 0}, self.SCHEMA, "flag") == {"valid": True}

    def test_valid_instance_all_formats(self):
        for fmt in ("flag", "basic", "detailed"):
            assert output({"a": 9, "d": 0}, self.SCHEMA, fmt) == {"valid": True}

    def test_basic_units(self):
        out = output(self.DOC, self.SCHEMA, "basic")
        assert out["valid"] is False
        locs = {(u["keywordLocation"], u["instanceLocation"])
                for u in out["errors"]}
        assert locs == {("/properties/a/minimum", "/a"),
                        ("/properties/b/properties/c/type", "/b/c"),
                        ("/required", "/d")}
        assert all(u["valid"] is False and u["error"] for u in out["errors"])

    def test_single_error_detailed_is_the_leaf(self):
        out = output(3, {"minimum": 5}, "detailed")
        assert out == {"valid": False, "keywordLocation": "/minimum",
                       "instanceLocation": "",
                       "error": "value is less than the minimum"}

    def test_detailed_nests_under_common_prefix(self):
        schema = {"properties": {"a": {"allOf": [{"minimum": 10},
                                                 {"multipleOf": 7}]}}}
        out = output({"a": 3}, schema, "detailed")
        assert out["keywordLocation"] == "/properties/a/allOf"
        assert out["instanceLocation"] == "/a"
        kids = {u["keywordLocation"] for u in out["errors"]}
        assert kids == {"/properties/a/allOf/0/minimum",
                        "/properties/a/allOf/1/multipleOf"}

    def test_detailed_branch_point_at_root(self):
        out = output(self.DOC, self.SCHEMA, "detailed")
        assert out["keywordLocation"] == ""
        assert out["instanceLocation"] == ""
        # root branches into the /properties container (2 leaves) and the
        # /required leaf — single-child chains collapse, branch points stay
        assert len(out["errors"]) == 2
        props = next(u for u in out["errors"]
                     if u["keywordLocation"] == "/properties")
        assert {x["keywordLocation"] for x in props["errors"]} == {
            "/properties/a/minimum", "/properties/b/properties/c/type"}
        req = next(u for u in out["errors"]
                   if u["keywordLocation"] == "/required")
        assert req["instanceLocation"] == "/d"

    def test_output_json_round_trips(self):
        s = output_json(self.DOC, self.SCHEMA, "basic")
        assert json.loads(s)["valid"] is False

    def test_unsupported_format_raises(self):
        try:
            output({}, {}, "verbose")
        except ValueError as e:
            assert "verbose" in str(e)
        else:
            raise AssertionError("expected ValueError")
