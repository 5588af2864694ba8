"""Fixture-ported unit tests: scalar types, constraints, coercion.

Each case mirrors an ExUnit fixture from the reference's
``test/zoi_test.exs`` (cited per test) — same input, same expected
(code, message, path) — evaluated through the Spark rule compiler on a
tiny DataFrame (SURVEY §5 engine test plan, item 1).
"""

import pytest
from pyspark.sql import Row

import zoi_spark as z


def run_one(spark, schema_fields, rows, id_col="id"):
    """rows: list of dicts; returns (violations list-of-dicts keyed by id,
    parsed rows keyed by id)."""
    df = spark.createDataFrame(rows)
    res = z.validate(df, z.fields(schema_fields), id_cols=[id_col])
    viols = [r.asDict() for r in res.violations.collect()]
    parsed = {r[id_col]: r.asDict() for r in res.parsed.collect()}
    return viols, parsed


# --- string (zoi_test.exs "string/1" :54-182) ------------------------------

def test_string_min_max(spark):
    rows = [
        {"id": 1, "name": "ab"},
        {"id": 2, "name": "a"},
        {"id": 3, "name": "x" * 10},
    ]
    viols, parsed = run_one(
        spark, {"id": z.integer(), "name": z.string(min=2, max=5)}, rows)
    by_id = {v["id"]: v for v in viols}
    assert 1 not in by_id
    assert by_id[2]["code"] == "greater_than_or_equal_to"
    assert by_id[2]["message"] == "too small: must have at least 2 character(s)"
    assert by_id[2]["path"] == ["name"]
    assert by_id[3]["code"] == "less_than_or_equal_to"
    assert by_id[3]["message"] == "too big: must have at most 5 character(s)"


def test_string_exact_length(spark):
    # zoi_test.exs length/3: "invalid length: must have N character(s)"
    viols, _ = run_one(
        spark, {"id": z.integer(), "code": z.string().length(3)},
        [{"id": 1, "code": "abc"}, {"id": 2, "code": "ab"}])
    assert len(viols) == 1
    assert viols[0]["code"] == "invalid_length"
    assert viols[0]["message"] == "invalid length: must have 3 character(s)"


def test_string_collects_all_errors(spark):
    # collect-all semantics (lib/zoi/validations.ex:10-28): min + regex
    # both reported for the same value
    viols, _ = run_one(
        spark,
        {"id": z.integer(), "v": z.string(min=5).regex("^[a-z]+$")},
        [{"id": 1, "v": "AB"}])
    codes = sorted(v["code"] for v in viols)
    assert codes == ["greater_than_or_equal_to", "invalid_format"]


def test_required_vs_optional(spark):
    # map fields required by default (types/map.ex:13-29)
    rows = [{"id": 1, "a": "x", "b": "y"}, {"id": 2, "a": None, "b": None}]
    viols, _ = run_one(
        spark, {"id": z.integer(), "a": z.string(), "b": z.string().optional()},
        rows)
    assert len(viols) == 1
    v = viols[0]
    assert (v["id"], v["code"], v["message"]) == (2, "required", "is required")
    assert v["path"] == ["a"]


def test_default_fills_null(spark):
    viols, parsed = run_one(
        spark,
        {"id": z.integer(), "role": z.string().with_default("user")},
        [{"id": 1, "role": None}, {"id": 2, "role": "admin"}])
    assert viols == []
    assert parsed[1]["role"] == "user"
    assert parsed[2]["role"] == "admin"


# --- integer (zoi_test.exs "integer/1" :183-212) ---------------------------

def test_integer_bounds_and_messages(spark):
    viols, _ = run_one(
        spark,
        {"id": z.integer(), "age": z.integer(gte=18, lte=120)},
        [{"id": 1, "age": 42}, {"id": 2, "age": 3}, {"id": 3, "age": 200}])
    by_id = {v["id"]: v for v in viols}
    assert by_id[2]["message"] == "too small: must be at least 18"
    assert by_id[3]["message"] == "too big: must be at most 120"


def test_integer_coerce_rejects_trailing_garbage(spark):
    # Integer.parse rejects "42x" (types/integer.ex:64-73); Spark's
    # lenient cast is regex-guarded
    viols, parsed = run_one(
        spark,
        {"id": z.integer(), "n": z.integer(coerce=True)},
        [{"id": 1, "n": "42"}, {"id": 2, "n": "42x"}, {"id": 3, "n": "-7"}])
    assert len(viols) == 1
    assert viols[0]["id"] == 2
    assert viols[0]["code"] == "invalid_type"
    assert viols[0]["message"] == "invalid type: expected integer"
    assert parsed[1]["n"] == 42 and parsed[3]["n"] == -7


def test_integer_without_coerce_rejects_strings(spark):
    viols, _ = run_one(
        spark, {"id": z.integer(), "n": z.integer()},
        [{"id": 1, "n": "42"}])
    assert viols[0]["code"] == "invalid_type"


def test_multiple_of_int(spark):
    viols, _ = run_one(
        spark, {"id": z.integer(), "n": z.integer(multiple_of=5)},
        [{"id": 1, "n": 10}, {"id": 2, "n": 7}])
    assert len(viols) == 1
    assert viols[0]["message"] == "must be a multiple of 5"


# --- float / number (zoi_test.exs :213-322) --------------------------------

def test_float_rejects_int_column(spark):
    # float/1 accepts only floats (types/float.ex:64-73)
    viols, _ = run_one(
        spark, {"id": z.integer(), "x": z.float_()},
        [{"id": 1, "x": 3}])
    assert viols[0]["message"] == "invalid type: expected float"


def test_float_positive_multiple(spark):
    viols, _ = run_one(
        spark,
        {"id": z.integer(), "score": z.float_().positive().multiple_of(0.5)},
        [{"id": 1, "score": 2.5}, {"id": 2, "score": -1.0},
         {"id": 3, "score": 0.3}])
    by_id = {}
    for v in viols:
        by_id.setdefault(v["id"], []).append(v)
    assert 1 not in by_id
    assert by_id[2][0]["message"] == "too small: must be greater than 0"
    assert by_id[3][0]["message"] == "must be a multiple of 0.5"


def test_number_accepts_int_and_float_columns(spark):
    viols, _ = run_one(
        spark, {"id": z.integer(), "x": z.number(gte=0)},
        [{"id": 1, "x": 5}])
    assert viols == []
    viols, _ = run_one(
        spark, {"id": z.integer(), "x": z.number(gte=0)},
        [{"id": 1, "x": 5.5}, {"id": 2, "x": -0.1}])
    assert len(viols) == 1 and viols[0]["id"] == 2


# --- boolean / string_boolean (zoi_test.exs :323-355) ----------------------

def test_boolean_coerce_strict(spark):
    viols, parsed = run_one(
        spark, {"id": z.integer(), "b": z.boolean(coerce=True)},
        [{"id": 1, "b": "true"}, {"id": 2, "b": "false"}, {"id": 3, "b": "TRUE"}])
    assert len(viols) == 1 and viols[0]["id"] == 3
    assert viols[0]["message"] == "invalid type: expected boolean"
    assert parsed[1]["b"] is True and parsed[2]["b"] is False


def test_string_boolean_insensitive(spark):
    viols, parsed = run_one(
        spark, {"id": z.integer(), "b": z.string_boolean()},
        [{"id": 1, "b": "YES"}, {"id": 2, "b": "off"}, {"id": 3, "b": "maybe"}])
    assert len(viols) == 1 and viols[0]["id"] == 3
    assert viols[0]["message"] == "invalid type: expected string boolean"
    assert parsed[1]["b"] is True and parsed[2]["b"] is False


# --- literal / enum (zoi_test.exs :918-, "enum/2" :2972-3059) --------------

def test_literal(spark):
    viols, _ = run_one(
        spark, {"id": z.integer(), "v": z.literal("cat")},
        [{"id": 1, "v": "cat"}, {"id": 2, "v": "dog"}])
    assert len(viols) == 1
    assert viols[0]["code"] == "invalid_literal"
    assert viols[0]["message"] == "invalid literal: expected cat"


def test_enum_membership_and_message(spark):
    viols, _ = run_one(
        spark, {"id": z.integer(), "role": z.enum(["admin", "user"])},
        [{"id": 1, "role": "admin"}, {"id": 2, "role": "root"}])
    assert len(viols) == 1
    assert viols[0]["code"] == "invalid_enum_value"
    assert viols[0]["message"] == "invalid enum value: expected one of admin, user"


def test_enum_kv_remap(spark):
    # kv-pairs map value→key on parse (types/enum.ex:53-66)
    viols, parsed = run_one(
        spark, {"id": z.integer(), "role": z.enum({"a": "admin", "u": "user"})},
        [{"id": 1, "role": "admin"}, {"id": 2, "role": "user"}])
    assert viols == []
    assert parsed[1]["role"] == "a" and parsed[2]["role"] == "u"


def test_one_of(spark):
    viols, _ = run_one(
        spark, {"id": z.integer(), "c": z.string().one_of(["red", "green"])},
        [{"id": 1, "c": "blue"}])
    assert viols[0]["code"] == "not_in_values"
    assert viols[0]["message"] == "invalid value: expected one of red, green"


# --- custom error override (lib/zoi/error.ex:183-197) ----------------------

def test_error_override_flips_code_to_custom(spark):
    viols, _ = run_one(
        spark,
        {"id": z.integer(), "v": z.string().gte(5, error="way too short")},
        [{"id": 1, "v": "ab"}])
    assert viols[0]["code"] == "custom"
    assert viols[0]["message"] == "way too short"


def test_grapheme_length_mode(spark):
    """length_mode='grapheme': rules measure extended grapheme clusters
    (combining marks, flags, emoji-ZWJ) while default mode counts
    codepoints; mode inside arrays is rejected."""
    from zoi_spark.text import _grapheme_count_py

    assert _grapheme_count_py("u\u0301n\u0301o\u0301") == 3          # combining accents
    assert _grapheme_count_py("\U0001F1FA\U0001F1F8") == 1    # flag pair
    assert _grapheme_count_py("\U0001F468\u200d\U0001F469") == 1  # emoji ZWJ
    assert _grapheme_count_py("abc\u200ddef") == 6  # ZWJ between letters
    assert _grapheme_count_py(None) is None

    df = spark.createDataFrame([(1, "u\u0301n\u0301o\u0301"), (2, "hello!")],
                               "id long, s string")
    g = z.validate(df, z.fields({
        "id": z.integer(),
        "s": z.string(min=4, length_mode="grapheme")}), ["id"])
    assert {r.id for r in g.violations.collect()} == {1}
    c = z.validate(df, z.fields({
        "id": z.integer(), "s": z.string(min=4)}), ["id"])
    assert c.violations.count() == 0               # 6 codepoints each

    with pytest.raises(ValueError):
        z.string(length_mode="bogus")
    with pytest.raises(NotImplementedError):
        z.validate(spark.createDataFrame([(1, [["x"]])],
                                         "id long, a array<array<string>>"),
                   z.fields({"id": z.integer(),
                             "a": z.array(z.array(z.string(
                                 min=1, length_mode="grapheme")))}), ["id"])
