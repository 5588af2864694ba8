"""Nesting & combinators: array element paths, nested structs, union /
intersection / discriminated-union dispatch, tuple, map k/v, defaults.

Ports the corresponding ExUnit shapes (zoi_test.exs "array/2" :2521,
"map/2" :1371, "union/2" :815, "discriminated_union/3" :1024,
"tuple/2" :1864) onto DataFrame columns.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as ST

import zoi_spark as z


def run(spark, schema, rows, ddl=None, id_col="id"):
    df = spark.createDataFrame(rows, schema=ddl) if ddl else spark.createDataFrame(rows)
    res = z.validate(df, schema, id_cols=[id_col])
    viols = [r.asDict() for r in res.violations.collect()]
    parsed = {r[id_col]: r.asDict() for r in res.parsed.collect()}
    return viols, parsed


# --- arrays (types/array.ex:54-80, element index paths) --------------------

def test_array_element_errors_carry_index_path(spark):
    schema = z.fields({"id": z.integer(), "tags": z.array(z.string(min=2))})
    viols, _ = run(spark, schema,
                   [{"id": 1, "tags": ["ok", "x", "fine", "y"]}])
    paths = sorted(v["path"] for v in viols)
    assert paths == [["tags", "1"], ["tags", "3"]]
    assert all(v["message"] == "too small: must have at least 2 character(s)"
               for v in viols)


def test_array_level_constraints(spark):
    schema = z.fields({
        "id": z.integer(),
        "tags": z.array(z.string(), min_length=1, max_length=3, unique_items=True),
    })
    viols, _ = run(spark, schema, [
        {"id": 1, "tags": []},
        {"id": 2, "tags": ["a", "b", "c", "d"]},
        {"id": 3, "tags": ["a", "a"]},
        {"id": 4, "tags": ["a", "b"]},
    ])
    by_id = {v["id"]: v for v in viols}
    assert by_id[1]["message"] == "too small: must have at least 1 item(s)"
    assert by_id[2]["message"] == "too big: must have at most 3 item(s)"
    assert by_id[3]["message"] == "must contain unique items"
    assert by_id[3]["code"] == "not_unique"
    assert 4 not in by_id


def test_array_transform_elements(spark):
    schema = z.fields({"id": z.integer(),
                       "tags": z.array(z.string().to_upcase())})
    viols, parsed = run(spark, schema, [{"id": 1, "tags": ["ab", "cd"]}])
    assert viols == []
    assert parsed[1]["tags"] == ["AB", "CD"]


# --- nested structs (zoi_test.exs:1490-1520) --------------------------------

def test_nested_struct_paths(spark):
    ddl = "id int, address struct<city:string, zip:string>"
    schema = z.fields({
        "id": z.integer(),
        "address": z.fields({"city": z.string(min=2), "zip": z.string()}),
    })
    viols, _ = run(spark, schema, [
        (1, ("x", None)),
        (2, ("berlin", "10115")),
        (3, None),
    ], ddl=ddl)
    key = {(v["id"], tuple(v["path"])): v for v in viols}
    assert key[(1, ("address", "city"))]["code"] == "greater_than_or_equal_to"
    assert key[(1, ("address", "zip"))]["code"] == "required"
    # whole struct null → required on the struct itself
    assert key[(3, ("address",))]["code"] == "required"
    assert (2, ("address", "city")) not in key


def test_unrecognized_keys_error_mode(spark):
    schema = z.fields({"id": z.integer()}, unrecognized="error")
    viols, _ = run(spark, schema, [{"id": 1, "extra": "x"}])
    assert viols[0]["code"] == "unrecognized_key"
    assert viols[0]["message"] == "unrecognized key: extra"


# --- union (types/union.ex:23-37) -------------------------------------------

def test_union_first_match_wins_and_last_error(spark):
    schema = z.fields({
        "id": z.integer(),
        "v": z.union([z.string().length(3), z.string().starts_with("x")]),
    })
    viols, _ = run(spark, schema, [
        {"id": 1, "v": "abc"},   # matches branch 1
        {"id": 2, "v": "xlong"}, # matches branch 2
        {"id": 3, "v": "nope"},  # fails both → LAST branch's error
    ])
    assert len(viols) == 1
    assert viols[0]["id"] == 3
    assert viols[0]["message"] == "invalid format: must start with 'x'"


def test_union_coercion_branches(spark):
    # ordered fallback casting (SURVEY §2.6): int-string else bool-string
    schema = z.fields({
        "id": z.integer(),
        "v": z.union([z.integer(coerce=True), z.boolean(coerce=True)]),
    })
    viols, parsed = run(spark, schema, [
        {"id": 1, "v": "42"},
        {"id": 2, "v": "true"},
        {"id": 3, "v": "zzz"},
    ])
    assert [v["id"] for v in viols] == [3]
    assert parsed[1]["v"] == "42" or parsed[1]["v"] == 42


def test_intersection_halts_on_first_failure(spark):
    schema = z.fields({
        "id": z.integer(),
        "v": z.intersection([z.string(min=3), z.string(max=5)]),
    })
    viols, _ = run(spark, schema, [
        {"id": 1, "v": "okay"},
        {"id": 2, "v": "x"},          # fails first → only first error
        {"id": 3, "v": "toolongname"} # passes first, fails second
    ])
    by_id = {}
    for v in viols:
        by_id.setdefault(v["id"], []).append(v["message"])
    assert by_id[2] == ["too small: must have at least 3 character(s)"]
    assert by_id[3] == ["too big: must have at most 5 character(s)"]


# --- discriminated union (types/discriminated_union.ex) --------------------

def test_discriminated_union_dispatch(spark):
    ddl = "id int, pet struct<type:string, meow:string, bark:string>"
    schema = z.fields({
        "id": z.integer(),
        "pet": z.discriminated_union("type", [
            z.fields({"type": z.literal("cat"), "meow": z.string(),
                      "bark": z.string().optional()}),
            z.fields({"type": z.literal("dog"), "bark": z.string(),
                      "meow": z.string().optional()}),
        ]),
    })
    viols, _ = run(spark, schema, [
        (1, ("cat", "loud", None)),
        (2, ("dog", None, "woof")),
        (3, ("dog", None, None)),      # dog missing bark
        (4, ("fish", None, None)),     # unknown discriminator
    ], ddl=ddl)
    key = {(v["id"]): v for v in viols}
    assert key[3]["code"] == "required"
    assert key[3]["path"] == ["pet", "bark"]
    assert key[4]["code"] == "custom"
    assert key[4]["message"] == "unknown discriminator 'fish' for field 'type'"
    assert 1 not in key and 2 not in key


def test_discriminated_union_duplicate_rejected():
    with pytest.raises(ValueError, match="duplicate discriminator"):
        z.discriminated_union("t", [
            z.fields({"t": z.literal("a")}),
            z.fields({"t": z.literal("a")}),
        ])


# --- tuple (types/tuple.ex) -------------------------------------------------

def test_tuple_positional_fields(spark):
    ddl = "id int, pair struct<f0:string, f1:int>"
    schema = z.fields({
        "id": z.integer(),
        "pair": z.tuple_([z.string(min=2), z.integer(gte=0)]),
    })
    viols, _ = run(spark, schema, [
        (1, ("ok", 5)),
        (2, ("x", -1)),
    ], ddl=ddl)
    got = sorted((v["id"], tuple(v["path"])) for v in viols)
    assert got == [(2, ("pair", "0")), (2, ("pair", "1"))]


def test_tuple_from_array_length_mismatch(spark):
    ddl = "id int, pair array<string>"
    schema = z.fields({"id": z.integer(),
                       "pair": z.tuple_([z.string(), z.string()])})
    viols, _ = run(spark, schema, [(1, ["a"]), (2, ["a", "b"])], ddl=ddl)
    assert len(viols) == 1
    assert viols[0]["code"] == "invalid_tuple"
    assert viols[0]["message"] == "invalid tuple: expected length 2, got 1"


# --- map k/v (types/map.ex:63-86) -------------------------------------------

def test_map_kv_per_entry_paths(spark):
    ddl = "id int, attrs map<string,int>"
    schema = z.fields({
        "id": z.integer(),
        "attrs": z.map_kv(z.string(min=2), z.integer(gte=0)),
    })
    viols, _ = run(spark, schema, [
        (1, {"ok": 1, "x": 2, "fine": -5}),
    ], ddl=ddl)
    got = sorted((tuple(v["path"]), v["code"]) for v in viols)
    assert (("attrs", "x"), "greater_than_or_equal_to") in got
    assert (("attrs", "fine"), "greater_than_or_equal_to") in got
    assert len(got) == 2


# --- nullable / nullish / defaults ------------------------------------------

def test_nullable_passes_null(spark):
    schema = z.fields({"id": z.integer(),
                       "v": z.string(min=2).as_nullable()})
    viols, parsed = run(spark, schema, [(1, None), (2, "x")],
                        ddl="id int, v string")
    assert [(v["id"], v["code"]) for v in viols] == \
        [(2, "greater_than_or_equal_to")]
    assert parsed[1]["v"] is None


def test_schema_algebra_extend_pick_omit(spark):
    base = z.fields({"a": z.string(), "b": z.integer()})
    ext = z.extend(base, {"c": z.boolean()})
    assert set(ext.params["fields"]) == {"a", "b", "c"}
    assert set(z.pick(ext, ["a", "c"]).params["fields"]) == {"a", "c"}
    assert set(z.omit(ext, ["a"]).params["fields"]) == {"b", "c"}


def test_coerce_all_traverse(spark):
    s = z.fields({"n": z.integer(), "inner": z.fields({"m": z.integer()})})
    c = z.coerce_all(s)
    assert c.params["fields"]["n"].coerce is True
    assert c.params["fields"]["inner"].params["fields"]["m"].coerce is True


# --- unrecognized_keys {:preserve, schemas} (key_value.ex:104-129, 186-196) --

def test_unrecognized_preserve_schemas_valid_values(spark):
    """zoi_test.exs:1653-1668: extra keys validated through
    map(key_schema, value_schema) and preserved when valid."""
    schema = z.fields({"name": z.string()},
                      unrecognized=("preserve", z.any_(), z.integer()))
    viols, parsed = run(
        spark, z.fields({"id": z.integer(), "rec": schema}),
        [(1, ("John", 123, 456))],
        ddl="id int, rec struct<name string, extra int, another int>")
    assert viols == []
    assert parsed[1]["rec"]["extra"] == 123
    assert parsed[1]["rec"]["another"] == 456


def test_unrecognized_preserve_schemas_invalid_value(spark):
    schema = z.fields({"name": z.string()},
                      unrecognized=("preserve", z.any_(), z.integer()))
    viols, _ = run(
        spark, z.fields({"id": z.integer(), "rec": schema}),
        [(1, ("John", "not an integer"))],
        ddl="id int, rec struct<name string, extra string>")
    assert [(v["code"], tuple(v["path"])) for v in viols] == \
        [("invalid_type", ("rec", "extra"))]


def test_unrecognized_preserve_schemas_key_schema(spark):
    """zoi_test.exs:1670-1685 analogue: the key schema validates the
    (static) extra column names — a too-short key fails min(6)."""
    schema = z.fields({"name": z.string()},
                      unrecognized=("preserve", z.string(min=6), z.integer()))
    viols, _ = run(
        spark, z.fields({"id": z.integer(), "rec": schema}),
        [(1, ("John", 1, 2))],
        ddl="id int, rec struct<name string, ok_length int, x int>")
    assert [(v["code"], tuple(v["path"])) for v in viols] == \
        [("greater_than_or_equal_to", ("rec", "x"))]


def test_unrecognized_mode_validation():
    with pytest.raises(ValueError):
        z.fields({"a": z.string()}, unrecognized="bogus")
    with pytest.raises(ValueError):
        z.fields({"a": z.string()}, unrecognized=("preserve", z.string()))


# --- per-schema empty_values (key_value.ex:82-84) ----------------------------

def test_fields_empty_values_required(spark):
    """zoi_test.exs:1706-1729: a value in empty_values behaves as
    MISSING → required error for required fields."""
    schema = z.fields({"name": z.string(), "age": z.integer()},
                      empty_values=("",))
    viols, _ = run(spark, z.fields({"id": z.integer(), "rec": schema}),
                   [(1, ("", 30)), (2, ("John", 31))],
                   ddl="id int, rec struct<name string, age int>")
    assert [(v["id"], v["code"], tuple(v["path"])) for v in viols] == \
        [(1, "required", ("rec", "name"))]


def test_fields_empty_values_default_and_optional(spark):
    schema = z.fields({
        "name": z.string().with_default("anon"),
        "nick": z.string().optional(),
    }, empty_values=("", "n/a"))
    viols, parsed = run(spark, z.fields({"id": z.integer(), "rec": schema}),
                        [(1, ("", "n/a"))],
                        ddl="id int, rec struct<name string, nick string>")
    assert viols == []
    assert parsed[1]["rec"]["name"] == "anon"
    assert parsed[1]["rec"]["nick"] is None


def test_empty_values_type_scoped(spark):
    """'' entries must not break numeric columns; numeric sentinels
    apply to numeric columns only."""
    schema = z.fields({"age": z.integer()}, empty_values=("", -1))
    viols, parsed = run(spark, z.fields({"id": z.integer(), "rec": schema}),
                        [(1, (-1,)), (2, (30,))],
                        ddl="id int, rec struct<age int>")
    assert [(v["id"], v["code"]) for v in viols] == [(1, "required")]
    assert parsed[2]["rec"]["age"] == 30


# --- context-style refine: multiple errors (lib/zoi.ex:3120-3143) ------------

def test_refine_ctx_multiple_errors_pandas(spark):
    """zoi_test.exs:4513-4540: one refinement emits several errors."""
    def check(s):
        return s.map(lambda v: [] if v is None or len(v) > 5
                     else ["context error", "another error"])

    schema = z.fields({"id": z.integer(),
                       "name": z.string().refine_ctx(check)})
    viols, _ = run(spark, schema, [(1, "hello"), (2, "long enough")],
                   ddl="id int, name string")
    assert [(v["id"], v["code"], v["message"]) for v in viols] == \
        [(1, "custom", "context error"), (1, "custom", "another error")]


def test_refine_ctx_expr_engine(spark):
    from pyspark.sql import functions as F

    def check(col):
        return F.when(F.length(col) <= 3,
                      F.array(F.concat(F.lit("too short: "), col),
                              F.lit("second error"))
                      ).otherwise(F.array().cast("array<string>"))

    schema = z.fields({"id": z.integer(),
                       "name": z.string().refine_ctx(check, engine="expr")})
    viols, _ = run(spark, schema, [(1, "abc"), (2, "abcdef")],
                   ddl="id int, name string")
    assert [(v["id"], v["message"]) for v in viols] == \
        [(1, "too short: abc"), (1, "second error")]


def test_fields_level_cross_field_refine(spark):
    """Zoi map |> refine parity: node-level refinements on a fields
    schema run over the PARSED struct (cross-field rules); chain order
    holds through a struct transform; non-expr engines are rejected."""
    df = spark.createDataFrame(
        [(1, 2, 10), (2, 8, 5), (3, 1, 1)], "id long, a long, b long")
    schema = z.fields({
        "id": z.integer(), "a": z.integer(), "b": z.integer(),
    }).refine(lambda s: s.getField("a") <= s.getField("b"),
              error="a must not exceed b", engine="expr")
    res = z.validate(df, schema, ["id"])
    bad = {r.id: r.message for r in res.violations.collect()}
    assert bad == {2: "a must not exceed b"}

    # nested fields node: same machinery one level down
    nested = spark.createDataFrame(
        [(1, (2, 10)), (2, (8, 5))], "id long, p struct<a:long,b:long>")
    nschema = z.fields({
        "id": z.integer(),
        "p": z.fields({"a": z.integer(), "b": z.integer()})
             .refine(lambda s: s.getField("a") <= s.getField("b"),
                     error="a>b", engine="expr"),
    })
    nbad = {r.id for r in z.validate(nested, nschema, ["id"])
            .violations.collect()}
    assert nbad == {2}

    # a CHILD error suppresses the cross-field refine (Context.parse
    # runs effects only when parse_type — incl. field parsing — was ok)
    gated = spark.createDataFrame([(1, 9, 5)], "id long, a long, b long")
    gschema = z.fields({
        "id": z.integer(), "a": z.integer(lte=3), "b": z.integer(),
    }).refine(lambda s: s.getField("a") <= s.getField("b"),
              error="a must not exceed b", engine="expr")
    grules = {r.rule_id for r in
              z.validate(gated, gschema, ["id"]).violations.collect()}
    assert grules == {"a.lte"}        # the refine never fires

    # non-expr engine on a fields node is a clear compile-time error
    with pytest.raises(NotImplementedError, match="engine='expr'"):
        z.validate(df, z.fields({"id": z.integer()})
                   .refine(lambda s: s, engine="pandas"), ["id"])


def test_combinator_level_refinements(spark):
    """Effects are universal (meta on every type): refine on a union /
    tuple runs over the parsed value, only when the combinator parse
    succeeded; array-level constraints are skipped entirely when an
    element erred (types/array.ex finalize_result)."""
    # union |> refine: parsed collapses to string across branches
    df = spark.createDataFrame([(1, "7"), (2, "abc"), (3, "12345")],
                               "id long, v string")
    u = z.union([z.integer(coerce=True), z.string(min=2)]) \
        .refine(lambda c: F.length(c) <= 3, error="too wide", engine="expr")
    res = z.validate(df, z.fields({"id": z.integer(), "v": u}), ["id"])
    bad = {r.id: r.message for r in res.violations.collect()}
    assert bad == {3: "too wide"}

    # tuple |> refine over the parsed struct
    t = spark.createDataFrame([(1, (1.0, 5.0)), (2, (9.0, 2.0))],
                              "id long, p struct<a:double,b:double>")
    ts = z.tuple_([z.float_(), z.float_()]).refine(
        lambda s: s.getField("a") <= s.getField("b"),
        error="not sorted", engine="expr")
    tbad = {r.id for r in z.validate(
        t, z.fields({"id": z.integer(), "p": ts}), ["id"])
        .violations.collect()}
    assert tbad == {2}

    # element error suppresses the array-level constraint
    a = spark.createDataFrame([(1, ["aa", ""]), (2, ["aa", "aa"])],
                              "id long, v array<string>")
    asch = z.fields({"id": z.integer(),
                     "v": z.array(z.string(min=1), unique_items=True)})
    rules = {}
    for r in z.validate(a, asch, ["id"]).violations.collect():
        rules.setdefault(r.id, set()).add(r.rule_id)
    assert rules[1] == {"v.*.gte"}           # element error only
    assert rules[2] == {"v.unique_items"}    # clean elements -> constraint
