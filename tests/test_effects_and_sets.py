"""Effect-chain ordering, map_set, lazy recursion, nullish, and the
remaining coercion edges of SURVEY §1.3/§2.4.

Reference semantics cited per test; the ordering contract is
lib/zoi/types/meta.ex:62-95 (effects run strictly in chain order) and
the doc diagram at lib/zoi.ex:128-144.
"""

import pytest
from pyspark.sql import functions as F

import zoi_spark as z


def _one(spark, value, schema_field, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return z.validate(df, z.fields({"v": schema_field}), id_cols=["v"])


def rule_ids(res):
    return {r.rule_id for r in res.violations.collect()}


def test_constraint_before_trim_sees_untrimmed(spark):
    """`string |> min(3) |> trim` validates the UNTRIMMED length
    (lib/zoi.ex:128-144 example; constraint stored as typed field runs
    before the effect chain)."""
    res = _one(spark, "  ab  ", z.string(min=3).trim())
    assert rule_ids(res) == set()          # 6 untrimmed chars >= 3
    parsed = res.annotated.select(F.col("__zoi_parsed.v")).collect()[0][0]
    assert parsed == "ab"                  # but the parsed value is trimmed


def test_constraint_after_trim_sees_trimmed(spark):
    """`string |> trim |> min(3)`: once the effect chain is non-empty,
    later constraints append as refine effects (lib/zoi.ex:2666-2672)
    and see the transformed value."""
    res = _one(spark, "  ab  ", z.string().trim().min(3))
    assert rule_ids(res) == {"v.gte"}      # 2 trimmed chars < 3


def test_transform_chain_order_upcase_then_check(spark):
    res_ok = _one(spark, "abc", z.string().to_upcase().regex("^[A-Z]+$"))
    assert rule_ids(res_ok) == set()
    res_bad = _one(spark, "abc", z.string().regex("^[A-Z]+$").to_upcase())
    assert rule_ids(res_bad) == {"v.regex"}


def test_map_set_dedupes_and_validates_elements(spark):
    """map_set = element-validated set; coerced from a list
    (types/map_set.ex:21-33 — MapSet.new dedupes silently) but
    duplicate items violate the set contract pre-coercion
    (unique_items → :not_unique, types/array.ex:260-274)."""
    df = spark.createDataFrame([(1, ["a", "b", "a"]), (2, ["a", "b"])],
                               "id bigint, v array<string>")
    res = z.validate(df, z.fields({"id": z.integer(),
                                   "v": z.map_set(z.string(min=1))},),
                     id_cols=["id"])
    bad = {r.id: r.rule_id for r in res.violations.collect()}
    assert bad == {1: "v.unique_items"}


def test_lazy_bounded_recursion(spark):
    """Recursive schema via bounded unrolling (SURVEY §7 hard parts):
    a category tree validated two levels deep; beyond max_depth values
    pass opaquely."""
    def category():
        return z.fields({
            "name": z.string(min=1),
            "child": z.lazy(category, max_depth=2).optional(),
        })

    df = spark.createDataFrame(
        [(1, ("ok", ("also-ok", None))), (2, ("", ("x", None)))],
        "id bigint, v struct<name:string, child:struct<name:string, child:string>>")
    res = z.validate(df, z.fields({"id": z.integer(), "v": category()}),
                     id_cols=["id"])
    bad = {(r.id, r.path_str) for r in res.violations.collect()}
    assert bad == {(2, "v.name")}          # empty name at depth 1 only


def test_nullish_is_optional_and_nullable(spark):
    """nullish = optional(nullable(inner)) (types/nullish.ex:5)."""
    df = spark.createDataFrame([(1, None), (2, "x")], "id bigint, v string")
    res = z.validate(df, z.fields({"id": z.integer(),
                                   "v": z.string(min=1).nullish()}),
                     id_cols=["id"])
    assert res.violations.count() == 0


def test_string_coerce_from_numeric_and_binary(spark):
    """string(coerce): to_string on numbers; UTF-8 decode on binaries
    (types/string.ex:51-57)."""
    df = spark.createDataFrame([(1, 42, bytearray(b"hi"))],
                               "id bigint, n bigint, b binary")
    res = z.validate(df, z.fields({
        "id": z.integer(),
        "n": z.string(coerce=True),
        "b": z.string(coerce=True, min=2),
    }), id_cols=["id"])
    assert res.violations.count() == 0
    row = res.annotated.select("__zoi_parsed.n", "__zoi_parsed.b").collect()[0]
    assert row[0] == "42" and row[1] == "hi"


def test_naive_datetime_from_gregorian_seconds(spark):
    """naive_datetime coerce from integer = gregorian seconds from year
    0 (types/naive_datetime.ex:67-81), NOT unix seconds."""
    greg = 63_113_904_000          # 2000-01-01 00:00:00 in gregorian secs
    df = spark.createDataFrame([(1, greg)], "id bigint, v bigint")
    res = z.validate(df, z.fields({"id": z.integer(),
                                   "v": z.naive_datetime(coerce=True)}),
                     id_cols=["id"])
    assert res.violations.count() == 0
    parsed = res.annotated.select(F.col("__zoi_parsed.v")).collect()[0][0]
    assert parsed.year == 2000 and parsed.month == 1 and parsed.day == 1


def test_default_skips_effects(spark):
    """nil → default short-circuits the effect chain
    (types/default.ex:16-18): the default value is NOT transformed."""
    df = spark.createDataFrame([(1, None), (2, "x")], "id bigint, v string")
    res = z.validate(df, z.fields({
        "id": z.integer(),
        "v": z.string().to_upcase().with_default("keep-lower"),
    }), id_cols=["id"])
    assert res.violations.count() == 0
    vals = {r.id: r.v for r in
            res.annotated.select("id", F.col("__zoi_parsed.v").alias("v"))
            .collect()}
    assert vals == {1: "keep-lower", 2: "X"}


def test_effects_skipped_after_field_constraint_failure(spark):
    """Context.parse runs effects only when parse_type succeeded — and
    parse_type INCLUDES field constraints (lib/zoi/context.ex:42-44,
    types/string.ex:42-49, test/zoi_test.exs:107-115): a min_length
    failure suppresses the chained post-transform check entirely."""
    schema = z.string(min=6).trim().gte(5)
    res = _one(spark, "abc", schema)          # raw 3 < 6 AND trimmed 3 < 5
    assert rule_ids(res) == {"v.gte"}         # only the FIELD constraint
    res2 = _one(spark, "  ab  ", schema)      # raw 6 ok, trimmed 2 < 5
    assert rule_ids(res2) == {"v.gte#1"}      # only the chained check


def test_parsed_is_nil_for_erring_nodes(spark):
    """A node that produced any error parses to nil (meta.ex:90-95
    `%{ctx | parsed: nil}`); sibling fields keep their values (the
    partial map output, context.ex:73-74)."""
    df = spark.createDataFrame([(1, "ok", 5), (2, "ok", -3), (3, "x", 5)],
                               "id long, s string, n long")
    schema = z.fields({"id": z.integer(),
                       "s": z.string(min=2),
                       "n": z.integer().non_negative()})
    res = z.validate(df, schema, ["id"])
    parsed = {r.id: (r.s, r.n) for r in res.parsed
              .toDF("key", "id", "s", "n").select("key", "s", "n")
              .withColumnRenamed("key", "id").collect()}
    assert parsed[1] == ("ok", 5)
    assert parsed[2] == ("ok", None)          # n failed -> nil; s kept
    assert parsed[3] == (None, 5)             # s failed -> nil; n kept


def test_register_kind_custom_type(spark):
    """Zoi.Type extension point (lib/zoi/type.ex:1-62): a registered
    kind plugs a type stage into the compiler; checks/meta/error
    collection compose on it like any built-in kind."""
    from pyspark.sql import types as T
    from zoi_spark import errors as E

    def even_int_stage(schema, col, itype):
        if isinstance(itype, (T.LongType, T.IntegerType)):
            ok = col % 2 == 0
            return (F.when(ok, col.cast("long")), ok,
                    E.invalid_type("even integer", error=schema.error),
                    T.LongType())
        if schema.coerce and isinstance(itype, T.StringType):
            ok = col.rlike("^-?[0-9]+$") & (col.cast("long") % 2 == 0)
            return (F.when(ok, col.cast("long")), ok,
                    E.invalid_type("even integer", error=schema.error),
                    T.LongType())
        return (F.lit(None).cast("long"), F.lit(False),
                E.invalid_type("even integer", error=schema.error),
                T.LongType())

    z.register_kind("even_int", even_int_stage)
    try:
        schema = z.fields({"n": z.custom("even_int").gte(0),
                           "m": z.coerce(z.custom("even_int")).optional()})
        df = spark.createDataFrame(
            [(1, 4, "10"), (2, 3, "11"), (3, -2, "x"), (4, 8, None)],
            "row_id long, n long, m string")
        res = z.validate(df, schema, id_cols=["row_id"])
        viol = {(r.row_id, r.rule_id) for r in
                res.violations.select("row_id", "rule_id").collect()}
        assert viol == {(2, "n.type"), (3, "n.gte"),
                        (2, "m.type"), (3, "m.type")}
        parsed = {r.row_id: (r.p.n, r.p.m)
                  for r in res.annotated.select(
                      "row_id", F.col("__zoi_parsed").alias("p")).collect()}
        assert parsed[1] == (4, 10)
        assert parsed[2] == (None, None)     # both fail their type stage
        assert parsed[3][1] is None          # 'x' not coercible
        assert parsed[4] == (8, None)        # optional m absent -> nil

        # guards: no shadowing built-ins, no silent re-registration,
        # unknown kinds fail at build time
        with pytest.raises(ValueError):
            z.register_kind("integer", even_int_stage)
        with pytest.raises(ValueError):
            z.register_kind("even_int", even_int_stage)
        z.register_kind("even_int", even_int_stage, replace=True)
        with pytest.raises(KeyError):
            z.custom("odd_int")
    finally:
        z.unregister_kind("even_int")
