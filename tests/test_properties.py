"""Property-based compiler checks (hypothesis).

The reference's suite is example-based (SURVEY §5); these properties
cross-check the Spark rule compiler against an INDEPENDENT pure-Python
interpreter of the same documented semantics on randomized schemas and
data — a per-row mini-oracle that example tests and the DuckDB gate
can't provide. Batched: each example builds ONE DataFrame for all rows
and runs ONE validate, so examples cost one tiny Spark job each.
"""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import zoi_spark as z

SET = settings(max_examples=8, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])


def _expected_int_rules(v, lo, hi):
    """Independent interpretation of integer gte/lte semantics
    (types/integer.ex:102-109): rules only fire on non-null values;
    all failures collected."""
    if v is None:
        return {"required"}
    out = set()
    if not (v >= lo):
        out.add("gte")
    if not (v <= hi):
        out.add("lte")
    return out


@SET
@given(
    lo=st.integers(-50, 50),
    span=st.integers(0, 60),
    values=st.lists(st.one_of(st.none(), st.integers(-120, 120)),
                    min_size=1, max_size=30),
)
def test_integer_range_rules_match_reference_semantics(spark, lo, span, values):
    hi = lo + span
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, v int")
    schema = z.fields({"id": z.integer(), "v": z.integer(gte=lo, lte=hi)})
    res = z.validate(df, schema, id_cols=["id"])
    got: dict[int, set] = {}
    for r in res.violations.collect():
        got.setdefault(r.id, set()).add(r.rule_id.split(".")[-1])
    for i, v in enumerate(values):
        assert got.get(i, set()) == _expected_int_rules(v, lo, hi), \
            f"value={v} bounds=({lo},{hi})"


def _expected_str_rules(v, mn, mx, prefix):
    if v is None:
        return {"required"}
    out = set()
    if not (len(v) >= mn):
        out.add("gte")
    if not (len(v) <= mx):
        out.add("lte")
    if not v.startswith(prefix):
        out.add("starts_with")
    return out


@SET
@given(
    mn=st.integers(0, 6),
    extra=st.integers(0, 8),
    prefix=st.text(alphabet="abxy", min_size=0, max_size=2),
    values=st.lists(
        st.one_of(st.none(), st.text(alphabet="abxy z", max_size=12)),
        min_size=1, max_size=25),
)
def test_string_rules_match_reference_semantics(spark, mn, extra, prefix, values):
    mx = mn + extra
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, v string")
    schema = z.fields({
        "id": z.integer(),
        "v": z.string(min=mn, max=mx).starts_with(prefix),
    })
    res = z.validate(df, schema, id_cols=["id"])
    got: dict[int, set] = {}
    for r in res.violations.collect():
        got.setdefault(r.id, set()).add(r.rule_id.split(".")[-1])
    for i, v in enumerate(values):
        assert got.get(i, set()) == _expected_str_rules(v, mn, mx, prefix), \
            f"value={v!r} len=({mn},{mx}) prefix={prefix!r}"


@SET
@given(values=st.lists(
    st.one_of(st.none(),
              st.from_regex(r"[+-]?[0-9]{1,6}", fullmatch=True),
              st.text(alphabet="0123456789abc.-+", max_size=8)),
    min_size=1, max_size=25))
def test_strict_integer_coercion_matches_reference(spark, values):
    """Guarded coerce (types/integer.ex:64-73): only strings fully
    matching ^[+-]?\\d+$ parse; anything else is an invalid_type —
    never a partial/lenient cast."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, v string")
    schema = z.fields({"id": z.integer(),
                       "v": z.integer(coerce=True).optional()})
    res = z.validate(df, schema, id_cols=["id"])
    bad = {r.id for r in res.violations.collect()}
    parsed = {r.id: r.asDict()["v"] for r in res.parsed.collect()}
    for i, v in enumerate(values):
        if v is None:
            assert i not in bad and parsed[i] is None
        elif re.fullmatch(r"[+-]?\d+", v):
            assert i not in bad and parsed[i] == int(v)
        else:
            assert i in bad and parsed[i] is None


@SET
@given(values=st.lists(st.lists(st.integers(0, 5), max_size=6),
                       min_size=1, max_size=15),
       mn=st.integers(0, 3))
def test_array_rules_match_reference_semantics(spark, values, mn):
    """Array min-size + unique_items (types/array.ex:127-135, 260-274)."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, v array<int>")
    schema = z.fields({
        "id": z.integer(),
        "v": z.array(z.integer(), min_length=mn, unique_items=True),
    })
    res = z.validate(df, schema, id_cols=["id"])
    got: dict[int, set] = {}
    for r in res.violations.collect():
        got.setdefault(r.id, set()).add(r.rule_id.split(".")[-1])
    for i, v in enumerate(values):
        exp = set()
        if not (len(v) >= mn):
            exp.add("gte")
        if len(set(v)) != len(v):
            exp.add("unique_items")
        assert got.get(i, set()) == exp, f"value={v} mn={mn}"


def test_canonical_url_idempotent_and_dialect_parity(spark):
    """canonical_url is idempotent, and the Spark expression agrees
    byte-for-byte with the DuckDB twin (canonical_url_sql) over an
    adversarial url pool — the contract that keeps the oracle honest."""
    import duckdb

    from pyspark.sql import functions as F
    from zoi_spark import urls

    pool = [
        "http://Example.COM/Path?a=1#frag",
        "HTTPS://HOST.example.org:443/x?utm_source=a&b=2",
        "http://h.co:80/",
        "http://h.co:8080/keep-port",
        "https://h.co/?utm_campaign=x",
        "http://h.co/p?ref=abc&x=1",
        "http://h.co/p?x=1&fbclid=zzz",
        "http://h.co/p?gclid=1&msclkid=2",
        "ftp://odd.scheme/UPPER",
        "not a url at all",
        "http://h.co/CaseSensitive/Path",
        "https://h.co",
        "http://h.co/p#a#b",
        "http://h.co/p?utm_a=1&utm_b=2&keep=3",
        # '$' and '\' are legal URL bytes (RFC 3986 sub-delims /
        # percent-encoding escapees in the wild) — regression for the
        # regexp_replace dynamic-replacement injection (ADVICE r3):
        # '$'+letter aborted the job, '$1' corrupted the canonical form
        "http://a$bad.com/x",
        "HTTP://A$1z.COM/P?utm_source=x",
        "http://back\\slash.com:80/P?a=$1",
        None,
    ]
    rng_rows = [(i, u) for i, u in enumerate(pool)]
    df = spark.createDataFrame(rng_rows, "i long, url string")
    once = urls.canonical_url(F.col("url"))
    got = df.select("i", once.alias("c1"),
                    urls.canonical_url(once).alias("c2")).collect()
    spark_c = {}
    for r in got:
        assert r.c1 == r.c2, f"not idempotent for {pool[r.i]!r}: {r.c1!r} -> {r.c2!r}"
        spark_c[r.i] = r.c1

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rng_rows)
    duck = dict(con.sql(
        f"SELECT i, {urls.canonical_url_sql('url')} FROM t").fetchall())
    for i, u in enumerate(pool):
        assert spark_c[i] == duck[i], \
            f"dialect drift for {u!r}: spark={spark_c[i]!r} duck={duck[i]!r}"


def _expected_chain_rules(v, mn_field, mn_eff):
    """Independent interpretation of the effect-gating contract
    (lib/zoi/context.ex:42-44 + types/string.ex:42-49): field
    constraints all collect; the chained post-transform check runs only
    when every field constraint passed, against the trimmed value; a
    node with any error parses to nil, else to the transformed value."""
    if v is None:
        return {"required"}, None
    rules = set()
    if not (len(v) >= mn_field):
        rules.add("gte")
        return rules, None              # effects skipped entirely
    if not (len(v.strip()) >= mn_eff):
        rules.add("gte#1")
        return rules, None
    return rules, v.strip()


@SET
@given(
    mn_field=st.integers(0, 8),
    mn_eff=st.integers(0, 8),
    values=st.lists(
        st.one_of(st.none(),
                  st.text(alphabet="ab ", min_size=0, max_size=12)),
        min_size=1, max_size=20),
)
def test_effect_gating_matches_reference_semantics(spark, mn_field, mn_eff,
                                                   values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, v string")
    schema = z.fields({"id": z.integer(),
                       "v": z.string(min=mn_field).trim().gte(mn_eff)})
    res = z.validate(df, schema, id_cols=["id"])
    got: dict[int, set] = {}
    for r in res.violations.collect():
        got.setdefault(r.id, set()).add(
            r.rule_id.split(".", 1)[1])
    parsed = {r[0]: r[1] for r in res.parsed
              .toDF("key", "id", "v").select("key", "v").collect()}
    for i, v in enumerate(values):
        want_rules, want_parsed = _expected_chain_rules(v, mn_field, mn_eff)
        assert got.get(i, set()) == want_rules, \
            f"v={v!r} mn={mn_field} eff={mn_eff}"
        assert parsed[i] == want_parsed, \
            f"parsed v={v!r} mn={mn_field} eff={mn_eff}: {parsed[i]!r}"
