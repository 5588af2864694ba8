"""Deterministic synthetic webtext generator (FIXTURES.md F1-F3).

Generates the BASELINE.json input_hint table shape — ``url:string,
warc_ts:timestamp, html:binary, text:string, lang:string`` — entirely
inside Spark (no driver-side row lists): ``spark.range(n)`` plus pure
Column expressions, so generation itself scales to any n. Seeded
violations (~2% per class) are tagged in ``expect_rule_ids`` for exact
oracle assertions. Everything derives from xxhash64 of the row id with
a fixed seed column — same rows for any partitioning or cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALLOWED_LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "pl", "ru", "ja"]
_BAD_LANGS = ["xx", "q1", "zz"]

_WORDS = [
    "the", "and", "of", "to", "data", "spark", "query", "table", "row",
    "value", "filter", "join", "scan", "hash", "sort", "merge", "batch",
    "stream", "window", "group", "page", "web", "crawl", "text", "index",
]


def _h(seed: int, *cols) -> F.Column:
    """Deterministic per-row hash stream: non-negative long."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def webtext(spark: SparkSession, n_rows: int, *,
            n_hosts: int = 1000, hot_host_share: int = 4,
            violation_pct: float = 0.02, partitions: int | None = None
            ) -> DataFrame:
    """The F1 `webtext` table with seeded violations.

    Hosts are zipf-ish: ids `h % hot_host_share == 0` collapse onto a
    single hot host (exercises uniqueness salting at scale).
    """
    df = spark.range(n_rows, numPartitions=partitions)
    rid = F.col("id")
    mod = int(1 / violation_pct)

    # duplicated urls: ~2% of rows reuse the url of row (id - id%50);
    # the whole url derives from url_id so duplicates are byte-equal
    dup_sel = _h(3, rid) % mod == 0
    url_id = F.when(dup_sel, (rid - rid % 50)).otherwise(rid)
    host_raw = _h(1, url_id) % n_hosts
    host = F.when(host_raw % hot_host_share == 0, F.lit(0)).otherwise(host_raw)
    good_url = F.concat(F.lit("https://host"), host.cast("string"),
                        F.lit(".example/p/"),
                        (_h(2, url_id) % 100000).cast("string"),
                        F.lit("-"), url_id.cast("string"))
    # invalid urls (no scheme/host) and nulls
    bad_url_sel = _h(4, rid) % mod == 1
    null_url_sel = _h(4, rid) % mod == 2
    url = (F.when(null_url_sel, F.lit(None).cast("string"))
           .when(bad_url_sel, F.concat(F.lit("notaurl:"), rid.cast("string")))
           .otherwise(good_url))

    # timestamps 2020-01-01..2026-01-01; ~2% null, ~2% before 2020
    base_ts = F.lit(1577836800)  # 2020-01-01
    span = 6 * 365 * 24 * 3600
    ts_null_sel = _h(5, rid) % mod == 3
    ts_old_sel = _h(5, rid) % mod == 4
    warc_ts = (F.when(ts_null_sel, F.lit(None).cast("timestamp"))
               .when(ts_old_sel, F.timestamp_seconds(base_ts - (_h(6, rid) % span)))
               .otherwise(F.timestamp_seconds(base_ts + (_h(6, rid) % span))))

    # text: deterministic word salad, target length 0..~2000 chars;
    # ~2% empty, ~2% oversized (> max_chars bound checked by rules)
    n_words = (_h(7, rid) % 300) + 5
    word = F.element_at(
        F.array(*[F.lit(w) for w in _WORDS]),
        (_h(8, rid) % len(_WORDS) + 1).cast("int"))
    sentence = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), n_words.cast("int")),
                         lambda i: F.element_at(
                             F.array(*[F.lit(w) for w in _WORDS]),
                             ((_h(9, rid) + i.cast("long")) % len(_WORDS) + 1)
                             .cast("int"))))
    empty_sel = _h(10, rid) % mod == 5
    huge_sel = _h(10, rid) % mod == 6
    text = (F.when(empty_sel, F.lit(""))
            .when(huge_sel, F.repeat(F.concat(sentence, F.lit(" ")), 40))
            .otherwise(sentence))

    # lang from the allowed dictionary; ~2% outside it
    bad_lang_sel = _h(11, rid) % mod == 7
    lang = (F.when(bad_lang_sel,
                   F.element_at(F.array(*[F.lit(x) for x in _BAD_LANGS]),
                                (_h(12, rid) % 3 + 1).cast("int")))
            .otherwise(F.element_at(
                F.array(*[F.lit(x) for x in ALLOWED_LANGS]),
                (_h(12, rid) % len(ALLOWED_LANGS) + 1).cast("int"))))

    # html wraps text; ~2% null
    html_null_sel = _h(13, rid) % mod == 8
    html = (F.when(html_null_sel, F.lit(None).cast("binary"))
            .otherwise(F.encode(
                F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")),
                "UTF-8")))

    expect = F.filter(
        F.array(
            F.when(dup_sel, F.lit("url.duplicate")),
            F.when(bad_url_sel, F.lit("url.url")),
            F.when(null_url_sel, F.lit("url.required")),
            F.when(ts_null_sel, F.lit("warc_ts.required")),
            F.when(ts_old_sel, F.lit("warc_ts.gte")),
            F.when(empty_sel, F.lit("text.gte")),
            F.when(huge_sel, F.lit("text.lte")),
            F.when(bad_lang_sel, F.lit("lang.one_of")),
            F.when(html_null_sel, F.lit("html.required")),
        ),
        lambda x: x.isNotNull())

    return df.select(
        rid.alias("row_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        expect.alias("expect_rule_ids"),
    )


def allowed_langs(spark: SparkSession) -> DataFrame:
    """F2 referential dictionary."""
    return spark.createDataFrame(
        [(code, f"lang-{code}") for code in ALLOWED_LANGS],
        "lang string, label string")


def webtext_schema():
    """The full webtext rule-set (the north_rule 'full rule-set pass'):
    every per-row rule class over the input_hint columns."""
    import zoi_spark as z

    return z.fields({
        "row_id": z.integer().non_negative(),
        "url": z.url().max(300),
        "warc_ts": z.datetime(),
        "html": z.any_().optional(),          # binary payload: presence-only
        "text": z.string(min=1, max=4000),
        "lang": z.string(min=2, max=2).one_of(ALLOWED_LANGS).downcase(),
        "expect_rule_ids": z.any_().optional(),
    })
