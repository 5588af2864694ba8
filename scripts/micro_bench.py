"""Micro-bench mirrors of the reference's Benchee suites (BASELINE.md).

Mirrors `bench/run.exs` suites against the rule compiler, reporting
validated docs/sec over the deterministic webtext table:

* primitives (`bench/run.exs:63-93`)  — one rule-set per scalar rule
  class: string type, validated string (min/max), integer range, float
  range, boolean via string_boolean, email regex, uuid regex, enum.
* complex (`bench/run.exs:95-137`)    — flat map with 5 and 20 fields,
  3-level nested struct, arrays of ~10 and ~100 validated elements,
  array-of-structs.

Protocol matches bench.py: one untimed warmup pass, then best of FOUR
timed passes through the noop sink (the reference's own suites run a
Benchee ``warmup`` phase first, bench/run.exs:55-61; min-of-N because
these sub-second jobs sit fully inside this host's scheduling-jitter
band — the r2→r3 post-mortem measured 10-20× pass-to-pass swings on
byte-identical plans).

Writes BENCH/micro.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("ZOI_MICRO_ROWS", "200000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import zoi_spark as z
    from zoi_spark import testgen

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.codegen.hugeMethodLimit", "8000")
             .config("spark.driver.memory", "16g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    web = testgen.webtext(spark, N_ROWS, partitions=CPUS * 2).cache()
    web.count()

    def timed(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    def dps(schema, frame) -> int:
        res = z.validate(frame, schema, id_cols=[frame.columns[0]])
        sec = timed(res.annotated.select(frame.columns[0], "__zoi_valid",
                                         "__zoi_errors"))
        return round(N_ROWS / sec) if sec > 0 else 0

    # -- primitives (one rule class per run) --------------------------------
    txt = web.select("row_id", "text", "lang", "url")
    primitives = {
        "string_type": dps(z.fields({"row_id": z.integer(),
                                     "text": z.string()}), txt),
        "string_min_max": dps(z.fields({"row_id": z.integer(),
                                        "text": z.string(min=1, max=20000)}),
                              txt),
        "integer_range": dps(z.fields({"row_id": z.integer(gte=0,
                                                           lte=10**12)}),
                             web.select("row_id")),
        "float_range": dps(z.fields({"row_id": z.integer(),
                                     "v": z.float_(gte=0.0, lte=1e9)}),
                           web.select("row_id",
                                      (F.col("row_id") * 1.5).alias("v"))),
        "string_boolean": dps(
            z.fields({"row_id": z.integer(), "b": z.string_boolean()}),
            web.select("row_id", F.when(F.col("row_id") % 2 == 0, "true")
                       .otherwise("false").alias("b"))),
        "email_regex": dps(z.fields({"row_id": z.integer(),
                                     "url": z.email()}), txt),
        "uuid_regex": dps(z.fields({"row_id": z.integer(),
                                    "url": z.uuid()}), txt),
        "enum": dps(z.fields({"row_id": z.integer(),
                              "lang": z.enum(["en", "de", "fr", "es"])}),
                    txt),
        "url_format": dps(z.fields({"row_id": z.integer(),
                                    "url": z.url()}), txt),
    }

    # -- complex ------------------------------------------------------------
    flat5 = web.selectExpr("row_id", "url", "text", "lang",
                           "warc_ts", "length(text) as n")
    schema5 = z.fields({
        "row_id": z.integer().non_negative(),
        "url": z.string(min=1), "text": z.string(min=0),
        "lang": z.string(min=2, max=2), "n": z.integer(gte=0),
    })

    cols20 = {"row_id": z.integer()}
    sel20 = ["row_id"]
    for i in range(19):
        sel20.append(f"length(text) + {i} as f{i}")
        cols20[f"f{i}"] = z.integer(gte=0)
    flat20 = web.selectExpr(*sel20)

    nested = web.select(
        "row_id",
        F.struct(
            F.col("url"),
            F.struct(F.col("lang"),
                     F.struct(F.col("text")).alias("deep")).alias("mid"),
        ).alias("page"))
    nested_schema = z.fields({
        "row_id": z.integer(),
        "page": z.fields({
            "url": z.string(min=1),
            "mid": z.fields({
                "lang": z.string(min=2, max=2),
                "deep": z.fields({"text": z.string(min=0)}),
            }),
        }),
    })

    tokens = web.select("row_id",
                        F.slice(F.split("text", " "), 1, 10).alias("a10"),
                        F.split("text", " ").alias("a100"))
    arr10 = z.fields({"row_id": z.integer(),
                      "a10": z.array(z.string(min=1), max_length=1000)})
    arr100 = z.fields({"row_id": z.integer(),
                       "a100": z.array(z.string(min=0), max_length=100000)})

    structs = web.select(
        "row_id",
        F.transform(F.sequence(F.lit(1), F.lit(10)),
                    lambda i: F.struct(i.alias("k"),
                                       F.col("lang").alias("v"))).alias("rows"))
    arr_of_struct = z.fields({
        "row_id": z.integer(),
        "rows": z.array(z.fields({"k": z.integer(gte=1),
                                  "v": z.string(min=2, max=2)})),
    })

    complex_suite = {
        "map_5_fields": dps(schema5, flat5),
        "map_20_fields": dps(cols20 and z.fields(cols20), flat20),
        "nested_3_levels": dps(nested_schema, nested),
        "array_10_elems": dps(arr10, tokens.select("row_id", "a10")),
        "array_100_elems": dps(arr100, tokens.select("row_id", "a100")),
        "array_of_structs_10": dps(arr_of_struct, structs),
    }

    # -- dedup hashing (r2: SimHash is pure Column; MinHash hashes each
    # shingle once) — docs/sec through the signature computation only
    from zoi_spark import dedup, text as ztext

    def dps_df(df) -> int:
        sec = timed(df)
        return round(N_ROWS / sec) if sec > 0 else 0

    docs = web.select("row_id", "text")
    dedup_suite = {
        "simhash_xxhash64": dps_df(
            dedup.with_simhash(docs).select("row_id", "__simhash")),
        "simhash_md5": dps_df(
            dedup.with_simhash(docs, hash="md5").select("row_id", "__simhash")),
        "minhash_64": dps_df(
            dedup.with_minhash(docs).select("row_id", "__minhash")),
        "fingerprint_md5": dps_df(
            docs.select("row_id",
                        ztext.fingerprint(F.col("text")).alias("fp"))),
    }

    web.unpersist()
    out = {"n_rows": N_ROWS, "cpus": CPUS, "unit": "validated docs/sec",
           "primitives": primitives, "complex": complex_suite,
           "dedup": dedup_suite}
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/micro.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
