"""spark-submit entry point.

north_rule: "run via spark-submit --py-files on a multi-executor
cluster". Usage:

    spark-submit --py-files zoi_spark.zip zoi_spark/cli.py \
        --input  s3://bucket/webtext/          \
        --schema schema.json                   \
        --id-col url                           \
        --manifest  s3://bucket/_manifest/     \
        --violations s3://bucket/_violations/  \
        --run-id 2026-08-16                    \
        --partitions 4096

The schema file is JSON Schema (draft 2020-12) — imported through
``zoi_spark.json_schema.from_json_schema`` — so rule-sets are plain
reviewable artifacts, not code. Exits 0 when every partition passed,
3 when any partition failed (violations written either way).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="zoi-spark",
                                description="validate a table against a schema")
    p.add_argument("--mode", choices=["validate", "curate", "contract"],
                   default="validate",
                   help="validate (default): resumable rule-set run; "
                        "curate: full corpus-curation pipeline "
                        "(validate → gates → dedup) writing the kept "
                        "corpus to --output")
    p.add_argument("--input", required=True,
                   help="parquet path or iceberg table (catalog.db.table)")
    p.add_argument("--schema", required=True,
                   help="JSON-Schema file describing the rule-set")
    p.add_argument("--id-col", required=True)
    p.add_argument("--manifest", default=None,
                   help="parquet dir for the per-partition manifest "
                        "(required in validate mode)")
    p.add_argument("--violations", default=None)
    p.add_argument("--run-id", required=True)
    p.add_argument("--partitions", type=int, default=256)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--stats", action="store_true",
                   help="also print the fused single-pass column stats")
    # curate-mode options (ignored in validate mode)
    p.add_argument("--output", default=None,
                   help="parquet dir for the kept corpus (curate mode)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--allowed-langs", default=None,
                   help="comma-separated lang allow-list")
    p.add_argument("--lang-col", default=None)
    p.add_argument("--url-col", default=None)
    p.add_argument("--url-filter", action="store_true")
    p.add_argument("--drop-pii", action="store_true")
    p.add_argument("--gopher", action="store_true",
                   help="apply the Gopher admission battery (defaults)")
    p.add_argument("--max-dup-ngram-fraction", type=float, default=None)
    p.add_argument("--near-dup-threshold", type=float, default=0.85)
    # blocking knobs: default "auto" (threshold-derived bands,
    # pair-work-bounded bucket cap, log2(n)-derived round budget) so
    # the deployed job needs no per-corpus tuning; integers override
    p.add_argument("--minhash-bands", default="auto",
                   type=lambda s: s if s == "auto" else int(s))
    p.add_argument("--max-bucket-size", default="auto",
                   type=lambda s: s if s == "auto" else int(s))
    p.add_argument("--cluster-max-iters", default="auto",
                   type=lambda s: s if s == "auto" else int(s))
    p.add_argument("--approx-rows", type=int, default=None,
                   help="known/estimated input row count; skips the "
                        "one count() job auto sizing otherwise runs")
    p.add_argument("--decontam-probes", default=None,
                   help="parquet of (probe_id, probe_text) benchmark "
                        "docs; kept corpus drops any document sharing "
                        "a 13-gram with a probe (curate mode)")
    p.add_argument("--decontam-fuzzy-threshold", type=float, default=None,
                   help="use the MinHash-LSH cross-corpus join at this "
                        "Jaccard threshold instead of exact 13-gram "
                        "overlap (catches paraphrased near-copies)")
    p.add_argument("--split", default=None,
                   help="stamp a deterministic recrawl-stable split "
                        "column on the kept corpus, e.g. "
                        "'train:0.8,val:0.1,test:0.1' (curate mode)")
    p.add_argument("--contract", default=None,
                   help="contract JSON for --mode contract: "
                        '{"expectations": [...], "references": '
                        '[{"column": c, "values": [...]}]} — the '
                        "row-level rules come from --schema")
    return p


def parse_split(spec: str) -> dict:
    """'train:0.8,val:0.1,test:0.1' → ordered weights dict."""
    out = {}
    for part in spec.split(","):
        name, _, w = part.partition(":")
        if not name or not w:
            raise ValueError(f"bad --split segment: {part!r}")
        out[name.strip()] = float(w)
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    # absolute imports: spark-submit executes this FILE as __main__ (no
    # package context); the package itself ships via --py-files
    from zoi_spark import json_schema
    from zoi_spark.runner import ValidationRunner
    from zoi_spark.tablechecks import column_stats

    spark = SparkSession.builder.appName(
        f"zoi-spark-{args.run_id}").getOrCreate()

    with open(args.schema) as f:
        schema = json_schema.from_json_schema(json.load(f))

    if "/" in args.input or args.input.endswith(".parquet"):
        df = spark.read.parquet(args.input)
    else:
        df = spark.read.table(args.input)

    if args.mode == "contract":
        from zoi_spark.contract import contract_check
        spec = {}
        if args.contract:
            with open(args.contract) as f:
                spec = json.load(f)
        refs = []
        for r in spec.get("references", ()):
            dic = spark.createDataFrame(
                [(v,) for v in r["values"]], f"{r['column']} string")
            refs.append((r["column"], dic))
        verdicts = contract_check(
            df, schema=schema,
            expectations=spec.get("expectations") or None,
            references=refs, id_cols=[args.id_col]).collect()
        for row in verdicts:
            print(f"{'PASS' if row['passed'] else 'FAIL'}  "
                  f"{row['check']}  metric={row['metric']}")
        if args.output:
            spark.createDataFrame(verdicts).write.mode(
                "overwrite").parquet(args.output)
        return 0 if all(r["passed"] for r in verdicts) else 3

    if args.mode == "curate":
        if not args.output:
            print("--output is required in curate mode", file=sys.stderr)
            return 2
        from zoi_spark import pipeline
        res = pipeline.curate(
            df, schema, id_col=args.id_col, text_col=args.text_col,
            min_quality=args.min_quality,
            allowed_langs=(args.allowed_langs.split(",")
                           if args.allowed_langs else None),
            lang_col=args.lang_col or None, url_col=args.url_col or None,
            url_filter=args.url_filter, drop_pii=args.drop_pii,
            gopher=({} if args.gopher else None),
            max_dup_ngram_fraction=args.max_dup_ngram_fraction,
            near_dup_threshold=args.near_dup_threshold,
            minhash_bands=args.minhash_bands,
            max_bucket_size=args.max_bucket_size,
            cluster_max_iters=args.cluster_max_iters,
            approx_rows=args.approx_rows,
            decontam_probes=(spark.read.parquet(args.decontam_probes)
                             if args.decontam_probes else None),
            decontam_fuzzy_threshold=args.decontam_fuzzy_threshold,
            split_weights=(parse_split(args.split)
                           if args.split else None))
        res.kept.write.mode("overwrite").parquet(args.output)
        # the ledger's kept-corpus legs (count + token sums) read the
        # parquet just written instead of re-executing the near-dup
        # join/cluster chain a second and third time
        ledger = res.report(
            kept_materialized=spark.read.parquet(args.output))
        res.release()
        print(json.dumps({"run_id": args.run_id,
                          "converged": res.converged, **ledger}))
        # exit 4 = corpus written but the near-dup drop list did not
        # converge within cluster_max_iters — mirror of validate
        # mode's exit-3 contract so orchestration can gate on it
        return 0 if res.converged else 4

    if not args.manifest:
        print("--manifest is required in validate mode", file=sys.stderr)
        return 2
    runner = ValidationRunner(
        spark, schema, id_col=args.id_col, n_partitions=args.partitions,
        manifest_dir=args.manifest, violations_dir=args.violations,
        input_lineage=args.input)
    summary = runner.run(df, args.run_id, resume=not args.no_resume)
    print(json.dumps(summary.__dict__))

    if args.stats:
        row = column_stats(df).collect()[0].asDict()
        print(json.dumps({k: (str(v) if v is not None else None)
                          for k, v in row.items()}))

    return 0 if summary.n_partitions_failed == 0 else 3


if __name__ == "__main__":
    sys.exit(main())
