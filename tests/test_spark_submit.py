"""End-to-end spark-submit --py-files launch (north_rule: "launched via
spark-submit --py-files on multi-executor clusters").

Packages zoi_spark into a zip, submits cli.py against the documents
table with a JSON-Schema rule-set, and checks the manifest, violations
sink, exit code, and resume behavior — the exact deployment shape a
cluster run uses (local[4] standing in for the executor fleet).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMA = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 50, "maxLength": 520},
        "lang": {"type": "string", "enum": ["en", "de", "es", "fr"]},
    },
    "required": ["doc_id", "text", "lang"],
}


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "zoi_spark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        pkg = os.path.join(REPO, "zoi_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.timeout(600)
def test_spark_submit_py_files_roundtrip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    zpath = _zip_package(tmp_path)
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps(SCHEMA))
    manifest = str(tmp_path / "manifest")
    violations = str(tmp_path / "violations")

    def submit(run_id, extra=()):
        cmd = [spark_submit, "--master", "local[4]",
               "--conf", "spark.ui.enabled=false",
               "--conf", "spark.sql.shuffle.partitions=8",
               "--py-files", zpath,
               os.path.join(REPO, "zoi_spark", "cli.py"),
               "--input", "/root/testdata/sf0.001/documents.parquet",
               "--schema", str(schema_file),
               "--id-col", "doc_id",
               "--manifest", manifest,
               "--violations", violations,
               "--run-id", run_id, "--partitions", "8", *extra]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=540, cwd=str(tmp_path))
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, f"no summary JSON:\n{out.stdout}\n{out.stderr[-2000:]}"
        return out.returncode, json.loads(lines[0])

    rc, summary = submit("r1")
    # sf0.001 documents seed lang/type violations → some partition fails
    assert rc == 3
    assert summary["n_partitions_total"] == 8
    assert summary["n_rows"] == 500
    assert summary["n_invalid"] > 0
    assert os.path.isdir(manifest)
    assert os.path.isdir(violations)

    # resume: identical run-id + fingerprint → all partitions skipped
    rc2, summary2 = submit("r1")
    assert summary2["n_partitions_skipped"] == 8
    assert summary2["n_partitions_processed"] == 0


@pytest.mark.timeout(600)
def test_spark_submit_curate_mode(tmp_path):
    """--mode curate via spark-submit: the whole curation pipeline is
    deployable with the same --py-files shape; kept corpus written to
    parquet, ledger JSON on stdout, exit 0."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
    zpath = _zip_package(tmp_path)
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps(SCHEMA))
    out_dir = str(tmp_path / "kept")

    # benchmark probes: a 20-word window lifted verbatim from doc 7, so
    # the decontamination gate must drop at least that document
    import pyarrow as pa
    import pyarrow.parquet as pq
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    text7 = docs.filter(pa.compute.equal(docs["doc_id"], 7))["text"][0]
    probe = " ".join(text7.as_py().split()[5:25])
    probes_path = str(tmp_path / "probes.parquet")
    pq.write_table(pa.table({"probe_id": [100], "probe_text": [probe]}),
                   probes_path)

    cmd = [spark_submit, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--py-files", zpath,
           os.path.join(REPO, "zoi_spark", "cli.py"),
           "--mode", "curate",
           "--input", "/root/testdata/sf0.001/documents.parquet",
           "--schema", str(schema_file),
           "--id-col", "doc_id",
           "--run-id", "c1",
           "--output", out_dir,
           "--min-quality", "0.55",
           "--near-dup-threshold", "0.8",
           "--decontam-probes", probes_path]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=540, cwd=str(tmp_path))
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert out.returncode == 0, out.stderr[-2000:]
    assert lines, f"no ledger JSON:\n{out.stdout}\n{out.stderr[-2000:]}"
    ledger = json.loads(lines[0])
    assert ledger["converged"] is True
    assert 0 < ledger["near_dedup"] <= ledger["valid"] <= ledger["input"]
    # the probe source document must be gone from the written corpus
    assert ledger["decontaminated"] < ledger["near_dedup"]
    kept_ids = pq.read_table(out_dir, columns=["doc_id"])["doc_id"]
    assert 7 not in set(kept_ids.to_pylist())
    assert ledger["kept_ws_tokens"] > 0
    assert os.path.isdir(out_dir)


def test_cli_contract_mode_in_process(tmp_path, spark):
    """--mode contract: verdict rows printed, parquet written, exit
    code folds the passed column (0 all-pass / 3 any-fail)."""
    import zoi_spark.cli as cli

    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps({
        "type": "object",
        "properties": {"doc_id": {"type": "integer", "minimum": 0},
                       "lang": {"type": "string"}},
        "required": ["doc_id", "lang"],
    }))
    contract_file = tmp_path / "contract.json"
    contract_file.write_text(json.dumps({
        "expectations": [
            {"name": "rows", "kind": "row_count", "lo": 1},
            {"name": "lang_nulls", "kind": "null_share",
             "column": "lang", "hi": 0.0}],
        "references": [{"column": "lang",
                        "values": ["en", "de", "es", "fr"]}],
    }))
    out_dir = tmp_path / "verdicts"
    argv = ["--mode", "contract",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--schema", str(schema_file),
            "--contract", str(contract_file),
            "--id-col", "doc_id", "--run-id", "t1",
            "--output", str(out_dir)]
    # zh docs miss the reference dictionary -> contract fails with 3
    assert cli.main(argv) == 3
    rows = {r["check"]: r for r in
            spark.read.parquet(str(out_dir)).collect()}
    assert rows["ref:lang"]["passed"] is False
    assert rows["expect:rows"]["passed"] is True
    assert any(c.startswith("schema:") for c in rows)

    contract_file.write_text(json.dumps({
        "references": [{"column": "lang",
                        "values": ["en", "de", "es", "fr", "zh"]}],
    }))
    assert cli.main(["--mode", "contract",
                     "--input",
                     "/root/testdata/sf0.001/documents.parquet",
                     "--schema", str(schema_file),
                     "--contract", str(contract_file),
                     "--id-col", "doc_id", "--run-id", "t2"]) == 0
