"""Scaling-efficiency evidence for the north rule (BASELINE.json).

The rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency from N to 4N executors) cannot use a real cluster in this
sandbox; per the driver protocol it is evidenced by running the SAME
full-rule-set validation job on the SAME input at two local parallelism
levels — local[8] and local[32] — in fresh JVMs, and reporting
docs/sec at both plus efficiency = (dps_32 / dps_8) / 4.

The input is generated ONCE to parquet (64 files) so both levels scan
byte-identical data; timing covers scan + full rule evaluation through
the noop sink (all columns computed), best of 3 passes.

Writes BENCH/BASELINE.md and BENCH/scaling.json.

Usage: python scripts/scale_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = "/tmp/zoi_scale_input"

GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from zoi_spark import testgen

n_rows = int(sys.argv[1])
spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
(testgen.webtext(spark, n_rows, partitions=64)
 .write.mode("overwrite").parquet(%(input)r))
spark.stop()
""" % {"repo": REPO, "input": INPUT}

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
import zoi_spark as z
from zoi_spark import testgen

cpus = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"zoi-scale-{cpus}")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

web = spark.read.parquet(%(input)r)
n_rows = web.count()   # also warms the OS page cache identically
res = z.validate(web, testgen.webtext_schema(), id_cols=["row_id"])
times = []
for _ in range(3):
    t0 = time.time()
    res.annotated.write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
best = min(times)
print(json.dumps({"cpus": cpus, "n_rows": n_rows, "times": times,
                  "best_sec": best, "docs_per_sec": n_rows / best}))
spark.stop()
""" % {"repo": REPO, "input": INPUT}


def run_worker(cpus: int) -> dict:
    out = subprocess.run([sys.executable, "-c", WORKER, str(cpus)],
                         capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"worker cpus={cpus} failed:\n{out.stderr[-3000:]}")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    gen = subprocess.run([sys.executable, "-c", GEN, str(n_rows)],
                         capture_output=True, text=True, timeout=1800)
    if gen.returncode != 0:
        raise RuntimeError(f"generation failed:\n{gen.stderr[-3000:]}")

    results = [run_worker(8), run_worker(32)]
    shutil.rmtree(INPUT, ignore_errors=True)
    r8, r32 = results
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/scaling.json", "w") as f:
        json.dump({"runs": results, "efficiency": eff,
                   "protocol": "same job over the same 64-file parquet "
                               "input, fresh JVM per level, best of 3"},
                  f, indent=2)

    md = f"""# BENCH/BASELINE — scaling-efficiency evidence (north rule)

Protocol (sandbox substitute for N vs 4N executors, per driver
instruction): the identical full-rule-set webtext validation job —
{n_rows:,} generated docs (BASELINE.json input_hint shape, seeded
violations), written once as a 64-file parquet dataset — executed in a
fresh JVM at `local[8]` and `local[32]`; best of 3 timed passes through
the noop sink (scan + every rule column computed).

| parallelism | best sec | validated docs/sec |
|---|---|---|
| local[8]  | {r8['best_sec']:.2f} | {r8['docs_per_sec']:,.0f} |
| local[32] | {r32['best_sec']:.2f} | {r32['docs_per_sec']:,.0f} |

**Scaling efficiency (8 → 32 threads) = (dps₃₂ / dps₈) / 4 =
{eff:.3f}** — target ≥ 0.8 per BASELINE.json north_rule.

Raw timings in `BENCH/scaling.json`. The rule-set is
`zoi_spark.testgen.webtext_schema()` (url format+length, timestamp
presence, text length band, lang membership+case+length, id range —
every per-row rule class of SURVEY §2.2-2.3). The job is a single
whole-stage-codegen Project over the parquet scan: no shuffle, no
Python, so throughput scales with cores until the scan's
decompression/memory bandwidth dominates. On a real cluster the same
plan shards by file split exactly as it shards by local task here.
"""
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": eff, "dps8": r8["docs_per_sec"],
                      "dps32": r32["docs_per_sec"]}))


if __name__ == "__main__":
    main()
