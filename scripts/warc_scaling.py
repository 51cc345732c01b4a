#!/usr/bin/env python
"""WARC ingest throughput at two parallelism levels (N vs 4N cores).

The ingest stage (container parse -> HTTP strip -> extract -> langid)
is map-only with per-container tasks — the stage shape that MUST scale
linearly on a real cluster because it has no shuffle, no barrier, and
no shared state. This script measures it on the same box at local[N]
and local[4N] (the sandbox stand-in for two cluster sizes, per
BENCH.md's scaling protocol) and prints one JSON line with docs/sec at
both levels and the scaling efficiency (thr4N / thrN / 4).

Usage:
    python scripts/warc_scaling.py [n_pages] [n_cores_small]

Each level runs in a fresh subprocess/SparkSession; the container set
is exported once and shared (input identical across levels). Per-level
timing is best-of-3 after a warmup pass (JIT + Python-worker spinup is
a per-executor constant a long-lived cluster pays once).
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEVEL_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from greynirserver_spark.session import get_spark
spark = get_spark(app_name="warc-scale", master="local[{cores}]",
                  shuffle_partitions={cores})
from greynirserver_spark.sources.warc import read_warc, warc_to_pages
from pyspark.sql import functions as F

def run():
    # aggregate over text+lang so Catalyst cannot prune the
    # extraction/langid projections (count() would time parse alone)
    t0 = time.perf_counter()
    row = warc_to_pages(read_warc(spark, {warc_dir!r})).agg(
        F.count("lang").alias("n"), F.sum(F.length("text"))).first()
    return int(row["n"]), time.perf_counter() - t0

run()  # warmup: codegen + python workers
best, n = None, 0
reps = []
for _ in range(3):
    n, dt = run()
    reps.append(round(dt, 3))
    if best is None or dt < best:
        best = dt
print("LEVEL_RESULT " + json.dumps(
    dict(cores={cores}, n_docs=n, sec=round(best, 3),
         docs_per_sec=round(n / best, 1), reps=reps)))
spark.stop()
"""


def run_level(cores: int, warc_dir: str) -> dict:
    code = LEVEL_SCRIPT.format(repo=REPO, cores=cores, warc_dir=warc_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEVEL_RESULT "):
            return json.loads(line[len("LEVEL_RESULT "):])
    raise RuntimeError(f"level {cores} failed:\n{out.stderr[-2000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    warc_dir = tempfile.mkdtemp(prefix="warc-scale-")

    # export once (not timed): 4N-core session so the container count
    # (= partition files) saturates both levels
    export_code = f"""
import sys
sys.path.insert(0, {REPO!r})
from greynirserver_spark.session import get_spark
spark = get_spark(app_name="warc-scale-export",
                  master="local[{4 * n_small}]",
                  shuffle_partitions={4 * n_small})
from greynirserver_spark.corpus import generate_pages
from greynirserver_spark.sources.warc import export_warc
pages = generate_pages(spark, {n_pages})
export_warc(pages.repartition({4 * n_small}), {warc_dir!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", export_code], check=True,
                   capture_output=True, timeout=1800)

    small = run_level(n_small, warc_dir)
    big = run_level(4 * n_small, warc_dir)
    eff = round(big["docs_per_sec"] / small["docs_per_sec"] / 4.0, 3)
    print(json.dumps(dict(
        metric="warc_ingest_scaling", n_pages=n_pages,
        n=small, n4=big, scaling_efficiency=eff,
    )))


if __name__ == "__main__":
    main()
