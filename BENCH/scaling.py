"""Scaling-efficiency experiment (BASELINE.json: N vs 4N executors).

No real cluster exists in this sandbox, so per BASELINE.md the same
extraction job runs at two parallelism levels over the SAME materialized
corpus, and we report throughput at both plus
``efficiency = rate(4N) / (4 × rate(N))``.

Default pair: ``local[4]`` vs ``local[16]``.  Both levels must leave CPU
headroom for the driver-JVM's scan/Arrow threads on this shared 32-CPU
box; at local[32] the JVM + 32 Python workers oversubscribe the machine
and per-core Python throughput drops ~2.4× — a measurement artifact a real
cluster (dedicated executor cores) does not have.  The raw hardware
ceiling, measured with a plain multiprocessing md5 burn, is itself ~0.74
at 8→32 procs (turbo/memory effects); 4→16 is clean.

Run:  python BENCH/scaling.py [--n-docs 240000] [--n 4]
Writes one JSON line; BENCH/BASELINE.md records results.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import json, statistics, sys, time
sys.path.insert(0, "@@REPO@@")
from doctor_spark.session import get_spark
from doctor_spark.operators.extract import extract_operator
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); corpus = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark("scaling", cores=cpus, extra_conf={
    "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
})

def run():
    pages = spark.read.parquet(corpus)
    ex = extract_operator(pages, ocr_available=True)
    ex.agg(F.count("*"), F.sum(F.length("content"))).collect()

run()  # warmup (codegen + python workers)
walls = []
for _ in range(reps):
    t0 = time.monotonic(); run(); walls.append(time.monotonic() - t0)
print(json.dumps({"cpus": cpus, "walls": [round(w, 2) for w in walls],
                  "median": round(statistics.median(walls), 2)}))
spark.stop()
"""


def materialize(n_docs: int) -> str:
    path = Path(f"/tmp/doctor_spark_corpus/n{n_docs}")
    if not (path / "_SUCCESS").exists():
        sys.path.insert(0, str(REPO))
        from doctor_spark.corpus import pages_dataframe
        from doctor_spark.session import get_spark

        spark = get_spark("scaling-gen", cores=32)
        pages_dataframe(spark, n_docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(str(path))
        spark.stop()
    return str(path)


def run_at(cpus: int, corpus: str, reps: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, "-c", WORKER.replace("@@REPO@@", str(REPO)),
            str(cpus), corpus, str(reps),
        ],
        capture_output=True, text=True, timeout=2400,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=240_000)
    ap.add_argument("--n", type=int, default=4, help="N; 4N runs too")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    corpus = materialize(args.n_docs)
    t0 = time.monotonic()
    lo = run_at(args.n, corpus, args.reps)
    hi = run_at(args.n * 4, corpus, args.reps)
    rate_lo = args.n_docs / lo["median"]
    rate_hi = args.n_docs / hi["median"]
    print(
        json.dumps(
            {
                "metric": "extraction scaling efficiency N->4N "
                f"(local[{args.n}] vs local[{args.n * 4}])",
                "n_docs": args.n_docs,
                "walls_n": lo["walls"],
                "walls_4n": hi["walls"],
                "docs_per_sec_n": round(rate_lo, 1),
                "docs_per_sec_4n": round(rate_hi, 1),
                "efficiency": round(rate_hi / (4 * rate_lo), 3),
                "experiment_sec": round(time.monotonic() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
