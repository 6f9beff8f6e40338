"""Scaling-efficiency experiment (BASELINE.json: N vs 4N executors).

No real cluster exists in this sandbox, so per BASELINE.md the same
extraction job runs at two parallelism levels over the SAME materialized
corpus, and we report throughput at both plus
``efficiency = rate(4N) / (4 × rate(N))``.

Protocol notes (all measured, see BENCH/BASELINE.md):

- levels are **interleaved** (N, 4N, N, 4N, …) — this box's clock/thermal
  state drifts between sequential sessions and was worth ±40 % efficiency
  in back-to-back runs; interleaving cancels it (medians reported);
- pair is ``local[4]`` vs ``local[16]``: both leave the driver-JVM's
  scan/Arrow threads headroom on the shared 32-CPU box (at local[32] the
  JVM + 32 Python workers oversubscribe and per-core Python throughput
  drops ~2.4× — impossible on a real cluster with dedicated executor
  cores);
- the corpus must keep both levels compute-bound (≥ ~200 core-seconds):
  default 720k docs.

Run:  python BENCH/scaling.py [--n-docs 720000] [--n 4] [--rounds 2]
Writes one JSON line.
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
import json, sys, time
sys.path.insert(0, "@@REPO@@")
from doctor_spark.session import get_spark
from doctor_spark.operators.extract import extract_operator
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); corpus = sys.argv[2]
spark = get_spark("scaling", cores=cpus, extra_conf={
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
})

def run():
    pages = spark.read.parquet(corpus)
    ex = extract_operator(pages, ocr_available=True)
    ex.agg(F.count("*"), F.sum(F.length("content"))).collect()

run()  # warmup (codegen + python workers)
t0 = time.monotonic(); run()
print(json.dumps({"wall": round(time.monotonic() - t0, 2)}))
spark.stop()
"""


def materialize(n_docs: int) -> str:
    sys.path.insert(0, str(REPO))
    from doctor_spark.corpus import CORPUS_VERSION

    path = Path(f"/tmp/doctor_spark_corpus/v{CORPUS_VERSION}_n{n_docs}")
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


def run_at(cpus: int, corpus: str) -> float:
    out = subprocess.run(
        [
            sys.executable, "-c", WORKER.replace("@@REPO@@", str(REPO)),
            str(cpus), corpus,
        ],
        capture_output=True, text=True, timeout=2400,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["wall"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=720_000)
    ap.add_argument("--n", type=int, default=4, help="N; 4N runs too")
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    corpus = materialize(args.n_docs)
    t0 = time.monotonic()
    walls: dict[int, list[float]] = {args.n: [], args.n * 4: []}
    for _ in range(args.rounds):
        for cpus in (args.n, args.n * 4):  # interleaved, see module docstring
            walls[cpus].append(run_at(cpus, corpus))
    m_lo = statistics.median(walls[args.n])
    m_hi = statistics.median(walls[args.n * 4])
    rate_lo, rate_hi = args.n_docs / m_lo, args.n_docs / m_hi
    print(
        json.dumps(
            {
                "metric": "extraction scaling efficiency N->4N "
                f"(local[{args.n}] vs local[{args.n * 4}], interleaved)",
                "n_docs": args.n_docs,
                "walls_n": walls[args.n],
                "walls_4n": walls[args.n * 4],
                "docs_per_sec_n": round(rate_lo, 1),
                "docs_per_sec_4n": round(rate_hi, 1),
                "efficiency": round(rate_hi / (4 * rate_lo), 3),
                "experiment_sec": round(time.monotonic() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
