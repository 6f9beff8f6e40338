"""N->4N throughput pair for PMI collocations (agg+join-bearing).

The collocation table pays a different exchange shape than the other
instrumented rungs: TWO row-volume keyed counts (unigrams, bigrams)
followed by vocab-sized joins — the classic "heavy fan-in aggregate"
profile of corpus statistics at 10^12 rows.  The corpus is the sf
documents table replicated with shifted doc_ids and materialized to
128 parquet files so both legs draw parallelism from input splits;
replication multiplies gram COUNTS, not vocab, exactly like a bigger
crawl of the same domain mix.

The timed action forces the full pipeline through the PMI projection
(sum over pmi_micro), so pruning cannot skip the joins.

Usage:
    python BENCH/collocations_scaling.py [--n 4] [--reps 16]
        [--rounds 2] [--sf-dir /tmp/doctor_spark_sf1]

Prints one JSON line with walls and N->4N efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_MATERIALIZE = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from doctor_spark.session import get_spark

spark = get_spark("colloc-corpus")
docs = spark.read.parquet({sf_dir!r} + "/documents.parquet")
big = (docs.select("doc_id", "text")
       .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit({reps} - 1))))
       .select((F.col("doc_id") * {reps} + F.col("r")).alias("doc_id"),
               "text")
       .repartition(128))
big.write.mode("overwrite").parquet({corpus!r})
print(spark.read.parquet({corpus!r}).count())
"""

_LEG = r"""
import json, sys, time
import os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cores})
from pyspark.sql import functions as F
from doctor_spark.session import get_spark
from doctor_spark.operators.collocations import collocations

spark = get_spark("colloc-scale")
docs = spark.read.parquet({corpus!r})
n_docs = docs.count()

def job():
    out = collocations(docs, min_pair=5)
    return out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum("pmi_micro").alias("pmi_sum"),
    ).collect()[0]

r = job()  # warm
t = time.time()
r = job()
print(json.dumps({{"wall": round(time.time() - t, 2),
                   "n_docs": n_docs,
                   "pairs": r["pairs"], "pmi_sum": int(r["pmi_sum"])}}))
"""


def _repo() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def materialize(args) -> str:
    corpus = f"/tmp/colloc_scale_corpus_x{args.reps}"
    marker = os.path.join(corpus, "_SUCCESS")
    if not os.path.exists(marker):
        code = _MATERIALIZE.format(repo=_repo(), reps=args.reps,
                                   sf_dir=args.sf_dir, corpus=corpus)
        subprocess.run([sys.executable, "-c", code], check=True,
                       capture_output=True, text=True)
    return corpus


def run_leg(cores: int, corpus: str) -> dict:
    code = _LEG.format(repo=_repo(), cores=cores, corpus=corpus)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--sf-dir", default="/tmp/doctor_spark_sf1")
    args = ap.parse_args()
    sys.path.insert(0, _repo())

    corpus = materialize(args)
    walls_n, walls_4n, n_docs, pairs = [], [], 0, 0
    checks = set()
    for _ in range(args.rounds):  # interleave to spread box drift
        r = run_leg(args.n, corpus)
        walls_n.append(r["wall"])
        n_docs, pairs = r["n_docs"], r["pairs"]
        checks.add((r["pairs"], r["pmi_sum"]))
        r = run_leg(4 * args.n, corpus)
        walls_4n.append(r["wall"])
        checks.add((r["pairs"], r["pmi_sum"]))
    assert len(checks) == 1, f"legs disagree on results: {checks}"
    tp_n = n_docs / (sum(walls_n) / len(walls_n))
    tp_4n = n_docs / (sum(walls_4n) / len(walls_4n))
    print(json.dumps({
        "metric": "collocations N->4N scaling (agg+join-bearing)",
        "n_docs": n_docs, "pairs": pairs,
        "cores_n": args.n, "cores_4n": 4 * args.n,
        "walls_n": walls_n, "walls_4n": walls_4n,
        "docs_per_sec_n": round(tp_n, 1), "docs_per_sec_4n": round(tp_4n, 1),
        "efficiency": round(tp_4n / tp_n / 4, 3),
    }))


if __name__ == "__main__":
    main()
