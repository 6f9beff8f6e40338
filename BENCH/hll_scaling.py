"""N->4N throughput pair for the HyperLogLog register aggregate
(thirteenth wave; shuffle-bearing).

The operator's cost profile at crawl scale is hash + register math in
the map stage, then a keyed exchange BOUNDED at <= 4096 rows per key
per map partition by the partial max — this pair evidences that the
bounded-exchange design actually scales: the shuffle volume is a
constant per key regardless of row count, so efficiency should track
the map stage.

Corpus: (host, url) pairs over 1,000 hosts with per-host distinct
cardinalities in the thousands, materialized to 128 parquet files so
both legs draw parallelism from input splits.  The timed action forces
registers AND the estimate rollup (sum over est_distinct).

Usage:
    python BENCH/hll_scaling.py [--n 4] [--rows 20000000] [--rounds 2]

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

spark = get_spark("hll-corpus")
n = {rows}
df = (spark.range(n)
      .select(
          F.concat(F.lit("host-"), (F.col("id") % 1000)).alias("host"),
          F.concat(F.lit("/p/"), ((F.col("id") * 2654435761) % 4099)
                   .cast("string"),
                   F.lit("-"), ((F.col("id") * 40503) % 7919)
                   .cast("string")).alias("url"))
      .repartition(128))
df.write.mode("overwrite").parquet({corpus!r})
print(spark.read.parquet({corpus!r}).count())
"""

_LEG = r"""
import json, sys, time
import os
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cores})
from pyspark.sql import functions as F
from doctor_spark.session import get_spark
from doctor_spark.operators.hll import hll_distinct

spark = get_spark("hll-scale")
pairs = spark.read.parquet({corpus!r})

def job():
    out = hll_distinct(pairs, ["host"], "url")
    return out.agg(
        F.count(F.lit(1)).alias("hosts"),
        F.sum("est_distinct").alias("est_sum"),
    ).collect()[0]

r = job()  # warm
t = time.time()
r = job()
print(json.dumps({{"wall": round(time.time() - t, 2),
                   "hosts": r["hosts"], "est_sum": r["est_sum"]}}))
"""


def _repo() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def materialize(args) -> str:
    corpus = f"/tmp/hll_scale_corpus_n{args.rows}"
    marker = os.path.join(corpus, "_SUCCESS")
    if not os.path.exists(marker):
        code = _MATERIALIZE.format(repo=_repo(), rows=args.rows,
                                   corpus=corpus)
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
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    sys.path.insert(0, _repo())

    corpus = materialize(args)
    walls_n, walls_4n, hosts, est = [], [], 0, 0
    for _ in range(args.rounds):  # interleave to spread box drift
        r = run_leg(args.n, corpus)
        walls_n.append(r["wall"]); hosts, est = r["hosts"], r["est_sum"]
        r = run_leg(4 * args.n, corpus)
        walls_4n.append(r["wall"])
    tp_n = args.rows / (sum(walls_n) / len(walls_n))
    tp_4n = args.rows / (sum(walls_4n) / len(walls_4n))
    print(json.dumps({
        "metric": "hll_distinct N->4N scaling (bounded keyed exchange)",
        "rows": args.rows, "hosts": hosts, "est_sum": est,
        "cores_n": args.n, "cores_4n": 4 * args.n,
        "walls_n": walls_n, "walls_4n": walls_4n,
        "rows_per_sec_n": round(tp_n, 1), "rows_per_sec_4n": round(tp_4n, 1),
        "efficiency": round(tp_4n / tp_n / 4, 3),
    }))


if __name__ == "__main__":
    main()
