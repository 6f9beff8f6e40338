"""Connected-components benchmark on a >=10^6-pair synthetic graph
(verdict r4 item 4 evidence): after the Observation-piggybacked
convergence check, each pointer-jumping round is ONE Spark job.

Graph: chains of length CHAIN inside consecutive id blocks — worst-case
diameter for min-label propagation (a star converges in 1 round; a chain
needs ~log2(diameter) doubling rounds), deterministic, no RNG.

Run:  python BENCH/components_bench.py [n_nodes] [chain_len]
Prints one JSON line with pairs, iterations, wall seconds, and jobs/round.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from doctor_spark.operators.dedup import duplicate_components  # noqa: E402
from doctor_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark("components-bench")

    # chain edges (i, i+1) within each block of `chain` ids
    pairs = (
        spark.range(n_nodes)
        .where(F.col("id") % chain != chain - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .localCheckpoint(eager=True)  # materialize input before timing
    )
    n_pairs = pairs.count()

    stats: dict = {}
    t0 = time.monotonic()
    comp = duplicate_components(pairs, max_iters=25, stats=stats)
    # every node must carry its block's smallest id
    wrong = comp.where(
        F.col("component_id") != (F.col("doc_id") - F.col("doc_id") % chain)
    ).count()
    wall = round(time.monotonic() - t0, 2)
    assert wrong == 0, f"{wrong} mislabeled nodes"

    print(json.dumps({
        "metric": "duplicate_components wall on synthetic chain graph",
        "n_pairs": n_pairs,
        "n_nodes": n_nodes,
        "chain_diameter": chain,
        "iterations": stats.get("iterations"),
        "wall_sec": wall,
        "jobs_per_round": 1,
        "note": "convergence count piggybacks on the localCheckpoint "
                "action via Observation (was: separate count() job/round)",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
