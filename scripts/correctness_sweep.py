"""Run the FULL queries()/oracle_sql() matrix at an arbitrary sf
directory — the driver's correctness gate (rows + schema + values)
replicated locally, with per-engine wall times, so scale-sensitive
divergences (tie-breaks, rounding at aggregation boundaries, band-bucket
collisions) can be checked beyond the driver's sf0.01 (round-4 verdict
item 5).

Usage:
  python scripts/correctness_sweep.py [--sf-dir /root/testdata/sf0.1]
      [--only q1,q2] [--skip q3] [--out /tmp/sweep.json]

Writes one JSON line per query plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from doctor_spark.session import get_spark

    # small input splits: the scaled sf dirs are single parquet files per
    # table, and the driver-matrix queries are CPU-bound — without this
    # a 15 MB documents.parquet runs the whole matrix on 1-2 tasks
    spark = get_spark(
        "correctness-sweep",
        cores=args.cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            # sf1 result sets can stall the driver >120 s in GC while a
            # huge collect materializes; with local heartbeats there is
            # no network to detect failures on — a timeout here kills
            # the session for every later query in the matrix
            "spark.network.timeout": "1200s",
            "spark.executor.heartbeatInterval": "120s",
        },
    )
    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()

    results = []
    for name in sorted(oracles):
        if (only and name not in only) or name in skip:
            continue
        rec: dict = {"query": name}
        try:
            t0 = time.monotonic()
            spark_pdf = _normalize(queries[name](spark, args.sf_dir).toPandas())
            rec["spark_sec"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            con = duckdb.connect()
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')"
                )
            oracle_pdf = _normalize(con.sql(oracles[name]).df())
            rec["oracle_sec"] = round(time.monotonic() - t0, 2)
            rec["rows"] = len(spark_pdf)
            rec["rows_match"] = len(spark_pdf) == len(oracle_pdf)
            rec["schema_match"] = list(spark_pdf.columns) == list(
                oracle_pdf.columns
            )
            diffs = 0
            if rec["rows_match"] and rec["schema_match"]:
                for col in spark_pdf.columns:
                    for a, b in zip(
                        spark_pdf[col].tolist(), oracle_pdf[col].tolist()
                    ):
                        if not _values_equal(a, b):
                            diffs += 1
            rec["value_diffs"] = diffs
            rec["ok"] = (
                rec["rows_match"] and rec["schema_match"] and diffs == 0
            )
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            rec["ok"] = False
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results.append(rec)
        print(json.dumps(rec), flush=True)

    summary = {
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_ok": sum(1 for r in results if r.get("ok")),
        "failed": [r["query"] for r in results if not r.get("ok")],
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        Path(args.out).write_text(
            "\n".join(json.dumps(r) for r in results)
            + "\n"
            + json.dumps(summary)
            + "\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
