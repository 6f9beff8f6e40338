"""Synthesize an sf1-scale test-data directory by key-shifted replication
of /root/testdata/sf0.1 (round-4 verdict item 5: run the full oracle
matrix at sf1 — no sf1 directory ships with the sandbox, and the gate
only needs both engines to read IDENTICAL parquet, so replication is a
valid scale-up).

Each copy ``i`` shifts every key column by a disjoint stride (joins stay
consistent within a copy, never across), and perturbs document text with
a tiny per-copy suffix so the corpus gains realistic NEAR-duplicate
structure instead of a degenerate 10-way exact-duplicate explosion.
Dimension tables (region, nation) are not replicated.

Usage: python scripts/make_scaled_sf.py [--k 10] [--src /root/testdata/sf0.1]
           [--out /tmp/doctor_spark_sf1]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb

SHIFTS = {
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
}
DIMS = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/doctor_spark_sf1")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )

    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(args.k):
            proj = []
            for c in cols:
                if c in shifts:
                    proj.append(f"{c} + {i * shifts[c]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # tiny suffix: near-duplicate, not exact-duplicate
                    proj.append(f"text || ' r{i}' AS text")
                elif t == "documents" and c == "n_chars" and i > 0:
                    proj.append(f"n_chars + {2 + len(str(i))} AS n_chars")
                else:
                    proj.append(c)
            selects.append(
                "SELECT "
                + ", ".join(proj)
                + f" FROM read_parquet('{args.src}/{t}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        con.sql(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT parquet)")
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
