"""Build an R-times-replicated sf directory for large-scale gate runs.

``python tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10`` writes every
driver table to the target dir with fact-table ids offset per replica
(dimension tables copy verbatim, so FKs stay valid).  The correctness
gate compares Spark vs DuckDB on the SAME input, so replicated data is a
legitimate scale point — it is NOT a throughput benchmark corpus (texts
repeat exactly; dedup sees R-member exact-dup groups, which is itself a
useful stressor for the bucket caps).

Offsets use 10^7 per replica: far above any source id, far below the
10^9 range the PII fixture corpus reserves (doc_pii unions fixture rows
with the documents table — a collision would silently merge rows).
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10_000_000

COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]
OFFSET_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main(src: str, dst: str, r: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied", flush=True)
    for t, keys in OFFSET_KEYS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        parts = []
        for i in range(r):
            sel = ", ".join(
                f"{c} + {i * OFF} AS {c}" if c in keys else c for c in cols
            )
            parts.append(
                f"SELECT {sel} FROM read_parquet('{src}/{t}.parquet')"
            )
        # Parallelism grain lesson, re-learned at gate scale: ONE parquet
        # file = 1-2 Spark splits regardless of size (and one DuckDB
        # morsel source per row group), so the 10x minhash ran its md5
        # storm on 2 of 8 cores for 20+ minutes.  Fact tables are written
        # as a DIRECTORY of one file per replica (Spark reads the dir
        # natively; check_contract globs it for DuckDB), with small row
        # groups inside so both engines parallelize within files too.
        tdir = os.path.join(dst, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        rgs = 4096 if t in ("documents", "embeddings") else 262144
        for i, part_sql in enumerate(parts):
            con.execute(
                f"COPY ({part_sql}) TO '{tdir}/part-{i:04d}.parquet' "
                f"(FORMAT parquet, ROW_GROUP_SIZE {rgs})"
            )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{tdir}/*.parquet')"
        ).fetchone()[0]
        print(f"{t}: x{r} -> {n} rows in {len(parts)} files", flush=True)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, r)
