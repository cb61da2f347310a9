"""Sustained-throughput + triples-stage skew rehearsal (ROADMAP #4 / VERDICT
r1 item 8): run the fused pipeline over a multi-million-page generated corpus
at full box parallelism, record docs/s, the triples-aggregation wall, and
per-partition row-count balance of the subject-hash repartition (the direct
evidence that no head subject dominates a reducer).

The triples ``distinct`` input is KB-bounded by construction (the distinct-QID
set broadcast-semi-joins the triple store), so the thing to watch at scale is
(a) the fused scan's sustained rate and (b) balance of the subject-hash
partitions. Appends a row to BENCH.md's Sustained table.

Usage: python tools/bench_sustained.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.plans.fused import build_fused
    from entity_extraction_svc_spark.session import get_spark

    d = f"/tmp/kg_bench_fixtures_sharded_{n_docs}"
    t0 = time.time()
    ensure_fixtures(d, n_docs, shards=128)
    gen_sec = round(time.time() - t0, 1)

    spark = get_spark(app_name=f"sustained{n_docs}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 << 10))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{d}/pages.parquet")

    # warm-up (codegen + python workers)
    wl, wt = build_fused(spark, pages.limit(64), d)
    wt.count()

    linked, triples = build_fused(spark, pages, d)
    linked = linked.persist()
    t0 = time.time()
    n_linked = linked.filter(F.col("rank") == 0).count()
    link_wall = time.time() - t0

    t0 = time.time()
    n_triples = triples.count()
    triples_wall = time.time() - t0

    # subject-hash partition balance: max/mean rows per partition of the
    # repartitioned triples output (the skew-rehearsal evidence)
    balance = (
        triples.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"),
             F.count("*").alias("parts"))
        .first()
    )
    linked.unpersist()

    report = {
        "n_docs": n_docs, "cpus": cpus, "gen_sec": gen_sec,
        "link_wall_sec": round(link_wall, 1),
        "docs_per_sec": round(n_docs / link_wall, 1),
        "n_linked": n_linked,
        "triples_wall_sec": round(triples_wall, 2),
        "n_triples": n_triples,
        "triples_partitions": balance["parts"],
        "triples_rows_max_partition": balance["mx"],
        "triples_rows_avg_partition": round(balance["avg"], 1),
        "skew_ratio_max_over_avg": round(balance["mx"] / balance["avg"], 2),
    }
    print(json.dumps(report))

    bench = os.path.join(REPO, "BENCH.md")
    text = open(bench).read()
    marker = "| 2M pages |"
    line = (f"| {n_docs//1_000_000}M pages | {report['link_wall_sec']} | "
            f"{report['docs_per_sec']:,.0f} | {n_linked:,} |\n")
    if marker in text and line not in text:
        idx = text.find("\n", text.find(marker)) + 1
        text = text[:idx] + line + text[idx:]
        open(bench, "w").write(text)
        print("appended BENCH.md row")


if __name__ == "__main__":
    main()
