"""Scale rehearsal for the distant-supervision emitters (round 5): run
the fused pipeline over a generated multi-million-page corpus, then time
ner.bio_training_rows and triples.relation_training_pairs over the run's
own linked output — the exact --emit-training path, measured at the
sustained-bench corpus scale.  Appends a row to BENCH.md is left to the
operator; this prints one JSON line.

Usage: python tools/bench_training_emit.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.extract import extract_text
    from entity_extraction_svc_spark.operators.ner import bio_training_rows
    from entity_extraction_svc_spark.operators.triples import (
        relation_training_pairs,
    )
    from entity_extraction_svc_spark.plans.fused import build_fused
    from entity_extraction_svc_spark.session import get_spark

    d = f"/tmp/kg_bench_fixtures_sharded_{n_docs}"
    ensure_fixtures(d, n_docs, shards=128)

    spark = get_spark(app_name=f"emit{n_docs}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{d}/pages.parquet")

    # the emitters' inputs, materialized once so the timings below are
    # the emitters', not the pipeline's
    linked, _ = build_fused(spark, pages, d)
    top1 = (
        linked.filter((F.col("rank") == 0) & F.col("qid").isNotNull())
        .select("url", "start", "end", "qid", F.col("ent_tag").alias("tag"))
        .persist()
    )
    n_links = top1.count()
    docs = extract_text(pages).select("url", "text").persist()
    n_pages = docs.count()

    # ONE action per emitter — a second filtered count would re-run the
    # whole unpersisted plan and double the booked wall (review find)
    t0 = time.time()
    bio = bio_training_rows(docs, top1)
    r = bio.agg(
        F.count("*").alias("n"),
        F.sum((F.col("bio") != "O").cast("long")).alias("e"),
    ).collect()[0]
    n_tok, n_ent = r.n, r.e
    bio_sec = round(time.time() - t0, 2)

    t0 = time.time()
    rel = relation_training_pairs(
        top1.select("url", "start", "end", "qid"),
        spark.read.parquet(f"{d}/kb_triples.parquet"),
    )
    r = rel.agg(
        F.count("*").alias("n"),
        F.sum((F.col("label") != "NO_REL").cast("long")).alias("l"),
    ).collect()[0]
    n_pairs, n_lab = r.n, r.l
    rel_sec = round(time.time() - t0, 2)

    print(json.dumps({
        "n_pages": n_pages, "n_links": n_links,
        "bio_sec": bio_sec, "ner_tokens": n_tok, "ner_entity_tokens": n_ent,
        "bio_tokens_per_sec": round(n_tok / bio_sec),
        "rel_sec": rel_sec, "rel_pairs": n_pairs, "rel_labelled": n_lab,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
