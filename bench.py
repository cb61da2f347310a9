"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The flagship number is the full KG-construction pipeline (HTML -> text ->
chunk -> NER -> link -> triples) over a deterministic 10k-page fixture corpus
(FIXTURES.md), reported as kg_pipeline_10k; the remaining queries cover the
training-data operators and a scan-heavy relational baseline on the sf_dir
tables.  tools/bench_scaling.py reuses run_benches() at two parallelism
levels for the N-vs-4N scaling-efficiency evidence (BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "10000"))


def _bench_fixture_dir(n_docs: int) -> str:
    """Deterministic n-doc page corpus, generated once and cached."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures

    d = os.path.join("/tmp", f"kg_bench_fixtures_sharded_{n_docs}")
    ensure_fixtures(d, n_docs, shards=64)
    return d


def run_benches(spark, sf_dir: str, bench_docs: int = BENCH_DOCS) -> dict[str, dict]:
    """Runs every headline query; returns {name: {sec, rows}}."""
    from pyspark.sql import functions as F

    from entity_extraction_svc_spark.operators.dedup import (
        minhash_dup_pairs,
        ngram_jaccard_pairs,
    )
    from entity_extraction_svc_spark.operators.simsearch import cosine_topk
    from entity_extraction_svc_spark.operators.textstats import doc_stats
    from entity_extraction_svc_spark.plans.fused import build_fused

    results: dict[str, dict] = {}

    def timed(name, fn, repeats: int = 3):
        """min-of-N wall time for EVERY query: the driver's bench is
        single-shot on a multi-tenant box (BASELINE.md documents 0.70-0.87
        tenant swings; r2's kg_pipeline_10k 3.55->4.63s was exactly such
        noise), so all rows follow tools/bench_scaling.py's min-of-3
        protocol — steady-state throughput, not first-compile latency."""
        best, rows = None, None
        for _ in range(repeats):
            # operators that persist internally (pack_sequences) must not
            # serve rep 2+ from cache — min-of-N books the COLD path
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        results[name] = {"sec": round(best, 3), "rows": rows}

    # flagship: fused KG pipeline (extract->chunk->NER->link in one narrow
    # mapInPandas; shuffles only in the triples aggregation) over the
    # generated page corpus
    fixdir = _bench_fixture_dir(bench_docs)

    # warm-up: python worker pool + codegen, tiny slice (steady-state
    # throughput is the comparable number; session startup is not)
    _wp = spark.read.parquet(f"{fixdir}/pages.parquet").limit(64)
    _, _wt = build_fused(spark, _wp, fixdir)
    _wt.count()

    def kg_run():
        pages = spark.read.parquet(f"{fixdir}/pages.parquet")
        linked, triples = build_fused(spark, pages, fixdir)
        linked = linked.persist()
        n_linked = linked.filter(F.col("rank") == 0).count()
        n_triples = triples.count()
        linked.unpersist()
        return n_linked + n_triples

    timed("kg_pipeline_10k", kg_run, repeats=3)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    timed("doc_stats", lambda: doc_stats(docs).count())

    from entity_extraction_svc_spark.operators.packing import pack_sequences

    timed("doc_pack", lambda: pack_sequences(docs, seq_len=2048).count())
    timed("dedup_minhash_pairs", lambda: minhash_dup_pairs(docs, threshold=0.5).count())
    timed(
        "dedup_ngram_jaccard",
        lambda: ngram_jaccard_pairs(docs, threshold=0.5).count(),
    )
    timed("sim_cosine_topk", lambda: cosine_topk(emb, query_id=0, k=10).count())

    # prebuilt-index ANN probe (build cached once per sf_dir; the probe is
    # the steady-state cost — a partition-pruned scan of ~1/3 of buckets)
    from entity_extraction_svc_spark.operators import annindex as ai

    import hashlib

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    tag = hashlib.md5(f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:10]
    idx_dir = os.path.join("/tmp", f"kg_bench_annidx_{tag}")
    if not ai.index_ready(idx_dir):
        ai.build_rp_index(emb, idx_dir, bits=8)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    timed(
        "sim_ann_probe",
        lambda: ai.probe_rp_index(
            spark, idx_dir, qvec, k=10, probe_hamming=3, exclude_id=0
        ).count(),
    )
    timed(
        "rel_grouped_agg",
        lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*"))
        .count(),
    )
    return results


def cpu_calibration() -> float:
    """Fixed pure-numpy burn (min-of-3 seconds): a tenant-noise yardstick
    printed next to the query times.  The SAME code measured 6.5s and
    12.5s driver-bench totals hours apart on this shared box; the
    calibration lets a reader separate code deltas from box deltas
    (ratio query_sec / calib_sec is comparable across rounds, wall
    seconds alone are not)."""
    import numpy as np

    rng = np.random.RandomState(0)
    A = rng.rand(1200, 1200)
    best = None
    for _ in range(3):
        t0 = time.time()
        B = A
        for _ in range(12):
            B = (B @ A) / np.linalg.norm(B)
        sec = time.time() - t0
        best = sec if best is None else min(best, sec)
    return round(best, 3)


def _burn_proc(_):
    import numpy as np

    A = np.random.RandomState(1).rand(600, 600)
    B = A
    for _ in range(24):
        B = (B @ A) / np.linalg.norm(B)
    return float(B[0, 0])


def cpu_calibration_parallel(procs: int | None = None) -> float:
    """The PARALLEL twin (min-of-3, `procs` worker processes): multi-tenant
    steal degrades aggregate capacity while leaving a single thread fast —
    measured on this box: serial calib 0.91s next to Spark rows 2-5x slow.
    Spark's 32-way stages track THIS number, not the serial one."""
    import multiprocessing as mp

    procs = procs or int(CPUS)
    best = None
    with mp.Pool(procs) as pool:
        for _ in range(3):
            t0 = time.time()
            pool.map(_burn_proc, range(procs))
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
    return round(best, 3)


# Quiet-box reference for the parallel calibration burn (measured
# 2026-08-17, BENCH.md §calibration).  The normalization rule, as applied
# to cross-round comparisons: normalized_sec = sec / max(noise_factor, 1)
# where noise_factor = cpu_calib_par_sec / this constant — i.e. times are
# deflated when the box is slower than the quiet reference and NEVER
# inflated when it is faster, so normalized numbers are conservative.
QUIET_CALIB_PAR_SEC = 1.02


def main() -> None:
    from entity_extraction_svc_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = run_benches(spark, SF_DIR)
    total = round(sum(r["sec"] for r in results.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    calib_par = cpu_calibration_parallel()
    noise = max(calib_par / QUIET_CALIB_PAR_SEC, 1.0)
    out = {
        "metric": "kg_pipeline+training_ops_total",
        "value": total,
        "unit": "sec",
        "queries": {k: v["sec"] for k, v in results.items()},
        "sf": sf,
        "docs_per_sec_kg": round(BENCH_DOCS / results["kg_pipeline_10k"]["sec"], 1),
        "cpu_calib_sec": cpu_calibration(),
        "cpu_calib_par_sec": calib_par,
        "box_noise_factor": round(noise, 3),
        "value_normalized": round(total / noise, 3),
        "queries_normalized": {
            k: round(v["sec"] / noise, 3) for k, v in results.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
