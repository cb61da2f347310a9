"""Persisted ANN index lifecycle: build once, probe with partition pruning.

The round-1 ANN operators (``simsearch.lsh_ann_topk`` / ``centroid_ivf_topk``)
compute every vector's signature / list assignment at query time — a full
corpus scan per query.  At 10^9 vectors the index must be a *materialized,
partition-keyed table* so a probe reads only the matching buckets:

* ``build_rp_index``  — random-hyperplane signature per vector, written as
                        parquet **partitioned by rp_sig** (2^bits directories).
                        A probe with Hamming radius h reads sum_{i<=h} C(bits,i)
                        of 2^bits partitions (bits=8, h=2 → 37/256 ≈ 14%).
* ``build_ivf_index`` — IVF-flat: spherical k-means centroids fitted on a
                        deterministic sample (k-means++ init, Lloyd's
                        iterations — NOT seeded random planes), vectors
                        assigned to their nearest centroid via an
                        Arrow-vectorized pandas UDF, written **partitioned by
                        list_id**.  A probe reads n_probe/n_lists partitions.
* ``probe_rp_index`` / ``probe_ivf_index`` — driver computes the *query's*
                        signature / centroid ranking (one vector, pure
                        numpy), then filters on the partition column so the
                        parquet scan prunes directories (visible as
                        PartitionFilters in .explain), and exact-cosine
                        re-ranks only the surviving buckets JVM-side.

Index metadata (dim, bits, centroids) lives in ``_ann_meta.json`` inside the
index directory — Spark's file index ignores ``_``-prefixed files, so the
sidecar never pollutes the scan.

Everything is deterministic: hyperplanes reuse ``simsearch._plane_component``
(md5-seeded ±1), the k-means sample is ordered by xxhash64(id), and the
k-means++ seeding uses a fixed RandomState.  Signatures are therefore stable
across runs and engines.

Reference parity note: the reference service has no vector index (its linker
is dictionary-based); this module is part of the training-data-pipeline
surface (brief: "similarity search ... IVF or LSH-bucketed variant as the
scale path").
"""

from __future__ import annotations

import json
import os
from itertools import combinations
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from entity_extraction_svc_spark.operators.simsearch import _plane_component, cosine

META_NAME = "_ann_meta.json"


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _planes(dim: int, bits: int) -> np.ndarray:
    """(bits, dim) ±1 hyperplane matrix, identical to simsearch.rp_signature's
    per-bit planes so on-the-fly and indexed signatures agree bit-for-bit."""
    return np.array(
        [[_plane_component(j, d) for d in range(dim)] for j in range(bits)],
        dtype=np.float64,
    )


def rp_sig_of(vec: Sequence[float], planes: np.ndarray) -> int:
    """Signature of ONE vector, driver-side (used for the query only)."""
    dots = planes @ np.asarray(vec, dtype=np.float64)
    return int(sum(1 << j for j, d in enumerate(dots) if d > 0))


def _hamming_ball(sig: int, bits: int, radius: int) -> list[int]:
    sigs = [sig]
    for h in range(1, radius + 1):
        for comb in combinations(range(bits), h):
            sigs.append(sig ^ sum(1 << b for b in comb))
    return sigs


def _qarr(qvec: Sequence[float]):
    return F.array([F.lit(float(x)) for x in qvec])


def _write_meta(index_dir: str, meta: dict) -> None:
    with open(os.path.join(index_dir, META_NAME), "w") as fh:
        json.dump(meta, fh)


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_NAME)) as fh:
        return json.load(fh)


def index_ready(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, META_NAME))


# ---------------------------------------------------------------------------
# random-hyperplane (LSH) index
# ---------------------------------------------------------------------------

def _rp_sig_udf(dim: int, bits: int):
    """Arrow-batched signature assignment: one (batch × dim) @ (dim × bits)
    matmul per batch — shared by the batch build and the streaming append."""
    planes_t = _planes(dim, bits).T  # (dim, bits)

    @F.pandas_udf(LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (n, dim)
        bitmat = (mat.astype(np.float64) @ planes_t) > 0  # (n, bits)
        weights = (1 << np.arange(bits)).astype(np.int64)
        return pd.Series(bitmat @ weights)

    return sig_udf


def append_rp_index(embeddings: DataFrame, index_dir: str) -> None:
    """Append new vectors to an EXISTING rp index (same partition layout).
    The incremental-maintenance primitive: signatures are row-local, so an
    append never touches existing buckets' files."""
    meta = read_meta(index_dir)
    sig_udf = _rp_sig_udf(meta["dim"], meta["bits"])
    (
        embeddings.withColumn("rp_sig", sig_udf(F.col(meta["vec_col"])))
        .write.mode("append")
        .partitionBy("rp_sig")
        .parquet(index_dir)
    )


def rp_index_stream(spark: SparkSession, src_dir: str, index_dir: str,
                    checkpoint_dir: str, schema, available_now: bool = True):
    """Structured-Streaming index maintenance: embedding files landing in
    ``src_dir`` are signature-assigned and appended to the partitioned index
    per micro-batch (foreachBatch -> append_rp_index).  Exactly-once = file
    -source checkpointing; the probe path needs no coordination because a
    vector's bucket is a pure function of its value.

    Returns the started StreamingQuery; callers awaitTermination().
    """
    stream = spark.readStream.schema(schema).parquet(src_dir)

    def process_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_rp_index(batch_df, index_dir)
        spark.catalog.refreshByPath(index_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def build_rp_index(embeddings: DataFrame, index_dir: str,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   bits: int = 8) -> None:
    """Materialize the signature table partitioned by ``rp_sig``.

    Signature assignment is one Arrow-batched pandas UDF doing a single
    (batch × dim) @ (dim × bits) matmul — vectorized, no per-row Python.
    The write shuffles nothing (partitionBy on write splits files per task);
    at cluster scale add ``.repartition("rp_sig")`` first if small files
    matter more than write parallelism.
    """
    first = embeddings.select(vec_col).first()
    dim = len(first[0])
    sig_udf = _rp_sig_udf(dim, bits)
    (
        embeddings.withColumn("rp_sig", sig_udf(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("rp_sig")
        .parquet(index_dir)
    )
    _write_meta(index_dir, {"kind": "rp", "bits": bits, "dim": dim,
                            "id_col": id_col, "vec_col": vec_col})


def probe_rp_index(spark: SparkSession, index_dir: str, qvec: Sequence[float],
                   k: int = 10, probe_hamming: int = 2,
                   exclude_id: int | None = None) -> DataFrame:
    """Top-k by exact cosine among vectors whose signature is within
    ``probe_hamming`` of the query's.  The ``rp_sig.isin(...)`` filter is on
    the partition column, so the scan prunes to the probed directories."""
    meta = read_meta(index_dir)
    bits, id_col, vec_col = meta["bits"], meta["id_col"], meta["vec_col"]
    qsig = rp_sig_of(qvec, _planes(meta["dim"], bits))
    probe_sigs = _hamming_ball(qsig, bits, probe_hamming)

    idx = spark.read.parquet(index_dir).filter(F.col("rp_sig").isin(probe_sigs))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    return (
        idx.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), _qarr(qvec)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-flat index (spherical k-means coarse quantizer)
# ---------------------------------------------------------------------------

def kmeans_centroids(embeddings: DataFrame, n_lists: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     sample_n: int = 4096, iters: int = 20) -> np.ndarray:
    """Spherical k-means on a deterministic sample.

    The sample is TakeOrdered by xxhash64(id) (a uniform pseudo-random but
    reproducible subset, bounded driver memory); the fit itself is numpy on
    the driver — centroids are a model artifact, n_lists × dim floats.
    k-means++ seeding with a fixed RandomState keeps the index reproducible.
    """
    sample = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_n)
        .toPandas()
    )
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(0)

    # k-means++ init on the unit sphere (distance = 1 - cos)
    cents = [X[rng.randint(len(X))]]
    for _ in range(1, n_lists):
        d = 1.0 - np.max(np.stack([X @ c for c in cents]), axis=0)
        d = np.maximum(d, 0)
        probs = d / d.sum() if d.sum() > 0 else np.full(len(X), 1.0 / len(X))
        cents.append(X[rng.choice(len(X), p=probs)])
    C = np.stack(cents)

    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        newC = np.zeros_like(C)
        for j in range(n_lists):
            members = X[assign == j]
            newC[j] = members.mean(axis=0) if len(members) else C[j]
        norms = np.maximum(np.linalg.norm(newC, axis=1, keepdims=True), 1e-12)
        newC /= norms
        if np.allclose(newC, C, atol=1e-9):
            C = newC
            break
        C = newC
    return C


def ivf_assign_udf(C: np.ndarray):
    """Arrow-batched nearest-centroid assignment (spherical): one matmul +
    argmax per batch.  Shared by the IVF index build and semantic_dedup."""
    Ct = C.T  # (dim, n_lists)

    @F.pandas_udf(LongType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ Ct, axis=1).astype(np.int64))

    return assign_udf


def build_ivf_index(embeddings: DataFrame, index_dir: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_lists: int = 16, sample_n: int = 4096,
                    iters: int = 20) -> None:
    """Fit centroids, assign every vector to its nearest list (vectorized
    argmax over one matmul per Arrow batch), write partitioned by list_id."""
    C = kmeans_centroids(embeddings, n_lists, id_col, vec_col, sample_n, iters)
    assign_udf = ivf_assign_udf(C)
    (
        embeddings.withColumn("list_id", assign_udf(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(index_dir)
    )
    _write_meta(index_dir, {
        "kind": "ivf", "n_lists": n_lists, "dim": C.shape[1],
        "id_col": id_col, "vec_col": vec_col,
        "centroids": C.tolist(),
    })


def probe_ivf_index(spark: SparkSession, index_dir: str, qvec: Sequence[float],
                    k: int = 10, n_probe: int = 4,
                    exclude_id: int | None = None) -> DataFrame:
    """Exact-cosine top-k over the ``n_probe`` lists whose centroids are
    nearest the query.  Centroid ranking is driver-side numpy over the meta
    sidecar (n_lists × dim — tiny); the list_id filter partition-prunes."""
    meta = read_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    C = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ q))[:n_probe].tolist()

    idx = spark.read.parquet(index_dir).filter(F.col("list_id").isin(probe))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    return (
        idx.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), _qarr(qvec)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# batched probes (many queries, one plan) + exact batch baseline
# ---------------------------------------------------------------------------
#
# A probe-per-query loop launches Q jobs; the batch form runs ONE plan:
# the (qid, bucket) probe pairs are a tiny broadcast table, the index scan
# is filtered by isin(all probed buckets) — still partition-pruned — and the
# bucket->qid assignment is a broadcast join.  Window top-k per qid.

def _queries_df(spark: SparkSession, queries: list[tuple[int, Sequence[float]]]):
    return spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "qid long, qvec array<double>",
    )


def _topk_per_qid(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def batch_exact_topk(embeddings: DataFrame,
                     queries: list[tuple[int, Sequence[float]]], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k for every query in one plan: corpus × broadcast(queries)
    scoring, window top-k.  Returns (qid, id, cos_sim) rows — the ground
    truth the ANN probes are measured against."""
    spark = embeddings.sparkSession
    scored = (
        embeddings.join(
            F.broadcast(_queries_df(spark, queries)),
            F.col(id_col) != F.col("qid"),
        )
        .select(
            "qid",
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
        )
    )
    return _topk_per_qid(scored, k, id_col)


def batch_probe_rp(spark: SparkSession, index_dir: str,
                   queries: list[tuple[int, Sequence[float]]], k: int = 10,
                   probe_hamming: int = 3) -> DataFrame:
    """RP-LSH ANN top-k for every query in one partition-pruned plan."""
    meta = read_meta(index_dir)
    bits, id_col, vec_col = meta["bits"], meta["id_col"], meta["vec_col"]
    planes = _planes(meta["dim"], bits)
    balls = [
        (int(q), s)
        for q, v in queries
        for s in _hamming_ball(rp_sig_of(v, planes), bits, probe_hamming)
    ]
    all_sigs = sorted({s for _, s in balls})
    bdf = spark.createDataFrame(balls, "qid long, rp_sig long")
    cand = (
        spark.read.parquet(index_dir)
        .filter(F.col("rp_sig").isin(all_sigs))  # partition pruning
        .join(F.broadcast(bdf), "rp_sig")        # bucket -> qid fanout
        .filter(F.col(id_col) != F.col("qid"))
    )
    scored = cand.join(F.broadcast(_queries_df(spark, queries)), "qid").select(
        "qid",
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
    )
    return _topk_per_qid(scored, k, id_col)


def batch_probe_ivf(spark: SparkSession, index_dir: str,
                    queries: list[tuple[int, Sequence[float]]], k: int = 10,
                    n_probe: int = 12) -> DataFrame:
    """IVF ANN top-k for every query in one partition-pruned plan."""
    meta = read_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    C = np.asarray(meta["centroids"], dtype=np.float64)
    probes = []
    for q, v in queries:
        qv = np.asarray(v, dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        for lid in np.argsort(-(C @ qv))[:n_probe]:
            probes.append((int(q), int(lid)))
    all_lists = sorted({l for _, l in probes})
    pdf = spark.createDataFrame(probes, "qid long, list_id long")
    cand = (
        spark.read.parquet(index_dir)
        .filter(F.col("list_id").isin(all_lists))  # partition pruning
        .join(F.broadcast(pdf), "list_id")
        .filter(F.col(id_col) != F.col("qid"))
    )
    scored = cand.join(F.broadcast(_queries_df(spark, queries)), "qid").select(
        "qid",
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
    )
    return _topk_per_qid(scored, k, id_col)


# ---------------------------------------------------------------------------
# scan accounting (test / plan-audit helper)
# ---------------------------------------------------------------------------

def files_scanned(df: DataFrame) -> int:
    """Number of distinct parquet files a plan actually reads — the direct
    evidence that partition pruning held (compare with files_in_index).
    Call on the *filtered scan* (before any limit) or the count reflects
    only surviving rows."""
    return df.select(F.input_file_name().alias("f")).distinct().count()


def files_in_index(index_dir: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(index_dir):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
