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

def _vec_dim(embeddings: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the first non-null row, with an explicit
    error instead of the opaque ``len(None)`` TypeError on an empty (or
    all-null) table."""
    first = embeddings.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:
        raise ValueError(
            f"cannot infer vector dim: '{vec_col}' has no non-null rows"
        )
    return len(first[0])


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
    dim = _vec_dim(embeddings, vec_col)
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

def unit_sample(embeddings: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", sample_n: int = 4096) -> np.ndarray:
    """Deterministic bounded sample as a unit-normalized (n, dim) matrix:
    TakeOrdered by xxhash64(id) — uniform pseudo-random but reproducible,
    bounded driver memory.  Shared by every index fit so one sample job
    feeds both the coarse k-means and the PQ codebooks."""
    sample = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_n)
        .toPandas()
    )
    if sample.empty:
        raise ValueError("empty embeddings table: nothing to sample for index fit")
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X


def kmeans_centroids(embeddings: DataFrame, n_lists: int,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     sample_n: int = 4096, iters: int = 20,
                     X: np.ndarray | None = None) -> np.ndarray:
    """Spherical k-means on a deterministic sample (see ``unit_sample``;
    pass ``X=`` to reuse an already-fetched sample).  The fit itself is
    numpy on the driver — centroids are a model artifact, n_lists × dim
    floats.  k-means++ seeding with a fixed RandomState keeps the index
    reproducible."""
    if X is None:
        X = unit_sample(embeddings, id_col, vec_col, sample_n)
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


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized codes inside the IVF lists (memory-bounded probes)
# ---------------------------------------------------------------------------
#
# At 10^10 vectors even the pruned IVF lists are too big to scan as full
# float arrays: a 64-dim float64 vector is 512 B, its PQ code is m_sub
# bytes (64x smaller at m_sub=8).  The index stores ONLY (id, list_id,
# codes); probes score candidates by asymmetric distance computation (ADC):
# the query precomputes an (m_sub x n_codes) table of sub-dot-products once,
# and every candidate's approximate dot is m_sub table lookups — no float
# vector ever leaves disk.  An optional refine step exact-re-ranks the ADC
# shortlist by joining the ORIGINAL embeddings table on the shortlist ids
# (Faiss's IVFPQ+refine recipe).
#
# Residual encoding (Faiss by_residual=true, the default here): codes
# quantize x − centroid[list(x)] with ONE codebook set shared across lists
# (pooled-residual training, Faiss's recipe).  Under the dot-product
# metric the per-list cost collapses: dot(q, c + dec(r)) = dot(q, c) +
# dot(q, dec(r)), so a probe still precomputes a single (m_sub x n_codes)
# table from the shared books plus an n_lists-long constant vector q @ C —
# NOT a table per list.  Residuals matter exactly where flat PQ is
# structurally blind: members of a tight cluster share near-identical
# codes when the vector itself is quantized (codes separate clusters, not
# members), but their residuals spread across the code space, so ADC can
# rank WITHIN a cluster and the refine shortlist shrinks ~10x (see
# BENCH.md).  ``by_residual=False`` keeps the flat variant readable and
# probes branch on the meta flag, so pre-existing indexes keep working.

def _pq_fit(X: np.ndarray, m_sub: int, n_codes: int,
            iters: int = 25) -> np.ndarray:
    """Codebooks (m_sub, n_codes, sub_dim) via per-subspace k-means on the
    (already unit-normalized) sample.  Fixed RandomState; k-means++ init."""
    n, dim = X.shape
    sub = dim // m_sub
    books = np.zeros((m_sub, n_codes, sub), dtype=np.float64)
    rng = np.random.RandomState(7)
    for m in range(m_sub):
        S = X[:, m * sub:(m + 1) * sub]
        k = min(n_codes, len(np.unique(S, axis=0)))
        cents = [S[rng.randint(len(S))]]
        # incremental k-means++: keep the running min distance and update
        # it with only the newest center — recomputing every center per
        # step is O(k^2 n) and dominated the whole PQ fit
        d2 = ((S - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            tot = d2.sum()
            probs = d2 / tot if tot > 0 else np.full(len(S), 1.0 / len(S))
            c = S[rng.choice(len(S), p=probs)]
            cents.append(c)
            d2 = np.minimum(d2, ((S - c) ** 2).sum(axis=1))
        C = np.stack(cents)
        for _ in range(iters):
            # ||s-c||^2 = ||s||^2 - 2 s.c + ||c||^2; the matmul form avoids
            # the (n, k, sub) broadcast temp (measured 75s -> ~3s for a
            # 4096-sample, 8-subspace, 256-code fit)
            d2 = -2.0 * (S @ C.T) + (C ** 2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            newC = np.array([
                S[assign == j].mean(axis=0) if (assign == j).any() else C[j]
                for j in range(len(C))
            ])
            if np.allclose(newC, C, atol=1e-10):
                C = newC
                break
            C = newC
        books[m, :len(C)] = C
        if len(C) < n_codes:  # degenerate sample: repeat last centroid
            books[m, len(C):] = C[-1]
    return books


def _pq_encode_udf(books: np.ndarray):
    """Arrow-batched PQ encoding: per subspace one (batch x n_codes)
    distance matrix + argmin.  Returns array<smallint> codes."""
    from pyspark.sql.types import ArrayType, ShortType

    m_sub, n_codes, sub = books.shape

    @F.pandas_udf(ArrayType(ShortType()))
    def encode_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        codes = np.zeros((len(mat), m_sub), dtype=np.int16)
        for m in range(m_sub):
            S = mat[:, m * sub:(m + 1) * sub]
            # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2 ; argmin over c
            d = -2.0 * (S @ books[m].T) + (books[m] ** 2).sum(axis=1)[None, :]
            codes[:, m] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return encode_udf


def _pq_encode_residual_udf(C: np.ndarray, books: np.ndarray):
    """Arrow-batched residual-PQ encoding: residual = unit(x) − C[list],
    then per-subspace argmin against the shared residual codebooks."""
    from pyspark.sql.types import ArrayType, ShortType

    m_sub, _n_codes, sub = books.shape

    @F.pandas_udf(ArrayType(ShortType()))
    def encode_udf(vecs: pd.Series, lids: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        R = mat - C[lids.to_numpy().astype(np.int64)]
        codes = np.zeros((len(R), m_sub), dtype=np.int16)
        for m in range(m_sub):
            S = R[:, m * sub:(m + 1) * sub]
            d = -2.0 * (S @ books[m].T) + (books[m] ** 2).sum(axis=1)[None, :]
            codes[:, m] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return encode_udf


def _encoded_rows(embeddings: DataFrame, C: np.ndarray, books: np.ndarray,
                  id_col: str, vec_col: str, by_residual: bool) -> DataFrame:
    """(id, list_id, codes) — the stored IVF-PQ row shape, shared by build
    and append so both encode identically off the frozen model."""
    assign_udf = ivf_assign_udf(C)
    with_list = embeddings.select(
        F.col(id_col), F.col(vec_col),
        assign_udf(F.col(vec_col)).alias("list_id"),
    )
    if by_residual:
        enc = _pq_encode_residual_udf(C, books)
        codes = enc(F.col(vec_col), F.col("list_id"))
    else:
        codes = _pq_encode_udf(books)(F.col(vec_col))
    return with_list.select(F.col(id_col), "list_id", codes.alias("codes"))


def build_ivfpq_index(embeddings: DataFrame, index_dir: str,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_lists: int = 16, m_sub: int = 8, n_codes: int = 256,
                      sample_n: int = 4096, by_residual: bool = True) -> None:
    """Coarse k-means lists + per-subspace PQ codebooks (both fitted on the
    same deterministic bounded sample, driver numpy — model artifacts, not
    data collects); vectors stored as (id, codes) partitioned by list_id.
    The float vectors do NOT enter the index — that is the memory bound.
    ``by_residual`` (default) trains the codebooks on pooled residuals
    x − centroid[list(x)] — see the section comment for why that fixes
    within-cluster ranking at zero extra query cost."""
    dim = _vec_dim(embeddings, vec_col)
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    X = unit_sample(embeddings, id_col, vec_col, sample_n)
    C = kmeans_centroids(embeddings, n_lists, id_col, vec_col, sample_n, X=X)
    fit_input = X - C[np.argmax(X @ C.T, axis=1)] if by_residual else X
    books = _pq_fit(fit_input, m_sub, n_codes)
    (
        _encoded_rows(embeddings, C, books, id_col, vec_col, by_residual)
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(index_dir)
    )
    _write_meta(index_dir, {
        "kind": "ivfpq", "n_lists": n_lists, "m_sub": m_sub,
        "n_codes": n_codes, "dim": dim, "id_col": id_col, "vec_col": vec_col,
        "by_residual": by_residual,
        "centroids": C.tolist(), "codebooks": books.tolist(),
    })


def _adc_score_udf(table: np.ndarray, base: np.ndarray | None = None):
    """ADC scorer: approx dot(q, x) = [base[list_id] +] sum_m
    table[m, codes[m]].  One numpy take+sum per Arrow batch; ``base`` is
    the per-list constant q @ C of a residual index (None for flat PQ)."""
    from pyspark.sql.types import DoubleType

    m_sub = table.shape[0]

    @F.pandas_udf(DoubleType())
    def adc_udf(codes: pd.Series, lids: pd.Series) -> pd.Series:
        mat = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m_sub)
        if base is None:
            score = np.zeros(len(mat), dtype=np.float64)
        else:
            score = base[lids.to_numpy().astype(np.int64)].copy()
        for m in range(m_sub):
            score += table[m][mat[:, m]]
        return pd.Series(score)

    return adc_udf


def probe_ivfpq_index(spark: SparkSession, index_dir: str,
                      qvec: Sequence[float], k: int = 10, n_probe: int = 4,
                      shortlist: int = 100,
                      refine_with: DataFrame | None = None,
                      exclude_id: int | None = None) -> DataFrame:
    """ADC top-``shortlist`` over the probed lists; exact-cosine re-rank to
    top-k when ``refine_with`` (the original embeddings table) is given,
    else ADC-ranked top-k directly.

    The scan reads (id, codes) from n_probe/n_lists partitions only; the
    refine join touches ``shortlist`` rows of the source table — at any
    corpus size the probe's data volume is bounded by the code bytes of
    the probed lists plus shortlist * dim floats.

    Sizing ``shortlist``: it must cover the ADC-tie set.  FLAT-PQ codes
    cannot rank WITHIN a tight cluster (members share near-identical
    codes), so dup-clusters of ~m members needed shortlist ≥ m (measured
    2/10 at shortlist 200 vs 10/10 at 4,000 on 3,125-member clusters).
    Residual indexes (the default) rank within clusters too, so the
    shortlist only needs to absorb residual-quantization noise — an order
    of magnitude smaller on the same fixture (BENCH.md).
    """
    meta = read_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    C = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    m_sub, _n_codes, sub = books.shape
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ q))[:n_probe].tolist()
    # (m_sub x n_codes) sub-dot table: dot(q, decode(codes)) decomposes as
    # the sum of per-subspace dots because subspaces are disjoint slices
    table = np.stack([books[m] @ q[m * sub:(m + 1) * sub]
                      for m in range(m_sub)])

    base = (C @ q) if meta.get("by_residual") else None
    idx = spark.read.parquet(index_dir).filter(F.col("list_id").isin(probe))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    adc = idx.select(
        F.col(id_col),
        _adc_score_udf(table, base)(
            F.col("codes"), F.col("list_id")
        ).alias("adc_score"),
    ).orderBy(F.desc("adc_score"), F.asc(id_col)).limit(shortlist)
    if refine_with is None:
        return adc.limit(k)
    short = adc.select(id_col)
    return (
        refine_with.join(F.broadcast(short), id_col)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), _qarr(qvec)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def batch_probe_ivfpq(spark: SparkSession, index_dir: str,
                      queries: list[tuple[int, Sequence[float]]], k: int = 10,
                      n_probe: int = 4, shortlist: int = 100,
                      refine_with: DataFrame | None = None) -> DataFrame:
    """IVFPQ ANN for every query in ONE partition-pruned plan (no driver
    probe loop).  ADC here decodes per (candidate, query) pair — decoded =
    codebook gather, score = row-wise dot with that row's query — one
    einsum per Arrow batch; the per-query table trick of the single probe
    doesn't apply once rows carry different queries."""
    from pyspark.sql.types import DoubleType

    meta = read_meta(index_dir)
    id_col = meta["id_col"]
    C = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    m_sub, _n_codes, sub = books.shape
    probes = []
    for q, v in queries:
        qv = np.asarray(v, dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        for lid in np.argsort(-(C @ qv))[:n_probe]:
            probes.append((int(q), int(lid)))
    all_lists = sorted({l for _, l in probes})
    pdf = spark.createDataFrame(probes, "qid long, list_id long")

    by_residual = bool(meta.get("by_residual"))

    @F.pandas_udf(DoubleType())
    def adc_pair_udf(codes: pd.Series, lids: pd.Series,
                     qvecs: pd.Series) -> pd.Series:
        cm = np.stack(codes.to_numpy()).astype(np.int64)        # (n, m_sub)
        qm = np.stack(qvecs.to_numpy()).astype(np.float64)      # (n, dim)
        qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
        dec = np.concatenate(
            [books[m][cm[:, m]] for m in range(m_sub)], axis=1
        )  # (n, dim) decoded candidates (residuals if by_residual)
        if by_residual:
            dec = dec + C[lids.to_numpy().astype(np.int64)]
        return pd.Series(np.einsum("nd,nd->n", dec, qm))

    cand = (
        spark.read.parquet(index_dir)
        .filter(F.col("list_id").isin(all_lists))   # partition pruning
        .join(F.broadcast(pdf), "list_id")
        .filter(F.col(id_col) != F.col("qid"))
        .join(F.broadcast(_queries_df(spark, queries)), "qid")
        .select(
            "qid", F.col(id_col),
            adc_pair_udf(
                F.col("codes"), F.col("list_id"), F.col("qvec")
            ).alias("adc_score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("adc_score"), F.asc(id_col))
    ranked = cand.withColumn("rn", F.row_number().over(w))
    if refine_with is None:
        return ranked.filter(F.col("rn") <= k).drop("rn")
    short = ranked.filter(F.col("rn") <= shortlist).select("qid", id_col)
    vec_col = meta["vec_col"]
    scored = (
        refine_with.join(F.broadcast(short), id_col)
        .join(F.broadcast(_queries_df(spark, queries)), "qid")
        .select(
            "qid", F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
        )
    )
    return _topk_per_qid(scored, k, id_col)


def append_ivfpq_index(embeddings: DataFrame, index_dir: str) -> None:
    """Append new vectors to an EXISTING IVF-PQ index.  Codebooks and
    coarse centroids are FROZEN at build time (the standard contract:
    retrain when drift warrants a rebuild), so list assignment and codes
    are pure functions of the vector — appends never touch existing
    buckets' files and need no coordination, same as append_rp_index."""
    meta = read_meta(index_dir)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    (
        _encoded_rows(embeddings, C, books, id_col, vec_col,
                      bool(meta.get("by_residual")))
        .write.mode("append")
        .partitionBy("list_id")
        .parquet(index_dir)
    )
