"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``     — brute-force cosine top-k against one query vector:
                        the correctness baseline.  `F.zip_with` dot product +
                        window top-k, all JVM-side.
* ``cosine_knn_pairs``— all-pairs k-NN via a block-nested join bounded by an
                        LSH pre-filter (see below) or, for small dims tables,
                        a broadcast cross join.
* ``lsh_ann_topk``    — the scale path: random-hyperplane LSH.  Each vector
                        gets a b-bit signature (sign of dot with b fixed
                        pseudo-random planes); candidates share a signature
                        prefix bucket; exact cosine re-ranks within buckets.
                        At 10^9+ vectors only the bucket groupBy shuffles.

Planes are deterministic (seeded md5 arithmetic) so signatures are stable
across runs and reproducible by external engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(embeddings: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k by cosine against the vector with ``query_id``.

    BASELINE ONLY: this scans the full corpus per query — it exists as the
    exact ground truth for the annindex recall contracts.  Production
    probes belong on ``operators.annindex`` (prebuilt, partition-pruned,
    batched).

    The query vector is a one-row broadcast (crossJoin with a broadcast hint
    — no shuffle of the big side); scoring is a narrow map; the final top-k
    is a TakeOrdered, not a full sort.  The scan is widened when a small
    file under-splits (r6: the per-row higher-order dot product ran on 2 of
    32 cores at sf1.0, 0.93s -> 0.53s; no-op at cluster scale).
    """
    from entity_extraction_svc_spark.operators.scanwide import widen_scan

    embeddings = widen_scan(embeddings)
    qvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # query norm precomputed on the (1-row) broadcast side — otherwise the
    # whole sqrt-aggregate re-evaluates per scanned row
    q = embeddings.filter(F.col(id_col) == query_id).select(
        qvec.alias("qvec"), _norm(qvec).alias("qnorm")
    )
    emb_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(
                _dot(emb_d, F.col("qvec")) / (_norm(emb_d) * F.col("qnorm")), 6
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random ±1 component via md5 — reproducible
    anywhere."""
    import hashlib

    h = hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()
    return 1.0 if int(h[:8], 16) % 2 == 0 else -1.0


def rp_signature(vec_col: Column, dim: int, bits: int = 8,
                 offset: int = 0) -> Column:
    """Random-hyperplane b-bit signature: bit_j = sign(<v, plane_{offset+j}>).
    ``offset`` selects a disjoint plane family, so per-band signatures
    (banding beyond a single long's 63 bits) reuse the same deterministic
    plane table — band b over planes [b*cb, (b+1)*cb) is bit-identical to
    slicing one wide signature."""
    sig = F.lit(0).cast("long")
    for j in range(bits):
        plane = [ _plane_component(offset + j, d) for d in range(dim) ]
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array([F.lit(c) for c in plane]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_ann_topk(embeddings: DataFrame, query_id: int, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 bits: int = 8, probe_hamming: int = 1) -> DataFrame:
    """ANN top-k: restrict exact scoring to vectors whose random-hyperplane
    signature is within ``probe_hamming`` of the query's (multi-probe LSH).

    BASELINE ONLY: recomputes every signature per query (scan-per-query
    shape) — kept as the self-contained correctness reference.  Production
    probes belong on ``operators.annindex.batch_probe_rp`` (prebuilt
    rp_sig-partitioned index, Hamming-ball partition pruning).

    At scale the table is pre-partitioned/bucketed by signature so a probe
    touches only ~(1 + bits) / 2^bits of the data; here the signature is
    computed on the fly and the filter happens before any scoring work.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    sigd = embeddings.withColumn("rp_sig", rp_signature(F.col(vec_col), dim, bits))
    q = sigd.filter(F.col(id_col) == query_id).select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qvec"),
        F.col("rp_sig").alias("q_sig"),
    )
    cand = (
        sigd.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .filter(
            F.bit_count(F.col("rp_sig").bitwiseXOR(F.col("q_sig"))) <= probe_hamming
        )
    )
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def centroid_ivf_topk(embeddings: DataFrame, query_id: int, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_lists: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-flat ANN: assign every vector to its nearest of ``n_lists``
    deterministic pseudo-random centroids (coarse quantizer), score only the
    ``n_probe`` lists nearest the query.

    BASELINE ONLY: re-assigns the corpus per query — production probes
    belong on ``operators.annindex.batch_probe_ivf`` (prebuilt
    list_id-partitioned index, k-means centroids, n_probe pruning).

    The list id is the natural partition/bucket key at scale — a probe reads
    n_probe/n_lists of the corpus.  Centroids here are seeded unit vectors;
    a production build would k-means them (same plumbing).
    """
    dim = len(embeddings.select(vec_col).first()[0])
    cents = []
    for c in range(n_lists):
        comps = [_plane_component(1000 + c, d) for d in range(dim)]
        nrm = math.sqrt(sum(x * x for x in comps))
        cents.append([x / nrm for x in comps])
    cent_arr = F.array([F.array([F.lit(x) for x in cv]) for cv in cents])

    def nearest_list(vec: Column) -> Column:
        sims = F.transform(cent_arr, lambda cv: _dot(
            F.transform(vec, lambda x: x.cast("double")), cv))
        return F.array_position(sims, F.array_max(sims)) - 1

    assigned = embeddings.withColumn("list_id", nearest_list(F.col(vec_col)))
    qrow = assigned.filter(F.col(id_col) == query_id).select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qvec")
    )
    # lists ranked by centroid similarity to the query
    qvec = qrow.first()[0]
    sims = [
        (i, sum(a * b for a, b in zip(qvec, cv)) / (math.sqrt(sum(a * a for a in qvec)) or 1.0))
        for i, cv in enumerate(cents)
    ]
    probe = [i for i, _ in sorted(sims, key=lambda t: -t[1])[:n_probe]]
    cand = assigned.filter(F.col("list_id").isin(probe) & (F.col(id_col) != query_id))
    return (
        cand.crossJoin(F.broadcast(qrow))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
