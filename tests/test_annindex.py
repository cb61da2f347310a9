"""Persisted ANN index lifecycle: build-once/probe-pruned semantics.

Covers the round-2 requirements: a probe must read only the matching
partitions of the prebuilt index (< 1/4 of the files), indexed signatures
must agree with the on-the-fly ``rp_signature`` expression bit-for-bit, the
k-means fit must be deterministic, and ANN recall vs the exact baseline must
clear the contract thresholds on the driver's own embeddings table.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators import annindex as ai

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
QIDS = list(range(0, 160, 10))


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def rp_dir(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("annidx") / "rp")
    ai.build_rp_index(emb, d, bits=8)
    return d


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("annidx") / "ivf")
    ai.build_ivf_index(emb, d, n_lists=32)
    return d


@pytest.fixture(scope="module")
def queries(emb):
    rows = emb.filter(F.col("vec_id").isin(QIDS)).collect()
    return [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]


def _exact_sets(emb, queries, k=10):
    exact = ai.batch_exact_topk(emb, queries, k=k).collect()
    out: dict[int, set] = {}
    for r in exact:
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def test_rp_signature_parity(spark, emb, rp_dir):
    """Indexed signatures == the on-the-fly Catalyst rp_signature expr."""
    from entity_extraction_svc_spark.operators.simsearch import rp_signature

    dim = len(emb.select("embedding").first()[0])
    live = emb.select(
        "vec_id", rp_signature(F.col("embedding"), dim, 8).alias("sig")
    )
    stored = spark.read.parquet(rp_dir).select(
        "vec_id", F.col("rp_sig").cast("long").alias("sig")
    )
    assert live.exceptAll(stored).count() == 0
    assert stored.exceptAll(live).count() == 0


def test_rp_probe_partition_pruning(spark, rp_dir, queries):
    """A single-query probe scans < 1/4 of the index's parquet files."""
    qvec = queries[0][1]
    meta = ai.read_meta(rp_dir)
    qsig = ai.rp_sig_of(qvec, ai._planes(meta["dim"], meta["bits"]))
    sigs = ai._hamming_ball(qsig, meta["bits"], 2)  # 37/256 buckets
    scan = spark.read.parquet(rp_dir).filter(F.col("rp_sig").isin(sigs))
    total = ai.files_in_index(rp_dir)
    assert ai.files_scanned(scan) < total / 4
    # and the pruning is in the PLAN, not just the row counts
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "rp_sig" in plan


def test_ivf_probe_partition_pruning(spark, ivf_dir, queries):
    qvec = np.asarray(queries[0][1])
    meta = ai.read_meta(ivf_dir)
    C = np.asarray(meta["centroids"])
    probe = np.argsort(-(C @ (qvec / np.linalg.norm(qvec))))[:6].tolist()
    scan = spark.read.parquet(ivf_dir).filter(F.col("list_id").isin(probe))
    total = ai.files_in_index(ivf_dir)
    assert ai.files_scanned(scan) < total / 4


def test_rp_recall_threshold(spark, emb, rp_dir, queries):
    exact = _exact_sets(emb, queries)
    got = ai.batch_probe_rp(spark, rp_dir, queries, k=10, probe_hamming=3)
    hits: dict[int, set] = {}
    for r in got.collect():
        hits.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [len(hits.get(q, set()) & exact[q]) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.45


def test_ivf_recall_threshold(spark, emb, ivf_dir, queries):
    exact = _exact_sets(emb, queries)
    got = ai.batch_probe_ivf(spark, ivf_dir, queries, k=10, n_probe=12)
    hits: dict[int, set] = {}
    for r in got.collect():
        hits.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [len(hits.get(q, set()) & exact[q]) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.60


def test_ivf_beats_random_pruning(spark, emb, ivf_dir, queries):
    """k-means lists must be *informative*: probing the TOP n_probe lists
    must find more exact neighbors than the same number of arbitrary lists
    (guards against the round-1 failure mode of random centroids)."""
    meta = ai.read_meta(ivf_dir)
    C = np.asarray(meta["centroids"])
    exact = _exact_sets(emb, queries)
    top_hits, bottom_hits = 0, 0
    idx = spark.read.parquet(ivf_dir)
    for q, v in queries[:4]:
        qv = np.asarray(v)
        qv = qv / np.linalg.norm(qv)
        order = np.argsort(-(C @ qv))
        for sel, acc in ((order[:12].tolist(), "top"), (order[-12:].tolist(), "bot")):
            cand = idx.filter(F.col("list_id").isin(sel) & (F.col("vec_id") != q))
            ids = {r.vec_id for r in cand.select("vec_id").collect()}
            n = len(ids & exact[q])
            if acc == "top":
                top_hits += n
            else:
                bottom_hits += n
    assert top_hits > bottom_hits


def test_kmeans_deterministic(emb):
    c1 = ai.kmeans_centroids(emb, n_lists=8, iters=5)
    c2 = ai.kmeans_centroids(emb, n_lists=8, iters=5)
    assert np.allclose(c1, c2)


def test_probe_single_query_matches_batch(spark, emb, rp_dir, ivf_dir, queries):
    q, v = queries[0]
    single = {
        r.vec_id
        for r in ai.probe_rp_index(
            spark, rp_dir, v, k=10, probe_hamming=3, exclude_id=q
        ).collect()
    }
    batch = {
        r.vec_id
        for r in ai.batch_probe_rp(spark, rp_dir, [(q, v)], k=10, probe_hamming=3)
        .collect()
    }
    assert single == batch
    single_ivf = {
        r.vec_id
        for r in ai.probe_ivf_index(
            spark, ivf_dir, v, k=10, n_probe=12, exclude_id=q
        ).collect()
    }
    batch_ivf = {
        r.vec_id
        for r in ai.batch_probe_ivf(spark, ivf_dir, [(q, v)], k=10, n_probe=12)
        .collect()
    }
    assert single_ivf == batch_ivf


def test_streaming_index_append(spark, emb, tmp_path):
    """Incremental index maintenance: new embedding files stream in and are
    signature-assigned + appended per micro-batch; probes then find them,
    and appended signatures agree with the batch build bit-for-bit."""
    idx = str(tmp_path / "rp_stream")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    base = emb.filter(F.col("vec_id") < 400)
    ai.build_rp_index(base, idx, bits=8)
    n0 = spark.read.parquet(idx).count()

    late = emb.filter(F.col("vec_id") >= 400)
    late.write.mode("overwrite").parquet(src)

    q = ai.rp_index_stream(spark, src, idx, ckpt, schema=emb.schema)
    q.awaitTermination(120)

    idx_df = spark.read.parquet(idx)
    assert idx_df.count() == emb.count()
    assert idx_df.count() > n0
    # appended signatures == batch-build signatures for the same vectors
    full = str(tmp_path / "rp_full")
    ai.build_rp_index(emb, full, bits=8)
    a = idx_df.select("vec_id", F.col("rp_sig").cast("long").alias("s"))
    b = spark.read.parquet(full).select(
        "vec_id", F.col("rp_sig").cast("long").alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # a probe over the maintained index finds a late vector by its own value
    row = late.first()
    got = ai.probe_rp_index(spark, idx, [float(x) for x in row.embedding],
                            k=1, probe_hamming=0)
    assert got.first().vec_id == row.vec_id  # cos=1 with itself


def test_ann_recall_high_on_clustered_embeddings(spark):
    """The contract taus are bounded by the sf tables' near-random vectors;
    on CLUSTERED embeddings (the real-world regime both IVF and SemDeDup
    assume) the same index must reach recall >= 0.9 — this pins the
    operator quality independent of the driver data."""
    import numpy as np

    rng = np.random.RandomState(0)
    centers = rng.randn(8, 32) * 5
    rows = []
    for i in range(400):
        c = i % 8
        v = centers[c] + rng.randn(32) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    X = np.array([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    import tempfile

    d = tempfile.mkdtemp(prefix="annx_clustered_")
    ai.build_ivf_index(emb, f"{d}/ivf", n_lists=8)
    qids = list(range(0, 80, 10))
    queries = [(q, rows[q][1]) for q in qids]
    exact = {}
    for q in qids:
        sims = Xn @ Xn[q]
        sims[q] = -9
        exact[q] = set(np.argsort(-sims)[:10].tolist())
    got = ai.batch_probe_ivf(spark, f"{d}/ivf", queries, k=10, n_probe=2)
    hits: dict[int, set] = {}
    for r in got.collect():
        hits.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [len(hits.get(q, set()) & exact[q]) / 10 for q in qids]
    # n_probe=2 of 8 lists (25% scan) on clustered data: near-perfect
    assert sum(recalls) / len(recalls) >= 0.9


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------

def _clustered(spark, n=400, dim=32, k=8, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim) * 5
    rows = [(i, [float(x) for x in centers[i % k] + rng.randn(dim) * 0.3])
            for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    X = np.array([r[1] for r in rows])
    return emb, rows, X / np.linalg.norm(X, axis=1, keepdims=True)


def test_ivfpq_index_is_code_only_and_pruned(spark, tmp_path):
    """The PQ index stores (id, list_id, codes) — no float vectors (the
    memory bound) — and a probe scans < 1/2 of its files at n_probe=2/8."""
    emb, rows, _ = _clustered(spark)
    d = str(tmp_path / "ivfpq")
    ai.build_ivfpq_index(emb, d, n_lists=8, m_sub=8)
    idx = spark.read.parquet(d)
    assert set(idx.columns) == {"vec_id", "codes", "list_id"}
    meta = ai.read_meta(d)
    C = np.asarray(meta["centroids"])
    q = np.asarray(rows[0][1]); q /= np.linalg.norm(q)
    probe = np.argsort(-(C @ q))[:2].tolist()
    scan = idx.filter(F.col("list_id").isin(probe))
    assert ai.files_scanned(scan) <= ai.files_in_index(d) / 2


def test_ivfpq_refine_recall_clustered(spark, tmp_path):
    """IVFPQ + exact-refine recall@10 >= 0.9 on clustered embeddings
    (n_probe=2 of 8 lists, shortlist 50).  ADC-only identity-recall is
    structurally low in THIS regime — tight-cluster members quantize to
    near-identical codes, so ADC separates clusters, not members (exactly
    why the refine join exists) — so the honest ADC assertion is pick
    QUALITY: the mean exact cosine of its top-10 must be >= 0.95 of the
    true top-10's mean."""
    emb, rows, Xn = _clustered(spark)
    d = str(tmp_path / "ivfpq")
    ai.build_ivfpq_index(emb, d, n_lists=8, m_sub=8)
    qids = list(range(0, 80, 10))
    hit_refine = total = 0
    adc_quality = []
    for q in qids:
        sims = Xn @ Xn[q]
        sims[q] = -9
        exact_top = np.argsort(-sims)[:10].tolist()
        exact = set(exact_top)
        ref = {r.vec_id for r in ai.probe_ivfpq_index(
            spark, d, rows[q][1], k=10, n_probe=2, shortlist=50,
            refine_with=emb, exclude_id=q).collect()}
        adc = [r.vec_id for r in ai.probe_ivfpq_index(
            spark, d, rows[q][1], k=10, n_probe=2, shortlist=10,
            refine_with=None, exclude_id=q).collect()]
        hit_refine += len(exact & ref)
        total += 10
        adc_quality.append(
            float(np.mean(sims[adc])) / float(np.mean(sims[exact_top]))
        )
    assert hit_refine / total >= 0.9
    assert min(adc_quality) >= 0.95


def test_ivfpq_deterministic(spark, tmp_path):
    """Two builds over the same data produce identical codes (fixed seeds,
    deterministic sample)."""
    emb, _rows, _ = _clustered(spark)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    ai.build_ivfpq_index(emb, d1, n_lists=8, m_sub=8)
    ai.build_ivfpq_index(emb, d2, n_lists=8, m_sub=8)
    c1 = {r.vec_id: (r.list_id, tuple(r.codes))
          for r in spark.read.parquet(d1).collect()}
    c2 = {r.vec_id: (r.list_id, tuple(r.codes))
          for r in spark.read.parquet(d2).collect()}
    assert c1 == c2


def test_ivfpq_append_matches_batch(spark, tmp_path):
    """Appending the second half of a corpus to a PQ index built on the
    first half yields, for the appended vectors, codes bit-identical to a
    from-scratch encode through the SAME frozen codebooks (append is a
    pure function of the vector; no coordination, no bucket rewrites).
    The indexes differ only in the model artifacts' training half."""
    emb, _rows, _ = _clustered(spark)
    first = emb.filter("vec_id < 200")
    rest = emb.filter("vec_id >= 200")
    d = str(tmp_path / "pq_inc")
    ai.build_ivfpq_index(first, d, n_lists=8, m_sub=8)
    ai.append_ivfpq_index(rest, d)
    spark.catalog.refreshByPath(d)
    got = {r.vec_id: (r.list_id, tuple(r.codes))
           for r in spark.read.parquet(d).collect()}
    assert len(got) == 400
    # re-encode the appended half through the same frozen artifacts
    # (residual path by default — the shared _encoded_rows is what both
    # build and append run, so this pins the pure-function contract)
    meta = ai.read_meta(d)
    C = np.asarray(meta["centroids"])
    books = np.asarray(meta["codebooks"])
    again = ai._encoded_rows(rest, C, books, "vec_id", "embedding",
                             bool(meta.get("by_residual")))
    want = {r.vec_id: (r.list_id, tuple(r.codes)) for r in again.collect()}
    assert meta["by_residual"] is True
    assert all(got[k] == v for k, v in want.items())


def test_ivfpq_residual_beats_flat_within_clusters(spark, tmp_path):
    """The residual-PQ payoff, in the regime where it exists: flat PQ
    quantizes cluster MEMBERS to near-identical codes (ADC separates
    clusters, not members); residual codes quantize x - centroid, so the
    within-cluster ordering signal survives quantization WHEN it is above
    the code rate's distortion floor.  On 100-member moderate clusters
    (noise 0.5) the residual index must clear refine recall 0.9 at
    shortlist 50 — half the cluster, where flat measures 43/50 — and win
    ADC-only identity clearly.  (For ISOTROPIC TIGHT clusters no code
    rate ranks the tie set — measured in BENCH.md; there the honest
    metric is pick quality + a tie-set-sized shortlist, which
    test_ivfpq_refine_recall_clustered pins.)  All seeds fixed — the
    measured values are deterministic."""
    rng = np.random.RandomState(3)
    centers = rng.randn(4, 32) * 5
    rows = []
    for i in range(400):
        v = centers[i % 4] + rng.randn(32) * 0.5
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    X = np.array([r[1] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    d_res = str(tmp_path / "res")
    d_flat = str(tmp_path / "flat")
    ai.build_ivfpq_index(emb, d_res, n_lists=4, m_sub=8)
    ai.build_ivfpq_index(emb, d_flat, n_lists=4, m_sub=8, by_residual=False)

    qids = [0, 17, 42, 103, 250]
    ref_res = ref_flat = adc_res = adc_flat = 0
    for q in qids:
        sims = Xn @ Xn[q]
        sims[q] = -9
        exact = set(np.argsort(-sims)[:10].tolist())

        def probe(d, shortlist, refine):
            return {r.vec_id for r in ai.probe_ivfpq_index(
                spark, d, rows[q][1], k=10, n_probe=1, shortlist=shortlist,
                refine_with=emb if refine else None, exclude_id=q).collect()}

        ref_res += len(exact & probe(d_res, 50, True))
        ref_flat += len(exact & probe(d_flat, 50, True))
        adc_res += len(exact & probe(d_res, 10, False))
        adc_flat += len(exact & probe(d_flat, 10, False))
    n = 10 * len(qids)
    assert ref_res / n >= 0.9           # measured 48/50
    assert ref_res > ref_flat           # measured 48 vs 43
    assert adc_res >= adc_flat + 3      # measured 23 vs 16
