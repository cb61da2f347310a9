"""Head-entity skew: the salted two-stage aggregation (north rule) must be
correct under a Zipfian key distribution and actually split the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.kgquery import triples_per_subject


def _skewed_triples(spark, n=60_000):
    """~50% of rows share one hot subject (Q5-style head entity)."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("Qhot"))
        .otherwise(F.concat(F.lit("Q"), (F.col("id") % 997).cast("string")))
        .alias("subj"),
        F.lit("P31").alias("pred"),
        F.concat(F.lit("O"), F.col("id").cast("string")).alias("obj"),
    )


def test_salted_agg_equals_plain(spark):
    t = _skewed_triples(spark)
    plain = {r.subj: r.n_triples for r in triples_per_subject(t).collect()}
    salted = {r.subj: r.n_triples for r in triples_per_subject(t, salt=16).collect()}
    assert salted == plain
    assert plain["Qhot"] == 30_000


def test_salted_partial_splits_hot_key(spark):
    """The first-stage output must carry the hot key in many (subj, salt)
    cells — that is the property that caps any single reducer's share."""
    t = _skewed_triples(spark)
    partial = (
        t.withColumn("_salt", F.pmod(F.xxhash64("pred", "obj"), F.lit(16)))
        .groupBy("subj", "_salt")
        .agg(F.count("*").alias("c"))
    )
    hot = partial.filter(F.col("subj") == "Qhot").collect()
    assert len(hot) == 16
    assert max(r.c for r in hot) < 30_000 * 0.2  # no salt bucket dominates


def test_topn_under_skew(spark):
    t = _skewed_triples(spark)
    top = triples_per_subject(t, top_n=3, salt=16).collect()
    assert top[0].subj == "Qhot" and top[0].n_triples == 30_000
    assert len(top) == 3


def test_lm_scoring_under_zipf_token_skew(spark):
    """The bigram-LM score joins on token keys; web text is Zipfian ('the'
    in half of all bigrams).  Build a corpus where ONE token dominates and
    verify (a) the join completes with AQE's skew handling, (b) scores
    match the plain-python formula on a spot-checked doc — skew must not
    change results, only the physical split."""
    import math

    from entity_extraction_svc_spark.operators.lm import score_cross_entropy

    # 2,000 docs; every doc is "the w_i the w_j ..." -> 'the' is one side
    # of nearly every bigram
    rows = [
        (i, " ".join(f"the w{(i * 7 + j) % 50}" for j in range(20)))
        for i in range(2000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.cross_entropy)
           for r in score_cross_entropy(docs).collect()}
    assert all(v[0] == 39 for v in got.values())  # 40 tokens -> 39 bigrams

    # plain-python oracle for doc 0
    toks = [t for r in rows for t in r[1].split()]
    from collections import Counter
    uni = Counter(toks)
    bi = Counter()
    for r in rows:
        ts = r[1].split()
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] += 1
    V, k = len(uni), 0.5
    ts = rows[0][1].split()
    bits = [-math.log2((bi[(a, b)] + k) / (uni[a] + k * V))
            for a, b in zip(ts, ts[1:])]
    want = sum(bits) / len(bits)
    assert abs(got[0][1] - want) < 1e-5
