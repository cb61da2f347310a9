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


def _hot_neighbor_triples(spark, n=40_000):
    """Hot subject with MANY DISTINCT objects (the window-skew case: count
    agg alone doesn't rank them) — 50% of rows on Qhot across 1,200 objs
    with a deterministic non-uniform frequency profile; the rest spread
    over 997 cold subjects x few objs each."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("Qhot"))
        .otherwise(F.concat(F.lit("Q"), (F.col("id") % 997).cast("string")))
        .alias("subj"),
        F.lit("P31").alias("pred"),
        F.when(
            F.col("id") % 2 == 0,
            # frequency ~ harmonic: obj j appears ~ n/(2*1200) * weight(j)
            F.concat(F.lit("O"), F.pmod(F.xxhash64((F.col("id") / 3).cast("long")), F.lit(1200)).cast("string")),
        )
        .otherwise(F.concat(F.lit("o"), (F.col("id") % 7).cast("string")))
        .alias("obj"),
    )


def test_top_objects_salted_equals_plain(spark):
    from entity_extraction_svc_spark.operators.kgquery import (
        top_objects_per_subject,
    )

    t = _hot_neighbor_triples(spark)
    plain = sorted(
        tuple(r) for r in top_objects_per_subject(t, k=5).collect()
    )
    salted = sorted(
        tuple(r) for r in top_objects_per_subject(t, k=5, salt=16).collect()
    )
    assert salted == plain
    hot = [r for r in plain if r[0] == "Qhot"]
    assert len(hot) == 5 and [r[3] for r in sorted(hot)] != []


def test_top_objects_partial_cut_never_drops_global_winner(spark):
    """Adversarial: pile the true top-k of the hot subject into what would
    be a single salt bucket if salting split an object's count — it can't,
    because counts are already total per (subj, obj)."""
    from entity_extraction_svc_spark.operators.kgquery import (
        top_objects_per_subject,
    )

    rows = [("Qh", "P31", f"Obig{i % 3}") for i in range(300)] + [
        ("Qh", "P31", f"Osmall{i}") for i in range(200)
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r.obj for r in top_objects_per_subject(t, k=3, salt=8).collect()}
    assert got == {"Obig0", "Obig1", "Obig2"}


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


def test_top_objects_matches_pandas_oracle_random(spark):
    """Randomized (seeded) cross-check of both top-k paths against an
    independent pandas implementation, including tie ordering."""
    import numpy as np
    import pandas as pd

    from entity_extraction_svc_spark.operators.kgquery import (
        top_objects_per_subject,
    )

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame({
        "subj": [f"Q{x}" for x in rng.zipf(1.6, 5000) % 37],
        "pred": "P31",
        "obj": [f"O{x}" for x in rng.randint(0, 50, 5000)],
    })
    t = spark.createDataFrame(pdf)

    counts = (pdf.groupby(["subj", "obj"]).size().reset_index(name="n")
              .sort_values(["subj", "n", "obj"],
                           ascending=[True, False, True]))
    counts["rank"] = counts.groupby("subj").cumcount() + 1
    want = {(r.subj, r.obj, r.n, r.rank)
            for r in counts[counts["rank"] <= 4].itertuples(index=False)}

    for salt in (None, 8):
        got = {(r.subj, r.obj, r.n_triples, r.rank)
               for r in top_objects_per_subject(t, k=4, salt=salt).collect()}
        assert got == want, f"salt={salt}"
