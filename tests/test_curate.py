"""Composed corpus-curation pipeline: each gate drops its target doc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    prose = ("the quick brown fox jumps over the lazy dog and then the "
             "dog wakes up to chase the fox around the yard for a while")
    rows = [
        (0, prose + " first version with enough clean words to pass"),
        (1, prose + " first version with enough clean words to pass"),  # near-dup of 0
        (2, "buy buy buy " * 30),                                       # repetition gate
        (3, "x"),                                                       # quality gate
        (4, "a completely separate article that quotes the "
            "leaked benchmark question about spark shuffles here today "
            "inside its own otherwise original body of prose text"),
        (5, "another fully distinct document whose words overlap nothing "
            "above but please mail me at a@b.org from host 192.168.0.1 "
            "whenever the cluster finishes its nightly compaction run ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame(
        [("leaked benchmark question about spark shuffles here today",)],
        "text string",
    )


def test_curation_report_gates(spark, corpus, eval_docs):
    from entity_extraction_svc_spark.plans.curate import curation_report

    rep = {r.doc_id: r for r in
           curation_report(corpus, eval_docs, dup_threshold=0.5).collect()}
    assert rep[0].keep and rep[0].dup_keep          # keeper of the dup pair
    assert not rep[1].keep and not rep[1].dup_keep  # dropped dup
    assert rep[1].dup_keeper_id == 0
    assert not rep[2].keep and not rep[2].repetition_keep
    assert not rep[3].keep and not rep[3].quality_keep
    assert "too_short" in rep[3].quality_reasons
    assert not rep[4].keep and rep[4].contaminated
    # PII redacts rather than drops; counts mirror the redaction cascade,
    # so the IP counts once as ipv4 and never again as phone
    assert rep[5].keep and rep[5].n_pii == 2


def test_curate_output_redacted(spark, corpus, eval_docs):
    from entity_extraction_svc_spark.plans.curate import curate

    out = {r.doc_id: r.text for r in curate(corpus, eval_docs).collect()}
    assert set(out) == {0, 5}
    assert "[EMAIL]" in out[5] and "[IP]" in out[5]
    assert "a@b.org" not in out[5]
    assert out[0].startswith("the quick brown fox")


def test_curate_no_eval_set(spark, corpus):
    from entity_extraction_svc_spark.plans.curate import curate

    out = {r.doc_id for r in curate(corpus, None).collect()}
    assert out == {0, 4, 5}  # contamination gate off -> doc 4 survives


def test_stratified_sample_and_cap(spark):
    from entity_extraction_svc_spark.operators.sampling import (
        cap_per_group,
        hash_sample,
        stratified_sample,
    )

    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("ru").alias("lang"),
    )
    s = stratified_sample(docs, "lang", {"en": 0.5, "ru": 0.1})
    got = {(r.lang) for r in s.collect()}
    n_en = s.filter("lang = 'en'").count()
    n_ru = s.filter("lang = 'ru'").count()
    assert abs(n_en / 1000 - 0.5) < 0.06 and abs(n_ru / 2000 - 0.1) < 0.04
    # consistency with hash_sample: same bucket rule -> same ids at same frac
    ids_strat = {r.doc_id for r in
                 stratified_sample(docs, "lang", 0.2).collect()}
    ids_hash = {r.doc_id for r in hash_sample(docs, 0.2).collect()}
    assert ids_strat == ids_hash
    capped = cap_per_group(docs, "lang", 7)
    per = {r.lang: r.n for r in
           capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 7, "ru": 7}
    # deterministic: same 14 rows every run
    again = {r.doc_id for r in cap_per_group(docs, "lang", 7).collect()}
    assert again == {r.doc_id for r in capped.collect()}


def test_curation_partitioning_invariance(spark, corpus, eval_docs):
    """Verdicts are a pure function of the corpus CONTENT: repartitioning
    the input (different task boundaries, different Arrow batches,
    different shuffle layouts) changes nothing."""
    from entity_extraction_svc_spark.plans.curate import curation_report

    base = {(r.doc_id, r.keep, tuple(r.quality_reasons), r.dup_keeper_id)
            for r in curation_report(corpus, eval_docs).collect()}
    for parts in (1, 7):
        again = {(r.doc_id, r.keep, tuple(r.quality_reasons), r.dup_keeper_id)
                 for r in curation_report(
                     corpus.repartition(parts), eval_docs).collect()}
        assert again == base
