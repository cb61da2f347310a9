"""TF-IDF description re-ranking (P10 stand-in)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.descrank import (
    build_idf,
    rank_by_description,
    tfidf_cosine,
    _tokens,
)


def test_tfidf_cosine_plain():
    idf = build_idf(["painting by leonardo", "song by nat king cole",
                     "city in france"])
    ctx = _tokens("a sixteenth century oil painting by leonardo")
    a = tfidf_cosine(ctx, _tokens("painting by leonardo"), idf)
    b = tfidf_cosine(ctx, _tokens("song by nat king cole"), idf)
    assert a > b >= 0.0
    assert tfidf_cosine([], ctx, idf) == 0.0


def test_rank_by_description_prefers_matching_sense(spark, fixture_dir):
    kb = spark.read.parquet(f"{fixture_dir}/kb_entities.parquet")
    # two Mona Lisa senses: painting (Q12418) vs song (Q1756508); a painting
    # context must out-rank the song
    cands = spark.createDataFrame(
        [
            ("u1", 0, 0, "Q1756508", "a famous work of art by a painter"),
            ("u1", 0, 1, "Q12418", "a famous work of art by a painter"),
        ],
        "url string, mention_id long, rank int, qid string, context string",
    )
    rows = rank_by_description(cands, kb).collect()
    out = {r.qid: r.descr_rank for r in rows}
    assert out["Q12418"] == 1  # work-of-art description wins the re-rank
    assert out["Q1756508"] == 2

    # the relational idf path (distributed df counts pruned to the batch's
    # tokens) must reproduce build_idf over the FULL description corpus
    # exactly — same smoothing, same N, same fallback for unseen tokens
    kb_rows = kb.select("qid", "descr").collect()
    idf = build_idf([r.descr or "" for r in kb_rows])
    descr = {r.qid: (r.descr or "") for r in kb_rows}
    ctx = _tokens("a famous work of art by a painter")
    for r in rows:
        want = round(tfidf_cosine(ctx, _tokens(descr[r.qid]), idf), 6)
        assert r.descr_score == want
