"""End-to-end correctness: byte-identical text, mention P/R, link P/R, triples.

Mirrors the reference's golden strategy (tests/test.py:32-65 posts
tests/data/{mona_lisa,spacex}/input.txt and checks annotations against
output.json); here the goldens are the template-side fixture tables.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_text_byte_identity(pipeline, fixture_dir):
    """Per-row invariant (BASELINE.json input_hint): extracted text per url
    is byte-identical to the template-side oracle (pages.text)."""
    got = {r.url: r.text for r in pipeline.extracted.collect()}
    want = {
        u: t
        for (u, t) in duckdb.sql(
            f"select url, text from '{fixture_dir}/pages.parquet'"
        ).fetchall()
    }
    assert set(got) == set(want)
    mismatches = [u for u in want if got[u] != want[u]]
    assert mismatches == [], f"text mismatch on {len(mismatches)} urls: {mismatches[:3]}"


def test_mention_detection_pr(pipeline, fixture_dir):
    got = {
        (r.url, r.start, r.end, r.tag)
        for r in pipeline.mentions.select("url", "start", "end", "tag").collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f'select url, start, "end", tag from \'{fixture_dir}/golden_mentions.parquet\''
        ).fetchall()
    }
    tp = len(got & want)
    p = tp / len(got) if got else 0.0
    r = tp / len(want) if want else 0.0
    assert p >= 0.95 and r >= 0.95, f"mention P={p:.3f} R={r:.3f}"


def test_linking_pr(pipeline, fixture_dir):
    """Linked-entity P/R >= 0.95 vs goldens (north rule quality bar)."""
    top1 = {
        (r.url, r.start, r.end): r.qid
        for r in pipeline.linked.filter(F.col("rank") == 0).collect()
        if r.qid
    }
    gold = {
        (u, s, e): q
        for (u, s, e, q) in duckdb.sql(
            f'select url, start, "end", qid from \'{fixture_dir}/golden_links.parquet\''
        ).fetchall()
    }
    tp = sum(1 for k, q in gold.items() if top1.get(k) == q)
    p = tp / len(top1) if top1 else 0.0
    r = tp / len(gold) if gold else 0.0
    assert p >= 0.95 and r >= 0.95, f"link P={p:.3f} R={r:.3f}"


def test_triples_match_golden(pipeline, fixture_dir):
    got = {(r.subj, r.pred, r.obj) for r in pipeline.triples.collect()}
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"select subj, pred, obj from '{fixture_dir}/golden_triples.parquet'"
        ).fetchall()
    }
    missing = want - got
    extra = got - want
    # P/R >= 0.95 on emitted triples (BASELINE.json metric)
    p = len(got & want) / len(got) if got else 0.0
    r = len(got & want) / len(want) if want else 0.0
    assert p >= 0.95 and r >= 0.95, (
        f"triple P={p:.3f} R={r:.3f}; missing={list(missing)[:5]} extra={list(extra)[:5]}"
    )


def test_empty_and_ru_docs_safe(pipeline):
    """Edge docs (empty html, entity-free ru pass-through) flow through
    without mentions and without crashing; the RU ENTITY pages (appended
    fixtures 203-205) do produce their Cyrillic mentions."""
    counts = (
        pipeline.pages.select("url", "lang")
        .join(pipeline.mentions.select("url", "substr"), "url", "left")
        .groupBy("url", "lang")
        .agg(F.count("substr").alias("n"))
    )
    ru = counts.filter(F.col("lang") == "ru")
    # the kind-5 no-entity ru pages stay mention-free
    assert ru.filter(F.col("n") == 0).count() > 0
    # the three RU entity pages carry the 9 golden Cyrillic mentions
    assert ru.agg(F.sum("n")).first()[0] == 9
    # empty-html docs produce zero mentions but still appear as pages
    assert counts.filter(F.col("n") == 0).count() > 0


def test_offsets_point_into_text(pipeline):
    """Every mention's [start, end) slice of the extracted text equals the
    surface the span claims (the N6/N7 offset-merge invariant)."""
    joined = pipeline.mentions.join(pipeline.extracted, "url").select(
        "substr", "start", "end", "text"
    )
    bad = []
    for r in joined.collect():
        surface = r.text[r.start : r.end]
        # decode drops possessive suffixes; compare lowercased prefix
        if not surface.lower().startswith(r.substr[:3]):
            bad.append((r.substr, surface))
    assert bad == [], bad[:5]


def test_unlisted_annotations_match_golden(spark, pipeline, fixture_dir):
    """Unlinkable mentions (gazetteer-only surfaces) surface as
    unlisted_annotations with null id and their detected tag — the agent's
    recall-audit array (agent/server.py:292-331)."""
    import duckdb

    from entity_extraction_svc_spark.operators.annotations import (
        assemble_unlisted_annotations,
    )

    got = {
        (r.url, r.spot, r.start, r.end, r.id, r.tag)
        for r in assemble_unlisted_annotations(pipeline.linked).collect()
    }
    gold = {
        (u, s, st, e, None, t)
        for (u, s, st, e, t) in duckdb.sql(
            f"select url, spot, start, \"end\", tag from "
            f"'{fixture_dir}/golden_unlisted.parquet'"
        ).fetchall()
    }
    assert got == gold and len(gold) == 3
