"""The fused (shuffle-free) plan must produce exactly the staged plan's rows."""

from __future__ import annotations

from entity_extraction_svc_spark.plans.fused import build_fused


def _key(r):
    return (r.url, r.mention_id, r.rank)


def test_fused_equals_staged(spark, fixture_dir, pipeline):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    linked_f, triples_f = build_fused(spark, pages, fixture_dir)

    staged = {_key(r): r for r in pipeline.linked.collect()}
    fused = {_key(r): r for r in linked_f.collect()}
    assert set(staged) == set(fused)
    for k, s in staged.items():
        f = fused[k]
        assert (s.qid, s.substr, s.start, s.end, s.conf) == (
            f.qid, f.substr, f.start, f.end, f.conf
        ), (k, s, f)

    got = {(r.subj, r.pred, r.obj) for r in triples_f.collect()}
    want = {(r.subj, r.pred, r.obj) for r in pipeline.triples.collect()}
    assert got == want
