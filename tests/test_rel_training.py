"""Distant-supervision relation pairs (triples.relation_training_pairs)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from entity_extraction_svc_spark.operators.triples import (
    relation_training_oracle_sql,
    relation_training_pairs,
)

_LINKS = [
    ("d1", 0, 4, "Q1"),
    ("d1", 10, 14, "Q2"),
    ("d1", 20, 24, "Q3"),
    ("d1", 300, 304, "Q4"),   # 276 chars past Q3's end -> beyond max_gap
    ("d1", 30, 34, "Q1"),     # second Q1 mention: (Q1,Q1) pairs excluded
    ("d2", 0, 4, "Q2"),
]
_KB = [
    ("Q1", "P10", "Q2"),
    ("Q1", "P05", "Q2"),      # second relation for the pair: P05 < P10 wins
    ("Q3", "P20", "Q2"),      # gives the (Q2,Q3) pair direction 'rev'
    ("Q1", "P31", "notaqid"), # non-entity object ignored
]


def _frames(spark):
    links = spark.createDataFrame(
        _LINKS, "url string, start long, end long, qid string")
    kb = spark.createDataFrame(_KB, "subj string, pred string, obj string")
    return links, kb


def test_labels_directions_and_gap(spark):
    links, kb = _frames(spark)
    got = {(r.url, r.start_a, r.start_b): (r.qid_a, r.qid_b, r.label, r.direction)
           for r in relation_training_pairs(links, kb).collect()}
    # KB-labelled forward pair, least pred wins
    assert got[("d1", 0, 10)] == ("Q1", "Q2", "P05", "fwd")
    # reverse KB edge
    assert got[("d1", 10, 20)] == ("Q2", "Q3", "P20", "rev")
    # no KB edge -> closed-world negative
    assert got[("d1", 0, 20)] == ("Q1", "Q3", "NO_REL", "none")
    assert got[("d1", 20, 30)] == ("Q3", "Q1", "NO_REL", "none")
    # Q4 is beyond max_gap from every earlier mention; same-QID pairs
    # excluded; d2 has one mention -> no pairs
    assert all(s_b != 300 for (_, _, s_b) in got)
    assert not any(u == "d2" for (u, _, _) in got)
    assert len(got) == 5  # (0,10) (0,20) (10,20) (10,30: Q2->Q1 rev P05) (20,30)
    assert got[("d1", 10, 30)] == ("Q2", "Q1", "P05", "rev")


def test_matches_oracle_and_partitioning_invariance(spark):
    links, kb = _frames(spark)
    got = sorted(map(tuple, relation_training_pairs(links, kb).collect()))
    con = duckdb.connect()
    con.register("rlinks", pd.DataFrame(
        _LINKS, columns=["url", "start", "end", "qid"]))
    con.register("rkbt", pd.DataFrame(_KB, columns=["subj", "pred", "obj"]))
    want = sorted(map(tuple, con.sql(relation_training_oracle_sql(
        'SELECT url, start, "end", qid FROM rlinks',
        "SELECT subj, pred, obj FROM rkbt",
    )).fetchall()))
    assert got == want and len(got) == 5
    re = sorted(map(tuple, relation_training_pairs(
        links.repartition(5), kb.repartition(3)).collect()))
    assert re == got


def test_gap_zero_requires_adjacency_and_validation(spark):
    links, kb = _frames(spark)
    got = relation_training_pairs(links, kb, max_gap=6).collect()
    # only consecutive mentions 6 chars apart survive
    assert {(r.start_a, r.start_b) for r in got} == {
        (0, 10), (10, 20), (20, 30)}
    with pytest.raises(ValueError):
        relation_training_pairs(links, kb, max_gap=-1)


def test_golden_corpus_emits_positives_and_negatives(spark, fixture_dir):
    links = spark.read.parquet(f"{fixture_dir}/golden_links.parquet").select(
        "url", "start", "end", "qid")
    kb = spark.read.parquet(f"{fixture_dir}/kb_triples.parquet")
    out = relation_training_pairs(links, kb)
    labels = {r.label for r in out.select("label").distinct().collect()}
    assert "NO_REL" in labels and len(labels) > 1
