"""Deterministic random walks + neighbor fan-out sampling (walks.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.walks import (
    fanout_oracle_sql,
    random_walks,
    sample_neighbors,
    walks_oracle_sql,
)

EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "e"),
    ("c", "a"),
    ("d", "e"),
    # e is a dead end
]


def _triples(spark, edges=EDGES):
    return spark.createDataFrame(
        [(s, "P1", o) for s, o in edges], "subj string, pred string, obj string"
    )


def _values_sql(edges=EDGES):
    rows = ", ".join(f"('{s}', 'P1', '{o}')" for s, o in edges)
    return f"SELECT * FROM (VALUES {rows}) t(subj, pred, obj)"


def test_walks_match_oracle(spark):
    got = sorted(
        map(tuple, random_walks(_triples(spark), num_walks=2, walk_length=3).collect())
    )
    want = sorted(
        map(tuple, duckdb.sql(walks_oracle_sql(_values_sql(), 2, 3)).fetchall())
    )
    assert got == want
    assert len(got) > 0


def test_walk_structure_and_determinism(spark):
    df = random_walks(_triples(spark), num_walks=2, walk_length=3)
    rows = {(r.start, r.walk, r.step): r.node for r in df.collect()}
    edge_set = set(EDGES)
    # step 0 is the start; every consecutive pair is a real edge
    for (start, walk, step), node in rows.items():
        if step == 0:
            assert node == start
        else:
            prev = rows[(start, walk, step - 1)]
            assert (prev, node) in edge_set
    # dead end truncates: any walk standing on 'e' has no later steps
    for (start, walk, step), node in rows.items():
        if node == "e":
            assert (start, walk, step + 1) not in rows
    # pure function of the data: repartitioning doesn't change the corpus
    again = {
        (r.start, r.walk, r.step): r.node
        for r in random_walks(
            _triples(spark).repartition(7, "obj"), num_walks=2, walk_length=3
        ).collect()
    }
    assert again == rows


def test_walks_differ_across_walk_ids(spark):
    # with 3 out-neighbors at 'a' and 4 walks, at least two walk ids
    # should pick different first hops (md5 choice varies with walk id)
    df = random_walks(_triples(spark), num_walks=4, walk_length=1)
    first = {r.walk: r.node for r in df.filter(
        (F.col("start") == "a") & (F.col("step") == 1)).collect()}
    assert len(set(first.values())) >= 2


def test_walks_custom_starts_and_validation(spark):
    t = _triples(spark)
    starts = t.sparkSession.createDataFrame([("a",)], "n string")
    df = random_walks(t, num_walks=1, walk_length=2, starts=starts)
    assert {r.start for r in df.collect()} == {"a"}
    with pytest.raises(ValueError):
        random_walks(t, num_walks=0)
    with pytest.raises(ValueError):
        random_walks(t, walk_length=0)


def test_fanout_matches_oracle_and_salted_is_identical(spark):
    t = _triples(spark)
    plain = sorted(map(tuple, sample_neighbors(t, k=2).collect()))
    want = sorted(
        map(tuple, duckdb.sql(fanout_oracle_sql(_values_sql(), 2)).fetchall())
    )
    assert plain == want
    for salt in (2, 7, 64):
        assert sorted(
            map(tuple, sample_neighbors(t, k=2, salt=salt).collect())
        ) == plain


def test_fanout_keeps_all_when_under_k(spark):
    got = sample_neighbors(_triples(spark), k=10)
    per_src = {
        r.src: r.cnt
        for r in got.groupBy("src").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_src == {"a": 3, "b": 2, "c": 1, "d": 1}
    with pytest.raises(ValueError):
        sample_neighbors(_triples(spark), k=0)
