"""Graph-shape analytics (operators/graphstats.py): triangles, clustering
coefficients, HITS."""

from __future__ import annotations

import duckdb
import pytest

from entity_extraction_svc_spark.operators.graphstats import (
    hits,
    hits_oracle_sql,
    triangle_counts,
    triangles_oracle_sql,
)

# two triangles (a,b,c) and (a,b,d), plus a reversed duplicate edge and a
# self-loop that must not change anything
_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "b"),
    ("b", "a"), ("c", "c"),
]


def _e(spark):
    return spark.createDataFrame(_EDGES, "src string, dst string")


def test_triangle_counts_hand_computed(spark):
    got = {r["node"]: (r["degree"], r["n_tri"], r["coeff"])
           for r in triangle_counts(_e(spark)).collect()}
    assert got == {
        "a": (3, 2, 0.666667),
        "b": (3, 2, 0.666667),
        "c": (2, 1, 1.0),
        "d": (2, 1, 1.0),
    }


def test_triangle_counts_triangle_free(spark):
    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], "src string, dst string"
    )
    got = triangle_counts(star).collect()
    assert {r["n_tri"] for r in got} == {0}
    assert {r["coeff"] for r in got} == {0.0}
    assert {r["node"]: r["degree"] for r in got}["hub"] == 5


def test_triangles_match_naive_oracle(spark):
    rows = ", ".join(f"('{s}', '{d}')" for s, d in _EDGES)
    sql = triangles_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) t(src, dst)"
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in duckdb.sql(sql).fetchall()}
    got = {r["node"]: (r["degree"], r["n_tri"], r["coeff"])
           for r in triangle_counts(_e(spark)).collect()}
    assert got == want


def test_hits_invariants_and_oracle_parity(spark):
    edges = [("x", "y"), ("x", "z"), ("w", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, 5).collect()}
    # x links to both authorities -> best hub; y has two hub in-links ->
    # best authority; pure sinks have hub 0, pure sources auth 0
    assert got["x"][0] > got["w"][0] > 0
    assert got["y"][1] > got["z"][1] > 0
    assert got["y"][0] == 0.0 and got["z"][0] == 0.0
    assert got["x"][1] == 0.0 and got["w"][1] == 0.0
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-5)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-5)

    rows = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    want = {r[0]: (r[1], r[2]) for r in duckdb.sql(
        hits_oracle_sql(f"SELECT * FROM (VALUES {rows}) t(src, dst)", 5)
    ).fetchall()}
    assert got == want


def test_hits_empty_graph(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty, 3).count() == 0
