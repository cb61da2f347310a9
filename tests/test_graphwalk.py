"""Bounded multi-hop BFS over triples (operators/graphwalk.py).

Pins: minimal-distance semantics (a node reachable at hops 1 AND 2 reports
1), direction handling, early exit when the frontier drains before
max_hops, and engine parity — the DuckDB recursive-CTE rendition from
``bfs_oracle_sql`` must produce the identical (entity, dist) set on the
committed fixture KB.
"""

from __future__ import annotations

import duckdb
import pytest

from entity_extraction_svc_spark.operators.graphwalk import (
    bfs_distances,
    bfs_oracle_sql,
)

# a --> b --> c --> d, plus the a --> c shortcut and the off-ball x --> y
_EDGES = [
    ("a", "p1", "b"),
    ("b", "p1", "c"),
    ("c", "p2", "d"),
    ("a", "p3", "c"),
    ("x", "p1", "y"),
]


def _graph(spark):
    return spark.createDataFrame(_EDGES, "subj string, pred string, obj string")


def _dists(df) -> dict[str, int]:
    return {r["entity"]: r["dist"] for r in df.collect()}


def test_bfs_minimal_distance_out(spark):
    got = _dists(bfs_distances(_graph(spark), "a", max_hops=3))
    # c is reachable in 2 hops via b but the shortcut wins: dist 1
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_direction_in(spark):
    got = _dists(bfs_distances(_graph(spark), "d", max_hops=3, direction="in"))
    assert got == {"d": 0, "c": 1, "b": 2, "a": 2}


def test_bfs_direction_both_reaches_everything(spark):
    got = _dists(bfs_distances(_graph(spark), "d", max_hops=4, direction="both"))
    # undirected: d-c-{b,a}-... ; x/y stay unreachable (their component)
    assert got == {"d": 0, "c": 1, "b": 2, "a": 2}
    got_x = _dists(bfs_distances(_graph(spark), "x", max_hops=4, direction="both"))
    assert got_x == {"x": 0, "y": 1}


def test_bfs_hop_budget_truncates(spark):
    got = _dists(bfs_distances(_graph(spark), "a", max_hops=1))
    assert got == {"a": 0, "b": 1, "c": 1}


def test_bfs_early_exit_beyond_ball(spark):
    # budget far past the graph diameter: loop must drain, not spin
    got = _dists(bfs_distances(_graph(spark), "a", max_hops=25))
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_source_without_edges(spark):
    got = _dists(bfs_distances(_graph(spark), "zzz", max_hops=3))
    assert got == {"zzz": 0}


def test_bfs_bad_direction_raises(spark):
    with pytest.raises(ValueError):
        bfs_distances(_graph(spark), "a", direction="sideways")


@pytest.mark.parametrize("direction", ["out", "both"])
def test_bfs_oracle_parity_on_fixture_kb(spark, fixture_dir, direction):
    kb = spark.read.parquet(f"{fixture_dir}/kb_triples.parquet")
    got = sorted(
        (r["entity"], r["dist"])
        for r in bfs_distances(kb, "Q12418", max_hops=3,
                               direction=direction).collect()
    )
    sql = bfs_oracle_sql(
        f"SELECT * FROM read_parquet('{fixture_dir}/kb_triples.parquet')",
        "Q12418", 3, direction=direction,
    )
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want
    assert len(got) > 1  # the fixture ball is non-trivial
