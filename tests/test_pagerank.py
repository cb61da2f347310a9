"""PageRank operator: hand-verified values, dangling mass, determinism."""

from __future__ import annotations

import pytest


def _pr_reference(edges, iterations=10, d=0.85):
    """Driver-side plain-Python PageRank with identical semantics
    (distinct edges, dangling redistribution) as the ground truth."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(nodes)
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, t in e:
            contrib[t] += r[s] / out[s]
        r = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n)
            for v in nodes
        }
    return {v: round(r[v], 6) for v in nodes}


def test_pagerank_matches_reference(spark):
    from entity_extraction_svc_spark.operators.pagerank import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    got = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()
    }
    want = _pr_reference(edges)
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) < 2e-6 for v in want)
    # mass conservation: dangling redistribution keeps sum(rank) ~ 1
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_parallel_edges_and_self_loop(spark):
    """Parallel edges collapse to one; self-loops feed their own rank."""
    from entity_extraction_svc_spark.operators.pagerank import pagerank

    edges = [("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"), ("c", "c")]
    got = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()
    }
    want = _pr_reference([("a", "b"), ("b", "a"), ("c", "c")])
    assert all(abs(got[v] - want[v]) < 2e-6 for v in want)


def test_pagerank_oracle_sql_parity(spark):
    """The generated unrolled SQL (the contract oracle) reproduces the
    Spark ranks bit-for-bit at round-6 on an asymmetric graph."""
    import duckdb

    from entity_extraction_svc_spark.operators.pagerank import (
        pagerank,
        pagerank_oracle_sql,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "a"),
             ("a", "c"), ("b", "d")]
    got = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(edges, "src string, dst string"),
            iterations=6,
        ).collect()
    }
    union = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{t}' AS dst" for s, t in edges
    )
    want = dict(duckdb.sql(pagerank_oracle_sql(union, iterations=6)).fetchall())
    assert got == pytest.approx(want, abs=1e-9)


def test_pagerank_empty(spark):
    from entity_extraction_svc_spark.operators.pagerank import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).collect() == []
