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


def test_entity_salience_composition(spark, pipeline):
    """Capstone composition: fused linking output -> within-document entity
    co-occurrence edges -> PageRank = corpus-level entity salience.  Pins
    that the KG pipeline's output schema feeds the graph operator directly
    and that the salient entities are the fixture's hub entities (the ones
    sharing documents with many others)."""
    from pyspark.sql import functions as F

    from entity_extraction_svc_spark.operators.pagerank import pagerank

    linked = pipeline.linked.filter(
        (F.col("rank") == 0) & F.col("qid").isNotNull()
    ).select("url", "qid")
    a, b = linked.alias("a"), linked.alias("b")
    edges = (
        a.join(b, (F.col("a.url") == F.col("b.url"))
               & (F.col("a.qid") != F.col("b.qid")))
        .select(F.col("a.qid").alias("src"), F.col("b.qid").alias("dst"))
        .distinct()
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert len(ranks) > 10
    assert abs(sum(ranks.values()) - 1.0) < 1e-3
    # the most-salient entity must be one that co-occurs broadly: compare
    # against the degree ranking (PageRank on a symmetric co-occurrence
    # graph correlates with degree; exact equality is not required, but
    # the top entity must sit in the degree top-3)
    deg = {r.src: r.n for r in edges.groupBy("src").agg(
        F.count("*").alias("n")).collect()}
    top_rank = max(ranks, key=ranks.get)
    top3_deg = sorted(deg, key=deg.get, reverse=True)[:3]
    assert top_rank in top3_deg


# --- personalized PageRank -------------------------------------------------

def _ppr(spark, edges, seeds, iterations):
    from entity_extraction_svc_spark.operators.pagerank import (
        personalized_pagerank,
    )

    df = personalized_pagerank(
        spark.createDataFrame(edges, "src string, dst string"),
        seeds, iterations=iterations,
    )
    return {r["node"]: r["rank"] for r in df.collect()}


def test_ppr_one_iteration_hand_computed(spark):
    # a -> b, seed a, d=0.85: r1(a) = 0.15, r1(b) = 0.85
    got = _ppr(spark, [("a", "b")], ["a"], iterations=1)
    assert got == {"a": 0.15, "b": 0.85}


def test_ppr_mass_conserved_and_locality(spark):
    # triangle a->b->c->a plus the disconnected d->e: mass stays on the
    # seed's component, unreachable nodes sit at exactly 0
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e")]
    got = _ppr(spark, edges, ["a"], iterations=10)
    assert got["d"] == 0.0 and got["e"] == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # everyone on the seed's cycle holds positive mass
    assert got["a"] > 0 and got["b"] > 0 and got["c"] > 0


def test_ppr_seed_outside_graph(spark):
    # a seed with no edges keeps the full teleport share of its own mass
    got = _ppr(spark, [("a", "b")], ["z"], iterations=3)
    assert got["z"] > 0.0 and got["a"] == 0.0 and got["b"] == 0.0


def test_ppr_empty_seeds_raise(spark):
    from entity_extraction_svc_spark.operators.pagerank import (
        personalized_pagerank,
    )

    with pytest.raises(ValueError):
        personalized_pagerank(
            spark.createDataFrame([("a", "b")], "src string, dst string"), []
        )


def test_ppr_oracle_sql_parity(spark):
    import duckdb

    from entity_extraction_svc_spark.operators.pagerank import ppr_oracle_sql

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("x", "a")]
    got = _ppr(spark, edges, ["a", "x"], iterations=6)
    sql = ppr_oracle_sql(
        "SELECT * FROM (VALUES " +
        ", ".join(f"('{s}', '{t}')" for s, t in edges) + ") v(src, dst)",
        ["a", "x"], iterations=6,
    )
    want = dict(duckdb.connect().execute(sql).fetchall())
    assert got == pytest.approx(want)
