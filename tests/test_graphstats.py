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


# --- label propagation ---------------------------------------------------------

from entity_extraction_svc_spark.operators.graphstats import (  # noqa: E402
    label_propagation,
    lpa_oracle_sql,
)


def test_lpa_two_cliques_one_bridge(spark):
    # two 4-cliques joined by one bridge edge: each clique converges to its
    # lexicographically smallest member and the bridge does not merge them.
    # (3-cliques WOULD merge under the deterministic min-label tie rule —
    # a bridge endpoint sees a 1-1-1 tie and imports the foreign label; a
    # 4-clique's internal majority outvotes the bridge, which is why the
    # docstring scopes community quality to structures with internal
    # support, exactly like GraphX's hash-min tie-break.)
    def clique(prefix):
        ns = [f"{prefix}{i}" for i in range(1, 5)]
        return [(a, b) for i, a in enumerate(ns) for b in ns[i + 1:]]

    edges = clique("a") + clique("b") + [("a1", "b1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["community"]
           for r in label_propagation(df, iterations=5).collect()}
    assert got["a2"] == got["a3"] == got["a4"] == got["a1"] == "a1"
    assert got["b2"] == got["b3"] == got["b4"] == got["b1"] == "b1"


def test_lpa_tie_breaks_to_smallest_label(spark):
    # isolated edge: after one sync round each endpoint adopts the other's
    # label; after two they swap back — with the min-label tie rule the
    # pair must still agree with the oracle at every fixed count
    df = spark.createDataFrame([("p", "q")], "src string, dst string")
    for iters in (1, 2, 3):
        got = {r["node"]: r["community"]
               for r in label_propagation(df, iterations=iters).collect()}
        want = {r[0]: r[1] for r in duckdb.sql(
            lpa_oracle_sql("SELECT 'p' AS src, 'q' AS dst", iters)
        ).fetchall()}
        assert got == want


def test_lpa_matches_oracle(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
        ("e", "f"), ("f", "d"), ("g", "a"), ("b", "a"), ("a", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    want = {r[0]: r[1] for r in duckdb.sql(
        lpa_oracle_sql(f"SELECT * FROM (VALUES {rows}) t(src, dst)", 5)
    ).fetchall()}
    got = {r["node"]: r["community"]
           for r in label_propagation(df, iterations=5).collect()}
    assert got == want


def test_lpa_partitioning_invariant(spark):
    edges = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, label_propagation(df, 3).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(11), 3).collect()))
    assert a == b


# --- k-core --------------------------------------------------------------------

from entity_extraction_svc_spark.operators.graphstats import (  # noqa: E402
    kcore,
    kcore_oracle_sql,
)


def test_kcore_peels_tree_keeps_clique(spark):
    # a 3-clique with a pendant path: the 2-core is exactly the clique
    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("c", "d"), ("d", "e"), ("e", "f")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.degree for r in kcore(df, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_cascade_peeling(spark):
    # peeling must CASCADE: d starts with degree 2 but loses it once e
    # (degree 1) is removed — a single pass would wrongly keep d
    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("a", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node for r in kcore(df, k=2).collect()}
    assert got == {"a", "b", "c"}


def test_kcore_matches_oracle(spark):
    import duckdb

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
             ("e", "f"), ("f", "d"), ("g", "a"), ("g", "b"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    for k in (1, 2, 3):
        got = sorted(map(tuple, kcore(df, k=k).collect()))
        want = sorted(map(tuple, duckdb.sql(kcore_oracle_sql(
            f"SELECT * FROM (VALUES {rows}) t(src, dst)", k=k
        )).fetchall()))
        assert got == want, k


def test_kcore_empty_when_k_too_high(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert kcore(df, k=2).count() == 0


def test_kcore_rejects_bad_k(spark):
    import pytest as _pt

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pt.raises(ValueError):
        kcore(df, k=0)


def test_kcore_raises_when_rounds_exhausted(spark):
    import pytest as _pt

    # a path peels one layer per round: 12 nodes, k=2, max_rounds=2 must
    # NOT return the partially-peeled middle as a fake core
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
    df = spark.createDataFrame(edges, "src string, dst string")
    with _pt.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, max_rounds=2)
    # with enough rounds the same graph converges to the empty core
    assert kcore(df, k=2, max_rounds=10).count() == 0


# --- neighbor-Jaccard structural similarity ---------------------------------

from entity_extraction_svc_spark.operators.graphstats import (  # noqa: E402
    neighbor_jaccard,
    neighbor_jaccard_oracle_sql,
)

_NJ_EDGES = [
    # q1 and q2 are near-duplicates: both touch p1, p2, p3; q1 also p4
    ("q1", "p1"), ("q1", "p2"), ("q1", "p3"), ("q1", "p4"),
    ("q2", "p1"), ("q2", "p2"), ("q2", "p3"),
    # q3 shares only the hub p1
    ("q3", "p1"),
]


def _nj_df(spark, edges=_NJ_EDGES):
    return spark.createDataFrame(edges, "src string, dst string")


def test_neighbor_jaccard_hand_computed(spark):
    got = {
        (r.ent_a, r.ent_b): r
        for r in neighbor_jaccard(_nj_df(spark)).collect()
    }
    r = got[("q1", "q2")]
    # neighbors(q1) = {p1..p4} (deg 4), neighbors(q2) = {p1,p2,p3} (deg 3),
    # shared 3 -> jaccard 3/4
    assert (r.n_shared, r.deg_a, r.deg_b) == (3, 4, 3)
    assert abs(r.jaccard - 0.75) < 1e-9
    # p-side entities pair up too (p1/p2 share q1 and q2, etc.); q1-q3
    # share only p1 -> jaccard 1/(4+1-1) = 0.25
    assert abs(got[("q1", "q3")].jaccard - 0.25) < 1e-9


def test_neighbor_jaccard_matches_oracle_and_thresholds(spark):
    import duckdb

    rows = ", ".join(f"('{s}', '{d}')" for s, d in _NJ_EDGES)
    sql = neighbor_jaccard_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) t(src, dst)", min_shared=1,
        threshold=0.3,
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    got = sorted(
        map(tuple, neighbor_jaccard(_nj_df(spark), threshold=0.3).collect())
    )
    assert got == want and len(got) > 0


def test_neighbor_jaccard_hub_cap_drops_hub_only_pairs(spark):
    # p1 is the hub (degree 3). With the cap at 2, q1-q3 (connected ONLY
    # through p1) disappears; q1-q2 survives via p2/p3 with n_shared
    # counting only non-hub connectors, degrees unchanged.
    got = {
        (r.ent_a, r.ent_b): r
        for r in neighbor_jaccard(
            _nj_df(spark), max_neighbor_degree=2
        ).collect()
    }
    assert ("q1", "q3") not in got
    r = got[("q1", "q2")]
    assert r.n_shared == 2 and (r.deg_a, r.deg_b) == (4, 3)


def test_neighbor_jaccard_undirected_dedup_and_validation(spark):
    import pytest

    # reversed + duplicate edges collapse; self-loop ignored
    df = _nj_df(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"),
                        ("c", "b")])
    got = sorted(map(tuple, neighbor_jaccard(df).collect()))
    assert got == [("a", "c", 1, 1, 1, 1.0)]
    with pytest.raises(ValueError):
        neighbor_jaccard(df, min_shared=0)
