"""k-NN graph + neighbor feature aggregation (gnn.py)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.gnn import (
    knn_graph,
    knn_graph_oracle_sql,
    neighbor_feature_agg,
    neighbor_feature_agg_oracle_sql,
)

# four 2-d unit-ish vectors: 1 and 2 nearly parallel, 3 orthogonal to
# them, 4 anti-parallel to 3
_VECS = [
    (1, [1.0, 0.0]),
    (2, [0.9, 0.1]),
    (3, [0.0, 1.0]),
    (4, [0.0, -1.0]),
]


def _emb(spark, vecs=_VECS):
    return spark.createDataFrame(vecs, "vec_id long, embedding array<float>")


def _duck(vecs=_VECS):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": [v[0] for v in vecs],
                      "embedding": [v[1] for v in vecs]}),
    )
    return con


def test_knn_graph_hand_computed(spark):
    got = {(r.src, r.rank): (r.dst, r.cos_sim)
           for r in knn_graph(_emb(spark), k=2, floor=0.0).collect()}
    # node 1's best neighbor is 2 (cos ~0.993884); 3 and 4 are orthogonal
    # to 1 (cos 0, below nothing at floor 0.0 but >= floor keeps them)
    dst, sim = got[(1, 1)]
    assert dst == 2 and abs(sim - round(0.9 / math.hypot(0.9, 0.1), 6)) < 1e-9
    # 3's ranked list: orthogonal to 1/2 (~0), anti-parallel to 4 (-1 <
    # floor 0.0 -> excluded); rank 1 is the smaller-id tie at cos 0? no:
    # cos(3,1)=0.0, cos(3,2)=0.1/norm ~0.110432 -> 2 ranks first
    dst3, _ = got[(3, 1)]
    assert dst3 == 2


def test_knn_graph_matches_oracle_and_salted(spark):
    got = sorted(map(tuple, knn_graph(_emb(spark), k=2, floor=0.05).collect()))
    con = _duck()
    want = sorted(map(tuple,
                      con.sql(knn_graph_oracle_sql(2, 0.05)).fetchall()))
    assert got == want and len(got) > 0
    for salt in (2, 7):
        assert sorted(map(tuple, knn_graph(
            _emb(spark), k=2, floor=0.05, salt=salt).collect())) == got


def test_knn_graph_floor_isolates_and_validation(spark):
    # floor 0.5: only the 1<->2 pair survives; 3 and 4 are isolated
    got = knn_graph(_emb(spark), k=3, floor=0.5)
    assert {r.src for r in got.collect()} == {1, 2}
    with pytest.raises(ValueError):
        knn_graph(_emb(spark), k=0)


def test_neighbor_feature_agg_mean_and_max(spark):
    edges = spark.createDataFrame(
        [(10, 1), (10, 3), (20, 4)], "src long, dst long"
    )
    mean = {r.vec_id: (r.n_nbr, list(r.feat))
            for r in neighbor_feature_agg(edges, _emb(spark), dim=2).collect()}
    # node 10 aggregates vec 1 [1,0] and vec 3 [0,1] -> mean [0.5, 0.5]
    assert mean[10] == (2, [0.5, 0.5])
    assert mean[20] == (1, [0.0, -1.0])
    mx = {r.vec_id: list(r.feat)
          for r in neighbor_feature_agg(
              edges, _emb(spark), dim=2, agg="max").collect()}
    assert mx[10] == [1.0, 1.0]


def test_neighbor_feature_agg_matches_oracle(spark):
    edges = [(10, 1), (10, 3), (20, 4), (20, 2)]
    ed = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r.vec_id, r.n_nbr, tuple(r.feat))
        for r in neighbor_feature_agg(ed, _emb(spark), dim=2).collect()
    )
    rows = ", ".join(f"({s}, {d})" for s, d in edges)
    con = _duck()
    want = sorted(
        (r[0], r[1], tuple(r[2]))
        for r in con.sql(neighbor_feature_agg_oracle_sql(
            f"SELECT * FROM (VALUES {rows}) t(src, dst)", 2)).fetchall()
    )
    assert got == want


def test_neighbor_feature_agg_drops_featureless_and_validates(spark):
    edges = spark.createDataFrame(
        [(10, 1), (10, 999)], "src long, dst long"  # 999 has no features
    )
    got = neighbor_feature_agg(edges, _emb(spark), dim=2).collect()
    assert len(got) == 1 and got[0].n_nbr == 1
    with pytest.raises(ValueError):
        neighbor_feature_agg(edges, _emb(spark), dim=2, agg="sum")
    with pytest.raises(ValueError):
        neighbor_feature_agg(edges, _emb(spark), dim=0)


def test_knn_into_gnn_composes(spark):
    """The composed pipeline the driver row runs: kNN edges -> smoothed
    embeddings.  Each surviving node's feature is the mean of its kNN
    neighbors' vectors."""
    emb = _emb(spark)
    edges = knn_graph(emb, k=2, floor=0.05)
    out = {r.vec_id: r.n_nbr
           for r in neighbor_feature_agg(edges, emb, dim=2).collect()}
    assert out and all(1 <= n <= 2 for n in out.values())
