"""Count-min sketch (operators/sketch.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.sketch import (
    countmin_build,
    countmin_estimate,
    countmin_oracle_sql,
    heavy_hitters,
)

_VALS = ["a"] * 100 + ["b"] * 50 + [f"x{i}" for i in range(200)]


def _df(spark, vals=_VALS):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_counter_table_is_bounded_and_totals_conserved(spark):
    c = countmin_build(_df(spark), "k", w=32, d=3)
    rows = c.collect()
    assert len(rows) <= 32 * 3
    # every hash row sees the whole stream once
    per_r = {r.r: 0 for r in rows}
    for r in rows:
        per_r[r.r] += r.n
    assert set(per_r) == {0, 1, 2} and all(v == len(_VALS) for v in per_r.values())


def test_one_sided_error_and_exactness_at_large_w(spark):
    df = _df(spark)
    est = {r.k: r.est for r in countmin_estimate(
        countmin_build(df, "k", w=64, d=4), df, "k", w=64, d=4).collect()}
    true = {"a": 100, "b": 50, **{f"x{i}": 1 for i in range(200)}}
    assert all(est[k] >= v for k, v in true.items())  # never undercounts
    # a huge, collision-free sketch is exact
    exact = {r.k: r.est for r in countmin_estimate(
        countmin_build(df, "k", w=1 << 16, d=4), df, "k",
        w=1 << 16, d=4).collect()}
    assert exact == true


def test_heavy_hitters_never_miss(spark):
    hh = {r.k for r in heavy_hitters(_df(spark), "k", threshold=50,
                                     w=64, d=4).collect()}
    assert {"a", "b"} <= hh           # no false negatives, ever
    assert len(hh) < 252               # and not everything


def test_matches_oracle_and_partitioning_invariance(spark):
    df = _df(spark)
    got = sorted((r.k, r.est) for r in countmin_estimate(
        countmin_build(df, "k", w=64, d=4), df, "k", w=64, d=4).collect())
    con = duckdb.connect()
    con.register("cm_in", pd.DataFrame({"k": _VALS}))
    want = sorted((k, int(v)) for k, v in con.sql(countmin_oracle_sql(
        "SELECT k FROM cm_in", "SELECT k FROM cm_in", w=64, d=4)).fetchall())
    assert got == want
    re = sorted((r.k, r.est) for r in countmin_estimate(
        countmin_build(df.repartition(7), "k", w=64, d=4),
        df.repartition(3), "k", w=64, d=4).collect())
    assert re == got


def test_nulls_excluded_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    c = countmin_build(df, "k", w=16, d=2)
    assert c.agg(F.sum("n")).collect()[0][0] == 2 * 2  # 2 non-null rows x d
    est = countmin_estimate(c, df, "k", w=16, d=2).collect()
    assert [(r.k, r.est) for r in est] == [("a", 2)]
    with pytest.raises(ValueError):
        countmin_build(df, "k", w=0)
    with pytest.raises(ValueError):
        countmin_estimate(c, df, "k", d=0)
