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


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch
# ---------------------------------------------------------------------------

from entity_extraction_svc_spark.operators.sketch import (  # noqa: E402
    hll_distinct,
    hll_estimate,
    hll_oracle_sql,
    hll_registers,
)

_PAIRS = (
    [("a", f"v{i}") for i in range(500)]
    + [("a", f"v{i}") for i in range(200)]   # repeats must not inflate
    + [("b", f"x{i}") for i in range(37)]
    + [("c", f"y{i}") for i in range(3)]
)


def _kv(spark, pairs=_PAIRS):
    return spark.createDataFrame(pairs, "k string, v string")


def test_hll_registers_bounded_and_duplicate_insensitive(spark):
    regs = hll_registers(_kv(spark), "k", "v", p=5)
    rows = regs.collect()
    assert len(rows) <= 3 * 32
    # the register table of the deduplicated stream is identical —
    # distinct-counting means repeats are free
    dedup = hll_registers(_kv(spark).distinct(), "k", "v", p=5)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, dedup.collect()))


def test_hll_estimate_accuracy(spark):
    est = {r.k: r.est for r in hll_distinct(_kv(spark), "k", "v", p=6).collect()}
    # standard error ~ 1.04/sqrt(64) = 13%; assert a loose 2-sigma band
    assert abs(est["a"] - 500) / 500 < 0.26
    assert abs(est["b"] - 37) / 37 < 0.30      # linear-counting regime
    assert abs(est["c"] - 3) / 3 < 0.35


def test_hll_matches_oracle_and_partitioning_invariance(spark):
    got = sorted(map(tuple, hll_distinct(_kv(spark), "k", "v", p=6).collect()))
    con = duckdb.connect()
    con.register("hll_in", pd.DataFrame(_PAIRS, columns=["k", "v"]))
    want = sorted((k, int(n), float(e)) for k, n, e in con.sql(
        hll_oracle_sql("SELECT k, v FROM hll_in", p=6)).fetchall())
    assert got == want
    # order/partitioning invariance: the harmonic sum is integer, so a
    # different physical layout is bit-identical, not just close
    re = sorted(map(tuple, hll_distinct(
        _kv(spark).repartition(7), "k", "v", p=6).collect()))
    assert re == got


def test_hll_nulls_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [("a", "v"), ("a", None), (None, "v")], "k string, v string")
    out = hll_distinct(df, "k", "v", p=6).collect()
    assert [(r.k, r.n_reg) for r in out] == [("a", 1)]
    with pytest.raises(ValueError):
        hll_registers(df, "k", "v", p=2)
    with pytest.raises(ValueError):
        hll_estimate(hll_registers(df, "k", "v"), p=20)


# ---------------------------------------------------------------------------
# histogram quantiles


from entity_extraction_svc_spark.operators.sketch import (  # noqa: E402
    histogram_quantiles,
    histogram_quantiles_oracle_sql,
)

# Zipf-ish integer degrees: a hub, a warm middle, a long unit tail
_DEGS = [5000] + [200] * 10 + [40] * 80 + [3] * 300 + [1] * 600


def _dvals(spark, vals=_DEGS):
    return spark.createDataFrame([(v,) for v in vals], "v long")


def _py_rank(vals, q):
    s = sorted(vals)
    rank = -(-int(round(q * 1_000_000)) * len(s) // 1_000_000)  # ceil
    return s[rank - 1]


def test_quantile_brackets_true_rank_value(spark):
    out = {r.q: r for r in histogram_quantiles(
        _dvals(spark), "v", qs=[0.5, 0.9, 0.99, 1.0], buckets=64).collect()}
    assert set(out) == {0.5, 0.9, 0.99, 1.0}
    for q, r in out.items():
        true = _py_rank(_DEGS, q)
        assert r.lo <= true <= r.hi, (q, r.lo, true, r.hi)
    # q=1.0 lands in the max's bucket and hi IS the max
    assert out[1.0].hi == 5000


def test_quantiles_exact_when_range_fits_buckets(spark):
    vals = [1, 2, 2, 3, 3, 3, 4, 10]
    out = {r.q: r for r in histogram_quantiles(
        _dvals(spark, vals), "v", qs=[0.25, 0.5, 1.0], buckets=16).collect()}
    # range (1..10) <= buckets: every bucket holds one value, lo == hi
    for q, r in out.items():
        assert r.lo == r.hi == _py_rank(vals, q)


def test_quantiles_match_oracle_and_partitioning_invariant(spark):
    got = sorted(map(tuple, histogram_quantiles(
        _dvals(spark), "v", buckets=64).collect()))
    con = duckdb.connect()
    con.register("hq_in", pd.DataFrame({"v": _DEGS}))
    want = sorted(map(tuple, con.sql(histogram_quantiles_oracle_sql(
        "SELECT v FROM hq_in", buckets=64)).fetchall()))
    assert [tuple(map(float, r)) for r in got] == \
           [tuple(map(float, r)) for r in want]
    re = sorted(map(tuple, histogram_quantiles(
        _dvals(spark).repartition(7), "v", buckets=64).collect()))
    assert re == got


def test_quantile_validation(spark):
    with pytest.raises(ValueError):
        histogram_quantiles(_dvals(spark), "v", qs=[0.0])
    with pytest.raises(ValueError):
        histogram_quantiles(_dvals(spark), "v", qs=[1.5])
    with pytest.raises(ValueError):
        histogram_quantiles(_dvals(spark), "v", buckets=0)
    with pytest.raises(ValueError):
        histogram_quantiles_oracle_sql("SELECT 1 AS v", qs=[])
