"""AS-OF and range joins: brute-force oracles, tie and boundary semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def streams(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5)), (4, 3, _ts(50))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 1, _ts(10), 1.0),   # equal ts: <= is inclusive
            (102, 1, _ts(10), 2.0),   # tie at same ts: larger event_id wins
            (103, 1, _ts(20), 3.0),
            (104, 2, _ts(6), 4.0),    # after the only left row of user 2
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_semantics(streams):
    left, right = streams
    out = {
        r.event_id: (r.r_event_id, r.r_value)
        for r in asof_join(left, right, on=["user_id"], ts_col="ts",
                           tie_col="event_id").collect()
    }
    assert out[1] == (102, 2.0)    # inclusive + largest-id tie-break
    assert out[2] == (103, 3.0)    # latest prior
    assert out[3] == (None, None)  # right row is in the future
    assert out[4] == (None, None)  # user has no right rows
    assert len(out) == 4           # left-join: every left row survives


def test_asof_matches_bruteforce(spark):
    """Randomized check vs the quadratic definition."""
    import random

    rng = random.Random(7)
    lrows = [(i, rng.randrange(5), _ts(rng.randrange(200))) for i in range(60)]
    rrows = [(1000 + i, rng.randrange(5), _ts(rng.randrange(200)),
              float(i)) for i in range(80)]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, value double")
    got = {
        r.event_id: r.r_event_id
        for r in asof_join(left, right, on=["user_id"], ts_col="ts",
                           tie_col="event_id").collect()
    }
    for eid, u, ts in lrows:
        elig = [(rts, rid) for rid, ru, rts, _v in rrows if ru == u and rts <= ts]
        expect = max(elig)[1] if elig else None
        assert got[eid] == expect, (eid, got[eid], expect)


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(59)), (3, 1, _ts(60)), (4, 2, _ts(30))],
        "pid long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, 1, _ts(0), _ts(60))],
        "iid long, user_id long, start timestamp, end timestamp",
    )
    got = {(r.pid, r.iid) for r in
           range_join(pts, iv, on=["user_id"], bucket_seconds=600).collect()}
    # [start, end): start inclusive, end exclusive; key must match
    assert got == {(1, 10), (2, 10)}


def test_range_join_bucket_size_invariant(spark):
    """The bucket width is a performance knob, never a semantics knob."""
    import random

    rng = random.Random(3)
    pts = spark.createDataFrame(
        [(i, rng.randrange(3), _ts(rng.randrange(500))) for i in range(80)],
        "pid long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(100 + i, rng.randrange(3), _ts(s := rng.randrange(400)),
          _ts(s + rng.randrange(1, 120))) for i in range(20)],
        "iid long, user_id long, start timestamp, end timestamp",
    )
    res = [
        {(r.pid, r.iid) for r in
         range_join(pts, iv, on=["user_id"], bucket_seconds=bs).collect()}
        for bs in (60, 3600, 86400)
    ]
    assert res[0] == res[1] == res[2]


def test_asof_plan_single_shuffle(spark):
    """The as-of plan must have exactly ONE Exchange (the key shuffle) —
    the property that distinguishes it from a theta-join formulation."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value")
    out = asof_join(p, c, on=["user_id"], ts_col="ts", tie_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# --- fact versioning (validity intervals + as-of snapshots) -------------------

import duckdb  # noqa: E402

from entity_extraction_svc_spark.operators.temporal import (  # noqa: E402
    fact_intervals,
    fact_intervals_oracle_sql,
    kb_as_of,
)

# Q1's capital: A (seen twice — runs merge), then B, then back to A;
# Q2's capital: constant C
_OBS = [
    ("Q1", "P36", "A", 0), ("Q1", "P36", "A", 10), ("Q1", "P36", "B", 20),
    ("Q1", "P36", "A", 30), ("Q2", "P36", "C", 5),
]


def _obs_df(spark):
    rows = [(s, p, v, _ts(m)) for s, p, v, m in _OBS]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, observed_ts timestamp"
    )


def test_fact_intervals_run_collapse(spark):
    got = sorted(
        (r["subj"], r["value"], r["valid_from"], r["valid_to"])
        for r in fact_intervals(
            _obs_df(spark), ["subj", "pred"], "obj"
        ).collect()
    )
    assert got == [
        ("Q1", "A", _ts(0), _ts(20)),   # the duplicate at t10 merged
        ("Q1", "A", _ts(30), None),     # reverted value opens a NEW interval
        ("Q1", "B", _ts(20), _ts(30)),
        ("Q2", "C", _ts(5), None),
    ]


def test_kb_as_of_reconstructs_snapshots(spark):
    iv = fact_intervals(_obs_df(spark), ["subj", "pred"], "obj")
    snap = lambda m: {  # noqa: E731
        (r["subj"], r["value"]) for r in kb_as_of(iv, _ts(m)).collect()
    }
    assert snap(15) == {("Q1", "A"), ("Q2", "C")}
    assert snap(25) == {("Q1", "B"), ("Q2", "C")}
    assert snap(99) == {("Q1", "A"), ("Q2", "C")}
    assert snap(2) == {("Q1", "A")}  # Q2 not yet observed


def test_fact_intervals_oracle_parity(spark):
    rows = ", ".join(
        f"('{s}', '{p}', '{v}', TIMESTAMP '2024-01-01 00:{m:02d}:00')"
        for s, p, v, m in _OBS
    )
    sql = fact_intervals_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) t(subj, pred, obj, observed_ts)",
        ["subj", "pred"], "obj",
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    got = sorted(
        (r["subj"], r["pred"], r["value"], r["valid_from"], r["valid_to"])
        for r in fact_intervals(
            _obs_df(spark), ["subj", "pred"], "obj"
        ).collect()
    )
    assert got == want


def test_fact_intervals_single_shuffle(spark):
    """Window + run collapse + lead all ride ONE exchange on the key."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    obs = ev.select(
        F.col("user_id").alias("subj"), F.lit("status").alias("pred"),
        F.col("event_type").alias("obj"), F.col("ts").alias("observed_ts"),
    )
    out = fact_intervals(obs, ["subj", "pred"], "obj")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# --- set-valued fact versioning (VERDICT r4 #7) -------------------------------

from entity_extraction_svc_spark.operators.temporal import (  # noqa: E402
    set_fact_intervals,
    set_fact_intervals_oracle_sql,
)
import datetime as _dt  # noqa: E402


def _snap(day):
    return _dt.datetime(2024, 1, day)


def test_set_fact_intervals_presence_runs(spark):
    # u1 snapshots: d1={a,b} d2={a} d3={a,b} d4={b}
    rows = [
        ("u1", "act", v, _snap(d))
        for d, vals in [(1, "ab"), (2, "a"), (3, "ab"), (4, "b")]
        for v in vals
    ]
    obs = spark.createDataFrame(
        rows, "subj string, pred string, obj string, observed_ts timestamp")
    got = {
        (r.subj, r.value, r.valid_from, r.valid_to)
        for r in set_fact_intervals(obs, ["subj", "pred"], "obj").collect()
    }
    assert got == {
        ("u1", "a", _snap(1), _snap(4)),   # present d1-d3, absent d4
        ("u1", "b", _snap(1), _snap(2)),   # first run closes at d2
        ("u1", "b", _snap(3), None),       # re-appears, open at latest
    }


def test_set_fact_intervals_per_key_snapshots(spark):
    # snapshot indexing is PER KEY: u2 only has snapshots d2/d4, so its
    # value is continuously present even though u1 has snapshots between
    rows = [
        ("u1", "act", "x", _snap(1)), ("u1", "act", "x", _snap(2)),
        ("u1", "act", "x", _snap(3)),
        ("u2", "act", "y", _snap(2)), ("u2", "act", "y", _snap(4)),
    ]
    obs = spark.createDataFrame(
        rows, "subj string, pred string, obj string, observed_ts timestamp")
    got = {
        (r.subj, r.value, r.valid_from, r.valid_to)
        for r in set_fact_intervals(obs, ["subj", "pred"], "obj").collect()
    }
    assert got == {
        ("u1", "x", _snap(1), None),
        ("u2", "y", _snap(2), None),
    }


def test_set_fact_intervals_oracle_parity(spark, fixture_dir):
    import duckdb

    ev = spark.createDataFrame(
        [("u1", "a", _snap(1)), ("u1", "b", _snap(1)), ("u1", "a", _snap(2)),
         ("u1", "b", _snap(3)), ("u2", "c", _snap(2))],
        "user_id string, event_type string, ts timestamp",
    )
    obs = ev.select(
        F.col("user_id").alias("subj"), F.lit("act").alias("pred"),
        F.col("event_type").alias("obj"), F.col("ts").alias("observed_ts"),
    )
    got = {
        (r.subj, r.value, r.valid_from, r.valid_to)
        for r in set_fact_intervals(obs, ["subj", "pred"], "obj").collect()
    }
    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    sql = set_fact_intervals_oracle_sql(
        "SELECT user_id AS subj, 'act' AS pred, event_type AS obj, "
        "ts AS observed_ts FROM ev", ["subj", "pred"], "obj")
    want = {
        (r[0], r[2], r[3], r[4])
        for r in con.execute(sql).fetchall()
    }
    assert got == want
