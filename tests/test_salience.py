"""Entity salience (annotations.entity_salience): aboutness ranking."""

from __future__ import annotations

import math

from entity_extraction_svc_spark.operators.annotations import entity_salience


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "url string, qid string, start long")


def test_salience_hand_computed(spark):
    # two docs, three entities; d1 is ABOUT q1 (3 early mentions of 4),
    # q_common appears in both docs (idf ln(2/2)=0 -> salience 0)
    rows = [
        ("d1", "q1", 0), ("d1", "q1", 100), ("d1", "q1", 400),
        ("d1", "q_common", 900),
        ("d2", "q2", 50), ("d2", "q_common", 10),
    ]
    got = {(r.url, r.qid): (r.tf, r.first_pos, r.salience, r.sal_rank)
           for r in entity_salience(_mentions(spark, rows)).collect()}
    # d1/q1: tf 3 of 4, df 1 of 2 docs, first at 0
    want_q1 = round((3 / 4) * math.log(2 / 1) * (1 + 1 / (1 + 0 / 1000)), 6)
    assert got[("d1", "q1")] == (3, 0, want_q1, 1)
    # ubiquitous entity scores exactly 0 (ln(2/2)) regardless of tf
    assert got[("d1", "q_common")][2] == 0.0
    assert got[("d2", "q_common")][2] == 0.0
    # ranks: scored entity above the zero-scored one in each doc
    assert got[("d1", "q1")][3] == 1 and got[("d1", "q_common")][3] == 2
    assert got[("d2", "q2")][3] == 1 and got[("d2", "q_common")][3] == 2


def test_salience_position_boost_orders_equal_tf(spark):
    # same tf (1) and df (1), N=2: scores differ ONLY by the position
    # boost, so the earlier first mention must strictly outrank the later
    rows = [
        ("d1", "qa", 0), ("d1", "qb", 2000),
        ("d2", "qc", 5),
    ]
    got = {(r.url, r.qid): (r.salience, r.sal_rank)
           for r in entity_salience(_mentions(spark, rows)).collect()}
    assert got[("d1", "qa")][0] > got[("d1", "qb")][0] > 0
    assert got[("d1", "qa")][1] == 1
    assert got[("d1", "qb")][1] == 2


def test_salience_rank_is_dense_per_doc(spark):
    rows = [("d1", f"q{i}", i * 10) for i in range(5)]
    got = sorted(r.sal_rank
                 for r in entity_salience(_mentions(spark, rows)).collect())
    assert got == [1, 2, 3, 4, 5]


def test_salience_partitioning_invariant(spark):
    rows = [(f"d{i % 7}", f"q{i % 13}", (i * 37) % 3000) for i in range(80)]
    df = _mentions(spark, rows)
    a = sorted(map(tuple, entity_salience(df).collect()))
    b = sorted(map(tuple, entity_salience(df.repartition(9)).collect()))
    assert a == b
