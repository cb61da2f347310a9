"""Entity co-occurrence + PMI relatedness (operators/cooccur.py).

Pins: per-doc dedup before pair counting, hand-computed PMI values, the
hot-doc cap, deterministic top-k neighborhoods, and engine parity on the
committed golden-links fixture.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from entity_extraction_svc_spark.operators.cooccur import (
    entity_cooccurrence,
    pmi_oracle_sql,
    pmi_relatedness,
)

# d1: {A, B} (A twice — must dedup), d2: {A, B, C}, d3: {A}, d4: {C}
_LINKS = [
    ("d1", "A"), ("d1", "A"), ("d1", "B"),
    ("d2", "A"), ("d2", "B"), ("d2", "C"),
    ("d3", "A"), ("d4", "C"),
]


def _df(spark):
    return spark.createDataFrame(_LINKS, "url string, qid string")


def test_cooccurrence_dedups_per_doc(spark):
    got = {(r["ent_a"], r["ent_b"]): r["n_ab"]
           for r in entity_cooccurrence(_df(spark)).collect()}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_pmi_hand_computed(spark):
    got = {(r["ent_a"], r["ent_b"]): (r["n_ab"], r["pmi"])
           for r in pmi_relatedness(_df(spark)).collect()}
    # N=4 docs, n_A=3, n_B=2, n_C=2
    assert got[("A", "B")] == (2, round(math.log(2 * 4 / (3 * 2)), 6))
    assert got[("A", "C")] == (1, round(math.log(1 * 4 / (3 * 2)), 6))
    assert got[("B", "C")] == (1, round(math.log(1 * 4 / (2 * 2)), 6))


def test_min_count_filters_before_marginals(spark):
    got = {(r["ent_a"], r["ent_b"])
           for r in pmi_relatedness(_df(spark), min_count=2).collect()}
    assert got == {("A", "B")}


def test_max_per_doc_cap(spark):
    # a 5-entity doc capped at 3 keeps the 3 lowest qids -> 3 pairs
    rows = [("big", q) for q in ["E1", "E2", "E3", "E4", "E5"]]
    df = spark.createDataFrame(rows, "url string, qid string")
    got = entity_cooccurrence(df, max_per_doc=3).collect()
    assert {(r["ent_a"], r["ent_b"]) for r in got} == {
        ("E1", "E2"), ("E1", "E3"), ("E2", "E3")
    }


def test_top_k_symmetric_and_deterministic(spark):
    top = pmi_relatedness(_df(spark), top_k=1).collect()
    best = {r["ent_a"]: r["ent_b"] for r in top}
    # every entity gets a neighborhood row, not just pair-canonical firsts
    assert set(best) == {"A", "B", "C"}
    # B's best is C: pmi(B,C)=ln(1)=0 > pmi(A,B)=ln(8/6)? no — ln(4/3)>0,
    # so B's best is A; C pairs tie at pmi? pmi(A,C)=ln(4/6)<0,
    # pmi(B,C)=ln(4/4)=0 -> C's best is B
    assert best["B"] == "A" and best["C"] == "B" and best["A"] == "B"


def test_pmi_oracle_parity_on_golden_links(spark, fixture_dir):
    src = f"SELECT url, qid FROM read_parquet('{fixture_dir}/golden_links.parquet')"
    want = {(r[0], r[1]): (r[2], r[3])
            for r in duckdb.sql(pmi_oracle_sql(src, min_count=2)).fetchall()}
    linked = spark.read.parquet(f"{fixture_dir}/golden_links.parquet")
    got = {(r["ent_a"], r["ent_b"]): (r["n_ab"], r["pmi"])
           for r in pmi_relatedness(linked, min_count=2).collect()}
    assert got == want
    assert len(got) > 3  # fixture corpus has real repeated co-mentions


def test_empty_input(spark):
    empty = spark.createDataFrame([], "url string, qid string")
    assert pmi_relatedness(empty).count() == 0


def test_top_k_salted_equals_plain(spark, fixture_dir):
    # VERDICT r4 #3: the two-stage salted neighborhood cut is EXACT —
    # same rows as the plain window, for several salts, on the real
    # fixture corpus (includes tied pmi values and hub entities)
    linked = spark.read.parquet(f"{fixture_dir}/golden_links.parquet")
    plain = sorted(map(tuple, pmi_relatedness(
        linked, min_count=1, top_k=3).collect()))
    assert len(plain) > 10
    for s in (2, 7, 64):
        salted = sorted(map(tuple, pmi_relatedness(
            linked, min_count=1, top_k=3, salt=s).collect()))
        assert salted == plain, f"salt={s} diverged"
