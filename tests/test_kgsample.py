"""CONSTRUCT rules (kgquery.construct_triples) and TransE negative
sampling (triples.negative_triples)."""

from __future__ import annotations

import duckdb
import pytest

from entity_extraction_svc_spark.operators.kgquery import construct_triples
from entity_extraction_svc_spark.operators.triples import (
    negative_triples,
    negative_triples_oracle_sql,
)

_KB = [
    ("Q1", "P19", "Q10"), ("Q2", "P19", "Q10"), ("Q3", "P19", "Q11"),
    ("Q10", "P131", "Q100"), ("Q11", "P131", "Q100"),
    ("Q1", "P27", "Q200"),
]


def _kb(spark):
    return spark.createDataFrame(_KB, "subj string, pred string, obj string")


def test_construct_derives_rule_head(spark):
    got = sorted(map(tuple, construct_triples(
        _kb(spark),
        [("?x", "P19", "?c"), ("?c", "P131", "?r")],
        ("?x", "bornin_region", "?r"),
    ).collect()))
    assert got == [
        ("Q1", "bornin_region", "Q100"),
        ("Q2", "bornin_region", "Q100"),
        ("Q3", "bornin_region", "Q100"),
    ]


def test_construct_set_semantics(spark):
    # two body bindings proving the same head triple yield ONE row
    kb = spark.createDataFrame(
        _KB + [("Q1", "P19", "Q11")], "subj string, pred string, obj string"
    )
    got = construct_triples(
        kb,
        [("?x", "P19", "?c"), ("?c", "P131", "?r")],
        ("?x", "bornin_region", "?r"),
    ).filter("subj = 'Q1'").collect()
    assert len(got) == 1  # Q1 born in two cities, both in Q100


def test_construct_rejects_unbound_head_var(spark):
    with pytest.raises(ValueError, match="not bound"):
        construct_triples(
            _kb(spark), [("?x", "P19", "?c")], ("?x", "p", "?nope")
        )


def test_construct_constant_head_terms(spark):
    got = construct_triples(
        _kb(spark), [("?x", "P27", "Q200")], ("?x", "P31", "Q5")
    ).collect()
    assert [tuple(r) for r in got] == [("Q1", "P31", "Q5")]


# --- negative sampling ---------------------------------------------------------


def test_negatives_deterministic_and_filtered(spark):
    kb = _kb(spark)
    a = sorted(map(tuple, negative_triples(kb, k=3).collect()))
    b = sorted(map(tuple, negative_triples(kb.repartition(7), k=3).collect()))
    assert a == b and len(a) > 0
    # the filtered setting: no emitted negative is a true triple
    true = {(s, p, o) for s, p, o in _KB}
    assert all((s, p, o) not in true for s, p, o, _ in a)
    # every negative's predicate comes from a true triple
    preds = {p for _, p, _ in _KB}
    assert {p for _, p, _, _ in a} <= preds


def test_negatives_match_oracle(spark):
    rows = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in _KB)
    want = sorted(map(tuple, duckdb.sql(negative_triples_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) t(subj, pred, obj)", k=2
    )).fetchall()))
    got = sorted(map(tuple, negative_triples(_kb(spark), k=2).collect()))
    assert got == want


def test_negatives_entities_come_from_graph(spark):
    ents = {x for s, _, o in _KB for x in (s, o)}
    out = negative_triples(_kb(spark), k=2).collect()
    assert all(r.subj in ents and r.obj in ents for r in out)


def test_negatives_reject_bad_k(spark):
    with pytest.raises(ValueError):
        negative_triples(_kb(spark), k=0)
