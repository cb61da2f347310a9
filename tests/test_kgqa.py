"""KG quality audits (operators/kgqa.py): functional-predicate
contradictions, dangling references, ingest profiles."""

from __future__ import annotations

from entity_extraction_svc_spark.operators.kgqa import (
    dangling_objects,
    functional_conflicts,
    predicate_stats,
)

_TRIPLES = [
    # two sources disagree on q1's birthplace; duplicate assertion of the
    # same value (q2) is NOT a conflict
    ("q1", "P19", "city_a"),
    ("q1", "P19", "city_b"),
    ("q2", "P19", "city_a"),
    ("q2", "P19", "city_a"),
    # non-functional predicate may repeat freely
    ("q1", "P106", "occ_a"),
    ("q1", "P106", "occ_b"),
    # entity-valued vs literal-valued objects for the dangling check
    ("q1", "P27", "Q900"),
    ("q2", "P27", "Q901"),
    ("Q900", "P31", "Q5"),
    ("q3", "P571", "1853-01-01"),
]


def _t(spark):
    return spark.createDataFrame(_TRIPLES, "subj string, pred string, obj string")


def test_functional_conflicts(spark):
    got = functional_conflicts(_t(spark)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["subj"], r["pred"], r["n_obj"]) == ("q1", "P19", 2)
    assert r["objects"] == ["city_a", "city_b"]  # sorted, deterministic


def test_functional_conflicts_custom_pred_list(spark):
    got = functional_conflicts(_t(spark), ["P106"]).collect()
    assert {(r["subj"], r["pred"]) for r in got} == {("q1", "P106")}


def test_dangling_objects_without_dim(spark):
    # Q900 IS a subject; Q901 and Q5 are not; literals excluded
    got = {r["obj"] for r in dangling_objects(_t(spark)).collect()}
    assert got == {"Q901", "Q5"}


def test_dangling_objects_with_entity_dim(spark):
    ents = spark.createDataFrame([("Q901",)], "qid string")
    got = {r["obj"] for r in dangling_objects(_t(spark), ents).collect()}
    assert got == {"Q5"}


def test_predicate_stats(spark):
    got = {r["pred"]: (r["n_triples"], r["n_subj"])
           for r in predicate_stats(_t(spark)).collect()}
    assert got == {
        "P19": (4, 2),
        "P106": (2, 1),
        "P27": (2, 2),
        "P31": (1, 1),
        "P571": (1, 1),
    }


# --- snapshot diff -----------------------------------------------------------

from entity_extraction_svc_spark.operators.kgqa import (  # noqa: E402
    functional_changes,
    snapshot_diff,
)


def _new(spark):
    rows = [r for r in _TRIPLES if r != ("q1", "P19", "city_b")] + [
        ("q1", "P19", "city_c"),      # functional value change (b -> gone, c new)
        ("q4", "P31", "Q5"),          # pure addition
        ("q2", "P19", "city_a"),      # yet another exact duplicate: no churn
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_snapshot_diff_set_semantics(spark):
    got = {(r["status"], r["subj"], r["pred"], r["obj"])
           for r in snapshot_diff(_t(spark), _new(spark)).collect()}
    assert got == {
        ("added", "q1", "P19", "city_c"),
        ("added", "q4", "P31", "Q5"),
        ("removed", "q1", "P19", "city_b"),
    }


def test_functional_changes_pairs_edits(spark):
    got = [(r["subj"], r["pred"], r["old_obj"], r["new_obj"])
           for r in functional_changes(_t(spark), _new(spark)).collect()]
    assert got == [("q1", "P19", "city_b", "city_c")]


def test_snapshot_diff_identical_is_empty(spark):
    assert snapshot_diff(_t(spark), _t(spark)).count() == 0


# --- schema induction (domain/range derived from the data) -----------------

from entity_extraction_svc_spark.operators.kgqa import (  # noqa: E402
    induce_schema,
    induce_schema_oracle_sql,
)

_SCHEMA_TRIPLES = [
    # types: h1/h2 humans (h2 also Q1 — min() picks Q1 as canonical),
    # c1/c2 cities, k1 country
    ("h1", "P31", "Q5"), ("h2", "P31", "Q5"), ("h2", "P31", "Q1"),
    ("c1", "P31", "Q515"), ("c2", "P31", "Q515"), ("k1", "P31", "Q6256"),
    # P19 birthplace: human -> city twice, country once (majority city)
    ("h1", "P19", "c1"), ("h2", "P19", "c2"), ("h1", "P19", "k1"),
    # P569 date of birth: literal objects (no range)
    ("h1", "P569", "1900"), ("h2", "P569", "1901"),
    # x1 has no type at all: untyped subject doesn't vote
    ("x1", "P19", "c1"),
]


def _schema_df(spark):
    return spark.createDataFrame(
        _SCHEMA_TRIPLES, "subj string, pred string, obj string"
    )


def test_induce_schema_hand_computed(spark):
    got = {r.pred: r.asDict() for r in induce_schema(_schema_df(spark)).collect()}
    p19 = got["P19"]
    # subjects: h1 (Q5) votes twice, h2 (min type Q1) once, x1 untyped ->
    # modal domain Q5 covering 2/3 typed votes
    assert (p19["domain"], p19["n_dom_typed"]) == ("Q5", 3)
    assert abs(p19["dom_cover"] - round(2 / 3, 6)) < 1e-9
    # objects: c1 twice + c2 once (Q515), k1 once (Q6256) -> range Q515 3/4
    assert (p19["rng"], p19["n_rng_typed"]) == ("Q515", 4)
    assert abs(p19["rng_cover"] - 0.75) < 1e-9
    assert p19["n_triples"] == 4
    # literal-valued predicate: no typed objects, null range
    p569 = got["P569"]
    assert p569["rng"] is None and p569["n_rng_typed"] == 0
    assert p569["rng_cover"] is None
    # the type predicate itself is profiled too (its objects are the type
    # QIDs, untyped here)
    assert got["P31"]["n_triples"] == 6


def test_induce_schema_matches_oracle(spark):
    import duckdb

    rows = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in _SCHEMA_TRIPLES)
    sql = induce_schema_oracle_sql(
        f"SELECT * FROM (VALUES {rows}) t(subj, pred, obj)"
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    got = sorted(map(tuple, induce_schema(_schema_df(spark)).collect()))
    assert got == want


def test_induce_schema_tie_breaks_on_type_asc(spark):
    t = spark.createDataFrame(
        [("a", "P31", "Q2"), ("b", "P31", "Q1"),
         ("a", "P99", "x"), ("b", "P99", "x")],
        "subj string, pred string, obj string",
    )
    row = induce_schema(t).filter("pred = 'P99'").first()
    assert row.domain == "Q1" and abs(row.dom_cover - 0.5) < 1e-9
