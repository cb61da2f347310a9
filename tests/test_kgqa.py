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
