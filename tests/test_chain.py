"""Multi-rule forward chaining (operators/chain.py).

Pins: fixpoint semantics against a brute-force in-Python evaluator,
semi-naive == naive (the fold path included), mutual recursion across
rules (subproperty-derived edges feeding range typing feeding taxonomy
inheritance), engine parity of the unrolled-CTE oracle on the committed
fixture KB, and the refusal surface (unbound head var, disconnected
body, round-budget exhaustion).
"""

from __future__ import annotations

import duckdb
import pytest

from entity_extraction_svc_spark.operators.chain import (
    RDFS_ONTOLOGY,
    RDFS_RULES,
    chain_oracle_sql,
    forward_chain,
    rdfs_ontology_values_sql,
)


def _py_fixpoint(facts, rules, max_rounds=64):
    """Reference evaluator: naive iteration over Python sets."""
    known = set(facts)
    for _ in range(max_rounds):
        new = set()
        for body, head in rules:
            bindings = [{}]
            for leg in body:
                nxt = []
                for b in bindings:
                    for f in known:
                        bb = dict(b)
                        ok = True
                        for term, val in zip(leg, f):
                            if term.startswith("?"):
                                v = term[1:]
                                if v in bb and bb[v] != val:
                                    ok = False
                                    break
                                bb[v] = val
                            elif term != val:
                                ok = False
                                break
                        if ok:
                            nxt.append(bb)
                bindings = nxt
            for b in bindings:
                new.add(tuple(
                    b[t[1:]] if t.startswith("?") else t for t in head
                ))
        if new <= known:
            return known
        known |= new
    raise RuntimeError("python fixpoint did not converge")


_CHAIN = [
    ("a", "P31", "c1"), ("c1", "P279", "c2"), ("c2", "P279", "c3"),
    ("c3", "P279", "c4"),
    ("b", "likes", "a"),
]
_R1 = [([("?x", "P31", "?c"), ("?c", "P279", "?d")], ("?x", "P31", "?d"))]


def _df(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _set(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_fixpoint_matches_python(spark):
    got = _set(forward_chain(_df(spark, _CHAIN), _R1))
    assert got == _py_fixpoint(_CHAIN, _R1)
    # and the inheritance climbed the whole chain
    assert ("a", "P31", "c4") in got


def test_derived_only(spark):
    got = _set(forward_chain(_df(spark, _CHAIN), _R1, derived_only=True))
    want = _py_fixpoint(_CHAIN, _R1) - set(_CHAIN)
    assert got == want and want  # non-empty delta


def test_fold_path_identical(spark):
    """fold_rows=1 forces the overlay to fold into the partitioned base
    every round; the result must not change (base+overlay is an internal
    layout choice, not a semantics choice)."""
    got = _set(forward_chain(_df(spark, _CHAIN), _R1, fold_rows=1))
    assert got == _py_fixpoint(_CHAIN, _R1)
    # derived_only must also survive folding (derived rows live in base
    # after a fold and are recovered by the anti-join against the input)
    d = _set(forward_chain(_df(spark, _CHAIN), _R1, fold_rows=1,
                           derived_only=True))
    assert d == _py_fixpoint(_CHAIN, _R1) - set(_CHAIN)


def test_broadcast_gate_path_identical(spark):
    """broadcast_rows=0 forces every round's dedup onto the shuffle
    anti-join path (the r6 bootstrap-scale gate, VERDICT r5 #2); the
    fixpoint must not change — the broadcast is a physical choice only."""
    got = _set(forward_chain(_df(spark, _CHAIN), _R1, broadcast_rows=0))
    assert got == _py_fixpoint(_CHAIN, _R1)
    # gate + fold together (both non-default paths at once)
    got2 = _set(forward_chain(_df(spark, _CHAIN), _R1, broadcast_rows=0,
                              fold_rows=1, derived_only=True))
    assert got2 == _py_fixpoint(_CHAIN, _R1) - set(_CHAIN)


def test_mutual_recursion_across_rules(spark):
    """Subproperty expansion derives an edge that range-types its object,
    and the derived type climbs the taxonomy — every rule fires on another
    rule's output (the RDFS preset's whole point)."""
    facts = [
        ("paris", "P1376", "france"),
        ("P1376", "P1647", "P131"),
        ("P131", "rng", "loc"),
        ("loc", "P279", "thing"),
    ]
    got = _set(forward_chain(_df(spark, facts), RDFS_RULES))
    assert ("paris", "P131", "france") in got      # R2
    assert ("france", "P31", "loc") in got          # R4 on R2's output
    assert ("france", "P31", "thing") in got        # R1 on R4's output
    assert got == _py_fixpoint(facts, RDFS_RULES)


def test_variable_predicate_join_position(spark):
    """A body variable may join a pred slot to a subj slot (R2's shape)."""
    facts = [("s", "p1", "o"), ("p1", "P1647", "p2")]
    rules = [([("?s", "?p", "?o"), ("?p", "P1647", "?q")],
              ("?s", "?q", "?o"))]
    got = _set(forward_chain(_df(spark, facts), rules))
    assert ("s", "p2", "o") in got


def test_repeated_var_in_one_leg(spark):
    facts = [("x", "p", "x"), ("x", "p", "y")]
    rules = [([("?a", "p", "?a")], ("?a", "selfloop", "?a"))]
    got = _set(forward_chain(_df(spark, facts), rules, derived_only=True))
    assert got == {("x", "selfloop", "x")}


def test_refusals(spark):
    df = _df(spark, _CHAIN)
    with pytest.raises(ValueError, match="head variable"):
        forward_chain(df, [([("?x", "P31", "?c")], ("?x", "P31", "?nope"))])
    with pytest.raises(ValueError, match="disconnected"):
        forward_chain(df, [([("?x", "P31", "?c"), ("?y", "P279", "?z")],
                            ("?x", "P31", "?z"))])
    with pytest.raises(RuntimeError, match="did not converge"):
        forward_chain(df, _R1, max_rounds=1)


def test_oracle_parity_rdfs_on_fixture_kb(spark, fixture_dir):
    """Spark fixpoint == unrolled-CTE DuckDB rendition on the committed KB
    + the RDFS ontology, both full set and derived-only."""
    kb = spark.read.parquet(f"{fixture_dir}/kb_triples.parquet")
    onto = _df(spark, RDFS_ONTOLOGY)
    inp = kb.select("subj", "pred", "obj").unionByName(onto)
    got = _set(forward_chain(inp, RDFS_RULES, derived_only=True))

    base_sql = (
        f"SELECT subj, pred, obj "
        f"FROM read_parquet('{fixture_dir}/kb_triples.parquet') "
        f"UNION ALL SELECT * FROM (VALUES {rdfs_ontology_values_sql()}) "
        f"o(subj, pred, obj)"
    )
    sql = chain_oracle_sql(base_sql, RDFS_RULES, rounds=8, derived_only=True)
    want = set(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want and len(got) > 100
    # spot-check the semantics on DERIVED facts (base-asserted types like
    # (human, P31, Q5) are excluded by derived_only): inheritance must
    # climb humans to natural person (Q154954) and on to the root
    # (Q35120), and domain typing must reach subjects the base never
    # typed at all
    natural = {s for s, p, o in got if p == "P31" and o == "Q154954"}
    roots = {s for s, p, o in got if p == "P31" and o == "Q35120"}
    assert natural and natural <= roots


def test_oracle_rounds_sufficiency(spark, fixture_dir):
    """rounds=8 is at the fixpoint for the fixture: one more round derives
    nothing new (guards the unroll depth against fixture growth)."""
    base_sql = (
        f"SELECT subj, pred, obj "
        f"FROM read_parquet('{fixture_dir}/kb_triples.parquet') "
        f"UNION ALL SELECT * FROM (VALUES {rdfs_ontology_values_sql()}) "
        f"o(subj, pred, obj)"
    )
    con = duckdb.connect()
    n8 = con.execute(
        f"SELECT count(*) FROM ({chain_oracle_sql(base_sql, RDFS_RULES, 8)})"
    ).fetchone()[0]
    n9 = con.execute(
        f"SELECT count(*) FROM ({chain_oracle_sql(base_sql, RDFS_RULES, 9)})"
    ).fetchone()[0]
    assert n8 == n9


# ---------------------------------------------------------------------------
# incremental maintenance (additions)


from entity_extraction_svc_spark.operators.chain import (  # noqa: E402
    forward_chain_delta,
)


def test_delta_matches_full_recompute(spark):
    """entailed(base) + delta-consequences == entailed(base ∪ new) — the
    maintenance invariant, with a cascade that crosses rules: the new
    P1376 fact subproperty-expands, range-types, and taxonomy-climbs."""
    base = [
        ("P1376", "P1647", "P131"),
        ("P131", "rng", "loc"),
        ("loc", "P279", "thing"),
        ("a", "P31", "loc"),
    ]
    new = [("paris", "P1376", "france")]
    ent = forward_chain(_df(spark, base), RDFS_RULES)
    got = _set(forward_chain_delta(ent, _df(spark, new), RDFS_RULES))
    full = _py_fixpoint(base + new, RDFS_RULES)
    old = _py_fixpoint(base, RDFS_RULES)
    assert got == full - old
    assert ("france", "P31", "thing") in got  # 3-rule cascade landed
    assert _set(ent) | got == full


def test_delta_already_entailed_fact_is_noop(spark):
    ent = forward_chain(_df(spark, _CHAIN), _R1)
    # (a, P31, c2) is derived already; re-adding it must change nothing
    got = forward_chain_delta(ent, _df(spark, [("a", "P31", "c2")]), _R1)
    assert got.count() == 0


def test_delta_empty_input(spark):
    ent = forward_chain(_df(spark, _CHAIN), _R1)
    assert forward_chain_delta(
        ent, _df(spark, []).limit(0), _R1).count() == 0


def test_delta_new_edge_extends_chain(spark):
    """A new taxonomy edge at the top of the chain back-fills inheritance
    for every instance below it."""
    ent = forward_chain(_df(spark, _CHAIN), _R1)
    got = _set(forward_chain_delta(
        ent, _df(spark, [("c4", "P279", "c5")]), _R1))
    assert ("a", "P31", "c5") in got
    full = _py_fixpoint(_CHAIN + [("c4", "P279", "c5")], _R1)
    assert _set(ent) | got == full


# ---------------------------------------------------------------------------
# DRed deletion maintenance


from entity_extraction_svc_spark.operators.chain import (  # noqa: E402
    forward_chain_retract,
)


def _retract_check(spark, base, removed, rules):
    """forward_chain_retract(E, base, removed) must equal
    fixpoint(base − removed) computed from scratch."""
    ent = forward_chain(_df(spark, base), rules)
    got = _set(forward_chain_retract(
        ent, _df(spark, base), _df(spark, removed), rules))
    want = _py_fixpoint([f for f in base if f not in removed], rules)
    assert got == want, (sorted(got - want), sorted(want - got))
    return got


def test_retract_cuts_inheritance_chain(spark):
    # removing the middle taxonomy edge severs everything above it
    got = _retract_check(spark, _CHAIN, [("c2", "P279", "c3")], _R1)
    assert ("a", "P31", "c2") in got and ("a", "P31", "c3") not in got


def test_retract_alternative_derivation_survives(spark):
    """A fact with a second derivation path must come back in re-derive:
    two routes to c3 (via c2 and via d2); cutting one keeps (a,P31,c3)."""
    base = _CHAIN + [("c1", "P279", "d2"), ("d2", "P279", "c3")]
    got = _retract_check(spark, base, [("c2", "P279", "c3")], _R1)
    assert ("a", "P31", "c3") in got and ("a", "P31", "c4") in got


def test_retract_removed_base_fact_can_rederive(spark):
    """Retracting an ASSERTION does not retract derivability: the capital
    fact re-proves the located-in edge the user tried to remove."""
    base = [
        ("paris", "P131", "france"),          # asserted AND derivable
        ("paris", "P1376", "france"),
        ("P1376", "P1647", "P131"),
    ]
    got = _retract_check(spark, base, [("paris", "P131", "france")],
                         RDFS_RULES)
    assert ("paris", "P131", "france") in got  # back via the rule


def test_retract_cross_rule_cascade(spark):
    """Removing the subproperty declaration takes down the derived edge,
    its range typing, and the taxonomy climb — the 3-rule unwind."""
    base = [
        ("paris", "P1376", "france"),
        ("P1376", "P1647", "P131"),
        ("P131", "rng", "loc"),
        ("loc", "P279", "thing"),
    ]
    got = _retract_check(spark, base, [("P1376", "P1647", "P131")],
                         RDFS_RULES)
    assert ("paris", "P131", "france") not in got
    assert ("france", "P31", "loc") not in got
    assert ("france", "P31", "thing") not in got


def test_retract_noop_and_full(spark):
    # removing nothing is identity; removing everything leaves nothing
    got = _retract_check(spark, _CHAIN, [], _R1)
    assert got == _py_fixpoint(_CHAIN, _R1)
    assert _retract_check(spark, _CHAIN, list(_CHAIN), _R1) == set()


def test_retract_on_fixture_kb(spark, fixture_dir):
    """Scale-shaped spot check on the committed KB: retracting one
    taxonomy edge equals the recompute, and untouched branches keep
    every derived fact."""
    kb = spark.read.parquet(f"{fixture_dir}/kb_triples.parquet")
    onto = _df(spark, RDFS_ONTOLOGY)
    inp = kb.select("subj", "pred", "obj").unionByName(onto)
    ent = forward_chain(inp, RDFS_RULES)
    rm = _df(spark, [("Q154954", "P279", "Q215627")])
    got = _set(forward_chain_retract(ent, inp, rm, RDFS_RULES))
    want = _set(forward_chain(
        inp.join(rm, ["subj", "pred", "obj"], "left_anti"), RDFS_RULES))
    assert got == want
    # the humans lost their climb past natural person
    assert not any(p == "P31" and o == "Q215627" and s.startswith("Q")
                   and (s, "P31", "Q154954") in got and s != "Q154954"
                   for s, p, o in got - want)
