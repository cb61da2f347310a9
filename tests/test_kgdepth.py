"""Round-4 KG depth operators: BGP matching, ontology validation,
multi-document triple evidence."""

import math

import pytest
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.kgquery import (
    match_bgp,
    validate_triples,
)
from entity_extraction_svc_spark.operators.triples import triple_evidence


@pytest.fixture(scope="module")
def kb(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/kb_triples.parquet")


def test_bgp_chain_matches_manual_joins(spark, kb):
    got = match_bgp(
        kb,
        [("?p", "P106", "?occ"), ("?p", "P19", "?city"),
         ("?city", "P131", "?region")],
        select=["?p", "?occ", "?city", "?region"],
    )
    a = kb.filter(F.col("pred") == "P106").select(
        F.col("subj").alias("p"), F.col("obj").alias("occ"))
    b = kb.filter(F.col("pred") == "P19").select(
        F.col("subj").alias("p"), F.col("obj").alias("city"))
    c = kb.filter(F.col("pred") == "P131").select(
        F.col("subj").alias("city"), F.col("obj").alias("region"))
    want = a.join(b, "p").join(c, "city").select("p", "occ", "city", "region")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_bgp_constant_leg_and_bag_semantics(spark, kb):
    # constant obj leg + a join; duplicates are NOT collapsed (bag semantics)
    got = match_bgp(
        kb, [("?x", "P31", "Q5"), ("?x", "P27", "?c")], select=["x", "c"]
    )
    humans = kb.filter((F.col("pred") == "P31") & (F.col("obj") == "Q5")).select(
        F.col("subj").alias("x"))
    cit = kb.filter(F.col("pred") == "P27").select(
        F.col("subj").alias("x"), F.col("obj").alias("c"))
    want = humans.join(cit, "x")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bgp_repeated_var_within_pattern(spark):
    tr = spark.createDataFrame(
        [("a", "self", "a"), ("a", "self", "b"), ("b", "self", "b")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(tr, [("?x", "self", "?x")], select=["x"])
    assert sorted(r.x for r in got.collect()) == ["a", "b"]


def test_bgp_disconnected_patterns_cross_join(spark):
    tr = spark.createDataFrame(
        [("a", "p", "b"), ("c", "q", "d")], "subj string, pred string, obj string"
    )
    got = match_bgp(tr, [("?x", "p", "?y"), ("?u", "q", "?v")])
    assert got.count() == 1  # 1 x 1 cross product
    row = got.collect()[0]
    assert (row.x, row.y, row.u, row.v) == ("a", "b", "c", "d")


def test_bgp_select_unbound_raises(spark, kb):
    with pytest.raises(ValueError, match="not bound"):
        match_bgp(kb, [("?x", "P31", "?t")], select=["nope"])
    with pytest.raises(ValueError, match="at least one"):
        match_bgp(kb, [])


def test_validate_triples_semantics(spark):
    tr = spark.createDataFrame(
        [
            ("h1", "P31", "Q5"),
            ("h1", "P19", "c1"),      # ok: typed city
            ("c1", "P31", "Q515"),
            ("h1", "P27", "c1"),      # range violation: city, expected country
            ("x9", "P19", "c1"),      # untyped subject -> passes (open world)
            ("h1", "P19", "z9"),      # untyped object -> passes
            ("c1", "P19", "c1"),      # domain violation: city as birth subject
        ],
        "subj string, pred string, obj string",
    )
    cons = spark.createDataFrame(
        [("P19", "Q5", "Q515"), ("P27", "Q5", "Q6256")],
        "pred string, domain string, range string",
    )
    got = sorted(map(tuple, validate_triples(tr, cons).collect()))
    assert got == sorted([
        ("h1", "P27", "c1", "range", "Q6256"),
        ("c1", "P19", "c1", "domain", "Q5"),
    ])


def test_triple_evidence_noisy_or(spark):
    linked = spark.createDataFrame(
        [
            # doc1 mentions E twice (conf .5 strongest), doc2 once (.8)
            ("u1", "E", 0, 0.5),
            ("u1", "E", 0, 0.2),
            ("u2", "E", 0, 0.8),
            # non-top-rank and null-qid rows are ignored
            ("u3", "E", 1, 0.99),
            ("u3", None, 0, 0.99),
            # doc3 mentions F, but F has no KB triples
            ("u3", "F", 0, 0.9),
        ],
        "url string, qid string, rank int, conf double",
    )
    kb = spark.createDataFrame(
        [("E", "P31", "Q5"), ("E", "P27", "c1"), ("G", "P31", "Q5")],
        "subj string, pred string, obj string",
    )
    rows = {(r.subj, r.pred, r.obj): r for r in triple_evidence(linked, kb).collect()}
    assert set(rows) == {("E", "P31", "Q5"), ("E", "P27", "c1")}
    r = rows[("E", "P31", "Q5")]
    assert r.n_docs == 2 and r.n_support == 2
    want = 1 - (1 - 0.5) * (1 - 0.8)
    assert math.isclose(r.evidence, round(want, 6), abs_tol=1e-9)


def test_triple_evidence_on_pipeline_links(spark, fixture_dir, pipeline):
    """Real linker confs through the operator vs a pandas recomputation."""
    import pandas as pd

    linked = pipeline.linked
    kb = spark.read.parquet(f"{fixture_dir}/kb_triples.parquet")
    got = triple_evidence(linked, kb).toPandas()
    pdf = linked.filter(
        (F.col("rank") == 0) & F.col("qid").isNotNull()
    ).select("url", "qid", "conf").toPandas()
    de = pdf.groupby(["url", "qid"], as_index=False)["conf"].max()
    kbp = kb.toPandas()
    merged = de.merge(kbp, left_on="qid", right_on="subj")
    for (s, p, o), grp in merged.groupby(["subj", "pred", "obj"]):
        row = got[(got.subj == s) & (got.pred == p) & (got.obj == o)]
        assert len(row) == 1, (s, p, o)
        row = row.iloc[0]
        assert row.n_docs == grp.url.nunique()
        ev = 1 - float((1 - grp.conf.clip(upper=0.999999)).prod())
        assert math.isclose(row.evidence, round(ev, 6), abs_tol=1e-6)
    assert len(got) == merged.groupby(["subj", "pred", "obj"]).ngroups


# --- alias mining from linked mentions ----------------------------------------

import duckdb as _duckdb

from entity_extraction_svc_spark.operators.canonicalize import (
    mine_aliases,
    mine_aliases_oracle_sql,
)

_MENTIONS = [
    # "big apple" -> Q60 dominantly (4/5), one stray link to Q100
    *[("d%d" % i, "Big  Apple", "Q60") for i in range(4)],
    ("d9", "big apple", "Q100"),
    # "acme" -> Q7 always but support 2 < min_support 3
    ("d1", "acme", "Q7"), ("d2", "acme", "Q7"),
    # "paris" -> 50/50 split: fails purity
    ("d1", "paris", "Q90"), ("d2", "paris", "Q90"),
    ("d3", "paris", "Q167646"), ("d4", "paris", "Q167646"),
    # null link must be ignored
    ("d5", "ghost", None),
]


def _mentions_df(spark):
    return spark.createDataFrame(
        _MENTIONS, "url string, substr string, qid string"
    )


def test_mine_aliases_thresholds_and_normalization(spark):
    got = [(r["alias"], r["qid"], r["support"], r["purity"])
           for r in mine_aliases(_mentions_df(spark)).collect()]
    # whitespace-normalized "big  apple" merges with "big apple"
    assert got == [("big apple", "Q60", 4, 0.8)]


def test_mine_aliases_excludes_known_pairs(spark):
    known = spark.createDataFrame(
        [("Big Apple", "Q60", "alias")], "alias string, qid string, name_or_alias string"
    )
    assert mine_aliases(_mentions_df(spark), known).count() == 0
    other = spark.createDataFrame(
        [("Big Apple", "Q999", "alias")], "alias string, qid string, name_or_alias string"
    )  # same surface, different qid: NOT a known pair
    assert mine_aliases(_mentions_df(spark), other).count() == 1


def test_mine_aliases_oracle_parity_on_golden_links(spark, fixture_dir):
    linked = spark.read.parquet(f"{fixture_dir}/golden_links.parquet")
    kb_al = spark.read.parquet(f"{fixture_dir}/kb_aliases.parquet")
    got = sorted(
        (r["alias"], r["qid"], r["support"], r["purity"])
        for r in mine_aliases(linked, kb_al, min_support=2).collect()
    )
    sql = mine_aliases_oracle_sql(
        f"SELECT * FROM read_parquet('{fixture_dir}/golden_links.parquet')",
        f"SELECT * FROM read_parquet('{fixture_dir}/kb_aliases.parquet')",
        min_support=2,
    )
    want = sorted(map(tuple, _duckdb.sql(sql).fetchall()))
    assert got == want
    assert len(got) > 0  # the corpus does surface un-dictionaried aliases


def test_bgp_selective_leg_planned_first(spark):
    """VERDICT r4 #4: a 3-leg pattern authored selective-leg-LAST must
    still join the selective (rare-predicate) leg first — the leg order
    comes from (bound-term count, per-pred cardinality), not authoring
    order.  Left-deep join trees print the first-joined leg's filter
    earliest in the explain string."""
    rows = (
        [(f"s{i}", "common", f"o{i}") for i in range(200)]
        + [(f"s{i}", "mid", f"m{i}") for i in range(50)]
        + [("s1", "rare", "r1")]
    )
    tr = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = match_bgp(
        tr,
        [("?x", "common", "?a"), ("?x", "mid", "?b"), ("?x", "rare", "?c")],
        select=["x", "a", "b", "c"],
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "extended"
    )
    # equal constant counts -> rare pred joins first, common last
    i_rare = plan.index("= rare")
    i_mid = plan.index("= mid")
    i_common = plan.index("= common")
    assert i_rare < i_mid < i_common, (i_rare, i_mid, i_common)
    # and the result is still correct
    assert [tuple(r) for r in got.collect()] == [("s1", "o1", "m1", "r1")]


def test_bgp_explicit_pred_counts_override(spark):
    """pred_counts passed in (the materialized predicate_stats path) is
    honored without running the internal aggregation."""
    rows = [("a", "p", "b"), ("a", "q", "c")]
    tr = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # lie: claim q is huge so p plans first despite equal true counts
    got = match_bgp(
        tr, [("?x", "q", "?v"), ("?x", "p", "?y")],
        select=["x", "y", "v"], pred_counts={"p": 1, "q": 10**9},
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "extended"
    )
    assert plan.index("= p") < plan.index("= q")
    assert [tuple(r) for r in got.collect()] == [("a", "b", "c")]


def test_bgp_path_alternation_and_inverse(spark):
    tr = spark.createDataFrame(
        [("a", "p", "b"), ("c", "q", "b"), ("d", "r", "b"),
         ("b", "s", "e")],
        "subj string, pred string, obj string",
    )
    # alternation: p|q matches both edges into b
    got = match_bgp(tr, [("?x", "p|q", "b")], select=["x"])
    assert sorted(r.x for r in got.collect()) == ["a", "c"]
    # inverse: ^s from e reaches b
    got = match_bgp(tr, [("e", "^s", "?y")], select=["y"])
    assert [r.y for r in got.collect()] == ["b"]
    # inverse joins like any leg: who points at something e points from
    got = match_bgp(
        tr, [("e", "^s", "?m"), ("?x", "p", "?m")], select=["x", "m"]
    )
    assert [tuple(r) for r in got.collect()] == [("a", "b")]


def test_bgp_alternation_closure(spark):
    # p1|p2+ parses as (p1|p2)+: one closure over the union edge set, so
    # mixed-predicate chains compose
    tr = spark.createDataFrame(
        [("a", "p1", "b"), ("b", "p2", "c"), ("c", "p1", "d"),
         ("x", "p3", "y")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(tr, [("a", "p1|p2+", "?t")], select=["t"])
    assert sorted(r.t for r in got.collect()) == ["b", "c", "d"]
    # inverse of a closure
    got = match_bgp(tr, [("d", "^p1|p2+", "?t")], select=["t"])
    assert sorted(r.t for r in got.collect()) == ["a", "b", "c"]


def test_bgp_optional_left_join(spark):
    tr = spark.createDataFrame(
        [("a", "occ", "dr"), ("b", "occ", "eng"),
         ("a", "born", "paris")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(
        tr, [("?p", "occ", "?o")],
        optional=[[("?p", "born", "?c")]],
        select=["p", "o", "c"],
    )
    assert sorted(map(tuple, got.collect())) == [
        ("a", "dr", "paris"), ("b", "eng", None)
    ]


def test_bgp_minus_anti_join(spark):
    tr = spark.createDataFrame(
        [("a", "occ", "dr"), ("b", "occ", "eng"),
         ("a", "born", "paris")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(
        tr, [("?p", "occ", "?o")],
        minus=[[("?p", "born", "?c")]],
        select=["p", "o"],
    )
    assert [tuple(r) for r in got.collect()] == [("b", "eng")]


def test_bgp_optional_group_and_chained_minus(spark):
    # optional GROUP: both legs must match for the group to bind;
    # second minus sees variables bound by the optional
    tr = spark.createDataFrame(
        [("a", "occ", "dr"), ("b", "occ", "eng"), ("c", "occ", "dr"),
         ("a", "born", "paris"), ("paris", "in", "france"),
         ("b", "born", "nyc")],  # nyc has no 'in' edge -> group unbound
        "subj string, pred string, obj string",
    )
    got = match_bgp(
        tr, [("?p", "occ", "?o")],
        optional=[[("?p", "born", "?c"), ("?c", "in", "?r")]],
        select=["p", "o", "c", "r"],
    )
    assert sorted(map(tuple, got.collect())) == [
        ("a", "dr", "paris", "france"),
        ("b", "eng", None, None),
        ("c", "dr", None, None),
    ]


def test_bgp_disjoint_optional_refused(spark):
    tr = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(tr, [("?x", "p", "?y")], optional=[[("?u", "q", "?v")]])
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(tr, [("?x", "p", "?y")], minus=[[("?u", "q", "?v")]])


def test_bgp_materialized_closure_injection(spark):
    # a maintained closure store feeds path legs directly — same result
    # as query-time closing, without re-closing
    tr = spark.createDataFrame(
        [("a", "P279", "b"), ("b", "P279", "c"), ("x", "P31", "a")],
        "subj string, pred string, obj string",
    )
    from entity_extraction_svc_spark.operators.graphwalk import (
        transitive_closure,
    )

    store = transitive_closure(tr, pred="P279")
    fresh = match_bgp(tr, [("a", "P279+", "?t")], select=["t"])
    injected = match_bgp(
        tr, [("a", "P279+", "?t")], select=["t"],
        materialized_closures={"P279": store},
    )
    assert sorted(r.t for r in injected.collect()) == \
        sorted(r.t for r in fresh.collect()) == ["b", "c"]


def test_bgp_sequence_path(spark):
    # p1/p2 joins step pair-sets through an anonymous midpoint; steps take
    # the full step grammar so a closure can sit inside a sequence
    tr = spark.createDataFrame(
        [("a", "P19", "c1"), ("c1", "P131", "r1"), ("b", "P19", "c2"),
         ("c2", "P131", "r2"), ("r1", "P279", "r0")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(tr, [("?x", "P19/P131", "?r")], select=["x", "r"])
    assert sorted((r.x, r.r) for r in got.collect()) == [
        ("a", "r1"), ("b", "r2")
    ]
    got = match_bgp(tr, [("?x", "P19/P131/P279+", "?r")], select=["x", "r"])
    assert [(r.x, r.r) for r in got.collect()] == [("a", "r0")]
    # inverse step inside a sequence: region's residents-by-birth
    got = match_bgp(tr, [("r1", "^P131/^P19", "?who")], select=["who"])
    assert [r.who for r in got.collect()] == ["a"]


def test_bgp_negated_property_set(spark):
    tr = spark.createDataFrame(
        [("a", "P106", "artist"), ("a", "P19", "c1"), ("a", "P31", "Q5")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(tr, [("a", "!P106", "?o")], select=["o"])
    assert sorted(r.o for r in got.collect()) == ["Q5", "c1"]
    got = match_bgp(tr, [("a", "!(P106|P31)", "?o")], select=["o"])
    assert [r.o for r in got.collect()] == ["c1"]
    # negating a path/closure has no single-scan meaning -> refused
    with pytest.raises(ValueError, match="negated property sets"):
        match_bgp(tr, [("a", "!P106+", "?o")], select=["o"])
    # negation INSIDE a sequence step is refused too — before the fix it
    # fell through to a literal predicate named '!P131' and silently
    # matched nothing (review finding)
    with pytest.raises(ValueError, match="negated property set"):
        match_bgp(tr, [("?s", "P19/!P131", "?o")], select=["s", "o"])
    # ...and under inverse
    with pytest.raises(ValueError, match="negated property set"):
        match_bgp(tr, [("?s", "^!P19", "?o")], select=["s", "o"])


def test_bgp_values_and_filter(spark):
    tr = spark.createDataFrame(
        [("a", "P106", "artist"), ("b", "P106", "writer"),
         ("c", "P106", "artist"), ("a", "P19", "paris")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(
        tr, [("?p", "P106", "?occ")], values={"?occ": ["artist"]},
        select=["p", "occ"],
    )
    assert sorted(r.p for r in got.collect()) == ["a", "c"]
    got = match_bgp(
        tr, [("?p", "P106", "?occ")], filters=["occ != 'artist'"],
        select=["p"],
    )
    assert [r.p for r in got.collect()] == ["b"]
    # FILTER applies after OPTIONAL, so it sees the nulls (SPARQL bound())
    got = match_bgp(
        tr, [("?p", "P106", "?occ")],
        optional=[[("?p", "P19", "?city")]],
        filters=["city IS NULL"], select=["p"],
    )
    assert sorted(r.p for r in got.collect()) == ["b", "c"]
    with pytest.raises(ValueError, match="VALUES variable"):
        match_bgp(tr, [("?p", "P106", "?occ")], values={"?nope": ["x"]})


def test_bgp_star_and_optional_quantifiers(spark):
    # p* = closure + zero-length identity; p? = raw + identity
    tr = spark.createDataFrame(
        [("a", "P279", "b"), ("b", "P279", "c"), ("x", "P31", "a"),
         ("d", "P5", "e")],
        "subj string, pred string, obj string",
    )
    got = match_bgp(tr, [("a", "P279*", "?t")], select=["t"])
    assert sorted(r.t for r in got.collect()) == ["a", "b", "c"]
    got = match_bgp(tr, [("a", "P279?", "?t")], select=["t"])
    assert sorted(r.t for r in got.collect()) == ["a", "b"]
    # zero-length matches a term with NO such edges at all
    got = match_bgp(tr, [("e", "P279*", "?t")], select=["t"])
    assert [r.t for r in got.collect()] == ["e"]
    # the canonical SPARQL idiom: instance-of including the class itself
    got = match_bgp(tr, [("x", "P31/P279*", "?t")], select=["t"])
    assert sorted(r.t for r in got.collect()) == ["a", "b", "c"]


# --- aggregate_bgp (SPARQL GROUP BY / HAVING / ORDER / LIMIT) ----------------

from entity_extraction_svc_spark.operators.kgquery import (  # noqa: E402
    aggregate_bgp,
)


def test_aggregate_bgp_matches_manual_groupby(spark, kb):
    got = aggregate_bgp(
        kb,
        [("?p", "P106", "?occ"), ("?p", "P31", "Q5")],
        group_by=["?occ"],
        aggregates=[("count", "*", "n"), ("count_distinct", "?p", "n_people")],
    )
    occ = kb.filter(F.col("pred") == "P106").select(
        F.col("subj").alias("p"), F.col("obj").alias("occ"))
    hum = kb.filter((F.col("pred") == "P31") & (F.col("obj") == "Q5")).select(
        F.col("subj").alias("p"))
    want = occ.join(hum, "p").groupBy("occ").agg(
        F.count("*").alias("n"), F.countDistinct("p").alias("n_people"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_aggregate_bgp_order_limit_deterministic_and_having(spark):
    tr = spark.createDataFrame(
        [("a", "P1", "x"), ("b", "P1", "x"), ("c", "P1", "y"),
         ("d", "P1", "z"), ("e", "P1", "z")],
        "subj string, pred string, obj string",
    )
    got = aggregate_bgp(
        tr, [("?s", "P1", "?o")], group_by=["?o"],
        aggregates=[("count", "*", "n")],
        order_by=[("n", "desc")], limit=2,
    ).collect()
    # x and z tie at 2; tie-break on the group key asc keeps x then z
    assert [(r.o, r.n) for r in got] == [("x", 2), ("z", 2)]
    had = aggregate_bgp(
        tr, [("?s", "P1", "?o")], group_by=["?o"],
        aggregates=[("count", "*", "n")], having="n >= 2",
    )
    assert {r.o for r in had.collect()} == {"x", "z"}


def test_aggregate_bgp_global_row_numeric_aggs_and_validation(spark):
    tr = spark.createDataFrame(
        [("a", "P1", "1"), ("b", "P1", "3"), ("c", "P1", "5")],
        "subj string, pred string, obj string",
    )
    row = aggregate_bgp(
        tr, [("?s", "P1", "?v")], group_by=[],
        aggregates=[("min", "?v", "lo"), ("max", "?v", "hi"),
                    ("count", "*", "n")],
    ).first()
    assert (row.lo, row.hi, row.n) == ("1", "5", 3)
    with pytest.raises(ValueError):
        aggregate_bgp(tr, [("?s", "P1", "?v")], ["?v"],
                      [("median", "?v", "m")])
    with pytest.raises(ValueError):
        aggregate_bgp(tr, [("?s", "P1", "?v")], ["?v"],
                      [("sum", "*", "m")])
    with pytest.raises(ValueError):
        aggregate_bgp(tr, [("?s", "P1", "?v")], ["?v"],
                      [("count", "*", "n")], limit=1)
    with pytest.raises(ValueError):
        aggregate_bgp(tr, [("?s", "P1", "?v")], ["?v"], [])


def test_aggregate_bgp_composes_with_grammar(spark, kb):
    # aggregate over an OPTIONAL-carrying pattern: humans per occupation
    # counting only those WITH a birthplace (filter sees optional nulls)
    got = aggregate_bgp(
        kb, [("?p", "P106", "?occ")],
        optional=[[("?p", "P19", "?city")]],
        filters=["city is not null"],
        group_by=["?occ"], aggregates=[("count_distinct", "?p", "n")],
    )
    occ = kb.filter(F.col("pred") == "P106").select(
        F.col("subj").alias("p"), F.col("obj").alias("occ"))
    bp = kb.filter(F.col("pred") == "P19").select(
        F.col("subj").alias("p")).distinct()
    want = occ.join(bp, "p").groupBy("occ").agg(F.countDistinct("p").alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
