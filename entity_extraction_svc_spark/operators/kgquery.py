"""KG read-side operators over the triples table — the wiki-parser surface.

The reference's wiki-parser service (``annotators/wiki_parser/wiki_parser.py``)
dispatches `parser_info` strings to HDT lookups (SURVEY.md §2.9 W1–W12).
Here each becomes a DataFrame function over ``triples(subj, pred, obj)``;
the DataFrame API is the dispatcher, Catalyst plans the probes, and at scale
the triples table is partitioned by ``pmod(xxhash64(subj), P)`` so subject
probes prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pattern_search(triples: DataFrame, subj: str | None = None,
                   pred: str | None = None, obj: str | None = None,
                   limit: int = 1_000_000) -> DataFrame:
    """W1 (wiki_parser.py:179-191): (s?, p?, o?) pattern match with the
    reference's max_comb_num=1e6 result cap."""
    out = triples
    if subj is not None:
        out = out.filter(F.col("subj") == subj)
    if pred is not None:
        out = out.filter(F.col("pred") == pred)
    if obj is not None:
        out = out.filter(F.col("obj") == obj)
    return out.limit(limit)


def find_objects(triples: DataFrame, entity: str, rel: str,
                 direction: str = "forw") -> DataFrame:
    """W5 (wiki_parser.py:276-291): objects of (entity, rel), fwd or backw."""
    if direction == "forw":
        return (
            triples.filter((F.col("subj") == entity) & (F.col("pred") == rel))
            .select(F.col("obj").alias("value"))
        )
    return (
        triples.filter((F.col("obj") == entity) & (F.col("pred") == rel))
        .select(F.col("subj").alias("value"))
    )


def find_rels(triples: DataFrame, entity: str) -> DataFrame:
    """W4 (wiki_parser.py:260-273): distinct relations of an entity, both
    directions — a union of two filtered projections."""
    fwd = triples.filter(F.col("subj") == entity).select("pred")
    bwd = triples.filter(F.col("obj") == entity).select("pred")
    return fwd.union(bwd).distinct()


def check_triplet(triples: DataFrame, subj: str, pred: str, obj: str) -> bool:
    """W6 (wiki_parser.py:294-302): existence check — a pruned count."""
    return (
        triples.filter(
            (F.col("subj") == subj) & (F.col("pred") == pred) & (F.col("obj") == obj)
        ).limit(1).count()
        > 0
    )


def find_types(triples: DataFrame) -> DataFrame:
    """W7 (wiki_parser.py:305-316): P31 types per subject (+P106 occupations
    for humans, the Q5 special case)."""
    p31 = triples.filter(F.col("pred") == "P31").select("subj", F.col("obj").alias("type"))
    humans = p31.filter(F.col("type") == "Q5").select("subj")
    occ = (
        triples.filter(F.col("pred") == "P106")
        .join(humans, "subj", "left_semi")
        .select("subj", F.col("obj").alias("type"))
    )
    return p31.union(occ).distinct()


def find_types_2hop(triples: DataFrame) -> DataFrame:
    """W8 (wiki_parser.py:319-337): types ∪ superclasses of types — the 2-hop
    self-join t1 ⋈ t2 ON t1.obj = t2.subj with t2.pred = P279."""
    t1 = triples.filter(F.col("pred") == "P31").select("subj", F.col("obj").alias("type"))
    sup = (
        t1.alias("a")
        .join(
            triples.filter(F.col("pred") == "P279").alias("b"),
            F.col("a.type") == F.col("b.subj"),
        )
        .select(F.col("a.subj").alias("subj"), F.col("b.obj").alias("type"))
    )
    return t1.union(sup).distinct()


def find_types_closure(triples: DataFrame) -> DataFrame:
    """W8 generalized: types ∪ ALL transitive superclasses of the types —
    the fixpoint the reference's 2-hop expansion (wiki_parser.py:319-337)
    truncates at depth 1.  The P279 taxonomy closes via log-round path
    doubling (graphwalk.transitive_closure), then one join carries every
    typed subject to its full ancestor set."""
    from entity_extraction_svc_spark.operators.graphwalk import (
        transitive_closure,
    )

    t1 = triples.filter(F.col("pred") == "P31").select(
        "subj", F.col("obj").alias("type")
    )
    clo = transitive_closure(triples, pred="P279")
    sup = (
        t1.alias("a")
        .join(clo.alias("c"), F.col("a.type") == F.col("c.src"))
        .select(F.col("a.subj").alias("subj"), F.col("c.dst").alias("type"))
    )
    return t1.union(sup).distinct()


def find_intersection(triples: DataFrame, entity1: str, entity2: str,
                      rel: str) -> DataFrame:
    """W9 (wiki_parser.py:349-368): shared objects of two entities over a
    relation — set intersection of two filtered projections."""
    o1 = find_objects(triples, entity1, rel)
    o2 = find_objects(triples, entity2, rel)
    return o1.intersect(o2)


def find_labels(labels: DataFrame, entities: DataFrame) -> DataFrame:
    """W2 (wiki_parser.py:210-258 find_label): entity -> @en label via a
    broadcast join against the labels dimension."""
    return entities.select("qid").distinct().join(
        F.broadcast(labels.select("qid", "label")), "qid", "left"
    )


def format_date_col(col) -> "F.Column":
    """W2 date cleanup (wiki_parser.py:194-207 format_date): a literal
    ``YYYY-MM-DD`` timestamp renders as ``dd MMMM yyyy`` unless the day is
    00 (year only); non-dates pass through with +/- stripped."""
    date_re = r"([\d]{3,4})-([\d]{1,2})-([\d]{1,2})"
    year = F.regexp_extract(col, date_re, 1)
    day = F.regexp_extract(col, date_re, 3)
    return (
        F.when(year == "", F.regexp_replace(col, r"^[+-]+", ""))
        .when(day == "00", year)
        .otherwise(
            F.date_format(F.to_date(F.regexp_extract(col, date_re, 0)), "dd MMMM yyyy")
        )
    )


def age_col(birth_date) -> "F.Column":
    """W11 age calc (wiki_parser.py:587-593): current year - birth year."""
    return F.year(F.current_date()) - F.year(F.to_date(birth_date))


# relations the reference probes for entity-pair connections
# (wiki_parser.py:371-405: spouse/partner first, then shared works/teams)
CONNECTION_RELS = ["P26", "P451", "P175", "P54", "P102", "P463", "P800"]


def find_connection(triples: DataFrame, entity1: str, entity2: str,
                    rels: list[str] | None = None) -> DataFrame:
    """W10 (wiki_parser.py:371-405): how two entities connect — direct edges
    either way, plus shared objects over the connection relations.

    Returns (rel, via) rows: via = NULL for a direct edge, else the shared
    object.  One pass over the (pred-pruned) triples of the two entities —
    a self-join on obj instead of the reference's per-rel probe cascade."""
    rels = rels or CONNECTION_RELS
    pair = triples.filter(
        F.col("subj").isin([entity1, entity2]) & F.col("pred").isin(rels)
    )
    direct = (
        triples.filter(
            ((F.col("subj") == entity1) & (F.col("obj") == entity2))
            | ((F.col("subj") == entity2) & (F.col("obj") == entity1))
        )
        .select("pred", F.lit(None).cast("string").alias("via"))
    )
    e1 = pair.filter(F.col("subj") == entity1).select("pred", "obj")
    e2 = pair.filter(F.col("subj") == entity2).select(
        F.col("pred").alias("pred2"), F.col("obj").alias("obj2")
    )
    shared = (
        e1.join(e2, (e1["obj"] == e2["obj2"]) & (e1["pred"] == e2["pred2"]))
        .select("pred", F.col("obj").alias("via"))
    )
    return direct.union(shared).distinct()


def triples_per_subject(triples: DataFrame, top_n: int | None = None,
                        salt: int | None = None) -> DataFrame:
    """W12 (wiki_parser.py:72-125): triple count per subject; optional top-n
    (the reference's precomputed top-people cache).

    ``salt`` enables the two-stage skew-safe aggregation for head subjects
    (north rule: high-frequency QIDs like Q30/Q5 concentrate rows): partial
    counts per (subj, salt-bucket) first — so no single reducer sees a whole
    hot key — then the cheap re-aggregation over at most ``salt`` rows per
    subject.  Results are identical; at 10^12 triples the first stage is
    also where map-side combine collapses the hot key per task."""
    if salt:
        partial = (
            triples.withColumn("_salt", F.pmod(F.xxhash64("pred", "obj"), F.lit(salt)))
            .groupBy("subj", "_salt")
            .agg(F.count("*").alias("c"))
        )
        counts = partial.groupBy("subj").agg(F.sum("c").cast("long").alias("n_triples"))
    else:
        counts = triples.groupBy("subj").agg(F.count("*").alias("n_triples"))
    if top_n is not None:
        return counts.orderBy(F.desc("n_triples"), F.asc("subj")).limit(top_n)
    return counts


def top_objects_per_subject(triples: DataFrame, k: int = 10,
                            salt: int | None = None) -> DataFrame:
    """Per subject, the ``k`` most frequent objects (count desc, obj asc) —
    the W12 top-people cache generalized from "top subjects overall" to
    "top neighbors per subject" (wiki_parser.py:72-125 keeps exactly this
    shape precomputed for Q5 humans).

    The count aggregation itself is skew-safe without help (map-side
    combine collapses a hot subject inside each task).  The part that is
    NOT is the ranking window: ``row_number() over (partition by subj)``
    sends every (subj, obj) count row of a head entity to ONE task — a
    hot QID with 10^7 distinct neighbors serializes there.  ``salt``
    switches to the exact two-stage cut: partial top-k per
    (subj, hash(obj) % salt) — each obj's TOTAL count lives in exactly one
    count row, so no bucket splits an object's count and the partial cut
    can never drop a global top-k member — then the final window ranks at
    most ``salt * k`` rows per subject.  Results are identical (pinned in
    tests/test_skew.py).

    When to salt (measured at 20M/40M rows, BENCH.md §skew): NOT for
    latency on a saturated box — the two-stage cut adds a full extra
    exchange and the hot key's single-task sort hides behind the other
    tasks' work (plain 10.7s vs salted 13.0s at 40M rows / 10^7 hot
    neighbors).  Salt when one subject's neighbor set exceeds a single
    task's sort memory (10^8+ at executor defaults) — there the plain
    window spills or OOMs while each salted bucket stays 1/salt the size;
    and on a real gang-scheduled cluster where a straggler holds the whole
    stage, not just one of 32 local threads."""
    counts = triples.groupBy("subj", "obj").agg(F.count("*").alias("n"))
    order = [F.desc("n"), F.asc("obj")]
    from pyspark.sql.window import Window

    if salt:
        pre = Window.partitionBy(
            "subj", F.pmod(F.xxhash64("obj"), F.lit(salt))
        ).orderBy(*order)
        counts = (
            counts.withColumn("_r", F.row_number().over(pre))
            .filter(F.col("_r") <= k)
            .drop("_r")
        )
    w = Window.partitionBy("subj").orderBy(*order)
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("subj", "obj", F.col("n").alias("n_triples"), "rank")
    )


def top_triplets_for(linked_qids: DataFrame, triples: DataFrame,
                     whitelist: list[str], labels: DataFrame | None = None) -> DataFrame:
    """W11 (wiki_parser.py:475-604): per linked entity, its whitelisted
    triples, optionally label-joined.  linked_qids is small (bounded by the
    KB) -> broadcast against the big triples table."""
    out = triples.filter(F.col("pred").isin(whitelist)).join(
        F.broadcast(linked_qids.select(F.col("qid").alias("subj")).distinct()),
        "subj",
        "left_semi",
    )
    if labels is not None:
        lab = labels.select(F.col("qid").alias("obj"), F.col("label").alias("obj_label"))
        out = out.join(F.broadcast(lab), "obj", "left")
    return out


def match_bgp(triples: DataFrame, patterns: list[tuple[str, str, str]],
              select: list[str] | None = None,
              pred_counts: dict[str, int] | None = None,
              optional: list[list[tuple[str, str, str]]] | None = None,
              minus: list[list[tuple[str, str, str]]] | None = None,
              materialized_closures: dict[str, DataFrame] | None = None,
              values: dict[str, list] | None = None,
              filters: list | None = None,
              ) -> DataFrame:
    """Basic-graph-pattern matcher: a conjunction of (s, p, o) patterns with
    ``?var`` terms compiled into selectivity-ordered hash self-joins over the
    triples table — the general form of the reference wiki-parser's
    fixed-shape probes (wiki_parser.py:179-191 pattern match, :319-337
    2-hop, :349-368 intersection are all 1-/2-leg special cases).

    Compilation, Spark-first:
      * each pattern becomes a *leg*: a constant-filtered projection of the
        triples scan (filters push down to parquet; a constant-``subj`` leg
        partition-prunes the subject-hash-partitioned store);
      * legs join greedily, cheapest-estimate-first, always preferring a
        leg that shares a variable with what's already bound —
        intermediates stay small and no accidental cartesian product
        appears unless the pattern graph itself is disconnected (then an
        explicit crossJoin, smallest estimates first).  The estimate is
        (bound-term count, per-predicate row count): at 10^12 triples a
        pattern authored selective-leg-last would otherwise materialize a
        huge intermediate before the selective leg prunes it.  Predicate
        counts come from ``pred_counts`` (pass
        ``kgqa.predicate_stats``'s profile when you have it materialized)
        or, when omitted, from one index-key-sized aggregation over the
        predicate dimension — the same sanctioned driver action as the
        streaming store's pfx collect;
      * join columns are the shared variables, so Catalyst sees plain
        equi-joins and AQE broadcasts any leg that turns out tiny at
        runtime.

    Property paths over constant predicates (the SPARQL 1.1 operators a
    KG query surface actually needs, round 5 extends + with | and ^):

      * ``p+`` — one-or-more: the leg scans the
        :func:`~entity_extraction_svc_spark.operators.graphwalk.transitive_closure`
        of the predicate instead of the raw table, closed once per
        distinct path expression and shared across legs.  Sound for the
        hierarchy-shaped predicates closure is sized for (see the
        closure docstring's honest budget note).
      * ``p1|p2`` — alternation: the leg filters ``pred IN (p1, p2)``
        (still a pushed-down scan filter).
      * ``^p`` — inverse: the leg swaps subj/obj.  Composes with the
        others: ``^p+`` is the inverse of the closure, and
        ``p1|p2+`` parses as ``(p1|p2)+`` (the ``+`` binds the whole
        alternation — one closure over the union edge set, which is how
        SPARQL's ``(p1|p2)+`` evaluates).  ``^`` binds the whole
        alternation too: ``^p1|p2`` means ``^(p1|p2)``, NOT SPARQL's
        ``(^p1)|p2`` — the uniform whole-binding rule of this
        unparenthesized mini-grammar (author separate legs for the
        per-alternative reading).
      * ``p*`` / ``p?`` — zero-or-more / zero-or-one: the closure (resp.
        raw scan) unioned with the identity pairs over the graph's terms
        (SPARQL's zero-length-path semantics), distinct because a length-1
        self-loop and the zero-length match coincide.  The identity frame
        is built once per match and shared across legs like a closure.
      * ``p1/p2`` — sequence: the leg is the join of the step pair-sets
        through anonymous midpoints (``?x P19/P131 ?r`` = birthplace's
        region without naming the city).  Each ``/``-separated step takes
        the full ``^``/``|``/``+``/``*``/``?`` grammar, so ``P31/P279*``
        is "type, including the type itself and its taxonomic ancestors";
        the chain folds left-to-right inside the leg.
      * ``!p1|p2`` (or ``!(p1|p2)``) — negated property set: the leg
        keeps edges whose predicate is NOT in the set (still one
        pushed-down scan filter); estimated at total - sum(set counts).
        Plain predicates/alternations only — negating a path has no
        single-scan meaning and is refused.

    ``optional`` (SPARQL OPTIONAL) takes pattern GROUPS, each compiled
    like a mini-BGP and LEFT-joined on its variables shared with what is
    already bound (nulls where the group does not match); ``minus``
    (SPARQL MINUS / FILTER NOT EXISTS) anti-joins each group's shared
    variables.  Both require at least one shared variable — a disjoint
    OPTIONAL/MINUS group is a SPARQL footgun this matcher refuses.

    ``values`` (SPARQL VALUES, the single-variable form) restricts a
    bound variable to an explicit list; ``filters`` (SPARQL FILTER)
    applies Spark SQL boolean expressions over the bound variable names
    (strings through ``F.expr`` or ready Column objects).  Both are
    attached to the assembled result — Catalyst pushes the isin/filter
    predicates down through the join tree to the leg that binds each
    variable, so authoring position costs nothing.  Per SPARQL semantics
    they apply AFTER optional joins (a filter on an optional variable
    sees its nulls).

    Bag semantics (no implicit distinct), like SPARQL BGPs.  ``select``
    projects the named variables (with or without the ``?``)."""
    from entity_extraction_svc_spark.operators.graphwalk import (
        transitive_closure,
    )

    closures: dict = {}
    # pre-materialized closures (the runner's --maintain-closure store,
    # plans/maintain.read_closure) keyed by predicate: a path leg like
    # "P279+" reads the maintained (src, dst) pairs instead of re-closing
    # the predicate at query time — the point of maintaining them
    for pred_name, df in (materialized_closures or {}).items():
        closures[(True, (pred_name,))] = df.select(
            F.col("src").alias("subj"), F.col("dst").alias("obj")
        )
    if pred_counts is None:
        # the predicate dimension is ontology-sized (10^3), and constant
        # predicates are the norm in BGPs — one tiny agg buys the
        # cardinality-ordered join tree below.  SKIPPED when no group has
        # two legs to order: a single-leg pattern derives nothing from
        # the stats, and paying a full-table aggregation per call for it
        # is a corpus-scale scan wasted (review finding — the driver row
        # alone makes several single-leg match_bgp calls)
        needs_ordering = len(patterns) >= 2 or any(
            len(g) >= 2 for g in (optional or []) + (minus or [])
        )
        if needs_ordering:
            pred_counts = {
                r["pred"]: r["n"]
                for r in triples.groupBy("pred").agg(
                    F.count("*").alias("n")
                ).collect()
            }
        else:
            pred_counts = {}
    total_rows = sum(pred_counts.values()) or 1

    def _parse_path(p: str) -> tuple[bool, str, list[str]]:
        """'^p1|p2+' -> (inverse, mode, [p1, p2]) with mode one of
        '' (raw scan), '+' (one-or-more), '*' (zero-or-more),
        '?' (zero-or-one).

        Grammar note (deliberate, uniform): BOTH the quantifier and a
        leading '^' bind the WHOLE alternation — '^p1|p2+' means
        ^((p1|p2)+).  This diverges from SPARQL 1.1's precedence, where
        postfix and '^' bind tighter than '|' ((^p1)|(p2+)); the
        whole-binding rule keeps the unparenthesized mini-grammar
        unambiguous.  For SPARQL's per-alternative reading, author the
        alternatives as separate legs (they union) or separate sequence
        steps."""
        inv = p.startswith("^")
        core = p[1:] if inv else p
        if core.startswith("!"):
            # negation is only supported as a WHOLE single-leg path (the
            # branch in _compile); inside a sequence step or under
            # inverse/quantifier it would otherwise fall through to a
            # literal predicate named '!...' and silently match nothing
            raise ValueError(
                f"negated property set not supported here: {p!r} "
                "(use '!p1|p2' as the whole pattern path)"
            )
        mode = ""
        if len(core) > 1 and core[-1] in "+*?":
            mode, core = core[-1], core[:-1]
        alts = [a for a in core.split("|") if a]
        if not alts:
            raise ValueError(f"empty property path: {p!r}")
        return inv, mode, alts

    def _neg_alts(p: str) -> list[str]:
        """'!p1|p2' / '!(p1|p2)' -> [p1, p2]; refuses negated paths."""
        core = p[1:]
        if core.startswith("(") and core.endswith(")"):
            core = core[1:-1]
        inv, mode, alts = _parse_path(core)
        if inv or mode or "/" in core:
            raise ValueError(
                "negated property sets take plain predicates/alternations "
                f"only: {p!r}"
            )
        return alts

    def _identity_pairs() -> DataFrame:
        # zero-length path: one (x, x) per term occurring in the graph
        # (SPARQL's zero-length semantics over the graph's RDF terms);
        # built once per match and cached like a closure
        if "__identity__" not in closures:
            nodes = (
                triples.select(F.col("subj").alias("n"))
                .unionByName(triples.select(F.col("obj").alias("n")))
                .distinct()
            )
            closures["__identity__"] = nodes.select(
                F.col("n").alias("subj"), F.col("n").alias("obj")
            ).localCheckpoint(eager=True)
        return closures["__identity__"]

    def _step_pairs(step: str) -> DataFrame:
        """One path STEP (['^'] alts ['+'|'*'|'?']) as (subj, obj) pairs."""
        inv, mode, alts = _parse_path(step)
        closed = mode in ("+", "*")
        key = (True, tuple(sorted(alts)))
        if closed and key not in closures:
            closures[key] = transitive_closure(
                triples.filter(F.col("pred").isin(alts))
            ).select(
                F.col("src").alias("subj"),
                F.col("dst").alias("obj"),
            ).localCheckpoint(eager=True)
        pairs = (
            closures[key] if closed
            else triples.filter(F.col("pred").isin(alts))
            .select("subj", "obj")
        )
        if inv:
            pairs = pairs.select(
                F.col("obj").alias("subj"),
                F.col("subj").alias("obj"),
            )
        if mode in ("*", "?"):
            # zero-or-X = X plus the identity pairs; distinct because a
            # length-1 self-loop and the zero-length match coincide
            pairs = pairs.unionByName(_identity_pairs()).distinct()
        return pairs

    def _step_est(step: str) -> int:
        return sum(pred_counts.get(a, 0) for a in _parse_path(step)[2])

    def _path_est(p: str) -> int:
        if p.startswith("?"):
            return total_rows
        if p.startswith("!"):
            return max(
                total_rows - sum(pred_counts.get(a, 0) for a in _neg_alts(p)),
                0,
            )
        # sequences: the most selective step bounds one join side; the
        # product can fan out past it, but as a RELATIVE key for leg
        # ordering the min-step proxy keeps selective chains early
        return min(_step_est(st) for st in p.split("/"))

    def _compile(pats: list[tuple[str, str, str]]):
        legs = []
        for i, (s, p, o) in enumerate(pats):
            leg = triples
            if not p.startswith("?"):
                if p.startswith("!"):
                    pairs = triples.filter(
                        ~F.col("pred").isin(_neg_alts(p))
                    ).select("subj", "obj")
                    leg = pairs.select("subj", F.lit(p).alias("pred"), "obj")
                else:
                    steps = [st for st in p.split("/") if st]
                    if not steps:
                        raise ValueError(f"empty property path: {p!r}")
                    inv0, mode0, alts0 = _parse_path(steps[0])
                    if len(steps) > 1 or inv0 or mode0 or len(alts0) > 1:
                        # sequence steps fold left-to-right; AQE broadcasts
                        # whichever step frame turns out tiny at runtime
                        pairs = _step_pairs(steps[0])
                        for st in steps[1:]:
                            nxt = _step_pairs(st)
                            pairs = pairs.alias("l").join(
                                nxt.alias("r"),
                                F.col("l.obj") == F.col("r.subj"),
                            ).select(
                                F.col("l.subj").alias("subj"),
                                F.col("r.obj").alias("obj"),
                            )
                        # pred rides as the original path literal so the
                        # generic constant filter below matches it
                        leg = pairs.select(
                            "subj", F.lit(p).alias("pred"), "obj"
                        )
            out_cols, seen = [], {}
            for col, term in (("subj", s), ("pred", p), ("obj", o)):
                if term.startswith("?"):
                    v = term[1:]
                    if not v:
                        raise ValueError(f"empty variable name in pattern {i}")
                    if v in seen:  # same var twice in one pattern -> equality
                        leg = leg.filter(F.col(col) == F.col(seen[v]))
                    else:
                        seen[v] = col
                        out_cols.append(F.col(col).alias(v))
                else:
                    leg = leg.filter(F.col(col) == term)
            # leg cardinality estimate: the predicate's row count (total for
            # a variable predicate; path legs use the base predicate counts
            # as a closure-size proxy, sequences their most selective step,
            # negations the complement count)
            est = _path_est(p)
            legs.append(
                {"df": leg.select(*out_cols), "vars": set(seen),
                 "nconst": 3 - len(seen), "est": est, "idx": i}
            )
        if not legs:
            raise ValueError("match_bgp needs at least one pattern")
        remaining = sorted(
            legs, key=lambda l: (-l["nconst"], l["est"], l["idx"])
        )
        first = remaining.pop(0)
        out, bound = first["df"], set(first["vars"])
        while remaining:
            pick = next(
                (j for j, leg in enumerate(remaining)
                 if leg["vars"] & bound), 0
            )
            leg = remaining.pop(pick)
            shared = sorted(leg["vars"] & bound)
            out = (out.join(leg["df"], on=shared) if shared
                   else out.crossJoin(leg["df"]))
            bound |= leg["vars"]
        return out, bound

    out, bound = _compile(patterns)
    for grp in (optional or []):
        og, ovars = _compile(grp)
        shared = sorted(ovars & bound)
        if not shared:
            raise ValueError(
                "optional group shares no variable with the required block"
            )
        out = out.join(og, on=shared, how="left")
        bound |= ovars
    for grp in (minus or []):
        mg, mvars = _compile(grp)
        shared = sorted(mvars & bound)
        if not shared:
            raise ValueError(
                "minus group shares no variable with the required block"
            )
        out = out.join(mg.select(*shared).distinct(), on=shared,
                       how="left_anti")
    for v, vals in (values or {}).items():
        vv = v.lstrip("?")
        if vv not in bound:
            raise ValueError(f"VALUES variable not bound by any pattern: {v}")
        out = out.filter(F.col(vv).isin(list(vals)))
    for fexpr in (filters or []):
        out = out.filter(F.expr(fexpr) if isinstance(fexpr, str) else fexpr)
    if select is not None:
        want = [v.lstrip("?") for v in select]
        missing = [v for v in want if v not in bound]
        if missing:
            raise ValueError(f"select variables not bound by any pattern: {missing}")
        out = out.select(*want)
    return out


def validate_triples(triples: DataFrame, constraints: DataFrame) -> DataFrame:
    """Ontology QA over a freshly-constructed KG: flag triples whose typed
    subject (domain) or typed object (range) carries no P31 type matching
    the predicate's declared constraint — the batch generalization of the
    reference's per-type gating (entity_linking.py P641-type seeding and
    the wiki-parser's Q5/P106 special case are point uses of the same
    domain/range knowledge).

    ``constraints``: (pred, domain, range) — either side nullable; a triple
    whose subject/object has NO P31 type at all passes (unknown ≠ wrong,
    the open-world reading).  Violations come back as
    (subj, pred, obj, kind∈{domain,range}, expected).

    Scale: constraints are a per-ontology dimension (10^3 preds) →
    broadcast; the P31 type-set aggregation and the domain check both key
    on ``subj``, so on the subject-hash-partitioned triples store they
    co-locate with the scan, and only the range check's join on ``obj``
    pays a real exchange."""
    p31 = (
        triples.filter(F.col("pred") == "P31")
        .groupBy("subj")
        .agg(F.collect_set("obj").alias("_types"))
    )
    t = triples.join(F.broadcast(constraints), "pred")
    dom = (
        t.filter(F.col("domain").isNotNull())
        .join(p31, "subj")
        .filter(~F.array_contains("_types", F.col("domain")))
        .select("subj", "pred", "obj", F.lit("domain").alias("kind"),
                F.col("domain").alias("expected"))
    )
    rng = (
        t.filter(F.col("range").isNotNull())
        .join(p31.withColumnRenamed("subj", "obj"), "obj")
        .filter(~F.array_contains("_types", F.col("range")))
        .select("subj", "pred", "obj", F.lit("range").alias("kind"),
                F.col("range").alias("expected"))
    )
    return dom.unionByName(rng)


def construct_triples(triples: DataFrame, patterns: list[tuple[str, str, str]],
                      head: tuple[str, str, str], **bgp_kwargs) -> DataFrame:
    """SPARQL CONSTRUCT / a single datalog rule: match the BGP body with
    :func:`match_bgp` (full grammar — property paths, OPTIONAL, MINUS,
    VALUES, FILTER), then emit one derived (subj, pred, obj) per binding
    from the ``head`` template, each term a ``?var`` bound by the body or
    a constant.  Output is DISTINCT (CONSTRUCT's set semantics: two
    bindings proving the same triple yield one row), ready to feed the
    lineage store or :func:`~..sources.ntriples.format_ntriples` — the
    rule-based enrichment step of a construction pipeline (e.g. born-in
    city + city-in-region => born-in-region).

    Head variables must appear in the body (raises otherwise — a silent
    null column would poison the store).  Plan = the body's ordered join
    tree + one projection + an aggregate-free distinct; the derived
    triples inherit the body's partitioning until the distinct's hash
    exchange on the full row.
    """
    bind = match_bgp(triples, patterns, **bgp_kwargs)

    def term(t: str):
        if t.startswith("?"):
            v = t[1:]
            if v not in bind.columns:
                raise ValueError(
                    f"head variable ?{v} is not bound by the body "
                    f"(bound: {bind.columns})"
                )
            return F.col(v)
        return F.lit(t)

    s, p, o = head
    return bind.select(
        term(s).alias("subj"), term(p).alias("pred"), term(o).alias("obj")
    ).distinct()


_BGP_AGG_FUNCS = {
    "count": F.count,
    "count_distinct": F.countDistinct,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "avg": F.avg,
}


def aggregate_bgp(triples: DataFrame, patterns: list[tuple[str, str, str]],
                  group_by: list[str],
                  aggregates: list[tuple[str, str, str]],
                  having: str | None = None,
                  order_by: list[tuple[str, str]] | None = None,
                  limit: int | None = None,
                  **bgp_kwargs) -> DataFrame:
    """SPARQL aggregate SELECT over :func:`match_bgp`'s solution bag:
    ``GROUP BY ?vars`` + COUNT / COUNT DISTINCT / MIN / MAX / SUM / AVG,
    HAVING, and deterministic ``ORDER BY ... LIMIT`` — the analytics form
    of the query surface ("top occupations among humans", "entities per
    type"), which the reference's wiki-parser approximates with
    client-side counting over find_* results.

    ``aggregates``: (fn, var, alias) triples; ``("count", "*", alias)``
    counts solutions.  ``group_by`` may be empty (one global row).
    ``order_by``: (alias_or_var, 'asc'|'desc') keys; the grouping
    variables are ALWAYS appended ascending as the final tie-break, so an
    ordered cut is a pure function of the data (SPARQL leaves tie order
    implementation-defined; determinism is this engine's contract —
    same rule as every top-k in the repo).  ``limit`` requires
    ``order_by``.  Extra keyword arguments (optional/minus/values/
    filters/pred_counts/materialized_closures) pass through to
    match_bgp, so aggregates compose with the full pattern grammar.

    Scale: the groupBy keys are the grouping variables — partial
    aggregation collapses each executor's slice before the one exchange
    (count/sum/min/max/avg are all map-side combinable; count_distinct
    expands to the standard two-phase plan); ORDER BY + LIMIT compiles to
    TakeOrderedAndProject (per-partition top-k, k-sized merge), never a
    global sort of the group table."""
    sols = match_bgp(triples, patterns, **bgp_kwargs)
    keys = [v.lstrip("?") for v in group_by]
    aggs = []
    for fn, var, alias in aggregates:
        if fn not in _BGP_AGG_FUNCS:
            raise ValueError(
                f"unknown aggregate {fn!r}; supported: "
                f"{sorted(_BGP_AGG_FUNCS)}"
            )
        if var == "*":
            if fn != "count":
                raise ValueError(f"'*' only aggregates with count, got {fn!r}")
            col = F.lit(1)
        else:
            col = F.col(var.lstrip("?"))
        aggs.append(_BGP_AGG_FUNCS[fn](col).alias(alias))
    if not aggs:
        raise ValueError("aggregate_bgp needs at least one aggregate")
    out = sols.groupBy(*keys).agg(*aggs) if keys else sols.agg(*aggs)
    if having is not None:
        out = out.filter(F.expr(having) if isinstance(having, str) else having)
    if order_by:
        order = [
            F.col(name.lstrip("?")).desc() if str(direction).lower() == "desc"
            else F.col(name.lstrip("?")).asc()
            for name, direction in order_by
        ]
        order += [F.col(k).asc() for k in keys]
        out = out.orderBy(*order)
        if limit is not None:
            out = out.limit(limit)
    elif limit is not None:
        raise ValueError("limit without order_by is nondeterministic; "
                         "pass order_by")
    return out
