"""Knowledge-graph quality audits: contradiction and referential checks.

The reference emits triples per request and trusts the KB side implicitly
(wiki_parser serves whatever the HDT store holds); a corpus-level
construction pipeline that MERGES sources (KB + per-document extractions,
S7/S8 custom-KB ingest) needs the standard QA passes before a graph is
shipped:

- :func:`functional_conflicts` — a *functional* predicate (birthplace,
  date of birth, capital) admits one value per subject; after a
  multi-source union, subjects carrying >1 distinct object on such a
  predicate are contradictions to surface, not rows to silently keep.
- :func:`dangling_objects` — entity-valued objects that never occur as a
  subject and are absent from the entity dimension: broken references
  introduced by partial ingests or by linker output naming QIDs the KB
  slice doesn't carry.
- :func:`predicate_stats` — per-predicate row/subject counts, the profile
  a schema owner reads before accepting an ingest.

Scale shape: each audit is one partial-agg-safe shuffle on its natural
key — ``groupBy(subj, pred)`` for conflicts, ``distinct`` + two
``left_anti`` joins on the entity id for dangling (the entity dim side is
broadcast when it fits, and both anti-join inputs are already
id-projected single columns), a ``groupBy(pred)`` for stats (predicate
cardinality is tiny, but counts are partial-aggregated before the
exchange so skewed predicates like P31 never concentrate rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Wikidata-style single-valued predicates relevant to the fixture domain:
# birthplace, capital, inception, date fields are one-per-subject.
FUNCTIONAL_PREDS = ["P19", "P36", "P571", "P159", "P1376"]


def functional_conflicts(triples: DataFrame,
                         functional_preds: list[str] | None = None,
                         ) -> DataFrame:
    """(subj, pred, objects, n_obj) for every subject carrying more than
    one distinct object on a functional predicate.

    ``objects`` is the sorted distinct object array — deterministic, so
    downstream resolution (pick-first, source-priority, human review) and
    the engine-parity contract both see one canonical spelling of the
    conflict.
    """
    preds = functional_preds or FUNCTIONAL_PREDS
    return (
        triples.filter(F.col("pred").isin(preds))
        .groupBy("subj", "pred")
        .agg(F.sort_array(F.collect_set("obj")).alias("objects"))
        .filter(F.size("objects") > 1)
        .select("subj", "pred", "objects", F.size("objects").alias("n_obj"))
    )


def dangling_objects(triples: DataFrame, entities: DataFrame | None = None,
                     qid_col: str = "qid") -> DataFrame:
    """Distinct entity-shaped objects (``Q<digits>``) that never appear as
    a subject — and, when the ``entities`` dimension is given, are absent
    from it too.  One column: ``obj``.

    Literal-valued objects (dates, names, quantities) are not references
    and are excluded up front, which also keeps the distinct small.
    """
    objs = (
        triples.filter(F.col("obj").rlike("^Q[0-9]+$"))
        .select("obj").distinct()
    )
    out = objs.join(
        triples.select(F.col("subj").alias("obj")).distinct(), "obj", "left_anti"
    )
    if entities is not None:
        out = out.join(
            entities.select(F.col(qid_col).alias("obj")).distinct(),
            "obj", "left_anti",
        )
    return out


def predicate_stats(triples: DataFrame) -> DataFrame:
    """(pred, n_triples, n_subj) — the ingest profile.  Exact distinct
    subject counts (the oracle certifies values); swap in
    ``approx_count_distinct`` when profiling at the full 10^12 scale and
    exactness stops mattering."""
    return triples.groupBy("pred").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Triple-set diff between two KB snapshots (crawl N vs crawl N+1, or
    pre- vs post-ingest): (status ∈ {added, removed}, subj, pred, obj)
    under SET semantics — exact re-extractions of an existing triple are
    not churn.  The batch twin of
    :func:`~entity_extraction_svc_spark.operators.temporal.fact_intervals`
    (which tracks one fact's value over many observations; this compares
    two whole graphs at two instants).

    Two distinct + two anti-joins, all hash-partitioned on the full
    (subj, pred, obj) key; on subject-hash-partitioned stores both sides
    arrive pre-clustered on the join key's prefix, and AQE broadcasts a
    small delta side (the common case: a daily crawl touches a sliver of
    10^12 triples)."""
    k = ["subj", "pred", "obj"]
    o, n = old.select(k).distinct(), new.select(k).distinct()
    added = n.join(o, k, "left_anti").select(F.lit("added").alias("status"), *k)
    removed = o.join(n, k, "left_anti").select(
        F.lit("removed").alias("status"), *k
    )
    return added.unionByName(removed)


def functional_changes(old: DataFrame, new: DataFrame,
                       functional_preds: list[str] | None = None,
                       ) -> DataFrame:
    """Value CHANGES of functional facts between two snapshots:
    (subj, pred, old_obj, new_obj) where a single-valued predicate's
    object differs — the diff rows a review queue actually wants paired
    (an added+removed pair on the same (subj, pred) is one edit, not two
    independent events).  Computed from :func:`snapshot_diff` by joining
    its added and removed sides on (subj, pred); subjects clean on one
    side (true additions / retractions) stay in the plain diff."""
    preds = functional_preds or FUNCTIONAL_PREDS
    d = snapshot_diff(old, new).filter(F.col("pred").isin(preds))
    a = d.filter(F.col("status") == "added").select(
        "subj", "pred", F.col("obj").alias("new_obj")
    )
    r = d.filter(F.col("status") == "removed").select(
        "subj", "pred", F.col("obj").alias("old_obj")
    )
    return a.join(r, ["subj", "pred"]).select(
        "subj", "pred", "old_obj", "new_obj"
    )


def induce_schema(triples: DataFrame, type_pred: str = "P31") -> DataFrame:
    """Domain/range INDUCTION — the inverse of kgquery.validate_triples:
    instead of checking triples against a declared ontology, derive the
    ontology the data implies.  Per predicate: the modal subject type
    (induced domain) and modal object type (induced range), each with the
    fraction of typed rows it covers, so a schema owner reads
    ``(P36, domain=Q6256 0.97, range=Q515 1.0)`` and declares the
    constraint (or investigates the 3%).

    Each entity contributes ONE canonical type — its minimal ``type_pred``
    object — so a multi-typed subject doesn't multi-vote and the modal
    count has a total, engine-independent definition.  Predicates whose
    objects are untyped literals (dates, names) come back with a null
    range and ``n_rng_typed = 0``; open-world, untyped ≠ wrong.

    Returns (pred, n_triples, domain, n_dom_typed, dom_cover,
    rng, n_rng_typed, rng_cover); covers are round(·, 6) doubles.

    Scale shape: the canonical-type frame is one groupBy(subj).min over
    the type predicate's rows (entity-dimension sized, NOT broadcast —
    10^8 entities at corpus scale — so both type joins are plain hash
    joins that co-locate with a subject-hash-partitioned store on the
    domain side); vote counting is groupBy(pred, type) with map-side
    partial aggregation, and the per-predicate argmax is min-of-struct
    ((-votes, type) — count desc, type asc tie), partial-agg-safe, so no
    predicate's vote list ever sorts in one task."""
    etype = (
        triples.filter(F.col("pred") == type_pred)
        .groupBy("subj")
        .agg(F.min("obj").alias("etype"))
    )
    totals = triples.groupBy("pred").agg(F.count("*").alias("n_triples"))

    def _modal(side: str) -> DataFrame:
        votes = (
            triples.select("pred", F.col(side).alias("ent"))
            .join(etype.withColumnRenamed("subj", "ent"), "ent")
            .groupBy("pred", "etype")
            .agg(F.count("*").alias("n"))
        )
        return votes.groupBy("pred").agg(
            F.min(F.struct((-F.col("n")).alias("neg"), F.col("etype").alias("t")))
            .alias("top"),
            F.sum("n").alias("n_typed"),
        ).select(
            "pred",
            F.col("top.t").alias(f"_{side}_type"),
            F.col("n_typed").alias(f"_{side}_typed"),
            F.round((-F.col("top.neg")) / F.col("n_typed"), 6)
            .alias(f"_{side}_cover"),
        )
    return (
        totals.join(_modal("subj"), "pred", "left")
        .join(_modal("obj"), "pred", "left")
        .select(
            "pred", "n_triples",
            F.col("_subj_type").alias("domain"),
            F.coalesce("_subj_typed", F.lit(0)).alias("n_dom_typed"),
            F.col("_subj_cover").alias("dom_cover"),
            F.col("_obj_type").alias("rng"),
            F.coalesce("_obj_typed", F.lit(0)).alias("n_rng_typed"),
            F.col("_obj_cover").alias("rng_cover"),
        )
    )


def induce_schema_oracle_sql(triples_sql: str, type_pred: str = "P31") -> str:
    """DuckDB rendition of the same induction (canonical type = min
    type-pred object per entity; modal vote = row_number over
    (votes desc, type asc)); generated here so both engines share one
    definition of "the induced schema"."""
    def _side(side: str) -> str:
        return f"""
        SELECT pred, etype, n, n_typed, row_number() OVER (
                   PARTITION BY pred ORDER BY n DESC, etype ASC) AS r
        FROM (SELECT t.pred, e.etype, count(*) AS n,
                     sum(count(*)) OVER (PARTITION BY t.pred) AS n_typed
              FROM t JOIN etype e ON t.{side} = e.subj
              GROUP BY t.pred, e.etype)"""
    return f"""
        WITH t AS ({triples_sql}),
        etype AS (SELECT subj, min(obj) AS etype FROM t
                  WHERE pred = '{type_pred}' GROUP BY subj),
        totals AS (SELECT pred, count(*) AS n_triples FROM t GROUP BY pred),
        dom AS ({_side('subj')}),
        rng AS ({_side('obj')})
        SELECT totals.pred, n_triples,
               dom.etype AS domain,
               CAST(coalesce(dom.n_typed, 0) AS BIGINT) AS n_dom_typed,
               round(dom.n / dom.n_typed, 6) AS dom_cover,
               rng.etype AS rng,
               CAST(coalesce(rng.n_typed, 0) AS BIGINT) AS n_rng_typed,
               round(rng.n / rng.n_typed, 6) AS rng_cover
        FROM totals
        LEFT JOIN dom ON dom.pred = totals.pred AND dom.r = 1
        LEFT JOIN rng ON rng.pred = totals.pred AND rng.r = 1
    """
