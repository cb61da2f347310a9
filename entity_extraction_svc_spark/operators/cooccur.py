"""Corpus-level entity co-occurrence and PMI relatedness.

The reference scores link candidates by their connections to the OTHER
entities in the same request (entity_linking.py R1-R6 pairwise
intersections) — a per-document, KB-edge-based relatedness.  A
construction pipeline that has just linked 10^12 documents holds a much
stronger signal the reference never materializes: which entities actually
co-occur across the corpus, and how far above chance.  Pointwise mutual
information over document co-occurrence is the standard estimator
(Church & Hanks 1990); its top-k neighborhoods feed candidate re-ranking,
alias clustering review, and KB-gap mining (high-PMI pairs with no KB
edge between them are missing-relation candidates).

Scale shape (10^12 docs):

- the input is (doc, entity) pairs — bounded per doc (top-1 links of a
  bounded mention count), so distinct-per-doc is a doc-keyed groupBy that
  co-locates with any doc-partitioned upstream;
- pairs come from a self-join on the doc key.  Fan-out per doc is
  quadratic in its DISTINCT entity count, so ``max_per_doc`` caps the
  per-doc set (deterministically, lowest qids kept) the same way
  ``cap_lsh_buckets`` caps hot LSH buckets — a list page with 5,000
  linked entities would otherwise contribute 12.5M pairs of near-zero
  individual weight;
- marginals (docs-per-entity) are one more count over the SAME distinct
  frame, joined back on each pair side — two hash joins on entity id,
  both AQE-broadcastable when the entity dimension is small;
- PMI itself is a row-local ln() — libm double math identical in Spark
  and DuckDB (the doc_perplexity precedent), so round(…, 6) is
  hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _distinct_doc_entities(linked: DataFrame, doc_col: str, ent_col: str,
                           max_per_doc: int | None) -> DataFrame:
    d = linked.select(
        F.col(doc_col).alias("doc"), F.col(ent_col).alias("ent")
    ).filter(F.col("ent").isNotNull()).distinct()
    if max_per_doc is not None:
        w = Window.partitionBy("doc").orderBy("ent")
        d = (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_per_doc)
            .drop("_rn")
        )
    return d


def entity_cooccurrence(linked: DataFrame, doc_col: str = "url",
                        ent_col: str = "qid",
                        max_per_doc: int | None = 1000) -> DataFrame:
    """Unordered co-occurring entity pairs with document counts:
    (ent_a, ent_b, n_ab), ent_a < ent_b, n_ab = number of documents where
    both appear (entities deduplicated per document first, so a page
    mentioning Mona Lisa twice counts once)."""
    d = _distinct_doc_entities(linked, doc_col, ent_col, max_per_doc)
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, "doc")
        .filter(F.col("a.ent") < F.col("b.ent"))
        .groupBy(
            F.col("a.ent").alias("ent_a"), F.col("b.ent").alias("ent_b")
        )
        .agg(F.count("*").alias("n_ab"))
    )


def pmi_relatedness(linked: DataFrame, doc_col: str = "url",
                    ent_col: str = "qid", min_count: int = 1,
                    top_k: int | None = None,
                    max_per_doc: int | None = 1000,
                    salt: int | None = None) -> DataFrame:
    """(ent_a, ent_b, n_ab, pmi): PMI = ln(n_ab * N / (n_a * n_b)) over
    document co-occurrence, N = total documents in ``linked``, n_x = docs
    containing x.  Pairs below ``min_count`` co-occurrences are dropped
    BEFORE the marginal joins (rare-pair PMI is noise and the filter is
    where the volume is).  ``top_k`` keeps each entity's k best neighbors
    (pmi desc, partner asc — deterministic), applied on the symmetric
    view so every entity gets a full neighborhood.  Rounded to 6 places
    (libm-stable, see module docstring).

    ``salt`` (with ``top_k``) switches the neighborhood cut to the exact
    two-stage form (VERDICT r4 #3): the plain ``row_number() over
    (partition by ent_a)`` sends a celebrity entity's ENTIRE neighbor
    list (Q30-shaped, 10^7 partners at corpus scale) to one task; salting
    pre-cuts top-k per (ent_a, hash(ent_b) % salt) — each pair is one row,
    so no bucket can split a neighbor's score and the partial cut never
    drops a global top-k member — then the final window ranks at most
    salt*k rows per entity.  Identical output (pinned in
    test_cooccur.py); the same when-to-salt economics as
    ``kgquery.top_objects_per_subject`` (BENCH.md §skew) apply."""
    d = _distinct_doc_entities(linked, doc_col, ent_col, max_per_doc)
    n_docs = linked.select(F.countDistinct(doc_col).alias("n")).alias("nd")
    marg = d.groupBy("ent").agg(F.count("*").alias("n_e"))
    pairs = entity_cooccurrence(
        linked, doc_col, ent_col, max_per_doc
    ).filter(F.col("n_ab") >= min_count)
    scored = (
        pairs.join(marg.withColumnRenamed("ent", "ent_a")
                       .withColumnRenamed("n_e", "n_a"), "ent_a")
        .join(marg.withColumnRenamed("ent", "ent_b")
                  .withColumnRenamed("n_e", "n_b"), "ent_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "ent_a", "ent_b", "n_ab",
            F.round(
                F.log(F.col("n_ab") * F.col("n") / (F.col("n_a") * F.col("n_b"))),
                6,
            ).alias("pmi"),
        )
    )
    if top_k is None:
        return scored
    sym = scored.unionByName(
        scored.select(
            F.col("ent_b").alias("ent_a"), F.col("ent_a").alias("ent_b"),
            "n_ab", "pmi",
        )
    )
    order = [F.col("pmi").desc(), F.col("ent_b").asc()]
    if salt:
        pre = Window.partitionBy(
            "ent_a", F.pmod(F.xxhash64("ent_b"), F.lit(salt))
        ).orderBy(*order)
        sym = (
            sym.withColumn("_pr", F.row_number().over(pre))
            .filter(F.col("_pr") <= top_k)
            .drop("_pr")
        )
    w = Window.partitionBy("ent_a").orderBy(*order)
    return (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def pmi_oracle_sql(linked_sql: str, doc_col: str = "url",
                   ent_col: str = "qid", min_count: int = 1,
                   max_per_doc: int | None = 1000) -> str:
    """DuckDB rendition of the full-pair (no top_k) PMI: same distinct /
    cap / pair / marginal / ln recurrence, independent plan."""
    cap = (
        f", capped AS (SELECT doc, ent FROM ("
        f"SELECT doc, ent, row_number() OVER "
        f"(PARTITION BY doc ORDER BY ent) AS rn FROM d) WHERE rn <= {max_per_doc})"
        if max_per_doc is not None
        else ", capped AS (SELECT * FROM d)"
    )
    return f"""
        WITH src AS ({linked_sql}),
        d AS (SELECT DISTINCT {doc_col} AS doc, {ent_col} AS ent FROM src
              WHERE {ent_col} IS NOT NULL)
        {cap},
        nd AS (SELECT count(DISTINCT {doc_col})::DOUBLE AS n FROM src),
        marg AS (SELECT ent, count(*)::DOUBLE AS n_e FROM capped GROUP BY ent),
        pairs AS (
          SELECT a.ent AS ent_a, b.ent AS ent_b, count(*)::BIGINT AS n_ab
          FROM capped a JOIN capped b ON a.doc = b.doc AND a.ent < b.ent
          GROUP BY 1, 2 HAVING count(*) >= {min_count}
        )
        SELECT ent_a, ent_b, n_ab,
               round(ln(n_ab * nd.n / (ma.n_e * mb.n_e)), 6) AS pmi
        FROM pairs
        JOIN marg ma ON pairs.ent_a = ma.ent
        JOIN marg mb ON pairs.ent_b = mb.ent
        CROSS JOIN nd
    """


def pmi_topk_oracle_sql(linked_sql: str, k: int, doc_col: str = "url",
                        ent_col: str = "qid", min_count: int = 1,
                        max_per_doc: int | None = 1000) -> str:
    """Top-k PMI neighborhoods (the ``top_k`` path of
    :func:`pmi_relatedness`, whose salted two-stage cut is pinned
    identical to the plain window): symmetric view, then row_number per
    entity ordered (pmi desc, partner asc)."""
    inner = pmi_oracle_sql(linked_sql, doc_col, ent_col, min_count,
                           max_per_doc)
    return f"""
        WITH p AS ({inner}),
        sym AS (SELECT ent_a, ent_b, n_ab, pmi FROM p
                UNION ALL
                SELECT ent_b AS ent_a, ent_a AS ent_b, n_ab, pmi FROM p),
        r AS (SELECT *, row_number() OVER
              (PARTITION BY ent_a ORDER BY pmi DESC, ent_b ASC) AS rn
              FROM sym)
        SELECT ent_a, ent_b, n_ab, pmi FROM r WHERE rn <= {int(k)}
    """
