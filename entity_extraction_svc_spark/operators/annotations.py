"""Annotation assembly: linked rows -> the reference's response shape.

Reference operators P9 (add-info lookup, ``src/entity_linking.py:1560-1596``)
and P11 (annotation/extras assembly + URI composition,
``agent/server.py:124-147,246-331``): the top candidate per mention becomes
the annotation — spot, span, QID, confidence, Wikipedia URI, image links,
abstract, categories, dbpedia types — and the remaining candidates fold into
an ``extras`` array.

Spark shape: one broadcast hash join against the ``kb_entities`` dimension
(the add-info store is KB-bounded — a dimension next to a web-scale mention
stream), URI composition as ``concat``/``replace`` expressions in codegen,
extras as a ``collect_list(struct(...))`` grouped window-free aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WIKI_BASE = "https://en.wikipedia.org/wiki/"
IMG_BASE = "https://commons.wikimedia.org/wiki/Special:FilePath/"


def add_info(kb_entities: DataFrame) -> DataFrame:
    """The add-info dimension (entity_additional_info, src/queries.py:8)."""
    return kb_entities.select(
        "qid",
        F.col("page"),
        F.col("descr").alias("abstract"),
        F.col("image_link"),
        F.col("categories"),
        F.col("dbpedia_types"),
    )


def assemble_unlisted_annotations(linked: DataFrame) -> DataFrame:
    """Unlinked mentions as the agent's ``unlisted_annotations`` array
    (``agent/server.py:292-331``): a mention whose top candidate has no
    Wikidata id is still reported — BaseEntityAnnotation shape (spot, span,
    tags) with a null id — so recall audits see every detected span.

    Same narrow filter/projection as the listed side; no join needed (there
    is no add-info for an unlinked mention).
    """
    return (
        linked.filter((F.col("rank") == 0) & F.col("qid").isNull())
        .select(
            "url",
            "mention_id",
            F.col("substr").alias("spot"),
            "start",
            "end",
            F.lit(None).cast("string").alias("id"),
            F.col("ent_tag").alias("tag"),
        )
    )


def assemble_annotations(linked: DataFrame, kb_entities: DataFrame) -> DataFrame:
    """Top-1 candidates joined to add-info, with extras collected per mention.

    Person-filter on dbpedia types (entity_linking.py:1589-1594: drop
    Animal/Eukaryote/Species when Person present) rides as an array expr.
    The unlinked complement is ``assemble_unlisted_annotations`` —
    together they partition the mention set exactly like the agent's
    (annotations, unlisted_annotations) response pair.
    """
    info = add_info(kb_entities)
    top = linked.filter((F.col("rank") == 0) & F.col("qid").isNotNull()).select(
        "url", "mention_id", "substr", "start", "end", "qid", "conf", "ent_tag"
    )
    extras = (
        linked.filter((F.col("rank") > 0) & F.col("qid").isNotNull())
        .groupBy("url", "mention_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("rank", "qid", "conf"))
            ).alias("extras")
        )
    )
    dbp = F.col("dbpedia_types")
    dbp_filtered = F.when(
        F.exists(dbp, lambda t: t.endswith("/Person")),
        F.filter(
            dbp,
            lambda t: ~t.endswith("/Animal")
            & ~t.endswith("/Eukaryote")
            & ~t.endswith("/Species"),
        ),
    ).otherwise(dbp)
    return (
        top.join(F.broadcast(info), "qid", "left")
        .join(extras, ["url", "mention_id"], "left")
        .select(
            "url",
            "mention_id",
            F.col("substr").alias("spot"),
            "start",
            "end",
            F.col("qid").alias("id"),
            "conf",
            F.col("ent_tag").alias("tag"),
            F.col("page").alias("title"),
            F.when(
                F.col("page").isNotNull(),
                F.concat(F.lit(WIKI_BASE), F.replace(F.col("page"), F.lit(" "), F.lit("_"))),
            ).alias("wiki_uri"),
            F.when(
                F.col("image_link").isNotNull(),
                F.struct(
                    F.concat(F.lit(IMG_BASE), F.col("image_link")).alias("full"),
                    F.concat(
                        F.lit(IMG_BASE), F.col("image_link"), F.lit("?width=300")
                    ).alias("thumbnail"),
                ),
            ).alias("image"),
            "abstract",
            "categories",
            dbp_filtered.alias("dbpedia_types"),
            F.coalesce(F.size("extras"), F.lit(0)).alias("n_extras"),
        )
    )
