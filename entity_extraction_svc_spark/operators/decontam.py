"""Benchmark decontamination: eval-set n-gram overlap detection.

Before training on a web corpus you must find (and usually drop) documents
that textually overlap the evaluation benchmarks, or downstream eval
numbers are meaningless.  The standard recipe (GPT-3 appendix C,
arXiv:2005.14165; Dodge et al. C4 audit, arXiv:2104.08758) flags a
training document when it shares any word n-gram (n in the 8-13 range)
with any eval document.

Scale shape: the eval side is always small (benchmarks are 10^3-10^5
rows), the corpus side is the 100 TB one.  So the corpus is NEVER
shuffled: eval n-grams are collected into a distinct set and
broadcast-joined against the exploded corpus n-grams; the per-document
overlap count is a map-side-combinable groupBy on ``doc_id``.  The plan is
scan -> generate n-grams (zip_with over shifted slices, row-local) ->
broadcast semi-join -> partial agg: one narrow shuffle of the (tiny)
surviving matches only.

Tokenization and n-gram construction reuse the dedup module's normalized
shingles (``operators/dedup.py:with_shingles``) so contamination, MinHash
and Jaccard all agree on what "the same n-gram" means.

The reference service has no decontamination stage (it is a per-request
annotator); this is part of the training-data surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.dedup import with_shingles

# 8-gram default: GPT-3 used 13-grams on very long documents; C4/Dodge use
# shorter windows. 8 keeps short eval rows (questions, prompts) detectable.
DEFAULT_N = 8


def eval_ngrams(eval_docs: DataFrame, n: int = DEFAULT_N,
                text_col: str = "text") -> DataFrame:
    """Distinct word n-grams of the eval set: one ``gram`` column.

    This is the broadcast side; dedupe BEFORE broadcasting so the hash
    relation holds each gram once however often benchmarks repeat it.
    """
    return (
        with_shingles(eval_docs.select(text_col), text_col, n=n)
        .select(F.explode("_sh").alias("gram"))
        .distinct()
    )


def contamination(docs: DataFrame, eval_docs: DataFrame,
                  n: int = DEFAULT_N, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document contamination report against an eval set.

    Returns (id, n_overlap, contaminated): the number of DISTINCT n-grams
    the document shares with any eval document, and the flag a filter
    would act on.  Every input document gets a row (clean docs report 0),
    so the output is a total audit, not just the hit list.

    Within-document gram dedup is ``array_distinct`` BEFORE the explode —
    row-local, so (id, gram) rows are already unique and the corpus is
    never shuffled on the gram; an explode-then-``.distinct()`` would
    hash-exchange every n-gram of the 100 TB side (plan-audited).
    """
    grams = (
        with_shingles(docs.select(id_col, text_col), text_col, n=n)
        .select(id_col, F.explode(F.array_distinct("_sh")).alias("gram"))
    )
    hits = (
        grams.join(F.broadcast(eval_ngrams(eval_docs, n, text_col)), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  n: int = DEFAULT_N, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Drop every contaminated document (all input columns preserved).
    The broadcast anti-join keeps the corpus unshuffled."""
    grams = (
        with_shingles(docs.select(id_col, text_col), text_col, n=n)
        .select(id_col, F.explode("_sh").alias("gram"))
    )
    bad = (
        grams.join(F.broadcast(eval_ngrams(eval_docs, n, text_col)), "gram")
        .select(id_col)
        .distinct()
    )
    return docs.join(bad, id_col, "left_anti")
