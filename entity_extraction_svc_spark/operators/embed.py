"""Deterministic document embeddings via the feature-hashing trick.

A learned encoder is the production embedder; at pipeline-plumbing level the
hashing trick (Weinberger et al. 2009, arXiv:0902.2206) gives a REAL,
scalable, model-free embedding: token ``t`` adds ``sign(h(t))`` to bucket
``h(t) mod dim``; the vector is L2-normalized.  Properties that matter here:

* pure Catalyst column expressions — row-local, whole-stage codegen, no
  Python, no vocabulary state, survives a 100 TB scan;
* md5-derived hashing, so the DuckDB oracle reproduces every component
  bit-for-bit (same trick as operators/dedup.py);
* identical texts embed identically (cos = 1), token-overlapping texts
  correlate — exactly what the downstream dedup/ANN operators key on.

This closes the documents -> embeddings -> (semantic_dedup | ANN index)
loop without external data: ``hash_embed(documents)`` feeds every operator
that takes an ``embedding array`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.dedup import (
    _h64,
    _norm_text,
    _word_tokens,
)


def hash_embed(docs: DataFrame, dim: int = 16, text_col: str = "text",
               id_col: str = "doc_id",
               out_col: str = "embedding") -> DataFrame:
    """(id, embedding: array<double>) — signed feature-hash embedding.

    Staged as three projections (tokens -> (bucket, sign) pairs -> vector)
    so Catalyst doesn't re-inline the md5 subtree once per output bucket
    (the element_at-in-transform trap measured at ~20x in dedup.py).
    The scan is widened when a small file under-splits: the per-row
    md5+fold expression ran on 2 of 32 cores at sf1.0 — 69s -> 4.4s
    (r6; no-op at cluster scale, see ``scanwide.widen_scan``).
    """
    from entity_extraction_svc_spark.operators.scanwide import widen_scan

    hashed = (
        widen_scan(docs)
        .withColumn("_toks", _word_tokens(_norm_text(text_col)))
        .withColumn("_h", F.transform("_toks", lambda t: _h64(t)))
        .withColumn(
            "_bs",
            F.transform(
                "_h",
                lambda h: F.struct(
                    (h % dim).cast("int").alias("b"),
                    (F.shiftright(h, 8) % 2 * 2 - 1).cast("double").alias("s"),
                ),
            ),
        )
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            "_bs",
            F.lit(0.0),
            lambda acc, p: acc + F.when(p["b"] == j, p["s"]).otherwise(F.lit(0.0)),
        ),
    )
    staged = hashed.withColumn("_raw", raw)
    norm = F.sqrt(
        F.aggregate("_raw", F.lit(0.0), lambda acc, v: acc + v * v)
    )
    vec = F.transform("_raw", lambda v: F.round(v / F.greatest(norm, F.lit(1e-12)), 6))
    return staged.select(F.col(id_col), vec.alias(out_col))
