"""End-to-end training-corpus curation: the composed keep/drop pipeline.

A 100 TB web corpus becomes a training set through a fixed gate sequence —
quality stats, repetition rules, near-dup resolution, benchmark
decontamination — followed by PII redaction of the survivors.  Each gate
exists as an independent operator (``operators/textstats``, ``dedup``,
``decontam``, ``privacy``); this module composes them into ONE auditable
report and ONE filtered output, the way a pipeline actually ships.

Design rules at scale:
  - every gate returns (doc_id, verdict[, reasons]); the report is a
    chain of per-id joins, so Catalyst collapses the row-local gates
    (quality, PII) into single-scan expression bundles, and the
    shuffling gates (repetition wordcount, minhash LSH, CC resolve) each
    keep their own documented minimal exchange (PLANS.md).
  - verdicts carry REASONS, not just booleans — silent drops are
    undebuggable at 10^12 documents.
  - the final filter is one semi-join of the corpus against the keep set;
    redaction is row-local codegen on the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pii_kinds():
    from entity_extraction_svc_spark.operators.privacy import PII_PATTERNS

    return PII_PATTERNS


def curation_report(docs: DataFrame, eval_docs: DataFrame | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    min_quality: float = 0.5,
                    dup_threshold: float = 0.5) -> DataFrame:
    """Per-document audit: every gate's verdict plus the composed ``keep``.

    Columns: (id, quality_keep, quality_reasons, repetition_keep,
    dup_keep, dup_keeper_id, contaminated, n_pii, keep).  ``eval_docs``
    None skips the decontamination gate (contaminated = false).
    """
    from entity_extraction_svc_spark.operators.decontam import contamination
    from entity_extraction_svc_spark.operators.dedup import (
        minhash_dup_pairs,
        resolve_near_dups,
    )
    from entity_extraction_svc_spark.operators.privacy import pii_count_exprs
    from entity_extraction_svc_spark.operators.textstats import (
        quality_exprs,
        repetition_filter,
    )

    # quality + PII are row-local — inlined as ONE projection (one scan,
    # no per-id join) via the operators' expression builders; only the
    # genuinely shuffling gates (repetition wordcount, minhash LSH + CC
    # resolve, decontam gram join) join afterwards
    q_keep, q_reasons = quality_exprs(text_col, min_score=min_quality)
    pii_e = pii_count_exprs(text_col)
    n_pii = sum(
        (pii_e[f"n_{kind}"] for kind, _, _ in _pii_kinds()), F.lit(0)
    )
    rowlocal = docs.select(
        F.col(id_col),
        q_keep.alias("quality_keep"),
        q_reasons.alias("quality_reasons"),
        n_pii.alias("n_pii"),
    )
    repetition = repetition_filter(docs, text_col, id_col).select(
        id_col, F.col("keep").alias("repetition_keep")
    )
    pairs = minhash_dup_pairs(
        docs, text_col, id_col, threshold=dup_threshold
    ).localCheckpoint(eager=True)
    dups = resolve_near_dups(docs, pairs, id_col).select(
        id_col,
        F.col("keep").alias("dup_keep"),
        F.col("keeper_id").alias("dup_keeper_id"),
    )
    report = rowlocal.join(repetition, id_col).join(dups, id_col)
    if eval_docs is not None:
        contam = contamination(docs, eval_docs, text_col=text_col,
                               id_col=id_col).select(id_col, "contaminated")
        report = report.join(contam, id_col)
    else:
        report = report.withColumn("contaminated", F.lit(False))
    return report.select(
        id_col,
        "quality_keep", "quality_reasons", "repetition_keep",
        "dup_keep", "dup_keeper_id", "contaminated", "n_pii",
        (
            F.col("quality_keep") & F.col("repetition_keep")
            & F.col("dup_keep") & ~F.col("contaminated")
        ).alias("keep"),
    )


def curate(docs: DataFrame, eval_docs: DataFrame | None = None,
           text_col: str = "text", id_col: str = "doc_id",
           min_quality: float = 0.5,
           dup_threshold: float = 0.5) -> DataFrame:
    """The shipped corpus: gate-surviving documents with PII redacted.

    Returns the input columns with ``text_col`` replaced by its redacted
    form (one semi-join + row-local regexp codegen on survivors).
    """
    from entity_extraction_svc_spark.operators.privacy import pii_redact

    report = curation_report(docs, eval_docs, text_col, id_col,
                             min_quality, dup_threshold)
    keep_ids = report.filter("keep").select(id_col)
    kept = docs.join(keep_ids, id_col, "semi")
    red = pii_redact(kept, text_col, id_col)
    others = [c for c in docs.columns if c != text_col]
    return kept.select(*others).join(red, id_col).withColumnRenamed(
        "redacted", text_col
    )
