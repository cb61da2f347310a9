"""Streaming curation: documents land as files, gates run per micro-batch.

Reuses ``plans/curate.py`` VERBATIM inside ``foreachBatch`` — one gate
implementation for batch and streaming (the same principle as
``streaming/ingest.py`` reusing the fused KG plan).  Exactly-once file
admission comes from the file-source checkpoint.

Semantics note (honest scope): the row-local gates (quality, repetition,
PII, decontamination against the fixed eval set) are batch-size-invariant
— a document's verdict is identical whether it arrives alone or with the
whole corpus.  NEAR-DUP resolution is batch-scoped: a pair split across
micro-batches is not detected here (its members see only their own
batch).  That is the standard streaming/batch split for dedup — run
``stream_dedup`` (watermarked exact dedup) in-line for the exact-hash
tier, and schedule periodic batch re-curation (``curate_runner``) for
cross-batch near-dups.  The report rows carry ``batch_id`` so an auditor
can see each verdict's scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string"


def curate_stream(spark: SparkSession, src_dir: str, out_dir: str,
                  checkpoint_dir: str, eval_docs: DataFrame | None = None,
                  schema: str = DOCS_SCHEMA, available_now: bool = True,
                  min_quality: float = 0.5, dup_threshold: float = 0.5,
                  text_col: str = "text", id_col: str = "doc_id"):
    """documents files -> per-batch curation report + redacted corpus.

    Appends ``report.parquet`` (gate verdicts, partitioned by batch_id)
    and ``corpus.parquet`` (PII-redacted survivors, same partitioning)
    under ``out_dir``.  foreachBatch is AT-LEAST-once — a crash between an
    append and the checkpoint commit replays the batch — so writes are
    made idempotent: outputs are partitioned by ``batch_id`` and a
    replayed batch dynamically OVERWRITES its own partition instead of
    appending duplicates.  Returns the started StreamingQuery; callers
    ``awaitTermination()``.
    """
    from entity_extraction_svc_spark.operators.privacy import pii_redact
    from entity_extraction_svc_spark.plans.curate import curation_report

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(src_dir)
    )

    def _write_partition(df: DataFrame, path: str) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        report = curation_report(
            batch_df, eval_docs, text_col, id_col, min_quality=min_quality,
            dup_threshold=dup_threshold,
        ).withColumn("batch_id", F.lit(batch_id)).persist()
        _write_partition(report, f"{out_dir}/report.parquet")
        kept = batch_df.join(
            report.filter("keep").select(id_col), id_col, "semi"
        )
        red = pii_redact(kept, text_col, id_col)
        others = [c for c in batch_df.columns if c != text_col]
        corpus = kept.select(*others).join(red, id_col).withColumnRenamed(
            "redacted", text_col
        ).withColumn("batch_id", F.lit(batch_id))
        _write_partition(corpus, f"{out_dir}/corpus.parquet")
        spark.catalog.refreshByPath(f"{out_dir}/report.parquet")
        spark.catalog.refreshByPath(f"{out_dir}/corpus.parquet")
        report.unpersist()
        batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
