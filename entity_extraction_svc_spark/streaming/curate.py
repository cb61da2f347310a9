"""Streaming curation: documents land as files, gates run per micro-batch.

Reuses ``plans/curate.py`` VERBATIM inside ``foreachBatch`` — one gate
implementation for batch and streaming (the same principle as
``streaming/ingest.py`` reusing the fused KG plan).  Exactly-once file
admission comes from the file-source checkpoint.

Near-dup scope — CROSS-BATCH via a persisted signature store: the
row-local gates (quality, repetition, PII, decontamination against the
fixed eval set) are batch-size-invariant, and near-dup resolution runs in
two tiers:

  1. batch-local: ``curation_report``'s MinHash-LSH + connected-components
     resolve, exactly as in batch mode;
  2. cross-batch: every shipped survivor's MinHash BAND SIGNATURES are
     appended to ``<out>/sig_store.parquet`` partitioned by (band, pfx)
     — pfx = first 2 hex chars of the band hash, 256 dirs per band — and
     each new batch's band rows probe the store with the pfx list as an
     explicit partition filter (the ``annindex.rp_index_stream`` pattern:
     the probe reads only the buckets the batch can collide with).  A new
     document matching a stored one is dropped with ``dup_keeper_id``
     pointing at the already-shipped keeper.

Replay safety (foreachBatch is at-least-once): report/corpus writes
dynamically overwrite their own ``batch_id`` partition; the store probe
filters ``batch_id < current`` AND same-id pairs never match, so a
replayed batch neither sees its own failed write as a duplicate of itself
nor double-drops; replay-duplicated store rows are neutralized at probe
time by an exact row dedupe on the pfx-pruned slice (pair-level
dropDuplicates alone is NOT enough — duplicate rows also inflate the
hot-bucket cap's counts, which could push a real bucket over max_bucket
and drop its dups silently).  The store holds SURVIVORS only
— it is the shipped corpus's signature index, which is exactly the "have
I already shipped something like this?" question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string"


def _read_store(spark: SparkSession, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:  # first batch: store not created yet
        return None


def curate_stream(spark: SparkSession, src_dir: str, out_dir: str,
                  checkpoint_dir: str, eval_docs: DataFrame | None = None,
                  schema: str = DOCS_SCHEMA, available_now: bool = True,
                  min_quality: float = 0.5, dup_threshold: float = 0.5,
                  text_col: str = "text", id_col: str = "doc_id"):
    """documents files -> per-batch curation report + redacted corpus.

    Appends ``report.parquet`` (gate verdicts, partitioned by batch_id)
    and ``corpus.parquet`` (PII-redacted survivors, same partitioning)
    under ``out_dir``; maintains ``sig_store.parquet`` (survivor band
    signatures, partitioned by band/pfx) for cross-batch near-dup — see
    module docstring for the two-tier semantics and replay safety.
    Returns the started StreamingQuery; callers ``awaitTermination()``.
    """
    from entity_extraction_svc_spark.operators.dedup import (
        cross_dup_pairs,
        minhash_band_rows,
    )
    from entity_extraction_svc_spark.operators.privacy import pii_redact
    from entity_extraction_svc_spark.plans.curate import curation_report

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(src_dir)
    )
    store_path = f"{out_dir}/sig_store.parquet"

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
        band_rows = minhash_band_rows(batch_df, text_col, id_col).persist()

        # cross-batch tier: probe the survivor signature store, partition-
        # pruned to the batch's pfx values (<= 256, an index-key collect)
        cross_keep = None
        store = _read_store(spark, store_path)
        if store is not None:
            pfxs = [r.pfx for r in band_rows.select("pfx").distinct().collect()]
            store = store.where(
                (F.col("batch_id") < F.lit(batch_id)) & F.col("pfx").isin(pfxs)
            )
            # replay-duplicated store rows (kill after the store append,
            # before the checkpoint commit) are row-deduped inside
            # cross_dup_pairs before its bucket cap — see its docstring
            cross = cross_dup_pairs(
                band_rows, store, id_col, threshold=dup_threshold
            )
            cross_keep = cross.groupBy("id_probe").agg(
                F.min("id_store").alias("cross_keeper_id")
            ).withColumnRenamed("id_probe", id_col)

        report = curation_report(
            batch_df, eval_docs, text_col, id_col, min_quality=min_quality,
            dup_threshold=dup_threshold,
        )
        if cross_keep is not None:
            report = (
                report.join(cross_keep, id_col, "left")
                .withColumn(
                    "dup_keep",
                    F.col("dup_keep") & F.col("cross_keeper_id").isNull(),
                )
                .withColumn(
                    "dup_keeper_id",
                    F.coalesce("cross_keeper_id", "dup_keeper_id"),
                )
                .withColumn(
                    "keep", F.col("keep") & F.col("cross_keeper_id").isNull()
                )
                .drop("cross_keeper_id")
            )
        report = report.withColumn("batch_id", F.lit(batch_id)).persist()
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

        # survivors' signatures enter the store LAST (report/corpus are
        # already materialized, so the refresh cannot invalidate them)
        survivors = band_rows.join(
            report.filter("keep").select(id_col), id_col, "semi"
        ).withColumn("batch_id", F.lit(batch_id))
        (
            survivors.write.mode("append")
            .partitionBy("band", "pfx")
            .parquet(store_path)
        )
        spark.catalog.refreshByPath(store_path)
        spark.catalog.refreshByPath(f"{out_dir}/report.parquet")
        spark.catalog.refreshByPath(f"{out_dir}/corpus.parquet")
        report.unpersist()
        band_rows.unpersist()
        batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
