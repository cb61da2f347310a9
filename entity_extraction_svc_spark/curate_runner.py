"""spark-submit entry point for training-corpus curation.

The batch face of ``plans/curate.py``: documents in, audited keep/drop
report + PII-redacted survivors out.

    spark-submit --py-files pkg.zip -m entity_extraction_svc_spark/curate_runner.py \
        --docs s3://.../documents --out s3://.../curated \
        [--eval s3://.../benchmarks] [--min-quality 0.5] [--dup-threshold 0.5]

Local smoke:
    python -m entity_extraction_svc_spark.curate_runner \
        --docs /root/testdata/sf0.01/documents.parquet --out /tmp/curated

Outputs under ``--out``:
    report.parquet     per-document gate verdicts + reasons (full audit)
    corpus.parquet     surviving documents, text PII-redacted
    sequences.parquet  (with --pack N) concat-and-chunk packing manifest:
                       which token slice of which doc lands in which
                       fixed-length training sequence
    quality_model.parquet / quality_scores.parquet
                       (with --quality-model) the fixed-point linear
                       quality scorer trained ON this run's documents
                       (weak labels = the gate) and its per-doc scores;
                       weights are bit-reproducible at any cluster size
and ONE JSON stats line on stdout (counts per gate — the numbers an
operator pastes into a run log).

``--mixture-alpha`` rebalances the kept set across ``--mixture-col``
groups by temperature before the corpus is written (minority groups keep
everything, the majority is hash-sampled down); ``--pack N`` appends the
training-sequence packing stage over the written corpus.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="training-corpus curation runner")
    ap.add_argument("--docs", required=True,
                    help="input path: documents parquet (doc_id, text) by "
                         "default; pages parquet or WARC glob with --format")
    ap.add_argument("--format", default="documents",
                    choices=["documents", "pages", "warc"],
                    help="pages/warc = raw web pages: extract text (the KG "
                         "pipeline's byte-identical chain) before curating")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--eval", default=None,
                    help="eval/benchmark parquet with a text column (enables decontamination)")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--dup-threshold", type=float, default=0.5)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--master", default=None)
    ap.add_argument("--mixture-alpha", type=float, default=None,
                    help="temperature-rebalance the kept docs across "
                         "--mixture-col groups (n^alpha weighting)")
    ap.add_argument("--mixture-col", default="lang",
                    help="grouping column for --mixture-alpha")
    ap.add_argument("--mixture-target", type=int, default=None,
                    help="target doc count for the mixture (default: keep "
                         "the corpus size, downsampling only the majority)")
    ap.add_argument("--pack", type=int, default=None, metavar="SEQ_LEN",
                    help="write sequences.parquet: concat-and-chunk packing "
                         "of the curated corpus into SEQ_LEN-token sequences")
    ap.add_argument("--quality-model", action="store_true",
                    help="train the fixed-point linear quality scorer on "
                         "this run's documents (weak labels = the gate) and "
                         "write quality_model.parquet (feature, weight "
                         "micros) + quality_scores.parquet (id, score, y, "
                         "pred); bit-reproducible across cluster sizes")
    args = ap.parse_args(argv)
    if args.pack is not None and args.pack <= 0:
        ap.error(f"--pack must be positive, got {args.pack}")
    if args.mixture_alpha is not None and args.mixture_alpha < 0:
        ap.error(f"--mixture-alpha must be >= 0, got {args.mixture_alpha}")
    if args.mixture_target is not None and args.mixture_target <= 0:
        ap.error(f"--mixture-target must be positive, got "
                 f"{args.mixture_target}")

    from pyspark.sql import functions as F

    from entity_extraction_svc_spark.plans.curate import curation_report
    from entity_extraction_svc_spark.session import get_spark

    spark = get_spark(app_name="curate-runner", master=args.master)
    t0 = time.time()
    if args.format == "documents":
        docs = spark.read.parquet(args.docs)
    else:
        # raw web pages: WARC segments or a pages table -> extracted text
        # via the same chain the KG pipeline pins byte-identical; the url
        # keyspace maps onto the id column via a stable 63-bit hash
        from entity_extraction_svc_spark.operators.extract import extract_text

        if args.format == "warc":
            from entity_extraction_svc_spark.sources.warc import read_warc

            pages = read_warc(spark, args.docs)
        else:
            pages = spark.read.parquet(args.docs)
        # crawls revisit URLs (read_warc does not dedup) and the per-id
        # joins downstream assume unique ids: keep ONE record per url
        # first, then derive a non-negative 63-bit id (mask, not abs —
        # abs(Long.MIN_VALUE) stays negative in non-ANSI Spark)
        docs = (
            extract_text(pages)
            .dropDuplicates(["url"])
            .select(
                (F.xxhash64("url").bitwiseAND(F.lit((1 << 63) - 1)))
                .alias(args.id_col),
                F.col("url"),
                F.col("text").alias(args.text_col),
            )
        )
    ev = spark.read.parquet(args.eval) if args.eval else None

    report = curation_report(docs, ev, args.text_col, args.id_col,
                             args.min_quality, args.dup_threshold)
    report.write.mode("overwrite").parquet(f"{args.out}/report.parquet")
    spark.catalog.refreshByPath(f"{args.out}/report.parquet")
    rep = spark.read.parquet(f"{args.out}/report.parquet")

    # derive the corpus FROM the materialized report (calling curate()
    # here would rebuild every gate — minhash LSH, CC resolve, decontam —
    # a second time; the report already holds the keep set)
    from entity_extraction_svc_spark.operators.privacy import pii_redact

    kept = docs.join(
        rep.filter("keep").select(args.id_col), args.id_col, "semi"
    )
    n_mixture_dropped = 0
    if args.mixture_alpha is not None:
        # validate BEFORE any further work (the early-flag-validation rule)
        if args.mixture_col not in kept.columns:
            print(f"error: --mixture-col '{args.mixture_col}' not in input "
                  f"columns {kept.columns}", file=sys.stderr)
            return 2
        from entity_extraction_svc_spark.operators.packing import (
            temperature_sample,
        )

        n_before = kept.count()
        kept = temperature_sample(
            kept, source_col=args.mixture_col, alpha=args.mixture_alpha,
            target_total=args.mixture_target, id_col=args.id_col,
        ).drop("keep_frac").persist()
        n_mixture_dropped = n_before - kept.count()
    red = pii_redact(kept, args.text_col, args.id_col)
    others = [c for c in docs.columns if c != args.text_col]
    corpus = kept.select(*others).join(red, args.id_col).withColumnRenamed(
        "redacted", args.text_col
    )
    corpus.write.mode("overwrite").parquet(f"{args.out}/corpus.parquet")
    spark.catalog.refreshByPath(f"{args.out}/corpus.parquet")

    stats = rep.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("quality_keep")).cast("long")).alias("n_low_quality"),
        F.sum((~F.col("repetition_keep")).cast("long")).alias("n_repetitive"),
        F.sum((~F.col("dup_keep")).cast("long")).alias("n_near_dups"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
        F.sum((F.col("n_pii") > 0).cast("long")).alias("n_pii_docs"),
    ).first().asDict()
    stats["n_out"] = spark.read.parquet(f"{args.out}/corpus.parquet").count()
    if args.mixture_alpha is not None:
        stats["n_mixture_dropped"] = n_mixture_dropped
    if args.pack is not None:
        # pack the WRITTEN corpus (reading it back avoids recomputing the
        # gate lineage; packing re-tokenizes once, which is its one pass)
        from entity_extraction_svc_spark.operators.packing import pack_sequences

        seqs = pack_sequences(
            spark.read.parquet(f"{args.out}/corpus.parquet"),
            seq_len=args.pack, id_col=args.id_col, text_col=args.text_col,
        )
        seqs.write.mode("overwrite").parquet(f"{args.out}/sequences.parquet")
        spark.catalog.refreshByPath(f"{args.out}/sequences.parquet")
        sq = spark.read.parquet(f"{args.out}/sequences.parquet")
        stats["n_sequences"] = sq.select("seq_id").distinct().count()
        stats["n_tokens"] = sq.agg(
            F.sum(F.col("tok_end") - F.col("tok_start"))
        ).first()[0]
    if args.quality_model:
        # trained on the PRE-gate document set (the gate provides the weak
        # labels), so the scorer sees the same distribution it will score;
        # fixed-point training makes the weights a pure function of the
        # input multiset — the same corpus trains the same model at any
        # cluster size
        from entity_extraction_svc_spark.operators.classifier import (
            FEATURES,
            quality_features,
            score_linear,
            train_linear,
        )

        feats = quality_features(docs, args.text_col, args.id_col)
        w = train_linear(feats)
        wdf = spark.createDataFrame(
            [(k, int(v)) for k, v in zip(FEATURES, w)],
            "feature string, weight_micros long",
        )
        wdf.coalesce(1).write.mode("overwrite").parquet(
            f"{args.out}/quality_model.parquet")
        score_linear(
            quality_features(docs, args.text_col, args.id_col), w
        ).withColumnRenamed("id", args.id_col).write.mode(
            "overwrite").parquet(f"{args.out}/quality_scores.parquet")
        spark.catalog.refreshByPath(f"{args.out}/quality_scores.parquet")
        sc = spark.read.parquet(f"{args.out}/quality_scores.parquet")
        n_scored = sc.count()
        stats["quality_model"] = {k: int(v) for k, v in zip(FEATURES, w)}
        stats["n_scored"] = n_scored
        stats["model_gate_agreement"] = round(
            sc.filter("pred = y").count() / max(n_scored, 1), 4)
    stats["sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
