"""spark-submit entry point (north rule: ``spark-submit --py-files`` run).

    zip -r pkg.zip entity_extraction_svc_spark
    spark-submit --py-files pkg.zip -m entity_extraction_svc_spark/runner.py \
        --pages s3://.../pages --kb s3://.../kb --out s3://.../kg \
        [--source html|text] [--resume] [--max-docs N]

Local smoke:
    python -m entity_extraction_svc_spark.runner \
        --pages fixtures/pages.parquet --kb fixtures --out /tmp/kg_out --resume
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="KG-construction pipeline runner")
    ap.add_argument("--pages", required=True,
                    help="pages table path (parquet) or WARC glob with --format warc")
    ap.add_argument("--kb", required=True, help="KB dir (kb_entities/kb_aliases/kb_triples/gazetteer parquet)")
    ap.add_argument("--out", required=True, help="output dir (triples/lineage/metrics)")
    ap.add_argument("--source", default="html", choices=["html", "text"])
    ap.add_argument("--format", default="parquet", choices=["parquet", "warc"],
                    help="pages input format (warc = Common-Crawl segments)")
    ap.add_argument("--resume", action="store_true",
                    help="checkpointed run: skip urls already in the lineage table")
    ap.add_argument("--compact", action="store_true",
                    help="after the run drains: rewrite the triples store "
                         "into subject-hash buckets and expire history "
                         "(run only while no other writer is active)")
    ap.add_argument("--vacuum", action="store_true",
                    help="after the run: delete snapshot-unreferenced "
                         "triple files left by killed runs (run only "
                         "while no other writer is active)")
    ap.add_argument("--maintain-closure", metavar="PRED", default=None,
                    help="after the run: bring the materialized "
                         "transitive closure of PRED (e.g. P279) up to "
                         "the store head — bootstrap on first use, then "
                         "incremental DRed-delete + semi-naive-insert "
                         "maintenance, committed crash-safely under "
                         "{out}/closure_PRED")
    ap.add_argument("--entail", action="store_true",
                    help="after the run: bring the materialized RDFS "
                         "rule entailment (forward_chain over the store "
                         "head) up to date — bootstrap on first use, "
                         "then incremental addition cascade; retractions "
                         "and expired history fall back to full "
                         "recompute; committed crash-safely under "
                         "{out}/entail_rdfs")
    ap.add_argument("--maintain-canonical", action="store_true",
                    help="after the run: bring the materialized "
                         "connected-component labels over the store's "
                         "entity->entity edges (the alias-clustering "
                         "artifact) up to the head — bootstrap on first "
                         "use, then incremental cc_delta maintenance "
                         "(additions merge via the delta-sized component "
                         "graph, removals recompute only affected "
                         "components); committed crash-safely under "
                         "{out}/cc_entities")
    ap.add_argument("--diff", nargs=2, metavar=("OLD_RUN", "NEW_RUN"),
                    default=None,
                    help="snapshot-diff the store between two committed "
                         "run_ids (writes {out}/diff_OLD_NEW, prints "
                         "added/removed counts)")
    ap.add_argument("--retract", metavar="PARQUET", default=None,
                    help="retraction commit: remove the (subj, pred, obj) "
                         "rows in this parquet from the store (rewrite + "
                         "compaction snapshot — the Iceberg-DELETE "
                         "stand-in); follow with --maintain-closure to "
                         "reconcile materialized closures via DRed")
    ap.add_argument("--emit-training", action="store_true",
                    help="after the batch run: emit distant-supervision "
                         "training data from the run's own linked output "
                         "— per-token BIO rows ({out}/training/ner) and "
                         "KB-labelled relation pairs ({out}/training/rel) "
                         "(batch mode only; --resume keeps no linked "
                         "frame to supervise from). Costs one extra "
                         "extraction pass over the corpus: the fused "
                         "plan keeps text internal to its Arrow batches "
                         "by design, so the emitter re-derives (url, "
                         "text) — narrow, scan-bound")
    ap.add_argument("--max-docs", type=int, default=None)
    ap.add_argument("--master", default=None, help="override spark master (local dev)")
    args = ap.parse_args(argv)
    if (args.vacuum or args.compact or args.maintain_closure or args.diff
            or args.retract or args.entail
            or args.maintain_canonical) and not args.resume:
        # validate BEFORE any work: failing after an hours-long run (with
        # triples already written) would report rc=2 on a completed job
        print("--compact/--vacuum/--maintain-closure/--maintain-canonical/"
              "--entail/--diff/--retract maintain the checkpointed "
              "(append) store; use them with --resume", file=sys.stderr)
        return 2
    if args.emit_training and args.resume:
        print("--emit-training needs the batch run's linked frame; "
              "it is not available under --resume", file=sys.stderr)
        return 2

    from entity_extraction_svc_spark.session import get_spark

    spark = get_spark(app_name="kg-runner", master=args.master)
    t0 = time.time()
    if args.resume:
        from entity_extraction_svc_spark.plans.lineage import run_checkpointed

        stats = run_checkpointed(
            spark, args.pages, args.kb, args.out,
            source=args.source, max_docs=args.max_docs,
        )
    else:
        from pyspark.sql import functions as F

        from entity_extraction_svc_spark.plans.fused import build_fused
        from entity_extraction_svc_spark.operators.triples import write_triples

        if args.format == "warc":
            from entity_extraction_svc_spark.sources.warc import read_warc

            pages = read_warc(spark, args.pages)
        else:
            pages = spark.read.parquet(args.pages)
        if args.max_docs:
            pages = pages.limit(args.max_docs)
        linked, triples = build_fused(spark, pages, args.kb, source=args.source)
        linked = linked.persist()
        n_linked = linked.filter((F.col("rank") == 0) & F.col("qid").isNotNull()).count()
        write_triples(triples, f"{args.out}/triples")
        stats = {"n_linked": n_linked,
                 "n_triples": spark.read.parquet(f"{args.out}/triples").count()}
        if args.emit_training:
            from entity_extraction_svc_spark.operators.extract import (
                extract_text,
            )
            from entity_extraction_svc_spark.operators.ner import (
                bio_training_rows,
            )
            from entity_extraction_svc_spark.operators.triples import (
                relation_training_pairs,
            )

            top1 = linked.filter(
                (F.col("rank") == 0) & F.col("qid").isNotNull()
            ).select("url", "start", "end", "qid", "ent_tag")
            docs = extract_text(pages, source=args.source).select("url", "text")
            bio = bio_training_rows(
                docs, top1.withColumnRenamed("ent_tag", "tag")
            )
            bio.write.mode("overwrite").parquet(f"{args.out}/training/ner")
            rel = relation_training_pairs(
                top1.select("url", "start", "end", "qid"),
                spark.read.parquet(f"{args.kb}/kb_triples.parquet"),
            )
            rel.write.mode("overwrite").parquet(f"{args.out}/training/rel")
            nerdf = spark.read.parquet(f"{args.out}/training/ner")
            reldf = spark.read.parquet(f"{args.out}/training/rel")
            stats["training"] = {
                "ner_tokens": nerdf.count(),
                "ner_entity_tokens": nerdf.filter("bio != 'O'").count(),
                "rel_pairs": reldf.count(),
                "rel_labelled": reldf.filter("label != 'NO_REL'").count(),
            }
    if args.vacuum or args.compact:
        from entity_extraction_svc_spark.plans import lineage as L

        if args.vacuum:
            stats["vacuum"] = L.vacuum_triples(spark, args.out)
        if args.compact:
            stats["compact"] = L.compact_triples(spark, args.out)
    if args.retract:
        from entity_extraction_svc_spark.plans import lineage as L

        stats["retract"] = L.retract_triples(
            spark, args.out, spark.read.parquet(args.retract)
        )
    if args.maintain_closure:
        from entity_extraction_svc_spark.plans import maintain as M

        stats["maintain_closure"] = M.maintain_closure(
            spark, args.out, args.maintain_closure
        )
    if args.maintain_canonical:
        from entity_extraction_svc_spark.plans import maintain as M

        stats["maintain_canonical"] = M.maintain_canonical(spark, args.out)
    if args.entail:
        import os as _os

        from pyspark.sql import functions as _F

        from entity_extraction_svc_spark.operators.chain import RDFS_ONTOLOGY
        from entity_extraction_svc_spark.plans import maintain as M

        # the extracted store carries instance facts; the schema lives
        # with the KB dictionaries — union the taxonomy/subproperty rows
        # plus the RDFS ontology constants as static extra facts
        extra = spark.createDataFrame(
            RDFS_ONTOLOGY, "subj string, pred string, obj string"
        )
        kb_tr = _os.path.join(args.kb, "kb_triples.parquet")
        if _os.path.exists(kb_tr):
            extra = (
                spark.read.parquet(kb_tr)
                .filter(_F.col("pred").isin("P279", "P1647"))
                .select("subj", "pred", "obj")
                .unionByName(extra)
            )
        stats["entail"] = M.maintain_entailment(spark, args.out,
                                                extra_facts=extra)
    if args.diff:
        from pyspark.sql import functions as F

        from entity_extraction_svc_spark.plans import maintain as M

        old_run, new_run = args.diff
        d = M.diff_runs(spark, args.out, old_run, new_run)
        dest = f"{args.out}/diff_{old_run}_{new_run}"
        d.write.mode("overwrite").parquet(dest)
        counts = {
            r["status"]: r["n"]
            for r in spark.read.parquet(dest)
            .groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        stats["diff"] = {"out": dest,
                         "added": counts.get("added", 0),
                         "removed": counts.get("removed", 0)}
    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
