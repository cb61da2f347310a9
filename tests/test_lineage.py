"""Checkpoint/resume: a run killed midway resumes idempotently (north rule)."""

from __future__ import annotations

import tempfile

import duckdb
from pyspark.sql import functions as F

from entity_extraction_svc_spark.plans import lineage as L


def test_resume_after_partial_run(spark, fixture_dir):
    out = tempfile.mkdtemp(prefix="kg_ckpt_")
    pages_path = f"{fixture_dir}/pages.parquet"

    # simulated crash: only 60 of 203 docs processed before the kill
    s1 = L.run_checkpointed(spark, pages_path, fixture_dir, out, max_docs=60)
    assert s1["n_pages"] == 60
    lin1 = spark.read.parquet(L.lineage_path(out))
    assert lin1.select("url").distinct().count() == 60

    # resume: drains the remaining 146, never reprocesses a url
    s2 = L.run_checkpointed(spark, pages_path, fixture_dir, out)
    assert s2["n_pages"] == 146
    lin = spark.read.parquet(L.lineage_path(out))
    assert lin.count() == lin.select("url").distinct().count() == 206

    # a third run is a no-op (idempotence)
    s3 = L.run_checkpointed(spark, pages_path, fixture_dir, out)
    assert s3["n_pages"] == 0

    # the union of partial runs equals the single-run golden triple set
    got = {(r.subj, r.pred, r.obj) for r in L.read_triples(spark, out).collect()}
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"select subj, pred, obj from '{fixture_dir}/golden_triples.parquet'"
        ).fetchall()
    }
    assert got == want

    # metrics table aggregates lineage per (run, partition)
    met = spark.read.parquet(L.metrics_path(out))
    assert met.agg(F.sum("n_urls")).first()[0] == 206
    assert {r.run_id for r in met.select("run_id").distinct().collect()} == {
        s1["run_id"], s2["run_id"]
    }

    # snapshot time-travel: as_of run1 shows only run1's triples (a strict
    # subset), as_of run2 equals the full current state
    t1 = {(r.subj, r.pred, r.obj)
          for r in L.read_triples(spark, out, as_of=s1["run_id"]).collect()}
    t2 = {(r.subj, r.pred, r.obj)
          for r in L.read_triples(spark, out, as_of=s2["run_id"]).collect()}
    assert t1 < t2 == got
    assert len(t1) == s1["n_triples"]
