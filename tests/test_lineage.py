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


def test_torn_states_self_heal(spark, fixture_dir):
    """Deterministic versions of the states a SIGKILL between appends
    leaves behind (tools/rehearse_kill_resume.py aims kills at the same
    window by wall clock; here we construct each state exactly).

    State A — killed after the lineage commit, before repair_metrics:
    metrics rows for that run are missing.  The NEXT run must backfill
    them (metrics run_ids == lineage run_ids, sum(n_urls) exact).

    State B — killed after the triples append + snapshot, before the
    lineage commit: urls uncommitted, orphan triple files on disk.  The
    next run must reprocess those urls; reads dedupe the duplicate
    triples; each url is counted in exactly ONE committed run."""
    import glob
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="kg_torn_")
    pages_path = f"{fixture_dir}/pages.parquet"

    # --- State A: commit run1, then delete its metrics (pre-repair kill)
    s1 = L.run_checkpointed(spark, pages_path, fixture_dir, out, max_docs=60)
    for f in glob.glob(os.path.join(L.metrics_path(out), "*")):
        os.remove(f)
    spark.catalog.refreshByPath(L.metrics_path(out))

    # --- State B: append run-X triples + snapshot WITHOUT a lineage commit
    from entity_extraction_svc_spark.plans.fused import build_fused

    done = L.processed_urls(spark, out)
    slice2 = (spark.read.parquet(pages_path)
              .join(done, "url", "left_anti").limit(60).persist())
    _, t2 = build_fused(spark, slice2, fixture_dir)
    t2.write.mode("append").parquet(L.triples_path(out))
    L._write_snapshot(out, "deadbeefcafe", seq=len(L._read_snapshots(out)),
                      files=[])
    slice2.unpersist()
    spark.catalog.refreshByPath(L.triples_path(out))

    # --- drain: both torn states must heal with no double counting
    L.run_to_completion(spark, pages_path, fixture_dir, out, batch_docs=100)
    lin = spark.read.parquet(L.lineage_path(out))
    assert lin.count() == lin.select("url").distinct().count() == 206

    met = spark.read.parquet(L.metrics_path(out))
    assert met.agg(F.sum("n_urls")).first()[0] == 206  # A backfilled, B once
    met_ids = {r.run_id for r in met.select("run_id").distinct().collect()}
    lin_ids = {r.run_id for r in lin.select("run_id").distinct().collect()}
    assert met_ids == lin_ids  # no orphan metrics, nothing missing
    assert s1["run_id"] in met_ids  # the deleted run1 metrics came back

    # orphan triples from state B deduped away on read
    got = {(r.subj, r.pred, r.obj) for r in L.read_triples(spark, out).collect()}
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"select subj, pred, obj from '{fixture_dir}/golden_triples.parquet'"
        ).fetchall()
    }
    assert got == want


def test_compaction(spark, fixture_dir):
    """compact_triples: file count collapses, reads and post-compaction
    time travel are unchanged, expired history raises, and the
    mid-compaction crash window (both file generations live) still reads
    correctly by set semantics."""
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="kg_compact_")
    pages_path = f"{fixture_dir}/pages.parquet"

    s1 = L.run_checkpointed(spark, pages_path, fixture_dir, out, max_docs=60)
    s2 = L.run_checkpointed(spark, pages_path, fixture_dir, out, max_docs=60)
    mid = {(r.subj, r.pred, r.obj) for r in L.read_triples(spark, out).collect()}

    stats = L.compact_triples(spark, out, num_buckets=4)
    assert stats["files_after"] <= 4 < stats["files_before"]
    assert {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out).collect()} == mid
    # time travel: the compaction state, and the run it equals, both work
    assert {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out, as_of=stats["run_id"]).collect()} == mid
    assert {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out, as_of=s2["run_id"]).collect()} == mid
    # earlier history is expired
    import pytest

    with pytest.raises(ValueError, match="expired"):
        L.read_triples(spark, out, as_of=s1["run_id"])

    # appends continue on top of the compacted base
    s3 = L.run_checkpointed(spark, pages_path, fixture_dir, out)
    full = {(r.subj, r.pred, r.obj) for r in L.read_triples(spark, out).collect()}
    assert {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out, as_of=s3["run_id"]).collect()} == full
    import duckdb as _duck

    want = {tuple(r) for r in _duck.sql(
        f"select subj, pred, obj from '{fixture_dir}/golden_triples.parquet'"
    ).fetchall()}
    assert full == want

    # crash window: a second compaction killed after moving files + manifest
    # but BEFORE deleting the old generation == both generations live.
    # Emulate by copying the current files under spare names, then writing
    # a compaction pass over the doubled dir — reads stay exact throughout.
    tp = L.triples_path(out)
    import shutil

    for f in list(os.listdir(tp)):
        if f.endswith(".parquet") and not f.startswith("_"):
            shutil.copy(os.path.join(tp, f), os.path.join(tp, f"dup-{f}"))
    spark.catalog.refreshByPath(tp)
    assert {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out).collect()} == full
    stats2 = L.compact_triples(spark, out, num_buckets=4)
    assert stats2["files_after"] <= 4
    assert {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out).collect()} == full


def test_vacuum_orphans(spark, fixture_dir):
    """vacuum_triples removes only snapshot-unreferenced debris (a run
    killed between append and snapshot), leaves committed state intact,
    and composes with compaction (pre-compaction files already deleted by
    the compactor are simply absent)."""
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="kg_vac_")
    pages_path = f"{fixture_dir}/pages.parquet"

    L.run_checkpointed(spark, pages_path, fixture_dir, out, max_docs=60)

    # orphan debris: an append that never reached its snapshot
    from entity_extraction_svc_spark.plans.fused import build_fused

    done = L.processed_urls(spark, out)
    sl = (spark.read.parquet(pages_path)
          .join(done, "url", "left_anti").limit(40).persist())
    _, t = build_fused(spark, sl, fixture_dir)
    t.write.mode("append").parquet(L.triples_path(out))
    sl.unpersist()
    spark.catalog.refreshByPath(L.triples_path(out))

    before = {(r.subj, r.pred, r.obj)
              for r in L.read_triples(spark, out).collect()}
    st = L.vacuum_triples(spark, out)
    assert st["removed"] > 0
    # committed state unchanged: vacuum dropped only uncommitted rows
    committed = {(r.subj, r.pred, r.obj)
                 for r in L.read_triples(spark, out).collect()}
    assert committed <= before
    # second vacuum is a no-op
    assert L.vacuum_triples(spark, out)["removed"] == 0

    # the orphaned urls were never committed -> drain reprocesses them
    L.run_to_completion(spark, pages_path, fixture_dir, out, batch_docs=100)
    import duckdb as _duck

    want = {tuple(r) for r in _duck.sql(
        f"select subj, pred, obj from '{fixture_dir}/golden_triples.parquet'"
    ).fetchall()}
    got = {(r.subj, r.pred, r.obj)
           for r in L.read_triples(spark, out).collect()}
    assert got == want

    # composes with compaction: compact, then vacuum keeps the base
    L.compact_triples(spark, out, num_buckets=4)
    assert L.vacuum_triples(spark, out)["removed"] == 0
    files = [f for f in os.listdir(L.triples_path(out))
             if f.endswith(".parquet")]
    assert len(files) <= 4
    assert {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out).collect()} == want


def test_compaction_rerun_after_crash_window(spark, fixture_dir):
    """A compaction killed between the file moves and the manifest write
    leaves its attempt files as unreferenced debris.  The RERUN must not
    collide with them (attempt-unique names) nor delete its own output —
    committed triples survive byte-for-byte."""
    import os
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="kg_crashcompact_")
    pages_path = f"{fixture_dir}/pages.parquet"
    L.run_to_completion(spark, pages_path, fixture_dir, out, batch_docs=100)
    want = {(r.subj, r.pred, r.obj)
            for r in L.read_triples(spark, out).collect()}

    # crashed attempt: files moved in under the NEXT seq with some uuid,
    # no manifest written
    tp = L.triples_path(out)
    seq = len(L._read_snapshots(out))
    for i, f in enumerate(sorted(
            x for x in os.listdir(tp) if x.endswith(".parquet"))):
        shutil.copy(os.path.join(tp, f),
                    os.path.join(tp, f"compact-{seq:06d}-deadcafe-{i:05d}.parquet"))
    spark.catalog.refreshByPath(tp)

    stats = L.compact_triples(spark, out, num_buckets=4)
    got = {(r.subj, r.pred, r.obj)
           for r in L.read_triples(spark, out).collect()}
    assert got == want
    # the manifest's files all exist (the rerun did not delete its output)
    snap = [s for s in L._read_snapshots(out) if s["run_id"] == stats["run_id"]][0]
    assert snap["files"] and all(os.path.exists(f) for f in snap["files"])
    # debris from the crashed attempt is gone
    assert not [f for f in os.listdir(tp) if "deadcafe" in f]


def test_vacuum_is_path_spelling_robust(spark, fixture_dir):
    """vacuum_triples compares snapshot liveness by basename: reaching the
    same store through a different path spelling (symlink here) must not
    make committed files look orphaned."""
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="kg_vacsym_")
    pages_path = f"{fixture_dir}/pages.parquet"
    L.run_checkpointed(spark, pages_path, fixture_dir, out, max_docs=60)

    alias = out + "_alias"
    os.symlink(out, alias)
    assert L.vacuum_triples(spark, alias)["removed"] == 0
    lin = spark.read.parquet(L.lineage_path(out))
    assert lin.count() == 60  # nothing deleted, store intact
