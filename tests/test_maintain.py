"""Lineage-wired closure maintenance (VERDICT r4 #5): bootstrap,
incremental insert, retraction via a rewrite commit, crash-orphan
invisibility, and the --diff surface."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.graphwalk import (
    transitive_closure,
)
from entity_extraction_svc_spark.plans import lineage as L
from entity_extraction_svc_spark.plans import maintain as M

PRED = "P131"


def _closure_now(spark, out):
    cur = L.read_triples(spark, out)
    return {
        (r.src, r.dst, r.dist)
        for r in transitive_closure(cur, pred=PRED).collect()
    }


def _stored(spark, out):
    df, m = M.read_closure(spark, out, PRED)
    assert df is not None
    return {(r.src, r.dst, r.dist) for r in df.collect()}, m


def test_maintain_closure_lifecycle(spark, fixture_dir):
    out = tempfile.mkdtemp(prefix="kg_maint_")
    pages = f"{fixture_dir}/pages.parquet"

    # no store yet
    assert M.maintain_closure(spark, out, PRED)["status"] == "no-triples-store"

    s1 = L.run_checkpointed(spark, pages, fixture_dir, out, max_docs=60)
    r1 = M.maintain_closure(spark, out, PRED)
    assert r1["status"] == "bootstrap"
    got, m1 = _stored(spark, out)
    assert got == _closure_now(spark, out) and len(got) > 0
    assert m1["as_of_run"] == s1["run_id"]

    # same head -> up-to-date fast path, no new manifest
    assert M.maintain_closure(spark, out, PRED)["status"] == "up-to-date"
    _, m1b = _stored(spark, out)
    assert m1b["seq"] == m1["seq"]

    # drain the corpus -> incremental insert maintenance
    s2 = L.run_checkpointed(spark, pages, fixture_dir, out)
    r2 = M.maintain_closure(spark, out, PRED)
    assert r2["status"] == "maintained"
    assert r2["added_edges"] > 0 and r2["removed_edges"] == 0
    got2, m2 = _stored(spark, out)
    assert got2 == _closure_now(spark, out)
    assert m2["seq"] == m1["seq"] + 1 and m2["as_of_run"] == s2["run_id"]
    assert got2 > got  # new docs asserted new P131 edges

    # --diff surface between the two pipeline commits (checked BEFORE the
    # retraction below, whose compaction expires s1's snapshot)
    d = M.diff_runs(spark, out, s1["run_id"], s2["run_id"])
    by = {r["status"]: r["count"]
          for r in d.groupBy("status").count().collect()}
    assert by.get("added", 0) > 0 and "removed" not in by

    # retraction: rewrite the store without 3 P131 triples, committed as
    # a compaction snapshot (the stand-in for an Iceberg DELETE commit)
    cur = L.read_triples(spark, out).localCheckpoint(eager=True)
    drop = cur.filter(F.col("pred") == PRED).orderBy("subj", "obj").limit(3)
    remaining = cur.join(drop, ["subj", "pred", "obj"], "left_anti")
    tp = L.triples_path(out)
    staging = tempfile.mkdtemp(prefix="kg_rewrite_")
    remaining.coalesce(1).write.mode("overwrite").parquet(staging)
    for f in glob.glob(f"{tp}/*.parquet"):
        os.remove(f)
    new_files = []
    for i, f in enumerate(sorted(glob.glob(f"{staging}/*.parquet"))):
        dest = os.path.join(tp, f"retract-{i:05d}.parquet")
        shutil.move(f, dest)
        new_files.append(dest)
    L._write_snapshot(out, "retract1", seq=len(L._read_snapshots(out)),
                      files=new_files, compaction=True)
    spark.catalog.refreshByPath(tp)

    r3 = M.maintain_closure(spark, out, PRED)
    assert r3["status"] == "maintained"
    assert r3["removed_edges"] > 0
    got3, m3 = _stored(spark, out)
    assert got3 == _closure_now(spark, out)
    assert got3 < got2

    # crash-orphan invisibility: a stray data file next to the committed
    # ones must not surface in the manifest read, and vacuum removes it
    root = M.closure_path(out, PRED)
    data_dir = os.path.dirname(m3["files"][0])
    orphan_dir = os.path.join(root, "data-999999-orphan")
    os.makedirs(orphan_dir)
    shutil.copy(m3["files"][0], os.path.join(orphan_dir, "stray.parquet"))
    got3b, _ = _stored(spark, out)
    assert got3b == got3
    stats = M.vacuum_closure(spark, out, PRED)
    assert stats["orphans_removed"] == 1
    assert not os.path.exists(orphan_dir)
    assert os.path.exists(m3["files"][0])

    shutil.rmtree(out, ignore_errors=True)


def test_retract_triples_end_to_end(spark, fixture_dir):
    out = tempfile.mkdtemp(prefix="kg_retract_")
    pages = f"{fixture_dir}/pages.parquet"
    L.run_checkpointed(spark, pages, fixture_dir, out)
    M.maintain_closure(spark, out, PRED)
    before = L.read_triples(spark, out).localCheckpoint(eager=True)
    n_before = before.count()
    drop = before.filter(F.col("pred") == PRED) \
        .orderBy("subj", "obj").limit(3).localCheckpoint(eager=True)

    stats = L.retract_triples(spark, out, drop)
    assert stats["removed"] == 3
    cur = L.read_triples(spark, out)
    assert cur.count() == n_before - 3
    assert cur.join(drop, ["subj", "pred", "obj"], "left_semi").count() == 0

    # the retraction is a committed snapshot: as-of it reads the new state
    asof = L.read_triples(spark, out, as_of=stats["run_id"])
    assert asof.count() == n_before - 3

    # and the PRE-retraction state time-travels EXACTLY: the retraction
    # commit carries its removed rows as a sidecar, so as-of the previous
    # run reads post-state ∪ removed == the old state byte-for-byte.
    # (The naive seq-1 redirect used to serve the post-retraction rows as
    # the old state — maintain_entailment's as-of diff saw no removals
    # and skipped reconciliation.)
    snaps = L._read_snapshots(out)
    prev_run = [s for s in snaps if not s.get("retraction")][-1]["run_id"]
    pre = {(r.subj, r.pred, r.obj)
           for r in L.read_triples(spark, out, as_of=prev_run).collect()}
    assert pre == {(r.subj, r.pred, r.obj) for r in before.collect()}

    # closure maintenance sees the retraction and reconciles via DRed
    r = M.maintain_closure(spark, out, PRED)
    assert r["status"] == "maintained" and r["removed_edges"] > 0
    got, _ = _stored(spark, out)
    assert got == _closure_now(spark, out)

    # retracting the same rows again is a no-op commit
    stats2 = L.retract_triples(spark, out, drop)
    assert stats2["removed"] == 0
    assert L.read_triples(spark, out).count() == n_before - 3

    shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# rule-entailment maintenance (--entail)


# store-shaped rules: located-in transitivity + capital-implies-located-in
# (the store's extracted triples carry P131/P1376 but not the ontology
# preds the RDFS preset keys on)
_ENT_RULES = [
    ([("?x", "P131", "?y"), ("?y", "P131", "?z")], ("?x", "P131", "?z")),
    ([("?s", "P1376", "?o")], ("?s", "P131", "?o")),
]


def _entailed_now(spark, out):
    from entity_extraction_svc_spark.operators.chain import forward_chain

    cur = L.read_triples(spark, out).select("subj", "pred", "obj").distinct()
    return {
        (r.subj, r.pred, r.obj)
        for r in forward_chain(cur, _ENT_RULES, derived_only=True).collect()
    }


def _ent_stored(spark, out):
    df, m = M.read_closure(spark, out, "test", prefix="entail")
    assert df is not None
    return {(r.subj, r.pred, r.obj) for r in df.collect()}, m


def test_maintain_entailment_lifecycle(spark, fixture_dir):
    out = tempfile.mkdtemp(prefix="kg_ent_")
    pages = f"{fixture_dir}/pages.parquet"

    assert M.maintain_entailment(
        spark, out, rules=_ENT_RULES, name="test"
    )["status"] == "no-triples-store"

    L.run_checkpointed(spark, pages, fixture_dir, out, max_docs=60)
    r1 = M.maintain_entailment(spark, out, rules=_ENT_RULES, name="test")
    assert r1["status"] == "bootstrap" and r1["derived"] > 0
    got, m1 = _ent_stored(spark, out)
    assert got == _entailed_now(spark, out)

    assert M.maintain_entailment(
        spark, out, rules=_ENT_RULES, name="test")["status"] == "up-to-date"

    # drain the corpus: additions cascade incrementally; the store must
    # land exactly on the from-scratch entailment of the new head
    L.run_checkpointed(spark, pages, fixture_dir, out)
    r2 = M.maintain_entailment(spark, out, rules=_ENT_RULES, name="test")
    assert r2["status"] == "maintained" and r2["added_facts"] > 0
    got2, m2 = _ent_stored(spark, out)
    want2 = _entailed_now(spark, out)
    # overlay may retain rows a later run also asserted as base facts —
    # harmless overlap by the derived-only convention; the ENTAILMENT
    # must match exactly
    base2 = {
        (r.subj, r.pred, r.obj)
        for r in L.read_triples(spark, out)
        .select("subj", "pred", "obj").distinct().collect()
    }
    assert got2 - base2 == want2 - base2
    assert got2 >= got and m2["seq"] == m1["seq"] + 1

    # retraction -> incremental DRed (the retraction sidecar makes the
    # pre-retraction base exactly readable, so the diff sees the removed
    # facts and forward_chain_retract reconciles without a recompute)
    cur = L.read_triples(spark, out).localCheckpoint(eager=True)
    drop = cur.filter(F.col("pred") == PRED).orderBy("subj", "obj").limit(2)
    L.retract_triples(spark, out, drop)
    r3 = M.maintain_entailment(spark, out, rules=_ENT_RULES, name="test")
    assert r3["status"] == "maintained" and r3["removed_facts"] >= 2
    got3, _ = _ent_stored(spark, out)
    base3 = {
        (r.subj, r.pred, r.obj)
        for r in L.read_triples(spark, out)
        .select("subj", "pred", "obj").distinct().collect()
    }
    assert got3 - base3 == _entailed_now(spark, out) - base3

    # orphan hygiene shares the closure-store vacuum
    assert M.vacuum_closure(
        spark, out, "test", prefix="entail")["orphans_removed"] == 0
    shutil.rmtree(out)


def _cc_now(spark, out):
    from entity_extraction_svc_spark.operators.canonicalize import (
        connected_components,
    )

    cur = M._entity_edges(L.read_triples(spark, out))
    return {(r.node, r.comp) for r in connected_components(cur).collect()}


def test_maintain_canonical_lifecycle(spark, fixture_dir):
    """cc_entities store: bootstrap, up-to-date, incremental merge on new
    docs, incremental split on a retraction commit — store == recompute
    over the head at every step (the cc_delta invariant, lineage-wired)."""
    out = tempfile.mkdtemp(prefix="kg_ccmaint_")
    pages = f"{fixture_dir}/pages.parquet"

    assert M.maintain_canonical(spark, out)["status"] == "no-triples-store"

    s1 = L.run_checkpointed(spark, pages, fixture_dir, out, max_docs=60)
    r1 = M.maintain_canonical(spark, out)
    assert r1["status"] == "bootstrap" and r1["as_of_run"] == s1["run_id"]
    df1, m1 = M.read_closure(spark, out, "entities", prefix="cc")
    got1 = {(r.node, r.comp) for r in df1.collect()}
    assert got1 == _cc_now(spark, out) and got1

    assert M.maintain_canonical(spark, out)["status"] == "up-to-date"

    # drain the corpus -> incremental (additions merge via cc_delta)
    L.run_checkpointed(spark, pages, fixture_dir, out)
    r2 = M.maintain_canonical(spark, out)
    assert r2["status"] == "maintained" and r2["added_edges"] > 0
    df2, m2 = M.read_closure(spark, out, "entities", prefix="cc")
    got2 = {(r.node, r.comp) for r in df2.collect()}
    assert got2 == _cc_now(spark, out)
    assert m2["seq"] == m1["seq"] + 1

    # retract every triple of one well-connected subject: the edge diff
    # shows removals and cc_delta takes the affected-component recompute
    # path; store must still equal recompute on the head
    before = L.read_triples(spark, out).localCheckpoint(eager=True)
    drop = before.filter(
        (F.col("subj") == "Q762") & F.col("obj").rlike("^Q[0-9]+$")
    ).localCheckpoint(eager=True)
    assert drop.count() > 0
    L.retract_triples(spark, out, drop)
    r3 = M.maintain_canonical(spark, out)
    assert r3["status"] == "maintained" and r3["removed_edges"] > 0
    df3, _ = M.read_closure(spark, out, "entities", prefix="cc")
    got3 = {(r.node, r.comp) for r in df3.collect()}
    assert got3 == _cc_now(spark, out)

    shutil.rmtree(out, ignore_errors=True)
