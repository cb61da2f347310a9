"""Checkpoint / resume with per-partition lineage + metrics (north rule).

The reference's stats collector persists request/response docs to MongoDB
(``agent/stats_collector/db.py:23-47``); at batch scale that becomes an
append-only **lineage table**: one row per (run_id, partition_id, url) with
the per-url metrics (mentions found, links found, max link score), plus a
per-partition **metrics table** aggregating the same.

Resume semantics (idempotent):

    to_do = source pages LEFT ANTI JOIN lineage ON url

so a killed run resumes exactly where its last *committed* write ended.
Writes are append-mode parquet; an Iceberg deployment swaps the appends for
snapshot commits with no code change above this module (SURVEY.md §4
"checkpoint/resume").  Because a url is processed by exactly one run, the
union of per-run triple outputs is the full-run output (triples are
set-semantic: ``read_triples`` applies DISTINCT across run directories).

At 10^12 docs the anti-join is a shuffle on url between the source and the
lineage table — both sides pruned to the url column; AQE picks a broadcast
anti-join while the lineage side is still small.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_extraction_svc_spark.plans.fused import build_fused


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def metrics_path(out_dir: str) -> str:
    return os.path.join(out_dir, "metrics")


def triples_path(out_dir: str) -> str:
    return os.path.join(out_dir, "triples")


def processed_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = lineage_path(out_dir)
    try:
        return spark.read.parquet(path).select("url").distinct()
    except Exception:
        return None


def per_url_metrics(pages: DataFrame, linked: DataFrame, run_id: str) -> DataFrame:
    """One lineage row per processed url: partition id, mention/link counts,
    max link score.  The partition id is the physical partition that carried
    the url through the doc-grouped link stage.  Pages with zero mentions
    still get a lineage row (they are processed — resume must skip them)."""
    per_url = linked.groupBy("url").agg(
        F.countDistinct("mention_id").alias("n_mentions"),
        F.count(
            F.when((F.col("rank") == 0) & F.col("qid").isNotNull(), 1)
        ).alias("n_linked"),
        F.max(F.when(F.col("rank") == 0, F.col("conf"))).alias("max_link_score"),
    )
    return (
        pages.select("url")
        .join(per_url, "url", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.spark_partition_id().alias("partition_id"),
            "url",
            F.coalesce("n_mentions", F.lit(0)).cast("int").alias("n_mentions"),
            F.coalesce("n_linked", F.lit(0)).cast("int").alias("n_linked"),
            F.col("max_link_score").cast("double"),
        )
    )


def run_checkpointed(
    spark: SparkSession,
    pages_path: str,
    kb_dir: str,
    out_dir: str,
    source: str = "html",
    max_docs: int | None = None,
    run_id: str | None = None,
) -> dict:
    """One resumable pipeline run: process only urls absent from the lineage
    table, append triples + lineage + per-partition metrics.

    ``max_docs`` bounds the slice (used by tests to simulate a run killed
    midway; a production run leaves it None).  Returns run stats.
    """
    run_id = run_id or new_run_id()
    pages = spark.read.parquet(pages_path)
    done = processed_urls(spark, out_dir)
    if done is not None:
        pages = pages.join(done, "url", "left_anti")
    if max_docs is not None:
        pages = pages.limit(max_docs)
    # the slice is reused by three writes below — materialize it once so
    # resume semantics don't race with the lazily re-evaluated limit
    pages = pages.persist()
    n_pages = pages.count()
    if n_pages == 0:
        pages.unpersist()
        return {"run_id": run_id, "n_pages": 0, "n_triples": 0}

    linked, triples = build_fused(spark, pages, kb_dir, source=source)
    linked = linked.persist()

    # materialize lineage BEFORE any append touches lineage_path: its plan
    # contains the resume anti-join against that very path, so writing first
    # and refreshing would invalidate the cache and re-plan against the
    # post-append state (yielding an empty frame)
    lineage = per_url_metrics(pages, linked, run_id).persist()
    lineage.count()

    def _triple_files() -> set[str]:
        p = triples_path(out_dir)
        if not os.path.isdir(p):
            return set()
        return {
            os.path.join(p, f) for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith("_")
        }

    before = _triple_files()
    triples.write.mode("append").parquet(triples_path(out_dir))
    added = sorted(_triple_files() - before)
    _write_snapshot(out_dir, run_id, seq=len(_read_snapshots(out_dir)), files=added)
    # the lineage append is the COMMIT POINT: a crash anywhere above leaves
    # these urls absent from lineage, so the next resume reprocesses them
    # (triples are set-semantic, so the duplicate appends dedupe on read;
    # a pre-commit snapshot is a phantom only reachable by its crashed
    # run_id).  Metrics are written AFTER the commit, derived from the
    # committed lineage via repair_metrics — a hard kill between the two
    # appends can therefore never double-count a reprocessed url (the old
    # metrics-first order did: metrics landed, lineage didn't, the urls
    # were reprocessed under a new run_id and counted twice forever).
    lineage.write.mode("append").parquet(lineage_path(out_dir))
    # appended files are invisible to readers holding the session-shared
    # FileStatusCache entry for these paths — refresh so the next resume's
    # anti-join (and any open reader) sees this commit
    spark.catalog.refreshByPath(lineage_path(out_dir))
    spark.catalog.refreshByPath(triples_path(out_dir))
    repair_metrics(spark, out_dir)
    n_triples = spark.read.parquet(triples_path(out_dir)).distinct().count()
    lineage.unpersist()
    linked.unpersist()
    pages.unpersist()
    return {"run_id": run_id, "n_pages": n_pages, "n_triples": n_triples}


def run_to_completion(spark: SparkSession, pages_path: str, kb_dir: str,
                      out_dir: str, source: str = "html",
                      batch_docs: int | None = None, max_rounds: int = 100) -> list[dict]:
    """Drive run_checkpointed until the anti-join drains (the resume loop)."""
    stats = []
    for _ in range(max_rounds):
        s = run_checkpointed(spark, pages_path, kb_dir, out_dir,
                             source=source, max_docs=batch_docs)
        stats.append(s)
        if s["n_pages"] == 0 or batch_docs is None:
            break
    return stats


def repair_metrics(spark: SparkSession, out_dir: str) -> int:
    """Backfill the metrics table for every committed run_id it is missing.

    Metrics are a pure aggregation of the lineage table, so any torn state
    (a kill between the lineage commit and the metrics append) is
    self-healing: the next run — or any direct call — recomputes exactly
    the missing run_ids from committed lineage and appends them.  Metrics
    run_ids are therefore always a subset of lineage run_ids, and a url
    reprocessed after a crash is counted in exactly one committed run.
    Returns the number of backfilled (run_id, partition_id) rows.  At
    10^12 docs the anti-join prunes to the two run_id columns and the agg
    only touches the missing runs' lineage partitions."""
    # missing/empty tables are expected states (AnalysisException, like
    # streaming/curate._read_store); anything else — a TRANSIENT read
    # failure — must propagate: swallowing it would treat every committed
    # run as missing and append duplicate metrics forever (append-mode
    # writes have no undo).  Probed via spark.read, NOT os.path: the out
    # dir may be s3/hdfs (runner's documented deployment), where a local
    # isdir is always False and would silently disable metrics.  Public
    # pyspark.errors.AnalysisException is the base both classic and
    # connect sessions raise; the captured-module class is one subclass.
    from pyspark.errors import AnalysisException

    try:
        lin = spark.read.parquet(lineage_path(out_dir))
    except AnalysisException:
        return 0
    try:
        have = spark.read.parquet(metrics_path(out_dir)) \
            .select("run_id").distinct()
        missing = lin.join(have, "run_id", "left_anti")
    except AnalysisException:
        missing = lin
    metrics = missing.groupBy("run_id", "partition_id").agg(
        F.count("*").alias("n_urls"),
        F.sum("n_mentions").alias("n_mentions"),
        F.sum("n_linked").alias("n_linked"),
        F.max("max_link_score").alias("max_link_score"),
    ).persist()
    n = metrics.count()
    if n:
        metrics.write.mode("append").parquet(metrics_path(out_dir))
        spark.catalog.refreshByPath(metrics_path(out_dir))
    metrics.unpersist()
    return n


def vacuum_triples(spark: SparkSession, out_dir: str) -> dict:
    """Delete triple files no snapshot references — the debris of runs
    killed between the triples append and the snapshot write (Iceberg's
    remove_orphan_files stand-in; pairs with ``compact_triples`` the way
    rewrite_data_files pairs with orphan GC).

    Safe by the commit protocol: an unreferenced file belongs to a run
    that never reached its snapshot, so its urls are absent from lineage
    and WILL be reprocessed — the rows are either already duplicated by a
    later committed run or about to be recreated.  Never deletes
    snapshot-referenced files; a compaction manifest resets the live set,
    so files only pre-compaction snapshots reference are removed too
    (their history is already expired for time travel).

    Run it while no writer is active (like remove_orphan_files' retention
    guard): a concurrent run between its append and its snapshot write
    would look orphaned and lose its in-flight files."""
    p = triples_path(out_dir)
    if not os.path.isdir(p):
        return {"removed": 0, "kept": 0}
    snaps = _read_snapshots(out_dir)
    live: set[str] = set()
    for snap in snaps:
        # liveness by BASENAME (part/compact file names embed a uuid, so
        # basenames are unique): manifests record the path spelling of the
        # run that wrote them, and comparing full strings against paths
        # built from THIS call's out_dir argument (relative vs absolute,
        # different cwd, symlinked mount) would make every committed file
        # look orphaned — and vacuum deletes what looks orphaned
        names = {os.path.basename(x) for x in snap["files"]}
        if snap.get("compaction"):
            live = names
        else:
            live.update(names)
    removed = 0
    for f in list(os.listdir(p)):
        if (f.endswith(".parquet") and not f.startswith("_")
                and f not in live):
            os.remove(os.path.join(p, f))
            removed += 1
    if removed:
        spark.catalog.refreshByPath(p)
    return {"removed": removed, "kept": len(live)}


def snapshots_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_snapshots")


def _write_snapshot(out_dir: str, run_id: str, seq: int, files: list[str],
                    compaction: bool = False,
                    retraction: bool = False,
                    removed_files: list[str] | None = None) -> None:
    """Manifest-based snapshot (the parquet-only stand-in for an Iceberg
    snapshot commit): one JSON per run listing the triple files it added.
    ``read_triples(as_of=run_id)`` time-travels by unioning manifests up to
    that run — the SURVEY §7.4 degradation path when no table format is
    available.  A ``compaction`` manifest REPLACES the file set accumulated
    so far (rewrite_data_files + expire_snapshots in one)."""
    import json

    os.makedirs(snapshots_path(out_dir), exist_ok=True)
    with open(os.path.join(snapshots_path(out_dir), f"{seq:06d}-{run_id}.json"), "w") as f:
        snap = {"run_id": run_id, "seq": seq, "files": sorted(files),
                "compaction": compaction, "retraction": retraction}
        if removed_files:
            snap["removed_files"] = sorted(removed_files)
        json.dump(snap, f)


def compact_triples(spark: SparkSession, out_dir: str,
                    num_buckets: int = 32) -> dict:
    """Rewrite the triples store into ``num_buckets`` subject-hash files
    and collapse snapshot history up to the latest commit — the
    parquet-manifest stand-in for Iceberg's rewrite_data_files +
    expire_snapshots.  At 10^12 docs the append-per-run layout is the
    operational pain point (thousands of runs x 32 files each); compaction
    restores a bounded file count and subject-hash locality in one job.

    Crash-safe BY SET SEMANTICS, no atomic swap needed: compacted files
    are moved into the live dir BEFORE the manifest, and the old files
    deleted only after it — every intermediate state holds a superset of
    the triple set, and ``read_triples`` applies DISTINCT, so a kill at
    any point leaves reads correct and a re-run of ``compact_triples``
    finishes the job (pinned in test_lineage.py).  Lineage/metrics are NOT
    compacted here: they lack set semantics, so safe rewrite needs a real
    table-format commit (the documented Iceberg swap-in point).

    Time travel after compaction: ``as_of`` any run at-or-after the
    compaction (and the run immediately before it, whose state the base
    equals) keeps working; earlier history is expired and raises.

    Like the rest of this module's manifest machinery, the file moves are
    local-FS os-level operations — the deliberate stand-in scope (module
    docstring): under a real table format this whole function IS
    ``rewrite_data_files`` + ``expire_snapshots`` and the os calls become
    table commits."""
    import shutil
    import uuid

    p = triples_path(out_dir)
    if not os.path.isdir(p):  # fresh/drained out dir: nothing to compact
        return {"run_id": None, "files_before": 0, "files_after": 0}
    old = {
        os.path.join(p, f) for f in os.listdir(p)
        if f.endswith(".parquet") and not f.startswith("_")
    }
    if not old:
        return {"run_id": None, "files_before": 0, "files_after": 0}
    snaps = _read_snapshots(out_dir)
    seq = len(snaps)
    run_id = f"compact{seq}-{uuid.uuid4().hex[:8]}"
    tmp = os.path.join(out_dir, f"_compact_tmp_{seq}")
    (
        spark.read.parquet(p).distinct()
        .repartition(num_buckets, F.pmod(F.xxhash64("subj"), F.lit(num_buckets)))
        .write.mode("overwrite").parquet(tmp)
    )
    # dst names carry this ATTEMPT's uuid, not just seq: a rerun after a
    # crash between the moves and the manifest must not collide with the
    # crashed attempt's files — with seq-only names the rerun would
    # os.replace onto paths that are also in `old` and then delete its own
    # freshly committed files (manifest pointing at nothing = data loss)
    moved = []
    attempt = run_id.split("-")[-1]
    for i, f in enumerate(sorted(
            x for x in os.listdir(tmp) if x.endswith(".parquet"))):
        dst = os.path.join(p, f"compact-{seq:06d}-{attempt}-{i:05d}.parquet")
        os.replace(os.path.join(tmp, f), dst)
        moved.append(dst)
    # manifest lands while BOTH file generations are live: a crash here
    # only costs disk (duplicate rows), never rows
    _write_snapshot(out_dir, run_id, seq=seq, files=moved, compaction=True)
    for f in old - set(moved):
        os.remove(f)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.refreshByPath(p)
    return {"run_id": run_id, "files_before": len(old),
            "files_after": len(moved)}


def retract_triples(spark: SparkSession, out_dir: str,
                    to_remove: DataFrame,
                    num_buckets: int = 32) -> dict:
    """First-class RETRACTION commit (the stand-in for an Iceberg DELETE,
    VERDICT r4 #2's missing producer): rewrite the store without the
    given (subj, pred, obj) rows and commit as a compaction snapshot —
    after which ``maintain_closure`` sees the edge disappear from the
    head and applies DRed :func:`~..operators.graphwalk.closure_delete`.
    The daily-crawl flow is therefore expressible end to end: ingest runs
    append, page retractions call this, closure maintenance reconciles.

    Commit order is compact_triples' (write-new -> manifest -> delete-
    old) with one honestly-different property: a retraction is the ONE
    store operation whose purpose is to violate "every intermediate state
    is a superset", so its visible COMMIT POINT is the old-file deletion
    at the end — head (directory) reads keep showing the retracted rows
    until then, a kill before it leaves the retraction pending, and
    re-running the same call completes it (idempotent: the anti-join
    rewrites the same survivor set).  No kept row is ever at risk: by the
    time any old file is deleted, every survivor is committed in the new
    generation AND referenced by the manifest.  Under a real table format
    this whole function is a single MERGE/DELETE commit and the window
    disappears (the documented Iceberg swap-in point).
    """
    import shutil
    import uuid

    p = triples_path(out_dir)
    if not os.path.isdir(p):
        return {"run_id": None, "removed": 0}
    old = {
        os.path.join(p, f) for f in os.listdir(p)
        if f.endswith(".parquet") and not f.startswith("_")
    }
    if not old:
        return {"run_id": None, "removed": 0}
    keys = ["subj", "pred", "obj"]
    rm = to_remove.select(keys).distinct().localCheckpoint(eager=True)
    cur = spark.read.parquet(p).distinct().localCheckpoint(eager=True)
    n_before = cur.count()
    remaining = cur.join(rm, keys, "left_anti")
    snaps = _read_snapshots(out_dir)
    seq = len(snaps)
    run_id = f"retract{seq}-{uuid.uuid4().hex[:8]}"
    attempt = run_id.split("-")[-1]
    tmp = os.path.join(out_dir, f"_retract_tmp_{seq}")
    (
        remaining
        .repartition(num_buckets,
                     F.pmod(F.xxhash64("subj"), F.lit(num_buckets)))
        .write.mode("overwrite").parquet(tmp)
    )
    moved = []
    for i, f in enumerate(sorted(
            x for x in os.listdir(tmp) if x.endswith(".parquet"))):
        dst = os.path.join(p, f"retract-{seq:06d}-{attempt}-{i:05d}.parquet")
        os.replace(os.path.join(tmp, f), dst)
        moved.append(dst)
    # removed-rows sidecar BEFORE the manifest that references it (a
    # kill in between leaves a harmless orphan file, never a manifest
    # pointing at nothing) — this is what makes the pre-retraction state
    # exactly time-travelable (read_triples: post-state ∪ sidecar)
    actually_removed = cur.join(rm, keys, "left_semi")
    side_dir = os.path.join(out_dir, "_retractions")
    side_tmp = os.path.join(out_dir, f"_retract_side_tmp_{seq}")
    actually_removed.coalesce(1).write.mode("overwrite").parquet(side_tmp)
    os.makedirs(side_dir, exist_ok=True)
    side_files = []
    for i, f in enumerate(sorted(
            x for x in os.listdir(side_tmp) if x.endswith(".parquet"))):
        dst = os.path.join(side_dir, f"removed-{seq:06d}-{attempt}-{i:05d}.parquet")
        os.replace(os.path.join(side_tmp, f), dst)
        side_files.append(dst)
    shutil.rmtree(side_tmp, ignore_errors=True)
    _write_snapshot(out_dir, run_id, seq=seq, files=moved, compaction=True,
                    retraction=True, removed_files=side_files)
    for f in old - set(moved):
        os.remove(f)  # the retraction's visible commit point
    shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.refreshByPath(p)
    n_after = spark.read.parquet(p).distinct().count()
    return {"run_id": run_id, "removed": n_before - n_after,
            "files_after": len(moved)}


def _read_snapshots(out_dir: str) -> list[dict]:
    import json

    p = snapshots_path(out_dir)
    if not os.path.isdir(p):
        return []
    out = []
    for name in sorted(os.listdir(p)):
        if name.endswith(".json"):
            with open(os.path.join(p, name)) as f:
                out.append(json.load(f))
    return out


def read_triples(spark: SparkSession, out_dir: str,
                 as_of: str | None = None) -> DataFrame:
    """The materialized KG across committed runs (set semantics).

    ``as_of=<run_id>`` time-travels to the state after that run's commit
    using the snapshot manifests; default reads the current state."""
    if as_of is None:
        return spark.read.parquet(triples_path(out_dir)).distinct()
    snaps = _read_snapshots(out_dir)
    by_id = {s["run_id"]: s for s in snaps}
    if as_of not in by_id:
        raise ValueError(f"unknown snapshot run_id: {as_of}")
    target_seq = by_id[as_of]["seq"]
    compact_seqs = [s["seq"] for s in snaps if s.get("compaction")]
    latest_compact = max(compact_seqs, default=-1)
    # a compaction expires history: only the state at-or-after it — plus
    # the run immediately before it, whose state the base file set equals
    # exactly — remains addressable
    if target_seq < latest_compact - 1:
        raise ValueError(
            f"snapshot {as_of} (seq {target_seq}) was expired by the "
            f"compaction at seq {latest_compact}"
        )
    removed_files: list[str] = []
    if target_seq == latest_compact - 1:
        latest = next(s for s in snaps if s["seq"] == latest_compact)
        # the plain seq-1 redirect is only sound for true compactions
        # (file rewrite, identical state); a RETRACTION commit changes
        # state, so it carries its removed rows as a side parquet and the
        # pre-retraction state reads as post-state ∪ removed — exact time
        # travel through one retraction.  (Silently serving the
        # post-retraction rows as the old state was the bug that made
        # maintain_entailment's as-of diff see no removals and skip
        # reconciliation; older retractions without the side file report
        # expired.)
        if latest.get("retraction"):
            removed_files = list(latest.get("removed_files") or [])
            if not removed_files:
                raise ValueError(
                    f"snapshot {as_of} (seq {target_seq}) was expired by "
                    f"the retraction at seq {latest_compact} (no removed-"
                    f"rows sidecar recorded)"
                )
        target_seq = latest_compact  # post-state (∪ sidecar if retraction)
    files: list[str] = []
    for snap in snaps:
        if snap["seq"] > target_seq:
            break
        if snap.get("compaction"):
            files = list(snap["files"])  # REPLACES accumulated history
        else:
            files.extend(snap["files"])
    if not files:
        raise ValueError(f"snapshot {as_of} carries no files")
    # rebase onto THIS call's out_dir spelling: manifests carry the
    # writing run's path strings, which may be relative/differently-rooted
    files = [os.path.join(triples_path(out_dir), os.path.basename(f))
             for f in files]
    out = spark.read.parquet(*files)
    if removed_files:
        side = [os.path.join(out_dir, "_retractions", os.path.basename(f))
                for f in removed_files]
        out = out.unionByName(spark.read.parquet(*side))
    return out.distinct()
