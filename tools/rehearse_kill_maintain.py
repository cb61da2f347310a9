"""Hard-kill rehearsal for the KG MAINTENANCE commit path (VERDICT r4 #5
done-criterion: a kill inside the maintenance append leaves invariants
green).

Builds a checkpointed store once (two clean runner runs), then fires
``--resume --maintain-closure P131`` runs and SIGKILLs them at staggered
offsets so kills land in the JVM boot, the closure compute, and the
write-new -> manifest -> delete-old commit window.  After each kill, a
clean maintenance run must converge, and the invariants are:

1. the committed closure (read STRICTLY via the manifest file list)
   equals the recursive-CTE recompute over the store's current P131
   edges — DuckDB as the independent engine;
2. every manifest's file list exists on disk (no manifest pointing at
   deleted data — the delete-old-last ordering);
3. vacuum_closure removes any orphan data files a kill stranded, and
   the manifest read is unchanged afterwards.

Usage: python tools/rehearse_kill_maintain.py [kill_offsets_sec ...]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.path.join(REPO, "fixtures")
PRED = "P131"


def runner_cmd(out: str, maintain: bool, max_docs: int | None) -> list[str]:
    cmd = [
        sys.executable, "-m", "entity_extraction_svc_spark.runner",
        "--pages", f"{FIX}/pages.parquet", "--kb", FIX, "--out", out,
        "--resume", "--master", "local[8]",
    ]
    if max_docs:
        cmd += ["--max-docs", str(max_docs)]
    if maintain:
        cmd += ["--maintain-closure", PRED, "--entail"]
    return cmd


def closure_files(out: str) -> list[dict]:
    snap_dir = os.path.join(out, f"closure_{PRED}", "_snapshots")
    if not os.path.isdir(snap_dir):
        return []
    ms = []
    for n in sorted(os.listdir(snap_dir)):
        if n.endswith(".json"):
            with open(os.path.join(snap_dir, n)) as f:
                ms.append(json.load(f))
    return ms


def main(offsets: list[float]) -> int:
    import duckdb

    from entity_extraction_svc_spark.operators.graphwalk import (
        closure_oracle_sql,
    )

    out = tempfile.mkdtemp(prefix="kg_maintkill_")
    env = {**os.environ, "PYTHONPATH": REPO}

    # store build: 60 docs, then a 1-doc run with maintenance so the
    # closure BOOTSTRAPS on a partial store — every kill target below
    # adds up to 30 fresh docs and runs INCREMENTAL maintenance on top
    for maintain, max_docs in [(False, 60), (True, 1)]:
        rc = subprocess.run(
            runner_cmd(out, maintain, max_docs), env=env, cwd=REPO,
            capture_output=True, text=True,
        ).returncode
        if rc != 0:
            print("store build failed")
            return 1
    print("store built (bootstrap manifest in place)", flush=True)

    killed = survived = 0
    for off in offsets:
        p = subprocess.Popen(
            runner_cmd(out, True, 30), env=env, cwd=REPO,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        try:
            p.wait(timeout=off)
            survived += 1
            print(f"kill@{off}s: run finished first", flush=True)
        except subprocess.TimeoutExpired:
            os.killpg(p.pid, signal.SIGKILL)
            p.wait()
            killed += 1
            print(f"kill@{off}s: SIGKILLed mid-maintenance", flush=True)
        time.sleep(1)
    print(f"{killed} hard kills, {survived} completed runs", flush=True)

    # clean converging maintenance
    r = subprocess.run(runner_cmd(out, True, 30), env=env, cwd=REPO,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print("CLEAN MAINTENANCE FAILED after kills")
        print(r.stderr[-2000:])
        return 1

    manifests = closure_files(out)
    ok = len(manifests) > 0
    print(f"{len(manifests)} closure manifests", flush=True)

    # invariant 2: the HEAD manifest's files all exist (earlier manifests
    # are expired history — completed commits delete their files by
    # design)
    dangling = [
        f for f in manifests[-1]["files"] if not os.path.exists(f)
    ]
    cond = not dangling
    print(("PASS " if cond else "FAIL ")
          + f"head manifest references only live files "
          f"({len(dangling)} dangling)", flush=True)
    ok &= cond

    # invariant 1: manifest-read closure == DuckDB recursive recompute
    latest = manifests[-1]
    files_sql = ", ".join(f"'{f}'" for f in latest["files"])
    got = duckdb.sql(
        f"SELECT src, dst, dist FROM read_parquet([{files_sql}]) "
        "ORDER BY 1, 2"
    ).fetchall()
    oracle = closure_oracle_sql(
        f"SELECT DISTINCT subj, pred, obj FROM '{out}/triples/*.parquet'",
        pred=PRED,
    )
    want = duckdb.sql(
        f"SELECT src, dst, dist FROM ({oracle}) ORDER BY 1, 2"
    ).fetchall()
    cond = got == want and len(got) > 0
    print(("PASS " if cond else "FAIL ")
          + f"closure == recompute oracle ({len(got)} vs {len(want)} pairs)",
          flush=True)
    ok &= cond

    # invariant 1b: the entailment store (also maintained + killed in
    # every run above — same commit protocol, separate manifest chain)
    # must equal the unrolled-chain recompute: base ∪ overlay ==
    # full entailment of (store ∪ KB schema facts ∪ RDFS ontology)
    from entity_extraction_svc_spark.operators.chain import (
        RDFS_RULES,
        chain_oracle_sql,
        rdfs_ontology_values_sql,
    )

    ent_snap = os.path.join(out, "entail_rdfs", "_snapshots")
    ent_ms = []
    for n in sorted(os.listdir(ent_snap)):
        if n.endswith(".json"):
            with open(os.path.join(ent_snap, n)) as f:
                ent_ms.append(json.load(f))
    efiles_sql = ", ".join(f"'{f}'" for f in ent_ms[-1]["files"])
    base_sql = (
        f"SELECT DISTINCT subj, pred, obj FROM '{out}/triples/*.parquet' "
        f"UNION SELECT subj, pred, obj FROM '{FIX}/kb_triples.parquet' "
        f"WHERE pred IN ('P279', 'P1647') "
        f"UNION SELECT * FROM (VALUES {rdfs_ontology_values_sql()}) "
        f"oo(subj, pred, obj)"
    )
    gote = duckdb.sql(
        f"SELECT subj, pred, obj FROM ({base_sql}) "
        f"UNION SELECT subj, pred, obj FROM read_parquet([{efiles_sql}]) "
        "ORDER BY 1, 2, 3"
    ).fetchall()
    wante = duckdb.sql(
        f"SELECT subj, pred, obj "
        f"FROM ({chain_oracle_sql(base_sql, RDFS_RULES, rounds=8)}) "
        "ORDER BY 1, 2, 3"
    ).fetchall()
    cond = gote == wante and len(gote) > 0
    print(("PASS " if cond else "FAIL ")
          + f"entailment store == chain recompute oracle "
          f"({len(gote)} vs {len(wante)} facts, "
          f"{len(ent_ms)} entail manifests)", flush=True)
    ok &= cond

    # invariant 3: vacuum drops orphans, manifest read unchanged
    from entity_extraction_svc_spark.plans.maintain import vacuum_closure

    stats = vacuum_closure(None, out, PRED)
    got2 = duckdb.sql(
        f"SELECT src, dst, dist FROM read_parquet([{files_sql}]) "
        "ORDER BY 1, 2"
    ).fetchall()
    cond = got2 == got
    print(("PASS " if cond else "FAIL ")
          + f"vacuum ({stats['orphans_removed']} orphans) preserves "
          "the manifest read", flush=True)
    ok &= cond

    if ok:
        shutil.rmtree(out, ignore_errors=True)
    else:
        print(f"state kept for inspection: {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    offs = [float(a) for a in sys.argv[1:]] or [12.0, 16.0, 19.0, 21.0, 23.0, 25.0]
    sys.exit(main(offs))
