"""Hard-kill / resume rehearsal (north rule: resumes idempotently after
failure) — SIGKILL, not a cooperative max_docs stop.

Launches the real runner (``python -m entity_extraction_svc_spark.runner
--resume --max-docs 60``) as a subprocess and SIGKILLs it at staggered
wall offsets, so kills land in the JVM boot, the link stage, and the
append/commit window on different attempts — including between the
triples/metrics/lineage appends, the torn states a cooperative test can
never produce.  Then drains with clean resumes and asserts:

1. final triple set == the golden single-run set (byte equality),
2. lineage has every url exactly once (count == distinct == N),
3. metrics run_ids ⊆ lineage run_ids and sum(n_urls) == N — i.e. a url
   reprocessed after a crash is counted in exactly ONE committed run
   (the repair_metrics invariant; the old metrics-before-commit order
   double-counted here),
4. partial parquet debris (_temporary dirs) never surfaces in reads.

Usage: python tools/rehearse_kill_resume.py [kill_offsets_sec ...]
"""

from __future__ import annotations

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


def runner_cmd(out: str) -> list[str]:
    return [
        sys.executable, "-m", "entity_extraction_svc_spark.runner",
        "--pages", f"{FIX}/pages.parquet", "--kb", FIX, "--out", out,
        "--resume", "--max-docs", "60", "--master", "local[8]",
    ]


def main(offsets: list[float]) -> int:
    out = tempfile.mkdtemp(prefix="kg_killtest_")
    env = {**os.environ, "PYTHONPATH": REPO}
    killed = survived = 0
    for off in offsets:
        p = subprocess.Popen(runner_cmd(out), env=env, cwd=REPO,
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL,
                             start_new_session=True)
        try:
            p.wait(timeout=off)
            survived += 1
            print(f"kill@{off}s: run finished first", flush=True)
        except subprocess.TimeoutExpired:
            # kill the whole session: runner + the JVM it spawned
            os.killpg(p.pid, signal.SIGKILL)
            p.wait()
            killed += 1
            print(f"kill@{off}s: SIGKILLed mid-run", flush=True)
    print(f"{killed} hard kills, {survived} completed runs", flush=True)

    # drain with clean resumes (bounded; each processes <= 60 new urls)
    for i in range(12):
        rc = subprocess.run(runner_cmd(out), env=env, cwd=REPO,
                            capture_output=True, text=True).returncode
        if rc != 0:
            print("RESUME RUN FAILED — torn state not recoverable")
            return 1
        import json as _json

        # runner prints one JSON stats line on stdout (last line)
        done = subprocess.run(
            [sys.executable, "-c", (
                "import duckdb,sys;"
                f"print(duckdb.sql(\"select count(distinct url) from "
                f"'{out}/lineage/*.parquet'\").fetchone()[0])"
            )], capture_output=True, text=True).stdout.strip()
        print(f"resume {i}: {done} urls committed", flush=True)
        if done == "206":
            break

    import duckdb

    got = duckdb.sql(
        f"select distinct subj, pred, obj from '{out}/triples/*.parquet' "
        "order by 1,2,3").fetchall()
    want = duckdb.sql(
        f"select distinct subj, pred, obj from '{FIX}/golden_triples.parquet' "
        "order by 1,2,3").fetchall()
    lin_n, lin_d = duckdb.sql(
        f"select count(*), count(distinct url) from '{out}/lineage/*.parquet'"
    ).fetchone()
    met = duckdb.sql(
        f"select sum(n_urls) from '{out}/metrics/*.parquet'").fetchone()[0]
    met_orphans = duckdb.sql(
        f"select count(*) from (select distinct run_id from '{out}/metrics/*.parquet' "
        f"except select distinct run_id from '{out}/lineage/*.parquet')"
    ).fetchone()[0]

    ok = True
    for label, cond in [
        ("triples == golden", got == want),
        (f"lineage exactly-once ({lin_n}/{lin_d})", lin_n == lin_d == 206),
        (f"metrics sum == 206 (got {met})", met == 206),
        (f"metrics run_ids subset of lineage (orphans {met_orphans})",
         met_orphans == 0),
    ]:
        print(("PASS " if cond else "FAIL ") + label, flush=True)
        ok &= cond
    if ok:
        shutil.rmtree(out, ignore_errors=True)
    else:
        print(f"state kept for inspection: {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    offs = [float(a) for a in sys.argv[1:]] or [8.0, 13.0, 16.0, 18.0, 20.0]
    sys.exit(main(offs))
