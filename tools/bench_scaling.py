"""Two-parallelism scaling bench (north rule: N vs 4N executors, sandbox
proxy per the driver's instruction: the identical job at two local
parallelism levels).

Levels are local[4] vs local[16]: this box exposes 32 hardware threads on
fewer physical cores, so 8->32 crosses the SMT boundary and a pure-Python
CPU burn already caps at ~3.2x for 4x procs — a real cluster adds machines,
not hyperthreads.  The harness also measures that raw-CPU ceiling and
reports it next to the job's speedup so the efficiency number is
interpretable.

Runs the fused KG pipeline (extract -> chunk -> NER -> link -> triples, one
narrow mapInPandas + the triples aggregation) in a fresh subprocess per
level, measures job wall time after a warm-up (JVM/session startup and
KB-broadcast construction excluded — both are corpus-size-independent),
writes BENCH.md.

Usage: python tools/bench_scaling.py [n_docs] [N] [mult]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from entity_extraction_svc_spark.session import get_spark
from entity_extraction_svc_spark.fixtures import ensure_fixtures
from entity_extraction_svc_spark.plans.fused import build_fused
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
d = f"/tmp/kg_bench_fixtures_sharded_{n_docs}"
ensure_fixtures(d, n_docs, shards=64)  # parallel scan: one split per shard
spark = get_spark(app_name=f"scale{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
# bench shards are ~100s of KB; default 128MB binning would serialize the scan
spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
spark.conf.set("spark.sql.files.openCostInBytes", str(64 << 10))
spark.sparkContext.setLogLevel("ERROR")

pages = spark.read.parquet(f"{d}/pages.parquet")
# warm-up: codegen + python worker pool, tiny slice
wl, wt = build_fused(spark, pages.limit(64), d)
wt.count()

# min-of-3: this box carries variable background load (other tenants);
# the minimum wall is the closest to the contention-free cost of the job
walls = []
for _ in range(3):
    linked, triples = build_fused(spark, pages, d)
    linked = linked.persist()
    t0 = time.time()
    n_linked = linked.filter(F.col("rank") == 0).count()
    n_triples = triples.count()
    walls.append(time.time() - t0)
    linked.unpersist()
wall = min(walls)
print(json.dumps({"cpus": cpus, "docs": n_docs, "wall_sec": round(wall, 2),
                  "walls": [round(w, 2) for w in walls],
                  "docs_per_sec": round(n_docs / wall, 1),
                  "n_linked": n_linked, "n_triples": n_triples,
                  "triples_per_sec": round(n_triples / wall, 2)}))
"""


def run_level(cpus: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cpus), str(n_docs)],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += 1
    return x


def cpu_ceiling(n_lo: int, n_hi: int) -> float:
    """Pure-Python multiprocessing speedup n_lo -> n_hi procs — the hardware
    ceiling any Python-heavy job can reach on this box."""
    rates = {}
    for n in (n_lo, n_hi):
        with mp.Pool(n) as p:
            t0 = time.time()
            total = sum(p.map(_burn, range(n)))
            rates[n] = total / (time.time() - t0)
    return rates[n_hi] / rates[n_lo]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_hi = n_lo * mult
    ceiling = cpu_ceiling(n_lo, n_hi)
    print(f"hardware ceiling {n_lo}->{n_hi} procs: {ceiling:.2f}x")
    lo = run_level(n_lo, n_docs)
    print(f"local[{n_lo}]:", json.dumps(lo))
    hi = run_level(n_hi, n_docs)
    print(f"local[{n_hi}]:", json.dumps(hi))
    speedup = lo["wall_sec"] / hi["wall_sec"]
    eff = speedup / mult
    report = {
        "n_docs": n_docs, "n_lo": n_lo, "n_hi": n_hi,
        "lo": lo, "hi": hi,
        "hardware_ceiling_speedup": round(ceiling, 3),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))
    # preserve hand-written sections (sustained throughput, reference
    # comparison) below the generated scaling block
    bench_path = os.path.join(REPO, "BENCH.md")
    tail = ""
    if os.path.exists(bench_path):
        prev = open(bench_path).read()
        idx = prev.find("\n## Sustained")
        if idx >= 0:
            tail = prev[idx:]
    with open(bench_path, "w") as f:
        f.write(
            "# BENCH — two-parallelism scaling evidence (north rule N vs 4N)\n\n"
            "Identical fused KG-pipeline job (HTML → text → chunk → NER → link →\n"
            "triples; one narrow mapInPandas, shuffles only in the triples\n"
            "aggregation) on the identical deterministic fixture corpus at two\n"
            "local parallelism levels, fresh JVM each, measured after a warm-up\n"
            "run (session startup and corpus-independent KB broadcast excluded).\n\n"
            f"- corpus: {n_docs} pages (seed-fixed, FIXTURES.md), 64 parquet shards\n"
            f"- hardware note: a pure-Python CPU burn scales {ceiling:.2f}x from "
            f"{n_lo} to {n_hi} processes on this box (SMT/turbo), which bounds any "
            "Python-heavy job's achievable speedup\n\n"
            f"| level | wall (s) | docs/s | triples/s |\n|---|---|---|---|\n"
            f"| local[{n_lo}] (N) | {lo['wall_sec']} | {lo['docs_per_sec']} | {lo['triples_per_sec']} |\n"
            f"| local[{n_hi}] (4N) | {hi['wall_sec']} | {hi['docs_per_sec']} | {hi['triples_per_sec']} |\n\n"
            f"**speedup N→4N: {report['speedup']}x; scaling efficiency "
            f"(T_N/T_4N)/4 = {report['scaling_efficiency']}** "
            f"(target ≥ 0.8: {'PASS' if report['pass'] else 'FAIL'}; "
            f"hardware ceiling {ceiling/mult:.2f})\n\n"
            "Run: `python tools/bench_scaling.py [n_docs] [N] [mult]`\n"
            + tail
        )
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
