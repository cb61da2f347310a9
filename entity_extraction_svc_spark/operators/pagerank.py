"""PageRank over the knowledge-graph edge list (entity importance).

The reference ranks entities per-request by connection counts and
mention-frequency heuristics (``annotators/entity_extraction_base/src/
entity_linking.py`` rel-ranking, and the top-people / top-triplets caches,
``wiki_parser``); a corpus-level engine wants the global version: a
stationary importance score over the whole triple store, usable as a link
prior or an export ranking.  Classic damped PageRank with dangling-mass
redistribution (Page et al. 1999):

    r'(v) = (1-d)/N + d * ( sum_{u -> v} r(u)/outdeg(u) + dangling/N )

Execution shape (the one that survives a 10^10-edge graph):
  - edges are DISTINCT (src, dst) pairs; contributions are an equi-join of
    the rank vector to the edge list on ``src`` followed by a sum groupBy
    on ``dst`` — both shuffles hash-partition on node id, and AQE's skew
    split handles celebrity in-degree nodes.
  - the rank vector is ``localCheckpoint``-ed each iteration.  PERSIST IS
    NOT ENOUGH: a persisted DataFrame keeps its full logical plan, and
    the analyzer re-walks (and self-join-dedups) the whole lineage on
    every new iteration — measured per-iteration driver cost DOUBLES
    (1.2s, 1.0s, ..., 6.1s, 11.8s over 10 iterations on a 5-edge graph).
    localCheckpoint truncates the plan to the materialized RDD, making
    iterations O(1).  The executor-local tradeoff (state lost if an
    executor dies mid-run) is the standard one for iterative rank
    vectors; on an unreliable cluster point ``spark.sparkContext.
    setCheckpointDir`` at durable storage and swap in ``checkpoint()``.
  - the dangling mass is a scalar aggregate per iteration (an action on
    the already-materialized vector, not a collect of data rows).

Fixed iteration count (default 10) rather than convergence-delta: the
result is a pure function of (edges, iterations, damping) — deterministic
across engines, which is what the DuckDB oracle certifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

DAMPING = 0.85
ITERATIONS = 10


def pagerank(edges: DataFrame, iterations: int = ITERATIONS,
             damping: float = DAMPING, src_col: str = "src",
             dst_col: str = "dst") -> DataFrame:
    """Rank every node of the directed graph ``edges``.

    Returns (node, rank) for all distinct endpoints; ranks sum to ~1.
    Parallel edges collapse to one (distinct), self-loops participate
    normally.  The returned frame is small-per-node (2 columns) and
    unpersisted — callers writing it out pay one final shuffle at most.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count("*").alias("outd"))

    # lineage cut per iteration — see module docstring for why persist
    # alone makes iteration cost double
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        with_deg = ranks.join(deg, ranks["node"] == deg["src"], "left")
        dangling = with_deg.filter(F.col("outd").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).first()[0]
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outd")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select("node", F.round("rank", 6).alias("rank")).localCheckpoint(
        eager=True
    )
    for df in (nodes, e):
        df.unpersist()
    return out


def pagerank_oracle_sql(edges_sql: str, iterations: int = ITERATIONS,
                        damping: float = DAMPING) -> str:
    """The UNROLLED ANSI-SQL equivalent (DuckDB-ready) of :func:`pagerank`
    for a fixed iteration count — generated here so the Spark operator and
    its oracle share one definition of the recurrence.

    ``edges_sql`` must select columns (src, dst); duplicates are removed
    identically to the Spark side.
    """
    d = damping
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # iteration references its predecessor twice (dangling + contrib), so
    # un-materialized unrolling expands the tree 2^iterations times — the
    # planner never returns for 10 iterations.  Materialization makes the
    # oracle linear in `iterations`, mirroring the Spark side's per-
    # iteration localCheckpoint.
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS outd FROM e GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)",
    ]
    for i in range(1, iterations + 1):
        p, c = f"r{i - 1}", f"r{i}"
        parts.append(
            f"{c} AS MATERIALIZED (SELECT nodes.node, "
            f"(1 - {d}) / nn.n + {d} * (coalesce(ctb.contrib, 0) + dang.m / nn.n) AS rank "
            f"FROM nodes CROSS JOIN nn CROSS JOIN ("
            f"  SELECT coalesce(sum(rank), 0) AS m FROM {p} "
            f"  LEFT JOIN deg ON {p}.node = deg.src WHERE deg.src IS NULL) dang "
            f"LEFT JOIN ("
            f"  SELECT e.dst AS node, sum({p}.rank / deg.outd) AS contrib "
            f"  FROM {p} JOIN e ON {p}.node = e.src "
            f"  JOIN deg ON e.src = deg.src GROUP BY e.dst) ctb "
            f"ON nodes.node = ctb.node)"
        )
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, round(rank, 6) AS rank FROM r{iterations}"
