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


def personalized_pagerank(edges: DataFrame, seeds: list[str],
                          iterations: int = ITERATIONS,
                          damping: float = DAMPING, src_col: str = "src",
                          dst_col: str = "dst") -> DataFrame:
    """Personalized PageRank: teleport mass restarts at ``seeds`` instead
    of uniformly, so rank measures RELATEDNESS TO THE SEED SET rather than
    global importance — the corpus-level analogue of the reference's
    per-request entity-relatedness ranking (entity_linking.py rel-ranking
    scores candidates by connections to the OTHER entities in the
    document; PPR from those entities is the principled closure of that
    heuristic, cf. Haveliwala 2002).

        r'(v) = (1-d)*s(v) + d * ( sum_{u->v} r(u)/outdeg(u) + dangling*s(v) )

    with s(v) = 1/|seeds| on the seeds, 0 elsewhere; dangling mass also
    restarts at the seeds (the standard PPR convention — mass never leaks
    to unrelated nodes).  Nodes outside the seeds' forward ball keep rank
    exactly 0, which is what makes the operator cheap in practice: the
    support of the vector is the reachable set, not the corpus.

    Same execution shape as :func:`pagerank` (distinct edges persisted
    once, per-iteration join + groupBy on node id, localCheckpoint lineage
    cut, scalar dangling aggregate).  ``seeds`` is a small literal list —
    the teleport indicator compiles to an ``isin`` codegen expression, no
    extra join.
    """
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed list")
    k = float(len(seeds))
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    spark = edges.sparkSession
    seed_nodes = spark.createDataFrame([(s,) for s in seeds], "node string")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(seed_nodes)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tp = F.when(F.col("node").isin(seeds), F.lit(1.0 / k)).otherwise(F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("outd"))

    ranks = nodes.select("node", tp.alias("rank")).localCheckpoint(eager=True)
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
                    F.lit(1.0 - damping) * tp
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling) * tp)
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


def ppr_oracle_sql(edges_sql: str, seeds: list[str],
                   iterations: int = ITERATIONS,
                   damping: float = DAMPING) -> str:
    """Unrolled DuckDB SQL for :func:`personalized_pagerank` — one shared
    recurrence definition, same AS-MATERIALIZED rationale as
    :func:`pagerank_oracle_sql`."""
    d = damping
    k = float(len(seeds))
    seed_vals = ", ".join(f"('{s}')" for s in seeds)
    seed_in = ", ".join(f"'{s}'" for s in seeds)
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION "
        f"SELECT dst FROM e UNION SELECT * FROM (VALUES {seed_vals}) sv(node))",
        "deg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS outd FROM e GROUP BY src)",
        f"tp AS MATERIALIZED (SELECT node, CASE WHEN node IN ({seed_in}) "
        f"THEN 1.0 / {k} ELSE 0.0 END AS s FROM nodes)",
        "r0 AS MATERIALIZED (SELECT node, s AS rank FROM tp)",
    ]
    for i in range(1, iterations + 1):
        p, c = f"r{i - 1}", f"r{i}"
        parts.append(
            f"{c} AS MATERIALIZED (SELECT tp.node, "
            f"(1 - {d}) * tp.s + {d} * (coalesce(ctb.contrib, 0) + dang.m * tp.s) AS rank "
            f"FROM tp CROSS JOIN ("
            f"  SELECT coalesce(sum(rank), 0) AS m FROM {p} "
            f"  LEFT JOIN deg ON {p}.node = deg.src WHERE deg.src IS NULL) dang "
            f"LEFT JOIN ("
            f"  SELECT e.dst AS node, sum({p}.rank / deg.outd) AS contrib "
            f"  FROM {p} JOIN e ON {p}.node = e.src "
            f"  JOIN deg ON e.src = deg.src GROUP BY e.dst) ctb "
            f"ON tp.node = ctb.node)"
        )
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, round(rank, 6) AS rank FROM r{iterations}"
