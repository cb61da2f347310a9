"""Graph-shape analytics over the KG edge list: triangles, clustering
coefficients, HITS hubs/authorities, label-propagation communities.

The reference's connection heuristics (``entity_linking.py`` rel-ranking,
``wiki_parser.py:339-368`` find_connection/find_intersection) are local
probes around one request's entities; a corpus-level construction pipeline
also wants the GLOBAL shape of the graph it just built — how clustered a
neighborhood is (triangle density separates an organic entity cluster from
a spam star), and which nodes act as hubs vs authorities in the directed
claim structure.  Both are standard graph-mining passes (Kleinberg 1999
for HITS; Suri & Vassilvitskii 2011 for MapReduce triangle counting) that
complement :mod:`pagerank` (importance) and :mod:`canonicalize`
(components).

Execution shapes, chosen for the 10^10-edge case:

- **Triangles** use the degree-orientation trick: orient every undirected
  edge from its (degree, id)-smaller endpoint to the larger one.  The
  orientation is acyclic and every triangle has exactly one node with two
  out-edges in it, so one self-join of the oriented list on ``src``
  (wedges) plus one semi-join of the wedge's far pair against the oriented
  list counts each triangle once — and the self-join fan-out per node is
  ``min(deg, sqrt(m))``-ish instead of celebrity-degree^2, the whole point
  of orienting (total work O(m^{3/2}) worst case).  Two hash shuffles:
  one on ``src`` for the wedge join, one on the (lo, hi) pair for the
  closing check.  AQE's skew split covers the residual heavy apexes.
- **HITS** is the same iterate-join-aggregate shape as :mod:`pagerank`:
  per iteration one join+groupBy on ``src`` and one on ``dst``, the rank
  vectors ``localCheckpoint``-ed (persist alone re-walks the whole lineage
  each analyzer pass — measured in pagerank.py's docstring), and the L1
  normalizer taken as a scalar action on the already-materialized vector.
  Fixed iteration count so the result is a pure function of (edges,
  iterations) the DuckDB oracle can certify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

HITS_ITERATIONS = 10


def _undirected(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Distinct canonical (lo, hi) pairs, self-loops dropped — the simple
    undirected graph both triangle functions count on."""
    s, d = F.col(src_col).cast("string"), F.col(dst_col).cast("string")
    return (
        edges.select(F.least(s, d).alias("lo"), F.greatest(s, d).alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, src_col: str = "src",
                    dst_col: str = "dst") -> DataFrame:
    """Per-node triangle participation over the undirected simple graph.

    Returns (node, degree, n_tri, coeff) for EVERY distinct endpoint —
    nodes in no triangle get ``n_tri = 0`` — where ``coeff`` is the local
    clustering coefficient ``2*n_tri / (degree*(degree-1))`` (0.0 when
    degree < 2), rounded to 6 places.

    Direction and edge multiplicity are ignored (a cites b and b cites a
    is ONE relationship for shape purposes); self-loops never form
    triangles and are dropped.
    """
    und = _undirected(edges, src_col, dst_col).persist(StorageLevel.MEMORY_AND_DISK)

    deg = (
        und.select(F.col("lo").alias("node"))
        .unionByName(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg.count()  # materialize before und is re-read by the joins below

    # orient by (degree, id): strictly acyclic total order
    o = (
        und.join(deg.withColumnRenamed("node", "lo")
                    .withColumnRenamed("degree", "dlo"), "lo")
        .join(deg.withColumnRenamed("node", "hi")
                 .withColumnRenamed("degree", "dhi"), "hi")
        .select(
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("src"), F.col("hi").alias("dst")),
            ).otherwise(
                F.struct(F.col("hi").alias("src"), F.col("lo").alias("dst"))
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # wedges at the orientation-minimal apex; close against the oriented
    # list (exactly one of (v,w)/(w,v) can be oriented, so no double count)
    a, b = o.alias("a"), o.alias("b")
    wedges = a.join(b, F.col("a.src") == F.col("b.src")).filter(
        F.col("a.dst") < F.col("b.dst")
    ).select(
        F.col("a.src").alias("u"),
        F.col("a.dst").alias("v"),
        F.col("b.dst").alias("w"),
    )
    closing = und.select(F.col("lo").alias("cl"), F.col("hi").alias("ch"))
    tris = wedges.join(
        closing,
        (F.least("v", "w") == F.col("cl")) & (F.greatest("v", "w") == F.col("ch")),
        "left_semi",
    )
    per_node = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    out = (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0 * F.coalesce("n_tri", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1.0)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("coeff"),
        )
        .localCheckpoint(eager=True)
    )
    for df in (o, deg, und):
        df.unpersist()
    return out


def triangles_oracle_sql(edges_sql: str) -> str:
    """DuckDB equivalent of :func:`triangle_counts` — counted the naive
    canonical way (a<b<c three-way join), which must equal the oriented
    count; sharing only the DEFINITION, not the plan, is the point of the
    oracle."""
    return f"""
    WITH raw AS ({edges_sql}),
    und AS (
      SELECT DISTINCT least(src::VARCHAR, dst::VARCHAR) AS lo,
                      greatest(src::VARCHAR, dst::VARCHAR) AS hi
      FROM raw WHERE src::VARCHAR <> dst::VARCHAR
    ),
    deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT lo AS node FROM und UNION ALL SELECT hi FROM und
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM und e1
      JOIN und e2 ON e2.lo = e1.hi
      JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    per_node AS (
      SELECT node, count(*) AS n_tri FROM (
        SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT deg.node, deg.degree, coalesce(per_node.n_tri, 0) AS n_tri,
           round(CASE WHEN deg.degree >= 2 THEN
                   2.0 * coalesce(per_node.n_tri, 0)
                     / (deg.degree * (deg.degree - 1.0))
                 ELSE 0.0 END, 6) AS coeff
    FROM deg LEFT JOIN per_node USING (node)
    """


def hits(edges: DataFrame, iterations: int = HITS_ITERATIONS,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Kleinberg HITS over the directed graph: (node, hub, auth), each
    vector L1-normalized (sums to 1) per iteration, rounded to 6 places.

    Update order is the classic one — authorities from the previous hubs,
    then hubs from the NEW authorities — so one iteration is two
    join+groupBy shuffles on node id.  Every distinct endpoint appears in
    the output (sinks have hub 0, sources auth 0 after the first round).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
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
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )

    hub = nodes.select("node", F.lit(1.0 / n).alias("hub")).localCheckpoint(
        eager=True
    )
    auth = None
    for _ in range(iterations):
        # auth(v) = sum_{u->v} hub(u), then L1-normalize
        raw_a = (
            hub.join(e, hub["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        auth = nodes.join(raw_a, nodes["node"] == raw_a["dst"], "left").select(
            "node", F.coalesce("s", F.lit(0.0)).alias("auth")
        ).localCheckpoint(eager=True)
        tot_a = auth.agg(F.sum("auth")).first()[0] or 1.0
        auth = auth.select(
            "node", (F.col("auth") / F.lit(tot_a)).alias("auth")
        ).localCheckpoint(eager=True)
        # hub(u) = sum_{u->v} auth(v), then L1-normalize
        raw_h = (
            auth.join(e, auth["node"] == e["dst"])
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
        )
        hub = nodes.join(raw_h, nodes["node"] == raw_h["src"], "left").select(
            "node", F.coalesce("s", F.lit(0.0)).alias("hub")
        ).localCheckpoint(eager=True)
        tot_h = hub.agg(F.sum("hub")).first()[0] or 1.0
        hub = hub.select(
            "node", (F.col("hub") / F.lit(tot_h)).alias("hub")
        ).localCheckpoint(eager=True)

    out = (
        hub.join(auth, "node")
        .select(
            "node",
            F.round("hub", 6).alias("hub"),
            F.round("auth", 6).alias("auth"),
        )
        .localCheckpoint(eager=True)
    )
    for df in (nodes, e):
        df.unpersist()
    return out


LPA_ITERATIONS = 5


def label_propagation(edges: DataFrame, iterations: int = LPA_ITERATIONS,
                      src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over the undirected simple graph: (node, community).

    Every node starts labelled with itself; each round it adopts the label
    most frequent among its neighbors, ties broken by the lexicographically
    smallest label — a total order, so the result is a pure function of
    (edges, iterations) the oracle can certify.  Fixed iteration count by
    design: synchronous LPA can two-cycle on bipartite structures (the
    known failure mode), so convergence detection would not terminate;
    bounded rounds make the answer deterministic instead, and community
    quality plateaus within ~5 rounds on social-shaped graphs (the paper's
    observation).

    Scale shape: the adjacency is built once (both directions of the
    deduped undirected edge list) and persisted; each round is ONE
    join+groupBy pair — labels joined to the adjacency on the neighbor
    end, counts reduced per (node, label) with map-side partial agg, then
    the (count desc, label asc) argmax taken as a min-of-struct aggregate
    (no window, so no per-node sort materialization).  Labels are
    ``localCheckpoint``-ed per round like pagerank/HITS (persist alone
    re-walks the whole lineage each analyzer pass).  Celebrity nodes are
    per-(node,label) count rows — bounded by distinct neighbor labels,
    already collapsed map-side — not per-neighbor rows.
    """
    und = _undirected(edges, src_col, dst_col)
    adj = (
        und.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
        .unionByName(
            und.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        adj.select("node").distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        nbr_labels = adj.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "label")
        labels = (
            nbr_labels.groupBy("node", "label")
            .agg(F.count("*").alias("c"))
            .groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l"))
                ).alias("best")
            )
            .select("node", F.col("best.l").alias("label"))
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def kcore(edges: DataFrame, k: int = 2, src_col: str = "src",
          dst_col: str = "dst", max_rounds: int = 50) -> DataFrame:
    """The k-core of the undirected simple graph: the maximal subgraph in
    which every node has degree >= k, computed by iterated peeling
    (delete all nodes with degree < k; repeat to fixpoint).  Returns
    (node, degree) for surviving nodes — ``degree`` is the degree INSIDE
    the core.

    Spark shape: per round one degree aggregation over the surviving
    edge list and one semi-join to drop edges touching peeled nodes,
    localCheckpoint-ed (the iterative-loop lineage rule); the loop stops
    when a round peels nothing (node count is the per-round scalar
    action).  Peeling is monotone and idempotent after convergence, which
    is what lets :func:`kcore_oracle_sql` unroll a FIXED round count and
    still be exact: extra rounds are no-ops.  ``max_rounds`` bounds the
    worst case (a path graph peels one layer per round; real KGs converge
    in a handful) — exhausting it RAISES rather than returning the
    partially-peeled graph, which would be a wrong answer.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = _undirected(edges, src_col, dst_col)
    adj = (
        und.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
        .unionByName(
            und.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
        )
        .localCheckpoint(eager=True)
    )
    n_prev = adj.select("node").distinct().count()
    converged = n_prev == 0
    for _ in range(max_rounds):
        alive = (
            adj.groupBy("node").agg(F.count("*").alias("degree"))
            .filter(F.col("degree") >= k)
            .select("node")
        )
        adj = (
            adj.join(alive, "node", "semi")
            .join(alive.withColumnRenamed("node", "nbr"), "nbr", "semi")
            .localCheckpoint(eager=True)
        )
        n_now = adj.select("node").distinct().count()
        if n_now == n_prev:
            converged = True
            break
        n_prev = n_now
        if n_now == 0:
            converged = True
            break
    if not converged:
        # returning the partially-peeled graph would be a WRONG k-core
        # (surviving low-degree nodes) — fail loudly instead
        raise RuntimeError(
            f"k-core peeling did not converge within {max_rounds} rounds "
            f"({n_prev} nodes still alive); raise max_rounds — long induced "
            "paths peel one layer per round"
        )
    return adj.groupBy("node").agg(F.count("*").alias("degree"))


def kcore_oracle_sql(edges_sql: str, k: int = 2, rounds: int = 12) -> str:
    """Unrolled DuckDB equivalent of :func:`kcore` — ``rounds`` fixed peel
    rounds (exact whenever the graph converges within them; extra rounds
    are no-ops by idempotence)."""
    parts = [
        f"""WITH und AS MATERIALIZED (
          SELECT DISTINCT least(src::VARCHAR, dst::VARCHAR) AS lo,
                          greatest(src::VARCHAR, dst::VARCHAR) AS hi
          FROM ({edges_sql}) WHERE src::VARCHAR <> dst::VARCHAR)""",
        "a0 AS MATERIALIZED (SELECT lo AS node, hi AS nbr FROM und "
        "UNION ALL SELECT hi, lo FROM und)",
    ]
    for i in range(1, rounds + 1):
        p, a = f"a{i - 1}", f"a{i}"
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT node FROM {p} "
            f"GROUP BY node HAVING count(*) >= {k})"
        )
        parts.append(
            f"{a} AS MATERIALIZED (SELECT t.node, t.nbr FROM {p} t "
            f"JOIN k{i} x ON t.node = x.node "
            f"JOIN k{i} y ON t.nbr = y.node)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, count(*) AS degree FROM a{rounds} GROUP BY node"
    )


def lpa_oracle_sql(edges_sql: str, iterations: int = LPA_ITERATIONS) -> str:
    """Unrolled DuckDB equivalent of :func:`label_propagation` — one
    MATERIALIZED CTE per round, argmax spelled as a row_number window
    (different plan, same (count desc, label asc) total order)."""
    parts = [
        f"""WITH und AS MATERIALIZED (
          SELECT DISTINCT least(src::VARCHAR, dst::VARCHAR) AS lo,
                          greatest(src::VARCHAR, dst::VARCHAR) AS hi
          FROM ({edges_sql}) WHERE src::VARCHAR <> dst::VARCHAR)""",
        "adj AS MATERIALIZED (SELECT lo AS node, hi AS nbr FROM und "
        "UNION ALL SELECT hi, lo FROM und)",
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM adj)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT node, label FROM ("
            f"  SELECT a.node, l.label, "
            f"    row_number() OVER (PARTITION BY a.node "
            f"      ORDER BY count(*) DESC, l.label ASC) AS rn "
            f"  FROM adj a JOIN l{i - 1} l ON a.nbr = l.node "
            f"  GROUP BY a.node, l.label) WHERE rn = 1)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, label AS community FROM l{iterations}"
    )


def hits_oracle_sql(edges_sql: str, iterations: int = HITS_ITERATIONS) -> str:
    """Unrolled DuckDB equivalent of :func:`hits` — one MATERIALIZED CTE
    pair per iteration (same reason as pagerank_oracle_sql: plain CTEs
    re-inline exponentially)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "h0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS hub FROM nodes, nn)",
    ]
    for i in range(1, iterations + 1):
        p, a, h = f"h{i - 1}", f"a{i}", f"h{i}"
        parts.append(
            f"{a}_raw AS MATERIALIZED (SELECT nodes.node, "
            f"coalesce(s.s, 0) AS auth FROM nodes LEFT JOIN ("
            f"  SELECT e.dst AS node, sum({p}.hub) AS s "
            f"  FROM {p} JOIN e ON {p}.node = e.src GROUP BY e.dst) s "
            f"USING (node))"
        )
        parts.append(
            f"{a} AS MATERIALIZED (SELECT node, auth / t.t AS auth "
            f"FROM {a}_raw, (SELECT CASE WHEN sum(auth) = 0 THEN 1.0 "
            f"ELSE sum(auth) END AS t FROM {a}_raw) t)"
        )
        parts.append(
            f"{h}_raw AS MATERIALIZED (SELECT nodes.node, "
            f"coalesce(s.s, 0) AS hub FROM nodes LEFT JOIN ("
            f"  SELECT e.src AS node, sum({a}.auth) AS s "
            f"  FROM {a} JOIN e ON {a}.node = e.dst GROUP BY e.src) s "
            f"USING (node))"
        )
        parts.append(
            f"{h} AS MATERIALIZED (SELECT node, hub / t.t AS hub "
            f"FROM {h}_raw, (SELECT CASE WHEN sum(hub) = 0 THEN 1.0 "
            f"ELSE sum(hub) END AS t FROM {h}_raw) t)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT h{iterations}.node, round(h{iterations}.hub, 6) AS hub, "
        f"round(a{iterations}.auth, 6) AS auth "
        f"FROM h{iterations} JOIN a{iterations} USING (node)"
    )


def neighbor_jaccard(edges: DataFrame, min_shared: int = 1,
                     threshold: float = 0.0,
                     max_neighbor_degree: int | None = None,
                     src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Structural entity similarity: Jaccard over undirected neighbor
    sets — the entity-RESOLUTION candidate scorer (two QIDs describing
    the same thing share birthplace/occupation/country edges even when
    their labels disagree; the alias-clustering CC in canonicalize.py
    needs a label bridge, this needs none).

    Candidate pairs come from an inverted index on the SHARED neighbor
    (self-join of the adjacency on the neighbor column, lo < hi), so only
    entities with >= 1 common neighbor are ever compared — the same
    never-materialize-n^2 shape as dedup.ngram_jaccard_pairs, with the
    same knob for its known hot spot: a hub neighbor of degree d
    contributes d-choose-2 candidate pairs while carrying almost no
    resolution signal (everyone is near the USA), so
    ``max_neighbor_degree`` drops hub CONNECTORS above the cap before the
    self-join (their edges still count toward each endpoint's degree —
    only pair GENERATION skips them, which makes the reported jaccard a
    lower bound for pairs that only shared hubs would have connected, and
    exact for every pair the index does emit... except shared-hub
    overlap is excluded from n_shared too; the cap therefore changes the
    metric's definition, which is why it defaults OFF and the contract
    row runs exact).

    Returns (ent_a, ent_b, n_shared, deg_a, deg_b, jaccard) with
    ent_a < ent_b, jaccard = shared / (deg_a + deg_b - shared),
    filtered to n_shared >= min_shared and jaccard >= threshold.

    Scale: adjacency built once (distinct symmetric pairs); degrees are a
    partial-agg groupBy; the self-join keys on the neighbor, so skew ==
    hub degree and the cap bounds fan-out at sum(min(deg, cap)^2);
    the pair aggregation groupBy(ent_a, ent_b) is map-side combinable.
    """
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    und = _undirected(edges, src_col, dst_col)
    adj = und.select(
        F.col("lo").alias("ent"), F.col("hi").alias("nbr")
    ).union(und.select(F.col("hi").alias("ent"), F.col("lo").alias("nbr")))
    deg = adj.groupBy("ent").agg(F.count("*").alias("deg"))
    connectors = adj
    if max_neighbor_degree is not None:
        hubs = deg.filter(F.col("deg") > max_neighbor_degree).select(
            F.col("ent").alias("nbr")
        )
        connectors = adj.join(F.broadcast(hubs), "nbr", "left_anti")
    a = connectors.select(F.col("ent").alias("ent_a"), "nbr")
    b = connectors.select(F.col("ent").alias("ent_b"), "nbr")
    shared = (
        a.join(b, "nbr")
        .filter(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared
        .join(deg.select(F.col("ent").alias("ent_a"), F.col("deg").alias("deg_a")), "ent_a")
        .join(deg.select(F.col("ent").alias("ent_b"), F.col("deg").alias("deg_b")), "ent_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("ent_a", "ent_b", "n_shared", "deg_a", "deg_b", "jaccard")
    )


def neighbor_jaccard_oracle_sql(edges_sql: str, min_shared: int = 1,
                                threshold: float = 0.0) -> str:
    """DuckDB rendition of the exact (uncapped) neighbor-Jaccard —
    generated beside the operator so both engines share one definition
    of the neighbor set (undirected, deduped, self-loops dropped)."""
    return f"""
        WITH e AS ({edges_sql}),
        und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
                FROM e WHERE src <> dst),
        adj AS (SELECT lo AS ent, hi AS nbr FROM und
                UNION ALL SELECT hi, lo FROM und),
        deg AS (SELECT ent, count(*) AS deg FROM adj GROUP BY ent),
        shared AS (
            SELECT a.ent AS ent_a, b.ent AS ent_b, count(*) AS n_shared
            FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.ent < b.ent
            GROUP BY a.ent, b.ent HAVING count(*) >= {min_shared})
        SELECT ent_a, ent_b, n_shared, da.deg AS deg_a, db.deg AS deg_b,
               round(n_shared / (da.deg + db.deg - n_shared), 6) AS jaccard
        FROM shared
        JOIN deg da ON da.ent = ent_a
        JOIN deg db ON db.ent = ent_b
        WHERE round(n_shared / (da.deg + db.deg - n_shared), 6) >= {threshold}
    """
