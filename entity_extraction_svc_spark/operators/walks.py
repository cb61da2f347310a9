"""Deterministic random-walk corpora and neighbor fan-out sampling.

The KG-embedding training path already has filtered TransE negatives
(triples.negative_triples); DeepWalk/node2vec-style skip-gram training
needs the other input — a WALK CORPUS over the entity graph — and
GNN-style (GraphSAGE) training needs bounded per-node neighbor samples.
Both are "pseudo-random but pure functions of the data" here, the same
md5-derived-choice discipline every sampler in this repo uses
(sampling.hash_split, packing's md5 shuffle order, triples.negative_
triples): re-running the job, changing partitioning, or changing the
executor count never changes the corpus, so downstream training data is
reproducible and the DuckDB oracle can re-derive it exactly.

Reference tie-in: the reference service precomputes per-entity neighbor
caches for ranking (wiki_parser.py:72-125 top-people, :371-405
find_connection); these operators are that neighborhood machinery turned
into training-data emission, the last mile the north-star pipeline needs
between "triples materialized" and "embedding model trains".

Scale shape (10^12 triples):
- ``random_walks``: the edge table is deduped and hash-partitioned ONCE
  on ``src`` and persisted; each step is one frontier join against that
  cached layout plus a min-of-struct groupBy.  min(struct(h, dst)) is
  partial-aggregation-safe, so a celebrity node's 10^7-edge fan-out
  collapses map-side — no per-key window sort anywhere in the loop.
  Walk state is (start, walk, node): O(|starts| * num_walks) rows per
  round regardless of graph size.
- ``sample_neighbors``: one distinct + one ranking pass.  The ranking
  window is the documented skew point (one hot node = one task), so the
  exact salted two-stage cut from kgquery.top_objects_per_subject is
  available behind ``salt=`` with the same can't-drop-a-winner argument:
  each (src, dst) pair is exactly ONE row, so a partial top-k per
  (src, xxhash64(dst) % salt) bucket retains every global top-k member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hop_hash(step: int) -> F.Column:
    """md5('start|walk|step|dst') — the walk's choice key at ``step``.

    Keyed on (start, walk, step) so every walk makes an independent
    pseudo-random choice at every step, and on ``dst`` only (not the
    current node) so the key is computable on the joined row without
    widening the aggregate.  md5 is bit-identical in Spark and DuckDB,
    which is what lets walks_oracle_sql re-derive the corpus.
    """
    return F.md5(
        F.concat_ws(
            "|",
            F.col("start"),
            F.col("walk").cast("string"),
            F.lit(str(step)),
            F.col("dst"),
        )
    )


def random_walks(triples: DataFrame, num_walks: int = 2,
                 walk_length: int = 4, starts: DataFrame | None = None,
                 src_col: str = "subj", dst_col: str = "obj") -> DataFrame:
    """DeepWalk-style walk corpus: ``num_walks`` walks of up to
    ``walk_length`` hops from every start node, as rows
    (start, walk, step, node) — step 0 is the start itself.

    The next hop from node v for walk (start, walk) at step t is the
    out-neighbor y minimizing md5('start|walk|t|y') (dst asc tie-break;
    md5 collisions on sibling edges are not a practical concern, the
    tie-break just makes the definition total).  Uniformity per step is
    the standard hashing argument; determinism is by construction.
    Dead-end nodes truncate the walk (inner join drops the walker), the
    same convention gensim-style corpus builders use.

    ``starts`` defaults to every node with at least one out-edge; pass a
    1-column DataFrame to walk from a subset (e.g. only Q5 humans).
    """
    if num_walks < 1 or walk_length < 1:
        raise ValueError("num_walks and walk_length must be >= 1")
    edges = (
        triples.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .repartition("src")
        .persist()
    )
    spark = triples.sparkSession
    if starts is None:
        starts = edges.select(F.col("src").alias("start")).distinct()
    else:
        starts = starts.select(F.col(starts.columns[0]).alias("start")).distinct()
    walk_ids = spark.range(num_walks).select(F.col("id").cast("int").alias("walk"))
    cur = (
        starts.crossJoin(F.broadcast(walk_ids))
        .select("start", "walk", F.col("start").alias("node"))
        .localCheckpoint(eager=True)
    )
    steps = [cur.withColumn("step", F.lit(0))]
    for t in range(1, walk_length + 1):
        nxt = (
            cur.join(edges, cur["node"] == edges["src"])
            .select(
                "start",
                "walk",
                F.struct(_hop_hash(t).alias("h"), F.col("dst").alias("d")).alias("pick"),
            )
            .groupBy("start", "walk")
            .agg(F.min("pick").alias("pick"))
            .select("start", "walk", F.col("pick.d").alias("node"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        steps.append(nxt.withColumn("step", F.lit(t)))
        cur = nxt
    edges.unpersist()
    out = steps[0]
    for frame in steps[1:]:
        out = out.unionByName(frame)
    return out.select("start", "walk", "step", "node")


def walks_oracle_sql(triples_sql: str, num_walks: int = 2,
                     walk_length: int = 4) -> str:
    """The DuckDB rendition of the SAME walk definition, one CTE per
    step (the loop unrolled — the argmin is a row_number window instead
    of Spark's partial-agg min-of-struct, same total order).  Generated
    beside the operator so both engines share one choice rule."""
    hop = (
        "md5(w.start || '|' || CAST(w.walk AS VARCHAR) || '|' || '{t}' "
        "|| '|' || e.dst)"
    )
    ctes = [
        f"t AS ({triples_sql})",
        "e AS (SELECT DISTINCT subj AS src, obj AS dst FROM t)",
        "ws AS (SELECT CAST(x.range AS INT) AS walk FROM "
        f"range({num_walks}) x)",
        "c0 AS (SELECT s.start, ws.walk, s.start AS node FROM "
        "(SELECT DISTINCT src AS start FROM e) s CROSS JOIN ws)",
    ]
    selects = ["SELECT start, walk, 0 AS step, node FROM c0"]
    for t in range(1, walk_length + 1):
        ctes.append(
            f"c{t} AS (SELECT start, walk, node FROM ("
            f"SELECT w.start, w.walk, e.dst AS node, row_number() OVER ("
            f"PARTITION BY w.start, w.walk ORDER BY {hop.format(t=t)}, e.dst"
            f") AS r FROM c{t - 1} w JOIN e ON e.src = w.node) WHERE r = 1)"
        )
        selects.append(f"SELECT start, walk, {t} AS step, node FROM c{t}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def sample_neighbors(triples: DataFrame, k: int = 5,
                     salt: int | None = None, src_col: str = "subj",
                     dst_col: str = "obj") -> DataFrame:
    """GraphSAGE-style bounded fan-out: per node, its ``k``
    deterministic pseudo-random out-neighbors — the k smallest
    md5('src|dst') — as (src, dst, rank).  Nodes with <= k neighbors
    keep all of them, so a GNN data loader can treat the output as THE
    adjacency at fan-out k.

    ``salt`` enables the exact two-stage cut for head-entity skew
    (identical results, pinned in tests): partial top-k per
    (src, xxhash64(dst) % salt) first, so no single task ever sorts a
    celebrity's full neighbor list.  Same measured guidance as
    kgquery.top_objects_per_subject — flip it when one node's fan-out
    exceeds a task's sort memory, not for latency on a healthy box.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    pairs = (
        triples.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .withColumn("h", F.md5(F.concat_ws("|", F.col("src"), F.col("dst"))))
    )
    from pyspark.sql.window import Window

    order = [F.asc("h"), F.asc("dst")]
    if salt:
        pre = Window.partitionBy(
            "src", F.pmod(F.xxhash64("dst"), F.lit(salt))
        ).orderBy(*order)
        pairs = (
            pairs.withColumn("_r", F.row_number().over(pre))
            .filter(F.col("_r") <= k)
            .drop("_r")
        )
    w = Window.partitionBy("src").orderBy(*order)
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "rank")
    )


def fanout_oracle_sql(triples_sql: str, k: int = 5) -> str:
    """DuckDB rendition of sample_neighbors' total order (always the
    plain one-window form; the salted path is pinned equal Spark-side)."""
    return f"""
        WITH t AS ({triples_sql}),
        p AS (SELECT DISTINCT subj AS src, obj AS dst FROM t)
        SELECT src, dst, rank FROM (
            SELECT src, dst, row_number() OVER (
                PARTITION BY src ORDER BY md5(src || '|' || dst), dst
            ) AS rank FROM p
        ) WHERE rank <= {k}
    """
