"""k-NN graph construction + GraphSAGE-style neighbor feature aggregation.

The GNN training-data last mile: walks.py emits skip-gram corpora and
bounded fan-outs over an EXISTING edge set; this module (a) builds an
edge set from an embedding column when the corpus has none (the k-NN
graph every graph-based curation / clustering / label-propagation recipe
starts from), and (b) runs one message-passing layer — per node, the
elementwise aggregate of its neighbors' feature vectors — which is both
the GraphSAGE layer-0 feature and the classic "smoothed embedding"
feature for near-dup clustering.

Scale shape:
- :func:`knn_graph` delegates pair generation to the tiled-matmul exact
  scan (``dedup.embedding_dup_pairs`` — O(n^2) by definition, the
  correctness baseline).  At corpus scale swap the candidate generator
  for ``annindex``'s LSH/IVF probes: the top-k cut here is unchanged, it
  only assumes (src, dst, cos_sim) candidate rows.  The ``floor``
  threshold bounds pair materialization; the per-src ranking window has
  the usual head-skew escape (``salt=``, the exact two-stage cut — one
  (src, dst) pair is one row, so a partial cut per hash bucket can never
  drop a global top-k member; same argument as
  kgquery.top_objects_per_subject).
- :func:`neighbor_feature_agg` compiles the layer to ``dim`` per-column
  avg/max aggregates — partial-aggregation-safe, so a celebrity node's
  10^7 messages collapse map-side.  It deliberately NEVER
  ``collect_list``s vectors into one task (the naive shape that OOMs on
  hubs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def knn_graph(embeddings: DataFrame, k: int = 5, floor: float = 0.3,
              id_col: str = "vec_id", vec_col: str = "embedding",
              n_blocks: int = 16, salt: int | None = None) -> DataFrame:
    """Exact k-NN graph over an embedding column: per vector, its ``k``
    most cosine-similar neighbors among pairs whose exact (unrounded)
    cosine is >= ``floor``, as (src, dst, cos_sim, rank) — cos_sim
    round(·,6), rank ordered by (cos_sim desc, dst asc) so the cut is a
    pure function of the data.  Symmetric by construction before the
    cut (an a→b candidate is also b→a), so rank is per-direction like
    every k-NN-graph consumer expects; nodes with no pair above the
    floor are absent (isolated in the k-NN graph)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from entity_extraction_svc_spark.operators.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        embeddings, threshold=floor, id_col=id_col, vec_col=vec_col,
        n_blocks=n_blocks,
    )
    # symmetrize by EXPLODING each pair into both directions rather
    # than a self-union — a union references the pairs subplan twice,
    # which re-executes the tiled matmul (review-pass find); explode
    # scans it once
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"),
                    F.col("id_b").alias("dst"),
                    F.col("cos_sim"),
                ),
                F.struct(
                    F.col("id_b").alias("src"),
                    F.col("id_a").alias("dst"),
                    F.col("cos_sim"),
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst", "_e.cos_sim")
    from pyspark.sql.window import Window

    order = [F.desc("cos_sim"), F.asc("dst")]
    if salt:
        pre = Window.partitionBy(
            "src", F.pmod(F.xxhash64(F.col("dst").cast("string")), F.lit(salt))
        ).orderBy(*order)
        sym = (
            sym.withColumn("_r", F.row_number().over(pre))
            .filter(F.col("_r") <= k)
            .drop("_r")
        )
    w = Window.partitionBy("src").orderBy(*order)
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cos_sim", "rank")
    )


def knn_graph_oracle_sql(k: int = 5, floor: float = 0.3,
                         table: str = "embeddings") -> str:
    """DuckDB rendition: same pair set (exact cosine >= floor on the
    UNROUNDED value, matching the Spark prefilter-then-round semantics),
    same (round-6 cos desc, dst asc) ranking order."""
    return f"""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM {table}
        ), pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_sum(list_transform(generate_series(1, len(a.v)),
                                         i -> a.v[i] * b.v[i]))
                 / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS c
          FROM e a JOIN e b ON a.vec_id < b.vec_id
        ), sym AS (
          SELECT id_a AS src, id_b AS dst, round(c, 6) AS cos_sim
          FROM pairs WHERE c >= {floor}
          UNION ALL
          SELECT id_b, id_a, round(c, 6) FROM pairs WHERE c >= {floor}
        )
        SELECT src, dst, cos_sim, rank FROM (
          SELECT src, dst, cos_sim, row_number() OVER (
            PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS rank
          FROM sym
        ) WHERE rank <= {k}
    """


def neighbor_feature_agg(edges: DataFrame, features: DataFrame, dim: int,
                         id_col: str = "vec_id", feat_col: str = "embedding",
                         agg: str = "mean") -> DataFrame:
    """One message-passing layer: for every ``src`` in ``edges``, the
    elementwise ``mean`` (or ``max``) of its neighbors' (``dst``'s)
    feature vectors, as (<id_col>, n_nbr, feat array<double> round-6).

    ``dim`` is the (known, fixed) feature width: the layer compiles to
    ``dim`` scalar avg/max aggregate columns re-assembled with
    ``F.array`` — every one partial-agg-safe, so the hot node's messages
    combine map-side and no task ever materializes a neighborhood's
    vector list.  Edges whose dst has no feature row drop out (inner
    join), mirroring how a GNN loader treats featureless nodes.
    """
    if agg not in ("mean", "max"):
        raise ValueError(f"agg must be mean|max, got {agg!r}")
    if dim < 1:
        raise ValueError("dim must be >= 1")
    fn = F.avg if agg == "mean" else F.max
    feats = features.select(
        F.col(id_col).alias("dst"), F.col(feat_col).alias("_f")
    )
    msgs = edges.select("src", "dst").join(feats, "dst")
    exprs = [
        F.round(fn(F.col("_f")[i].cast("double")), 6).alias(f"_d{i}")
        for i in range(dim)
    ]
    out = msgs.groupBy("src").agg(F.count("*").alias("n_nbr"), *exprs)
    return out.select(
        F.col("src").alias(id_col),
        "n_nbr",
        F.array(*[F.col(f"_d{i}") for i in range(dim)]).alias("feat"),
    )


def neighbor_feature_agg_oracle_sql(edges_sql: str, dim: int,
                                    agg: str = "mean",
                                    table: str = "embeddings") -> str:
    """DuckDB rendition (1-indexed arrays; same per-dimension
    round-6 aggregate, reassembled as a list)."""
    fn = "avg" if agg == "mean" else "max"
    dims = ", ".join(
        f"round({fn}(f.embedding[{i + 1}]::DOUBLE), 6)" for i in range(dim)
    )
    return f"""
        WITH ed AS ({edges_sql})
        SELECT ed.src AS vec_id, count(*) AS n_nbr, [{dims}] AS feat
        FROM ed JOIN {table} f ON ed.dst = f.vec_id
        GROUP BY ed.src
    """
