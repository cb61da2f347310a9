"""Distributed linear-classifier training in exact fixed-point arithmetic
— the template for training any row-wise document scorer (quality,
lang-id, toxicity) ON the cluster with bit-reproducible results.

Why fixed-point: float gradient sums are order-dependent, so a model
trained at N executors differs (in the last ulps, then — after enough
iterations — in behavior) from the same code at 4N.  That violates the
reproducibility bar this repo holds everything else to (md5-deterministic
dedup, integer HLL sums).  Here EVERY training quantity is an integer:

  - features are micros (value * 10^6) — BIGINT columns;
  - the per-row margin Σ w_j·x_j is a BIGINT (|w| stays ~10^6-scale, 5
    features → |margin| ≲ 5·10^12);
  - per-feature gradient sums Σ err·x_j are aggregated as DECIMAL(38,0)
    (exact, order-independent, no overflow below 10^38 — good past
    10^12 rows at worst-case feature magnitudes);
  - the learning-rate division is an exact FLOOR division (the shared
    subtract-pmod formulation both engines floor identically).

The result: full-batch gradient descent on squared loss whose weight
vector after T iterations is a pure function of the multiset of input
rows — independent of partitioning, executor count, and engine.  The
DuckDB oracle unrolls the same recurrence in CTEs (HUGEINT sums) and
matches bit-for-bit.

Scale shape: one scan of the persisted feature frame per iteration, a
5-value partial-agg-safe reduce (sums combine map-side), and a ~5-int
driver update — the sanctioned bounded scalar action (the pagerank /
HITS loop shape, with a k-sized reduce instead of a k-sized join).
Scoring is a pure projection (broadcast weights as literals).

Labels here are weak supervision: the default task distills the
row-local quality gate (textstats.quality_score >= 0.5) into a linear
scorer, giving a CONTINUOUS calibrated score where the gate is binary —
but `train_linear` takes any (features, y) frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.textstats import stat_exprs

SCALE = 1_000_000          # micros
FEATURES = ["x_bias", "x_len", "x_punct", "x_stop", "x_toklen"]
DEFAULT_ITERS = 16
LR_DEN = 2    # learning rate 1/2 in normalized feature units (measured
              # best on the documents table: acc .90, balanced acc .94
              # vs the .50 majority collapse the class weights prevent)


def _fdiv(a: Column, b: Column) -> Column:
    """Exact floor division for BIGINT-range operands: subtracting the
    nonnegative pmod makes the numerator an exact multiple, so the
    double-precision `/` is exact (|a| < 2^53) and floor == truncate."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, x_bias..x_toklen micros BIGINT, y) — integer features derived
    from the repo's shared per-document statistics (textstats.stat_exprs,
    already round(.,6) in both engines, so micros are exact) and the weak
    label y = [quality_score >= 0.5]."""
    e = stat_exprs(text_col)
    mtl_micros = F.least(F.round(e["mean_token_len"] * 1e6).cast("long"),
                         F.lit(10_000_000))
    return docs.select(
        F.col(id_col).alias("id"),
        F.lit(SCALE).cast("long").alias("x_bias"),
        (F.least(e["n_ws_tokens"], F.lit(400)) * 2500).cast("long").alias("x_len"),
        F.round(e["punct_ratio"] * 1e6).cast("long").alias("x_punct"),
        F.round(e["stopword_ratio"] * 1e6).cast("long").alias("x_stop"),
        # mean token len normalized by 10 then to micros: exact integer
        # floor of an exact integer (never a float .5 tie)
        _fdiv(mtl_micros, F.lit(10)).alias("x_toklen"),
        (e["quality_score"] >= 0.5).cast("long").alias("y"),
    )


def _margin(weights: list[int]) -> Column:
    m = F.lit(0).cast("long")
    for w, c in zip(weights, FEATURES):
        m = m + F.lit(int(w)) * F.col(c)
    return m


def _class_weights(n: int, pos: int) -> tuple[int, int]:
    """Integer cost-sensitive weights (cw_pos, cw_neg): the minority
    class is upweighted by the floor class ratio, so an imbalanced weak
    label (most web docs pass the quality gate) cannot collapse the
    model to the majority constant.  Pure integers — determinism holds."""
    neg = n - pos
    if pos == 0 or neg == 0:
        return 1, 1
    return (max(1, neg // pos), 1) if pos < neg else (1, max(1, pos // neg))


def train_linear(feats: DataFrame, iters: int = DEFAULT_ITERS,
                 lr_den: int = LR_DEN) -> list[int]:
    """Full-batch fixed-point GD on class-balanced squared loss; returns
    the weight vector (micros) after ``iters`` iterations.
    Deterministic: the only driver-side state is the k-int weight vector;
    each iteration is one scan + one k-column exact DECIMAL reduce."""
    if iters < 1 or lr_den < 1:
        raise ValueError("iters and lr_den must be >= 1")
    feats = feats.persist()
    n = feats.count()
    if n == 0:
        feats.unpersist()
        raise ValueError("empty training frame")
    pos = feats.filter(F.col("y") == 1).count()
    cw_pos, cw_neg = _class_weights(n, pos)
    n_eff = cw_pos * pos + cw_neg * (n - pos)
    cw = F.when(F.col("y") == 1, cw_pos).otherwise(cw_neg)
    w = [0] * len(FEATURES)
    for _ in range(iters):
        err = ((_fdiv(_margin(w), F.lit(SCALE)) - F.col("y") * SCALE)
               * cw).alias("_e")
        sums = feats.select(err, *FEATURES).agg(
            *[F.sum((F.col("_e") * F.col(c)).cast("decimal(38,0)")).alias(c)
              for c in FEATURES]
        ).collect()[0]
        # exact Python-bigint floor division == the SQL oracle's
        # subtract-mod // — both are mathematical floor
        w = [wj - int(sums[c]) // (lr_den * n_eff * SCALE)
             for wj, c in zip(w, FEATURES)]
    feats.unpersist()
    return w


def score_linear(feats: DataFrame, weights: list[int]) -> DataFrame:
    """(id, score micros BIGINT, y, pred) — the broadcast-weights
    projection; pred = [score >= 1/2] in micros."""
    score = _fdiv(_margin(weights), F.lit(SCALE))
    return feats.select(
        "id", score.alias("score"), "y",
        (score >= SCALE // 2).cast("long").alias("pred"),
    )


def train_quality_model(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", iters: int = DEFAULT_ITERS,
                        ) -> tuple[list[int], DataFrame]:
    """Distill the quality gate: returns (weights, scored frame)."""
    feats = quality_features(docs, text_col, id_col)
    w = train_linear(feats, iters)
    return w, score_linear(feats, w)


# ---------------------------------------------------------------------------
# DuckDB oracle
# ---------------------------------------------------------------------------

def _sql_fdiv(a: str, b: str) -> str:
    # same floor semantics: subtract the nonnegative mod, then exact
    # integer division (DuckDB // truncates, but the numerator is an
    # exact multiple so truncate == floor)
    return f"(({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b})"


def features_oracle_sql(stats_sql: str) -> str:
    """Feature frame from a stats SQL yielding (doc_id, n_ws_tokens,
    punct_ratio, stopword_ratio, mean_token_len, quality_score) — the
    repo's doc_stats rendition.  Micros are exact: the ratios are
    round(.,6) doubles identical in both engines."""
    mtl = "least(round(mean_token_len * 1e6)::BIGINT, 10000000)"
    return f"""
        SELECT doc_id AS id,
               {SCALE}::BIGINT AS x_bias,
               least(n_ws_tokens, 400)::BIGINT * 2500 AS x_len,
               round(punct_ratio * 1e6)::BIGINT AS x_punct,
               round(stopword_ratio * 1e6)::BIGINT AS x_stop,
               {_sql_fdiv(mtl, "10")} AS x_toklen,
               CASE WHEN quality_score >= 0.5 THEN 1 ELSE 0 END::BIGINT AS y
        FROM ({stats_sql})
    """


def train_oracle_sql(feats_sql: str, iters: int = DEFAULT_ITERS,
                     lr_den: int = LR_DEN) -> str:
    """The full training recurrence unrolled in CTEs (HUGEINT sums, same
    floor divisions), emitting part=w weight rows and part=score rows —
    the exact driver-row rendition of train_quality_model."""
    cols = FEATURES
    margin = " + ".join(f"{c} * w_{c}" for c in cols)
    w_cte = ", ".join(f"0::HUGEINT AS w_{c}" for c in cols)
    # same integer class-balance rule as _class_weights
    # clf_f MUST be materialized: every unrolled iteration references it,
    # and an inlined CTE would re-run the full feature scan (regex
    # tokenization over the corpus) once per iteration — measured 665s at
    # a 50k-doc scale point, 24x the materialized form
    ctes = [f"clf_f AS MATERIALIZED ({feats_sql})",
            "clf_n AS MATERIALIZED (SELECT count(*) AS n, sum(y) AS pos, "
            "count(*) - sum(y) AS neg FROM clf_f)",
            "clf_cw AS MATERIALIZED (SELECT CASE WHEN pos = 0 OR neg = 0 THEN 1 "
            "WHEN pos < neg THEN greatest(1, neg // pos) ELSE 1 END AS cw_pos, "
            "CASE WHEN pos = 0 OR neg = 0 THEN 1 "
            "WHEN pos < neg THEN 1 ELSE greatest(1, pos // neg) END AS cw_neg, "
            "n, pos, neg FROM clf_n)",
            f"cw0 AS (SELECT {w_cte})"]
    err = (f"({_sql_fdiv('margin', str(SCALE))} - y * {SCALE}) * "
           "(CASE WHEN y = 1 THEN (SELECT cw_pos FROM clf_cw) "
           "ELSE (SELECT cw_neg FROM clf_cw) END)")
    denom = (f"{lr_den} * (SELECT cw_pos * pos + cw_neg * neg FROM clf_cw) "
             f"* {SCALE}")
    for t in range(1, iters + 1):
        upd = ", ".join(
            f"max(w_{c}) - ({_sql_fdiv(f'sum(err * {c})', denom)}) AS w_{c}"
            for c in cols
        )
        ctes.append(
            f"p{t} AS (SELECT *, {err} AS err FROM "
            f"(SELECT clf_f.*, w.*, {margin} AS margin "
            f"FROM clf_f CROSS JOIN cw{t - 1} w))"
        )
        ctes.append(f"cw{t} AS (SELECT {upd} FROM p{t})")
    name_list = "', '".join(cols)
    weight_list = ", ".join(f"w_{c}" for c in cols)
    return f"""
        WITH {', '.join(ctes)},
        clf_scored AS (
          SELECT id, {_sql_fdiv('margin', str(SCALE))} AS score, y
          FROM (SELECT clf_f.*, w.*, {margin} AS margin
                FROM clf_f CROSS JOIN cw{iters} w)
        )
        SELECT 'w' AS part, fname AS k, CAST(fw AS BIGINT) AS v,
               NULL::BIGINT AS y, NULL::BIGINT AS pred
        FROM (SELECT unnest(['{name_list}']) AS fname,
                     unnest([{weight_list}]) AS fw
              FROM cw{iters})
        UNION ALL
        SELECT 'score', id, CAST(score AS BIGINT), y,
               CASE WHEN score >= {SCALE // 2} THEN 1 ELSE 0 END::BIGINT
        FROM clf_scored
    """
