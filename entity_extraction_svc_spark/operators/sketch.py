"""Count-min sketch: bounded-memory frequency estimation for head-key
(skew) telemetry.

Why this exists in a KG-construction engine: every skew decision in the
repo — salting the triples repartition, flipping top-k to the two-stage
cut, capping LSH buckets — needs to KNOW the head keys first, and at
10^12 rows an exact per-key count is itself a giant shuffle.  A
count-min sketch answers "which keys exceed f% of the stream" with
d x w counters (a few KB), one partial-agg-safe groupBy, and a
one-sided error guarantee: estimates never undercount, and overcount
by at most N*e/w with probability 1-(1/2)^d (Cormode & Muthukrishnan
2005).  Head-key detection then probes candidate keys (or every
distinct key of a SAMPLE) against the counters.

Determinism: bucket = md5-derived 60-bit hash of (row_index, key) mod
w — the repo's shared bit-reproducible hash (dedup._h64), so the
counters and estimates are pure functions of the data, identical in
Spark and the DuckDB oracle.

Scale shape: build explodes each row d times (d is 3-5) and groupBys
(row, bucket) — at most d*w output rows, partial aggregation collapses
the stream map-side, so the shuffle moves counters, not data.  Probing
joins candidates to the d*w counter frame (broadcast — it is KB-sized
by construction) and takes the min across rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.dedup import _h64


def _bucket(r: Column, key: Column, w: int) -> Column:
    return F.pmod(_h64(F.concat_ws("\x1f", r.cast("string"), key)), F.lit(w))


def countmin_build(df: DataFrame, key_col: str, w: int = 1024,
                   d: int = 4) -> DataFrame:
    """d x w counter table (r, b, n) for the stream of ``key_col``
    values (nulls excluded — they are not keys).  Output has at most
    d*w rows regardless of input size."""
    if w < 1 or d < 1:
        raise ValueError("w and d must be >= 1")
    rows = df.select(F.col(key_col).cast("string").alias("_k")).filter(
        F.col("_k").isNotNull()
    )
    ex = rows.select(
        "_k",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    return (
        ex.select("r", _bucket(F.col("r"), F.col("_k"), w).alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").alias("n"))
    )


def countmin_estimate(counters: DataFrame, keys: DataFrame, key_col: str,
                      w: int = 1024, d: int = 4) -> DataFrame:
    """Per-key count estimates: min over the d rows of the key's bucket
    counters (0 when a bucket was never hit).  ``w``/``d`` must match
    the build.  Returns (<key_col>, est).  est >= true count always;
    est is exact when no other key collides in some row."""
    if w < 1 or d < 1:
        raise ValueError("w and d must be >= 1")
    ks = keys.select(F.col(key_col).cast("string").alias("_k")).filter(
        F.col("_k").isNotNull()
    ).distinct()
    ex = ks.select(
        "_k", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r")
    ).select("_k", "r", _bucket(F.col("r"), F.col("_k"), w).alias("b"))
    return (
        ex.join(F.broadcast(counters), ["r", "b"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est"))
        .select(F.col("_k").alias(key_col), "est")
    )


def heavy_hitters(df: DataFrame, key_col: str, threshold: int,
                  w: int = 1024, d: int = 4) -> DataFrame:
    """Keys whose estimated count >= threshold — the salting decision
    input.  Probes the distinct keys of ``df`` against its own sketch;
    one-sided error means NO true heavy hitter is missed (false
    positives possible, bounded by the collision mass).  At corpus
    scale probe a SAMPLE of distinct keys instead of all of them — a
    key with count >= threshold appears in any uniform row sample with
    probability 1-(1-p)^threshold."""
    counters = countmin_build(df, key_col, w, d)
    est = countmin_estimate(counters, df, key_col, w, d)
    return est.filter(F.col("est") >= threshold)


def countmin_oracle_sql(stream_sql: str, probe_sql: str, w: int = 1024,
                        d: int = 4) -> str:
    """DuckDB rendition of build+estimate with the SAME md5 bucket
    definition.  ``stream_sql`` / ``probe_sql`` must each yield one
    column ``k`` (strings).  Returns (k, est)."""
    # the repo's shared DuckDB form of dedup._h64 (60-bit md5 int),
    # then mod w — identical to the Spark _bucket definition
    b = ("(('0x' || substr(md5(CAST(r AS VARCHAR) || chr(31) || k), 1, 15))"
         f"::BIGINT % {w})")
    return f"""
        WITH cm_stream AS ({stream_sql}),
        cm_probe AS (SELECT DISTINCT k FROM ({probe_sql}) WHERE k IS NOT NULL),
        rows_d AS (SELECT unnest(generate_series(0, {d - 1})) AS r),
        built AS (
          SELECT r, {b} AS b, count(*) AS n
          FROM cm_stream, rows_d WHERE k IS NOT NULL GROUP BY 1, 2
        ),
        probes AS (
          SELECT k, r, {b} AS b FROM cm_probe, rows_d
        )
        SELECT p.k, min(coalesce(built.n, 0)) AS est
        FROM probes p LEFT JOIN built ON p.r = built.r AND p.b = built.b
        GROUP BY p.k
    """
