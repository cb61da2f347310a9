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


# ---------------------------------------------------------------------------
# HyperLogLog: bounded-memory DISTINCT cardinality per key
# ---------------------------------------------------------------------------
#
# The companion question to count-min's "how often does this key appear"
# is "how many DISTINCT partners does this key have" — the input to
# per-predicate selectivity (BGP leg ordering), domain/range induction
# coverage, and neighbor-set sizing, none of which can afford an exact
# count(distinct) shuffle per key at 10^12 triples.  A Flajolet et al.
# 2007 HyperLogLog keeps m = 2^p registers per key (max leading-zero rank
# of the hashed value routed to each register); max() combines map-side,
# so the shuffle moves (key, register) rows — at most m per key — not
# values.
#
# Determinism is the design constraint: the registers are pure integer
# functions of md5 (the repo's shared _h64), the harmonic sum is computed
# in INTEGER arithmetic (each 2^-M term scaled by 2^(W+1) is an exact
# BIGINT, so the sum is order-independent — no float-accumulation drift
# between Spark and DuckDB), and the only float ops are one division by
# a Python-precomputed constant injected as the SAME literal into both
# engines, plus the standard small-range linear-counting correction
# (m*ln(m/V)) whose inputs are identical small integers.  Estimates are
# therefore bit-stable across partitionings, executor counts, and
# engines (round(.,4) guards the last-ulp libm difference on ln).

_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _hll_alpha(p: int) -> float:
    m = 1 << p
    return _HLL_ALPHA.get(p, 0.7213 / (1 + 1.079 / m))


def hll_registers(df: DataFrame, key_col: str, val_col: str,
                  p: int = 6) -> DataFrame:
    """Per-key HLL register table (k, j, mx): the hashed value's low p
    bits pick register j, mx is the max over values of (leading zeros of
    the remaining W = 60-p bits) + 1.  At most 2^p rows per key; max()
    partial-aggregates map-side, so the shuffle is register-sized."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m, big_w = 1 << p, 60 - p
    rows = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(val_col).cast("string").alias("_v"),
    ).filter(F.col("k").isNotNull() & F.col("_v").isNotNull())
    h = _h64(F.col("_v"))
    w = F.shiftright(h, p)
    # exact leading-zero rank via the binary-digit count (integer ops
    # only — floor(log2) on a 54-bit int is not float-safe)
    binlen = F.length(F.conv(w.cast("string"), 10, 2))
    mx = F.when(w == 0, F.lit(big_w + 1)).otherwise(F.lit(big_w) + 1 - binlen)
    return (
        rows.select("k", (h % m).alias("j"), mx.alias("_mx"))
        .groupBy("k", "j")
        .agg(F.max("_mx").alias("mx"))
    )


def hll_estimate(regs: DataFrame, p: int = 6) -> DataFrame:
    """(k, n_reg, est) distinct-count estimates from a register table.
    The harmonic sum is integer (each 2^-mx term scaled by 2^(W+1) is an
    exact BIGINT), so it is independent of aggregation order; V = 2^p -
    n_reg empty registers contribute 2^0 each.  Small-range correction
    (raw <= 2.5m with empty registers) switches to linear counting
    m*ln(m/V), the standard HLL regime rule."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m, big_w = 1 << p, 60 - p
    num = _hll_alpha(p) * m * m * float(1 << (big_w + 1))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {big_w + 1} - mx)")
    agg = regs.groupBy("k").agg(
        F.count("*").alias("n_reg"), F.sum(term).alias("_s")
    )
    s_full = F.col("_s") + (F.lit(m) - F.col("n_reg")) * F.lit(1 << (big_w + 1))
    raw = F.lit(num) / s_full
    v = F.lit(m) - F.col("n_reg")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.round(F.lit(m) * F.log(F.lit(float(m)) / v), 4),
    ).otherwise(F.round(raw, 4))
    return agg.select("k", "n_reg", est.alias("est"))


def hll_distinct(df: DataFrame, key_col: str, val_col: str,
                 p: int = 6) -> DataFrame:
    """Per-key approximate count(distinct val): build + estimate."""
    return hll_estimate(hll_registers(df, key_col, val_col, p), p)


def hll_oracle_sql(stream_sql: str, p: int = 6) -> str:
    """DuckDB rendition of hll_distinct over a (k, v) stream — same md5
    hash, same integer register/sum arithmetic, same injected alpha
    constant, same correction rule.  Returns (k, n_reg, est)."""
    m, big_w = 1 << p, 60 - p
    num = repr(_hll_alpha(p) * m * m * float(1 << (big_w + 1)))
    sc = 1 << (big_w + 1)
    h = "(('0x' || substr(md5(v), 1, 15))::BIGINT)"
    return f"""
        WITH hll_stream AS ({stream_sql}),
        hashed AS (
          SELECT k, {h} % {m} AS j, ({h} >> {p}) AS w
          FROM hll_stream WHERE k IS NOT NULL AND v IS NOT NULL
        ),
        regs AS (
          SELECT k, j,
                 max(CASE WHEN w = 0 THEN {big_w + 1}
                     ELSE {big_w} + 1 - length(to_base(w, 2)) END) AS mx
          FROM hashed GROUP BY k, j
        ),
        agg AS (
          SELECT k, count(*) AS n_reg,
                 sum((1::BIGINT << ({big_w + 1} - mx)))
                   + ({m} - count(*)) * {sc}::BIGINT AS s
          FROM regs GROUP BY k
        )
        SELECT k, n_reg,
               CASE WHEN ({num} / s) <= {2.5 * m} AND ({m} - n_reg) > 0
                    THEN round({m} * ln({m} * 1.0 / ({m} - n_reg)), 4)
                    ELSE round({num} / s, 4) END AS est
        FROM agg
    """


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


# ---------------------------------------------------------------------------
# Histogram quantiles: bounded-memory rank statistics over integer values
# ---------------------------------------------------------------------------
#
# The third telemetry question after "how often" (count-min) and "how many
# distinct" (HLL) is "how is it DISTRIBUTED" — the p99 subject degree
# decides whether a join needs salting, the p50/p99 document length sizes
# maxPartitionBytes, the tail of per-bucket LSH populations sets the
# bucket cap.  approxQuantile exists but is driver-side, float-threaded,
# and has no DuckDB twin; this sketch is a fixed-width bucket histogram
# whose every quantity is an INTEGER, so the result is bit-identical
# across partitionings, executor counts, and engines — the repo's
# determinism contract — with a known error bound: the true q-quantile
# lies in [lo, hi] of the reported bucket, width <= ceil(range/buckets).
#
# Scale shape: one min/max/count agg (partial), one groupBy on bucket id
# (<= ``buckets`` output rows, partial agg collapses map-side), one
# window over the bucket-sized histogram (single-partition but
# buckets-sized by construction — the sanctioned index-key-sized frame),
# one broadcast join against the quantile probe list.  Ranks use the
# ceil(q*n) convention computed in integer micros (rank = ceil(q_u * n /
# 1e6)) so no float ever touches the data path.


def histogram_quantiles(df: DataFrame, val_col: str,
                        qs: list[float] | None = None,
                        buckets: int = 1024) -> DataFrame:
    """Quantile estimates for an integer-valued column.

    Returns one row per probe: (q_micros, q, rank, bucket, lo, hi, n)
    where the true rank-``rank`` value (1-based, rank = ceil(q*n)) lies
    in [lo, hi] — exact equality when the bucket holds one distinct
    value (always true once range <= buckets).  ``q = 1.0`` reports the
    max's bucket.  Nulls are excluded; values must fit BIGINT."""
    qs = qs if qs is not None else [0.5, 0.9, 0.99, 1.0]
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    spark = df.sparkSession
    vals = df.select(F.col(val_col).cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # one pass for the frame: min/max/count (broadcast 1-row dim — the
    # same shape as lm.py's corpus-stats dims)
    stats = vals.agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax"),
        F.count("*").alias("n"),
    )
    # integer bucket id: ((v - vmin) * buckets) div (range + 1); width 1
    # buckets degenerate to exact per-value counts
    # `div` (Spark's integral division) keeps the whole path in exact
    # BIGINT arithmetic — double-divide-then-cast drifts past 2^53
    hist = (
        vals.crossJoin(F.broadcast(stats))
        .select(
            F.expr(f"((v - vmin) * {int(buckets)}) div (vmax - vmin + 1)")
            .alias("bucket"),
        )
        .groupBy("bucket").agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    cum = hist.withColumn(
        "cum", F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    probes = spark.createDataFrame(
        [(int(round(q * 1_000_000)),) for q in qs], "q_micros long"
    )
    # rank = ceil(q_u * n / 1e6) in pure integers: (q_u*n + 999999) div 1e6
    hit = (
        cum.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(probes))
        .withColumn(
            "rank",
            F.expr("(q_micros * n + 999999) div 1000000"),
        )
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("q_micros", "rank", "vmin", "vmax", "n")
        .agg(F.min("bucket").alias("bucket"))
    )
    # bucket b holds offsets [ceil(b*R/B), ceil((b+1)*R/B) - 1] — the
    # integer inverse of bucket(v) = floor((v-vmin)*B/R)
    b = int(buckets)
    return hit.select(
        "q_micros",
        (F.col("q_micros") / 1_000_000.0).alias("q"),
        "rank", "bucket",
        F.expr(f"vmin + (bucket * (vmax - vmin + 1) + {b - 1}) div {b}")
        .alias("lo"),
        F.least(
            F.col("vmax"),
            F.expr(
                f"vmin + ((bucket + 1) * (vmax - vmin + 1) + {b - 1}) "
                f"div {b} - 1"
            ),
        ).alias("hi"),
        "n",
    )


def histogram_quantiles_oracle_sql(vals_sql: str,
                                   qs: list[float] | None = None,
                                   buckets: int = 1024) -> str:
    """DuckDB rendition over a one-column ``v`` stream — same integer
    bucket ids, same integer micro-ranks, same edge arithmetic.  Returns
    (q_micros, q, rank, bucket, lo, hi, n)."""
    qs = qs if qs is not None else [0.5, 0.9, 0.99, 1.0]
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    probes = ", ".join(f"({int(round(q * 1_000_000))})" for q in qs)
    return f"""
        WITH hq_vals AS (
          SELECT v::BIGINT AS v FROM ({vals_sql}) WHERE v IS NOT NULL
        ),
        hq_stats AS (
          SELECT min(v) AS vmin, max(v) AS vmax, count(*) AS n FROM hq_vals
        ),
        hq_hist AS (
          SELECT ((v - vmin) * {buckets}) // (vmax - vmin + 1) AS bucket,
                 count(*) AS cnt
          FROM hq_vals, hq_stats GROUP BY 1
        ),
        hq_cum AS (
          SELECT bucket, sum(cnt) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hq_hist
        ),
        hq_probes AS (
          SELECT * FROM (VALUES {probes}) p(q_micros)
        ),
        hq_hit AS (
          SELECT q_micros, (q_micros * n + 999999) // 1000000 AS rank,
                 vmin, vmax, n, min(bucket) AS bucket
          FROM hq_cum, hq_stats, hq_probes
          WHERE cum >= (q_micros * n + 999999) // 1000000
          GROUP BY 1, 2, 3, 4, 5
        )
        SELECT q_micros, q_micros / 1000000.0 AS q, rank, bucket,
               vmin + (bucket * (vmax - vmin + 1) + {buckets - 1})
                 // {buckets} AS lo,
               least(vmax, vmin
                 + ((bucket + 1) * (vmax - vmin + 1) + {buckets - 1})
                 // {buckets} - 1) AS hi,
               n
        FROM hq_hit
    """
