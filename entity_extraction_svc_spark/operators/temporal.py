"""Temporal joins Spark lacks as built-ins: AS-OF join and range join.

Both are implemented as compositions of existing relational operators with
the scale-safe shape (the brief's "custom operators" clause):

* ``asof_join`` — for every left row, the latest right row of the same key
  with ``right.ts <= left.ts``.  NOT a theta join (which explodes to the
  per-key cross product before picking the max): both sides union into one
  stream, a running ``last(ignorenulls)`` window carries the most recent
  right payload forward, and left rows read it off.  Cost: ONE shuffle on
  the key, linear scan per partition — the same plan at 10^12 rows.

* ``range_join`` — points joined into [start, end) intervals of the same
  key.  NOT a per-key theta join: intervals explode to the coarse time
  buckets they overlap, points carry their single bucket, the join is an
  equi-join on (key, bucket) and the exact range predicate filters inside
  the bucket.  Candidate volume is bounded by bucket co-occupancy; pick
  ``bucket_seconds`` near the typical interval length.

Tie semantics (asof): among right rows sharing the latest eligible ts, the
largest ``tie_col`` wins — deterministic, and reproduced verbatim by the
DuckDB oracle (__spark_entry__.py rel_asof_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              ts_col: str = "ts", tie_col: str | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    ``right.ts <= left.ts`` on the same key (null-filled when none).

    Right payload columns come back prefixed with ``right_prefix``.
    """
    tie = tie_col or ts_col
    payload_cols = [c for c in right.columns if c not in on]
    r = right.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.col(tie).alias("_tie"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_rp"),
    ).withColumn("_is_left", F.lit(0))
    payload_type = r.schema["_rp"].dataType

    l = left.select(
        "*",
        F.col(ts_col).alias("_ts"),
        F.col(tie).alias("_tie"),
        F.lit(None).cast(payload_type).alias("_rp"),
    ).withColumn("_is_left", F.lit(1))

    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        # right rows sort before left at equal ts (<= is inclusive); among
        # equal right ts the largest tie_col lands last and wins
        .orderBy("_ts", "_is_left", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns]
    return matched.filter(F.col("_is_left") == 1).select(
        *out_cols,
        *[
            F.col(f"_match.{c}").alias(f"{right_prefix}{c}")
            for c in payload_cols
        ],
    )


def range_join(points: DataFrame, intervals: DataFrame, on: list[str],
               ts_col: str = "ts", start_col: str = "start",
               end_col: str = "end",
               bucket_seconds: int = 3600) -> DataFrame:
    """Inner join of point rows into [start, end) interval rows per key.

    Both sides bin to ``bucket_seconds`` buckets; intervals explode to every
    bucket they overlap, points keep their single bucket, and the exact
    predicate filters within the equi-joined bucket — no per-key cross
    product.  A point matches an interval in exactly one shared bucket (its
    own), so no dedup is needed.
    """
    b = F.lit(bucket_seconds)
    p = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    joined = p.join(iv, on + ["_bucket"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bucket")


def fact_intervals(observations: DataFrame, key_cols: list[str],
                   val_col: str, ts_col: str = "observed_ts") -> DataFrame:
    """Collapse a timestamped observation stream of FUNCTIONAL facts (one
    true value per key at a time — the (subj, pred)→obj shape of repeated
    crawls re-extracting the same claim) into validity intervals:
    (key…, value, valid_from, valid_to), half-open [valid_from, valid_to),
    valid_to NULL for the currently-believed value.

    Consecutive same-value observations merge into one run (re-seeing a
    fact extends nothing, changes nothing); a value CHANGE closes the
    previous interval at the change's timestamp.  This is the KG-side twin
    of Iceberg's snapshot time travel: :func:`kb_as_of` reconstructs the
    KB any crawl believed, from the full observation log.

    Execution shape: one hash shuffle on the key for the run-detection
    window (lag + conditional running count); the run collapse groups on
    (key…, run) — a superset of the window's partition key, so it reuses
    the same exchange — and the interval chaining (lead) rides the same
    partitioning again.  Ties at equal ts break by value (deterministic,
    oracle-identical).
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(val_col))
    chg = F.when(
        F.lag(val_col).over(w).isNull()
        | (F.col(val_col) != F.lag(val_col).over(w)),
        1,
    ).otherwise(0)
    runs = observations.withColumn(
        "_run",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select(
        *keys, F.col(val_col).alias("value"), F.col(ts_col).alias("_ts"),
        "_run",
    )
    iv = runs.groupBy(*key_cols, "_run").agg(
        F.first("value").alias("value"),
        F.min("_ts").alias("valid_from"),
    )
    w2 = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy("_run")
    return iv.select(
        *key_cols,
        "value",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def kb_as_of(intervals: DataFrame, ts, ts_col_from: str = "valid_from",
             ts_col_to: str = "valid_to") -> DataFrame:
    """The fact set believed at time ``ts``: rows whose half-open validity
    interval contains it (open current intervals match any later ts).
    Partition/predicate pruning applies if the interval table is stored
    partitioned on a time bucket of ``valid_from``."""
    t = F.lit(ts).cast("timestamp")
    return intervals.filter(
        (F.col(ts_col_from) <= t)
        & (F.col(ts_col_to).isNull() | (F.col(ts_col_to) > t))
    )


def fact_intervals_oracle_sql(observations_sql: str, key_cols: list[str],
                              val_col: str,
                              ts_col: str = "observed_ts") -> str:
    """DuckDB rendition of the SAME run-collapse recurrence (lag → change
    flag → running sum → group → lead), independent plan."""
    ks = ", ".join(key_cols)
    return f"""
        WITH obs AS ({observations_sql}),
        flagged AS (
          SELECT {ks}, {val_col} AS value, {ts_col} AS _ts,
                 CASE WHEN lag({val_col}) OVER w IS NULL
                        OR {val_col} <> lag({val_col}) OVER w
                      THEN 1 ELSE 0 END AS chg
          FROM obs
          WINDOW w AS (PARTITION BY {ks} ORDER BY {ts_col}, {val_col})
        ),
        runs AS (
          SELECT *, sum(chg) OVER (PARTITION BY {ks} ORDER BY _ts, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _run
          FROM flagged
        ),
        iv AS (
          SELECT {ks}, _run, first(value ORDER BY _ts, value) AS value,
                 min(_ts) AS valid_from
          FROM runs GROUP BY {ks}, _run
        )
        SELECT {ks}, value, valid_from,
               lead(valid_from) OVER (PARTITION BY {ks} ORDER BY _run) AS valid_to
        FROM iv
    """


def set_fact_intervals(observations: DataFrame, key_cols: list[str],
                       val_col: str,
                       ts_col: str = "observed_ts") -> DataFrame:
    """Validity intervals for SET-VALUED predicates (VERDICT r4 #7 —
    P39 positions held, P54 teams: a key holds MANY simultaneous values,
    so :func:`fact_intervals`'s value-change run collapse does not apply).
    Here an observation row means "value was present for key in the
    snapshot at ts", and a value's interval is a maximal run of
    consecutive SNAPSHOTS OF THAT KEY in which it appears:

    - valid_from = first snapshot ts of the run;
    - valid_to   = ts of the key's first snapshot where the value is
      absent after the run (half-open, like fact_intervals), NULL while
      present in the key's latest snapshot;
    - a value that disappears and later re-appears gets two intervals.

    Execution shape, one hash exchange on the key: ``dense_rank`` over
    the key's timestamps numbers the snapshots; per-(key, value) island
    detection is idx - row_number (consecutive snapshot indices collapse
    to one group); the run aggregation, the per-snapshot lookup table,
    and the closing-snapshot left join all group/join on supersets of the
    key, which hash-partitioning on the key already clusters — the same
    exchange-reuse argument as fact_intervals, stated by
    ClusteredDistribution: equal-key rows are co-located, hence equal-
    (key, …) rows are too.
    """
    keys = [F.col(k) for k in key_cols]
    w_key = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    idxed = observations.withColumn("_idx", F.dense_rank().over(w_key))
    pres = idxed.groupBy(*key_cols, val_col, "_idx").agg(
        F.min(ts_col).alias("_ts")
    )
    w_kv = Window.partitionBy(*keys, F.col(val_col)).orderBy("_idx")
    runs = pres.withColumn(
        "_grp", F.col("_idx") - F.row_number().over(w_kv)
    )
    agg = runs.groupBy(*key_cols, val_col, "_grp").agg(
        F.min("_ts").alias("valid_from"),
        F.max("_idx").alias("_last_idx"),
    )
    snap = idxed.groupBy(*key_cols, "_idx").agg(
        F.min(ts_col).alias("_snap_ts")
    )
    joined = agg.join(
        snap,
        [agg[k] == snap[k] for k in key_cols]
        + [snap["_idx"] == agg["_last_idx"] + 1],
        "left",
    )
    return joined.select(
        *[agg[k] for k in key_cols],
        F.col(val_col).alias("value"),
        "valid_from",
        F.col("_snap_ts").alias("valid_to"),
    )


def set_fact_intervals_oracle_sql(observations_sql: str,
                                  key_cols: list[str], val_col: str,
                                  ts_col: str = "observed_ts") -> str:
    """DuckDB rendition of the SAME presence/absence-per-snapshot
    recurrence (dense_rank -> island grouping -> closing-snapshot left
    join), independent plan."""
    ks = ", ".join(key_cols)
    on = " AND ".join(f"a.{k} = s.{k}" for k in key_cols)
    sel = ", ".join(f"a.{k}" for k in key_cols)
    return f"""
        WITH obs AS ({observations_sql}),
        idxed AS (
          SELECT *, dense_rank() OVER (PARTITION BY {ks} ORDER BY {ts_col})
                 AS _idx
          FROM obs
        ),
        pres AS (
          SELECT {ks}, {val_col} AS value, _idx, min({ts_col}) AS _ts
          FROM idxed GROUP BY {ks}, {val_col}, _idx
        ),
        runs AS (
          SELECT *, _idx - row_number() OVER
                 (PARTITION BY {ks}, value ORDER BY _idx) AS _grp
          FROM pres
        ),
        agg AS (
          SELECT {ks}, value, _grp, min(_ts) AS valid_from,
                 max(_idx) AS _last_idx
          FROM runs GROUP BY {ks}, value, _grp
        ),
        snap AS (
          SELECT {ks}, _idx, min({ts_col}) AS _snap_ts
          FROM idxed GROUP BY {ks}, _idx
        )
        SELECT {sel}, a.value, a.valid_from, s._snap_ts AS valid_to
        FROM agg a LEFT JOIN snap s ON {on} AND s._idx = a._last_idx + 1
    """
