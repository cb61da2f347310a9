"""Deterministic corpus splitting and sampling for training pipelines.

A training-data engine must split a corpus into train/val/test such that
(a) membership is a pure function of the document id — stable across runs,
re-partitions, cluster sizes and engine versions, (b) no shuffle and no
coordination: the split column is a row-local md5 expression evaluated in
whole-stage codegen (md5 is bit-identical everywhere, unlike engine-native
hash functions), and (c) the assignment survives incremental ingestion —
a document's split never changes when the corpus grows.

The same bucket column drives deterministic fractional sampling
(``hash_sample``): take buckets [0, frac*N_BUCKETS) — a stable sample that
is also REPEATABLE across tables keyed by the same id (join-compatible
samples, which ``df.sample`` cannot give).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def _bucket(id_col: str) -> Column:
    """md5-derived bucket in [0, N_BUCKETS): first 8 hex chars -> int.
    conv() returns a decimal string; the long cast keeps codegen.

    Null ids hash a NUL sentinel instead of propagating null — otherwise
    hash_split's when/otherwise silently dumped them in the LAST split
    while hash_sample/stratified_sample silently dropped them: the same
    row would disagree across supposedly join-compatible operators.  With
    the sentinel all md5-bucket consumers assign null ids one consistent
    deterministic bucket (NUL cannot appear in a cast numeric id, and is
    vanishingly unlikely in a string id)."""
    s = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00"))
    h = F.substring(F.md5(s), 1, 8)
    return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(N_BUCKETS))


def hash_split(docs: DataFrame, weights: dict[str, float] | None = None,
               id_col: str = "doc_id") -> DataFrame:
    """Assign every row a deterministic split label.

    ``weights`` maps label -> fraction (must sum to ~1); labels are
    assigned by cumulative bucket thresholds in the dict's order, so
    {"train": .8, "val": .1, "test": .1} puts buckets [0, 8000) in train,
    [8000, 9000) in val, the rest in test.  Returns all input columns plus
    (bucket, split).
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = _bucket(id_col)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        acc += w
        cond = b < int(round(acc * N_BUCKETS))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.select("*", b.alias("bucket"), expr.alias("split"))


def hash_sample(docs: DataFrame, fraction: float,
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic ~``fraction`` sample: buckets [0, fraction*N_BUCKETS).
    Unlike ``df.sample`` this is stable across runs/partitionings and
    consistent across any table sharing the id column."""
    return docs.filter(_bucket(id_col) < int(round(fraction * N_BUCKETS)))


def stratified_sample(docs: DataFrame, group_col: str,
                      fractions: dict[str, float] | float,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-group sampling (language/domain rebalancing).

    ``fractions`` is either one fraction for every group or a map
    group -> fraction (groups absent from the map are dropped — the
    explicit form a mixture spec takes).  Selection reuses the md5 bucket,
    so it is stable across runs and consistent with hash_split/hash_sample
    — and because the bucket is a pure function of the id, NO shuffle and
    no per-group count pass: the filter is a row-local codegen expression,
    unlike ``df.sampleBy`` which is seed-dependent per partition order.
    """
    b = _bucket(id_col)
    if isinstance(fractions, dict):
        expr = None
        for g, frac in fractions.items():
            cond = (F.col(group_col) == g) & (b < int(round(frac * N_BUCKETS)))
            expr = cond if expr is None else expr | cond
        if expr is None:
            return docs.filter(F.lit(False))
        return docs.filter(expr)
    return docs.filter(b < int(round(float(fractions) * N_BUCKETS)))


def cap_per_group(docs: DataFrame, group_col: str, max_per_group: int,
                  id_col: str = "doc_id") -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, deterministically
    (md5-bucket order, id tie-break).  The generic sibling of
    textstats.cap_per_domain: one shuffle on the group key, AQE-skew-
    handled like every windowed op."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(_bucket(id_col), F.col(id_col))
    return (
        docs.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= max_per_group)
        .drop("_rnk")
    )
