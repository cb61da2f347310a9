"""Training-sequence packing and temperature-weighted source mixing.

The last mile of a pretraining data pipeline: curated documents must be
(a) concatenated in a deterministic global shuffle order and chunked into
fixed-length training sequences ("concat-and-chunk" packing — every token
lands in exactly one sequence, sequences are exactly ``seq_len`` tokens
except possibly the last), and (b) re-weighted across sources by a
temperature exponent (sample source ``s`` proportionally to ``n_s**alpha``
— alpha=1 keeps natural proportions, alpha=0 equalizes sources, the
standard multilingual/multi-corpus rebalancing rule).

Scale design:

* Packing needs a GLOBAL prefix sum of per-document token counts in the
  shuffle order — the one genuinely order-dependent step in the pipeline.
  A single unpartitioned window would serialize the corpus through one
  task; instead the order key is ``md5(doc_id)`` and the prefix sum is
  two-level: documents are windowed WITHIN each of the 256 buckets given
  by the md5's first byte (parallel, one shuffle on the byte), and the 256
  bucket totals — index-sized, not data-sized — flow through one tiny
  cumulative window and broadcast-join back.  Because the bucket is a
  PREFIX of the order key, (bucket, md5, id) order IS (md5, id) order, so
  the two-level sum equals the global one exactly.
* The mixture weigher never shuffles the corpus at all: per-source counts
  are one partial-aggregated groupBy (source-cardinality rows), the keep
  fraction rides back on a broadcast join, and membership is the same
  row-local md5-bucket predicate as ``sampling.hash_sample`` — so mixture
  membership is stable across runs, partitionings and engines, and
  join-compatible with every other md5-bucket sampler in the repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import N_BUCKETS, _bucket
from .textstats import _tokens

# 256 order-prefix buckets: md5's first two hex chars. Plenty of
# parallelism for the windowed cumsum while the totals frame stays
# index-sized.
_PFX_BUCKETS = 256


def _order_key(id_col: str) -> Column:
    """Deterministic global shuffle key: md5 of the id string.  Null ids
    take the same NUL sentinel as sampling._bucket so every md5-derived
    operator agrees on where a null row lands."""
    return F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("\x00")))


def pack_sequences(docs: DataFrame, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text", count_col: str | None = None,
                   drop_last: bool = False,
                   order_col: str | None = None) -> DataFrame:
    """Concat-and-chunk packing: assign every token of every document to
    exactly one fixed-length training sequence.

    Documents are laid out in ``(md5(id), id)`` order — a deterministic
    global shuffle — or, with ``order_col``, in ``(order_col, id)`` order
    (curriculum packing: feed easy/high-quality documents first by
    passing a quality or perplexity column); the concatenated token
    stream is cut every ``seq_len`` tokens.  Returns one row per
    (document, sequence) overlap:

    * ``seq_id``    — 0-based sequence number in the global stream,
    * ``doc_id``    — the document,
    * ``tok_start`` / ``tok_end`` — the half-open token slice of THIS
      document that lands in the sequence,
    * ``seq_pos``   — the offset inside the sequence where the slice
      starts,
    * ``n_tokens``  — the document's total token count.

    A document longer than ``seq_len`` spans several sequences (one row
    each); short documents share sequences.  Token counts come from the
    whitespace tokenizer (``textstats._tokens``) unless ``count_col``
    names a precomputed count.  Zero-token documents are excluded (they
    contribute nothing to the stream).  ``drop_last=True`` drops the
    final partial sequence (training wants fixed shapes); the sequence
    is dropped whole, not truncated.

    Cache lifecycle: the narrow counted frame is ``persist()``-ed (see
    inline note — a prefix sum is two-phase) and stays registered until
    the session evicts it (LRU) or the caller runs
    ``spark.catalog.clearCache()``; a long-lived session packing many
    corpora in a loop should clear between runs.  Benchmarks must clear
    between repeats or they book the cache-hit path (bench.py does).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    from entity_extraction_svc_spark.operators.scanwide import widen_scan

    # tokenization + md5 run map-side of the bucket exchange; a small file
    # scanning as 1-2 splits would serialize them (r6, measured ~0.5s of
    # the 1.9s sf1.0 query) — widen_scan is a no-op at cluster scale.
    # min_bytes: tokenization cost scales with bytes, so a sub-4MB corpus
    # cannot be compute-heavy and skips the exchange outright
    docs = widen_scan(docs, min_bytes=4 << 20)
    S = F.lit(int(seq_len)).cast("long")
    n = (
        F.col(count_col).cast("long")
        if count_col
        else F.size(_tokens(F.coalesce(F.col(text_col), F.lit("")))).cast("long")
    )
    if order_col is None:
        # hash-shuffle order: the 256-way bucket is the md5's first byte,
        # a PREFIX of the order key, so per-bucket cumsums + bucket
        # offsets equal the flat global prefix sum exactly
        h = _order_key(id_col)
        pfx = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
        base = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                n.alias("n_tokens"),
                h.alias("_h"),
                pfx.alias("_pfx"),
            )
            .filter(F.col("n_tokens") > 0)
        )
    else:
        # curriculum order: range-repartition on (order_col, id) and use
        # the partition id as the bucket — range boundaries are sampled
        # (non-deterministic placement), but ANY split of a total order
        # yields the same global offsets, so the OUTPUT is still a pure
        # function of the data; ties across boundaries are broken by the
        # id in the range key itself
        base = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                n.alias("n_tokens"),
                F.col(order_col).alias("_h"),
            )
            .filter(F.col("n_tokens") > 0)
            .repartitionByRange(_PFX_BUCKETS, F.col("_h"), F.col("doc_id"))
            .withColumn("_pfx", F.spark_partition_id().cast("long"))
        )

    # level 1: inclusive cumsum inside each order-prefix bucket (parallel)
    w_local = (
        Window.partitionBy("_pfx")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # A global prefix sum is inherently two-phase: the totals pass and the
    # emit pass both consume this frame, and referencing one DataFrame
    # twice duplicates its lineage in the plan — WITHOUT the persist the
    # corpus would be scanned and re-tokenized twice.  The cached frame is
    # the NARROW one (id + three fixed-width columns, no text): ~60 bytes
    # a row, O(1000)x smaller than the corpus it summarizes, and both join
    # sides share the single InMemoryRelation so one scan + one shuffle
    # feed the whole job.
    local = base.withColumn(
        "_local_off", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    ).persist()

    # level 2: exclusive prefix offsets over the 256 bucket totals — an
    # index-sized frame, so the unpartitioned window is one tiny task
    w_tot = (
        Window.orderBy("_pfx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Totals come from the WINDOWED frame (a bucket's total is its max
    # inclusive cumsum), not from a second pass over `base`: the groupBy
    # consumes the same hashpartitioning(_pfx) exchange the window
    # produced, so the corpus is scanned and shuffled exactly once.
    totals = (
        local.groupBy("_pfx")
        .agg(F.max(F.col("_local_off") + F.col("n_tokens")).alias("_tot"))
        .withColumn("_pfx_off", F.sum("_tot").over(w_tot) - F.col("_tot"))
    )

    off = F.col("_pfx_off") + F.col("_local_off")
    chunks = (
        local.join(F.broadcast(totals.select("_pfx", "_pfx_off")), "_pfx")
        .withColumn("_off", off)
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("_off") / S),
                    F.floor((F.col("_off") + F.col("n_tokens") - 1) / S),
                )
            ),
        )
    )
    out = chunks.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "doc_id",
        F.greatest(F.lit(0).cast("long"), F.col("seq_id") * S - F.col("_off"))
        .alias("tok_start"),
        F.least(F.col("n_tokens"), (F.col("seq_id") + 1) * S - F.col("_off"))
        .alias("tok_end"),
        F.greatest(F.lit(0).cast("long"), F.col("_off") - F.col("seq_id") * S)
        .alias("seq_pos"),
        "n_tokens",
    )
    if drop_last:
        # number of FULL sequences = total // seq_len; the totals frame is
        # already index-sized, so the grand total is a 1-row broadcast
        grand = totals.agg(
            F.floor(F.sum("_tot") / S).cast("long").alias("_n_full")
        )
        out = out.join(F.broadcast(grand)).filter(
            F.col("seq_id") < F.col("_n_full")
        ).drop("_n_full")
    return out


def temperature_sample(docs: DataFrame, source_col: str = "source",
                       alpha: float = 0.5, target_total: int | None = None,
                       id_col: str = "doc_id") -> DataFrame:
    """Temperature-weighted source mixture: keep documents so that source
    ``s``'s share of the output is proportional to ``n_s ** alpha``.

    The expected kept count for source ``s`` is
    ``T * n_s**alpha / sum_t(n_t**alpha)`` with ``T = target_total`` (the
    corpus size by default), capped at ``n_s`` — sampling cannot invent
    rows, so sources whose temperature share exceeds their size keep
    everything (the standard behavior; upsampling is a repeat-factor
    concern for the data loader, not the curator).

    Membership is the md5-bucket predicate of ``sampling.hash_sample``
    per source: row-local, shuffle-free over the corpus (the only
    aggregation is the source-cardinality count table, broadcast back),
    stable under re-partitioning and corpus order, and join-compatible
    with hash_split/hash_sample.  Returns the kept rows plus ``keep_frac``
    (the source's sampling fraction, rounded).
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if target_total is not None and target_total <= 0:
        raise ValueError(
            f"target_total must be positive, got {target_total} "
            "(0 or negative would silently empty the corpus)"
        )
    counts = docs.groupBy(source_col).agg(F.count("*").alias("_n_src"))
    wsum = counts.agg(
        F.sum(F.pow(F.col("_n_src"), F.lit(float(alpha)))).alias("_wsum"),
        F.sum("_n_src").alias("_n_all"),
    )
    t = (
        F.lit(int(target_total)).cast("double")
        if target_total is not None
        else F.col("_n_all").cast("double")
    )
    fracs = (
        counts.join(F.broadcast(wsum))
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                t * F.pow(F.col("_n_src"), F.lit(float(alpha)))
                / F.col("_wsum") / F.col("_n_src"),
            ).alias("_frac"),
        )
    )
    kept = (
        docs.join(F.broadcast(fracs), source_col)
        .filter(_bucket(id_col) < F.floor(F.col("_frac") * N_BUCKETS))
        .withColumn("keep_frac", F.round(F.col("_frac"), 6))
        .drop("_frac")
    )
    return kept
