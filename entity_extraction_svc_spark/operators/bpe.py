"""Byte-pair-encoding merge learning and BPE token counting, corpus-scale.

A training pipeline reports corpus size in TOKENS of the tokenizer it will
train with; a whitespace count (textstats) is only a proxy.  This module
learns the BPE merge table itself and counts subword tokens with it — the
industrial trainer design (Sennrich et al. 2016; SentencePiece/HF trainers
do the same): the CORPUS is touched exactly twice, once to build the word
frequency table and once to sum per-document token counts through a
word->length dictionary; the merge loop iterates over the VOCABULARY frame
(10^6-10^8 rows at web scale — distributed but thousands of times smaller
than the corpus), and each round's argmax is an index-sized decision.

Merge application is a left-to-right greedy fold over the word's symbol
array (``F.aggregate`` with an array accumulator — pure Catalyst, no
Python in the loop), the same non-overlapping semantics every BPE
implementation uses.  Ties in pair frequency break by (left, right)
lexicographic order, so the learned table is a pure function of
(corpus, n_merges) that a DuckDB oracle — the same fold spelled as
``list_reduce`` over a separator-joined string — can certify round by
round.

Scope notes: symbols are Unicode codepoints of the whitespace-lowercased
words (``textstats._tokens``); the separator sentinel (US, ``\\x1f``)
must not appear inside words, which holds for any printable-text corpus.
The corpus must support ``n_merges`` rounds (some pair must exist each
round) — true for any natural-language corpus and asserted at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens

BPE_MERGES = 10

# unit separator: joins symbol segments in the oracle's string fold and
# never appears in printable text
SEP = "\x1f"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the whitespace-lowercased corpus — the ONE
    corpus-scale aggregation the trainer needs (map-side partial agg)."""
    return (
        docs.select(
            F.explode(_tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """Adjacent symbol pairs via zip_with over shifted slices (NOT
    element_at(lambda_i) inside transform — measured ~20x slower; see the
    verify notes)."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol: a fold with an array accumulator.  try_element_at returns null
    on the empty initial accumulator, which fails the when() into the
    plain append — exactly the seed step."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == left) & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(docs: DataFrame, n_merges: int = BPE_MERGES,
              text_col: str = "text") -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merge list in rank order,
    final vocab frame (word, cnt, syms)).

    Per round: adjacent-pair frequencies over the vocab (weighted by word
    count), the (count desc, left asc, right asc) argmax as a 1-row action
    — the sanctioned index-sized decision, like the IVF centroid picks —
    then one fold projection rewrites the vocab and is localCheckpoint-ed
    (the per-round lineage cut pagerank/HITS use; without it round k
    re-evaluates k nested folds).
    """
    vocab = (
        word_counts(docs, text_col)
        .select("word", "cnt", F.split("word", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .first()
        )
        if best is None:
            raise ValueError(
                f"corpus exhausted after {len(merges)} merges; "
                f"asked for {n_merges}"
            )
        merges.append((best["a"], best["b"]))
        vocab = vocab.select(
            "word", "cnt", _apply_merge(F.col("syms"), best["a"], best["b"]).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, vocab


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned table as a frame: (rank, left, right, merged)."""
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string, merged string",
    )


def bpe_token_counts(docs: DataFrame, vocab: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bpe): per-document subword token count under the learned
    merges — the corpus pass is ONE explode+join+sum; the expensive
    segmentation happened once per DISTINCT word in ``vocab`` (dictionary
    encoding), so cost scales with vocabulary, not corpus.  The join is
    broadcast: the word->length map is vocabulary-sized."""
    lens = vocab.select("word", F.size("syms").alias("n_sub"))
    per_word = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("wcnt"))
    )
    return (
        per_word.join(F.broadcast(lens), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("wcnt") * F.col("n_sub")).alias("n_bpe"))
    )


def ref_learn_bpe(word_cnt: dict[str, int],
                  n_merges: int) -> list[tuple[str, str]]:
    """Independent plain-Python reference (the test oracle's oracle):
    dict-and-loops, no Spark, no SQL."""
    vocab = {w: list(w) for w in word_cnt}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_cnt[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            raise ValueError("corpus exhausted")
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def bpe_oracle_sql(docs_sql: str, toks_expr: str,
                   n_merges: int = BPE_MERGES) -> str:
    """Unrolled DuckDB equivalent of learn_bpe + bpe_token_counts: one
    MATERIALIZED (pairs, best, vocab) triple per round, merge application
    as ``list_reduce`` over a US-joined segment string (same greedy
    left-to-right semantics as the Spark fold), the round's winning pair a
    correlated 1-row cross join.  Emits the same two parts as the driver
    row: merge ranks and per-doc counts.

    ``toks_expr`` must be the SAME tokenizer expression the other doc_*
    oracles use, over a relation aliased ``d``."""
    sep = "chr(31)"
    parts = [
        f"WITH d AS MATERIALIZED ({docs_sql})",
        f"words AS MATERIALIZED (SELECT unnest({toks_expr}) AS word, "
        "doc_id FROM d)",
        "wc AS MATERIALIZED (SELECT word, count(*) AS cnt "
        "FROM words GROUP BY word)",
        # v0: words as US-joined codepoint segments
        f"v0 AS MATERIALIZED (SELECT word, cnt, "
        f"array_to_string(string_split(word, ''), {sep}) AS s FROM wc)",
    ]
    for i in range(1, n_merges + 1):
        p, v = f"v{i - 1}", f"v{i}"
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT seg[i] AS a, seg[i + 1] AS b, "
            f"sum(cnt) AS c FROM ("
            f"  SELECT cnt, seg, unnest(generate_series(1, len(seg) - 1)) AS i"
            f"  FROM (SELECT cnt, string_split(s, {sep}) AS seg FROM {p})"
            f"  WHERE len(seg) >= 2) GROUP BY seg[i], seg[i + 1])"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT a, b, a || b AS m FROM p{i} "
            f"ORDER BY c DESC, a ASC, b ASC LIMIT 1)"
        )
        parts.append(
            f"{v} AS MATERIALIZED (SELECT word, cnt, "
            f"list_reduce(string_split(s, {sep}), "
            f"(acc, x) -> CASE WHEN (acc = b{i}.a OR "
            f"ends_with(acc, {sep} || b{i}.a)) AND x = b{i}.b "
            f"THEN substr(acc, 1, len(acc) - len(b{i}.a)) || b{i}.m "
            f"ELSE acc || {sep} || x END) AS s "
            f"FROM {p}, b{i})"
        )
    ranks = " UNION ALL ".join(
        f"SELECT 'merge' AS part, b{i}.a AS a, b{i}.b AS b, b{i}.m AS c, "
        f"{i - 1}::BIGINT AS n FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    body = ",\n".join(parts)
    return f"""{body}
        {ranks}
        UNION ALL
        SELECT 'count' AS part, w.doc_id::VARCHAR AS a, '' AS b, '' AS c,
               sum(len(string_split(v.s, {sep})))::BIGINT AS n
        FROM words w JOIN v{n_merges} v USING (word)
        GROUP BY w.doc_id
    """
