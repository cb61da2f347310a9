"""BPE merge learning + token counting (operators/bpe.py)."""

from __future__ import annotations

import duckdb
import pytest

from entity_extraction_svc_spark.operators.bpe import (
    bpe_oracle_sql,
    bpe_token_counts,
    learn_bpe,
    ref_learn_bpe,
)

_TEXTS = [
    (1, "low low low lower lowest"),
    (2, "new newer newest low"),
    (3, "wider wide new"),
]


def _docs(spark):
    return spark.createDataFrame(_TEXTS, "doc_id long, text string")


def _ref_wc():
    wc: dict[str, int] = {}
    for _, t in _TEXTS:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_learn_bpe_matches_python_reference(spark):
    merges, _ = learn_bpe(_docs(spark), n_merges=6)
    assert merges == ref_learn_bpe(_ref_wc(), 6)
    # the classic toy outcome: 'lo' then 'low' merge first (freq 5)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")


def test_token_counts_match_hand_segmentation(spark):
    merges, vocab = learn_bpe(_docs(spark), n_merges=6)
    got = {r.doc_id: r.n_bpe for r in bpe_token_counts(_docs(spark), vocab).collect()}
    # segment each word with the python reference merges
    def seg_len(word):
        syms = list(word)
        for a, b in merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return len(syms)

    want = {}
    for did, t in _TEXTS:
        want[did] = sum(seg_len(w) for w in t.lower().split())
    assert got == want
    # sanity: low=1 token ('low'), lowest = low+e+s+t = 4
    assert seg_len("low") == 1


def test_learn_bpe_matches_sql_oracle(spark):
    merges, vocab = learn_bpe(_docs(spark), n_merges=6)
    counts = {str(r.doc_id): r.n_bpe
              for r in bpe_token_counts(_docs(spark), vocab).collect()}
    rows = ", ".join(f"({i}, '{t}')" for i, t in _TEXTS)
    toks = ("list_filter(string_split_regex(lower(coalesce(d.text,'')), "
            "'\\s+'), t -> t != '')")
    got = duckdb.sql(
        bpe_oracle_sql(f"SELECT * FROM (VALUES {rows}) t(doc_id, text)", toks, 6)
    ).fetchall()
    sql_merges = [(r[1], r[2]) for r in sorted(
        (r for r in got if r[0] == "merge"), key=lambda r: r[4])]
    sql_counts = {r[1]: r[4] for r in got if r[0] == "count"}
    assert sql_merges == merges
    assert sql_counts == counts


def test_learn_bpe_exhaustion_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exhausted"):
        learn_bpe(docs, n_merges=1)


def test_learn_bpe_partitioning_invariant(spark):
    df = _docs(spark)
    a, _ = learn_bpe(df, n_merges=4)
    b, _ = learn_bpe(df.repartition(5), n_merges=4)
    assert a == b
