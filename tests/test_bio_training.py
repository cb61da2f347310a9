"""Distant-supervision BIO emission (ner.bio_training_rows)."""

from __future__ import annotations

import duckdb
import pandas as pd

from entity_extraction_svc_spark.operators.ner import (
    bio_training_oracle_sql,
    bio_training_rows,
)

#           0123456789012345678901234567890123456789
_TEXT1 = "The Mona Lisa hangs in the Louvre today."
# mentions: "Mona Lisa" [4,13) WORK, "Louvre" [27,33) — note the final
# token "today." ends with a period the span does not cover
_TEXT2 = "SpaceX  launches"  # double space -> empty token dropped
_DOCS = [("d1", _TEXT1), ("d2", _TEXT2)]
_MENTIONS = [
    ("d1", 4, 13, "WORK"),
    ("d1", 27, 33, "LOC"),
    ("d2", 0, 6, "ORG"),
]


def _frames(spark):
    docs = spark.createDataFrame(_DOCS, "url string, text string")
    m = spark.createDataFrame(
        _MENTIONS, "url string, start long, end long, tag string"
    )
    return docs, m


def test_hand_computed_bio(spark):
    docs, m = _frames(spark)
    got = {(r.url, r.tok_idx): (r.token, r.tok_start, r.tok_end, r.bio)
           for r in bio_training_rows(docs, m).collect()}
    assert got[("d1", 0)] == ("The", 0, 3, "O")
    assert got[("d1", 1)] == ("Mona", 4, 8, "B-WORK")
    assert got[("d1", 2)] == ("Lisa", 9, 13, "I-WORK")
    assert got[("d1", 3)] == ("hangs", 14, 19, "O")
    assert got[("d1", 6)] == ("Louvre", 27, 33, "B-LOC")
    assert got[("d1", 7)] == ("today.", 34, 40, "O")
    # d2: empty token (double space) dropped, offsets still honest
    assert got[("d2", 0)] == ("SpaceX", 0, 6, "B-ORG")
    assert ("d2", 1) not in got  # the empty token
    assert got[("d2", 2)] == ("launches", 8, 16, "O")


def test_mid_token_span_gets_labelled(spark):
    # span [34,39) covers "today" but not the period: the token
    # "today." OVERLAPS it and is labelled B-
    docs, _ = _frames(spark)
    m = spark.createDataFrame(
        [("d1", 34, 39, "MISC")], "url string, start long, end long, tag string"
    )
    got = {r.tok_idx: r.bio
           for r in bio_training_rows(docs, m).filter("url='d1'").collect()}
    assert got[7] == "B-MISC" and got[0] == "O"


def test_overlapping_mentions_least_wins(spark):
    docs, _ = _frames(spark)
    m = spark.createDataFrame(
        [("d1", 4, 13, "WORK"), ("d1", 4, 13, "ART"), ("d1", 9, 13, "X")],
        "url string, start long, end long, tag string",
    )
    got = {r.tok_idx: r.bio
           for r in bio_training_rows(docs, m).filter("url='d1'").collect()}
    # (4,13,ART) < (4,13,WORK) < (9,13,X): tokens 1-2 take ART
    assert got[1] == "B-ART" and got[2] == "I-ART"


def test_interleaved_overlaps_stay_well_formed(spark):
    """Review-pass find: with the old first-overlapping-token B rule,
    two partially-overlapping mentions could emit an I- run with no B-
    (here: the ORG mention's first overlapping token loses to PER, so
    the next ORG token used to come out I-ORG).  The run-start rule
    restarts it as B-ORG — every I- follows its own B-."""
    #        0123456789012345
    docs = spark.createDataFrame(
        [("d1", "Aaaa bbbb cccc")], "url string, text string")
    m = spark.createDataFrame(
        [("d1", 0, 8, "PER"), ("d1", 4, 13, "ORG")],
        "url string, start long, end long, tag string",
    )
    got = [r.bio for r in bio_training_rows(docs, m)
           .orderBy("tok_idx").collect()]
    assert got == ["B-PER", "I-PER", "B-ORG"]
    # well-formedness over the whole output: every I-x preceded by
    # B-x or I-x of the same tag
    prev = "O"
    for b in got:
        if b.startswith("I-"):
            assert prev.endswith(b[2:]) and prev != "O"
        prev = b


def test_matches_oracle_and_partitioning_invariance(spark):
    docs, m = _frames(spark)
    got = sorted(map(tuple, bio_training_rows(docs, m).collect()))
    con = duckdb.connect()
    con.register("bd", pd.DataFrame(_DOCS, columns=["url", "text"]))
    con.register("bm", pd.DataFrame(
        _MENTIONS, columns=["url", "m_start", "m_end", "m_tag"]))
    want = sorted(map(tuple, con.sql(bio_training_oracle_sql(
        "SELECT url, text FROM bd",
        "SELECT url, m_start, m_end, m_tag FROM bm",
    )).fetchall()))
    assert got == want and len(got) == 10
    re = sorted(map(tuple, bio_training_rows(
        docs.repartition(5), m.repartition(3)).collect()))
    assert re == got


def test_golden_mentions_roundtrip(spark, fixture_dir):
    """Over the real fixture corpus: every golden mention must produce
    exactly one B- token, and B/I counts must cover every mention's
    overlapping tokens."""
    docs = spark.read.parquet(f"{fixture_dir}/pages.parquet").select(
        "url", "text")
    m = spark.read.parquet(f"{fixture_dir}/golden_mentions.parquet")
    rows = bio_training_rows(docs, m)
    n_b = rows.filter("bio like 'B-%'").count()
    n_mentions = m.count()
    # every mention has >= 1 overlapping token; overlapping mentions can
    # merge (a token takes one label), so B-count <= mention count and
    # close to it on the golden set
    assert 0 < n_b <= n_mentions
    assert n_b >= n_mentions * 0.95
    assert rows.filter("bio = 'O'").count() > 0
