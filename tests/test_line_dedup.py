"""CCNet-style paragraph-level exact dedup (dedup.line_dedup)."""

from __future__ import annotations

import duckdb
import pandas as pd

from entity_extraction_svc_spark.operators.dedup import (
    line_dedup,
    line_dedup_oracle_sql,
)

_ROWS = [
    (1, "Nav Bar\nThe Mona Lisa is a painting.\nFooter"),
    (2, "Nav Bar\nStarliner is a spacecraft.\nFooter"),
    (3, "  nav   BAR \nUnique line\n\n   \nFooter"),
    (4, "nav bar"),  # every line loses its group -> doc disappears
]


def _docs(spark, rows=_ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _oracle(rows, sep="\n"):
    con = duckdb.connect()
    con.register("ld_in", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return sorted(map(tuple, con.sql(
        line_dedup_oracle_sql("SELECT doc_id, text FROM ld_in", sep=sep)
    ).fetchall()))


def test_keep_first_drop_later_and_normalized_match(spark):
    got = {r.doc_id: r for r in line_dedup(_docs(spark)).collect()}
    # doc 1 is the lexicographically first holder of every one of its
    # lines -> fully intact
    assert got[1].text == "Nav Bar\nThe Mona Lisa is a painting.\nFooter"
    assert (got[1].n_kept, got[1].n_dropped) == (3, 0)
    # doc 2 loses the boilerplate (doc 1 owns it), keeps its body
    assert got[2].text == "Starliner is a spacecraft."
    assert (got[2].n_kept, got[2].n_dropped) == (1, 2)
    # doc 3's "  nav   BAR " normalizes to doc 1's "nav bar" -> dropped;
    # empty/whitespace lines count as dropped too
    assert got[3].text == "Unique line"
    assert (got[3].n_kept, got[3].n_dropped) == (1, 4)
    # doc 4: nothing survives -> absent
    assert 4 not in got


def test_within_doc_repeat_dropped(spark):
    rows = [(1, "same line\nbody\nsame line")]
    got = line_dedup(_docs(spark, rows)).collect()[0]
    assert got.text == "same line\nbody" and got.n_dropped == 1


def test_matches_oracle_and_partitioning_invariance(spark):
    got = sorted(map(tuple, line_dedup(_docs(spark)).collect()))
    assert got == _oracle(_ROWS) and len(got) == 3
    re = sorted(map(tuple, line_dedup(_docs(spark).repartition(7)).collect()))
    assert re == got


def test_literal_separator_with_regex_metachars(spark):
    rows = [(1, "a . b . a")]
    got = sorted(map(tuple, line_dedup(_docs(spark, rows), sep=" . ").collect()))
    assert got[0][1] == "a . b"
    assert got == _oracle(rows, sep=" . ")
