"""Source operators: binaryFile HTML ingestion, trafilatura gating."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from entity_extraction_svc_spark.operators.extract import extract_text
from entity_extraction_svc_spark.sources.binary_html import read_html_files


def test_binary_html_roundtrip(spark, fixture_dir):
    """Raw .html files through the binaryFile source extract to the same
    byte-identical text as the parquet html column."""
    rows = duckdb.sql(
        f"select url, html, text from '{fixture_dir}/pages.parquet' limit 5"
    ).fetchall()
    d = tempfile.mkdtemp(prefix="kg_htmlsrc_")
    by_name = {}
    for i, (url, html, text) in enumerate(rows):
        p = os.path.join(d, f"doc{i}.html")
        with open(p, "wb") as f:
            f.write(html)
        by_name[f"doc{i}.html"] = text
    # decoy that the glob must prune
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("not html")

    pages = read_html_files(spark, d)
    out = extract_text(pages).collect()
    assert len(out) == 5
    for r in out:
        name = r.url.rsplit("/", 1)[-1]
        assert r.text == by_name[name]


def test_trafilatura_engine_gated(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    try:
        import trafilatura  # noqa: F401

        has = True
    except ImportError:
        has = False
    if has:
        assert extract_text(pages, engine="trafilatura").count() == 206
    else:
        with pytest.raises(NotImplementedError):
            extract_text(pages, engine="trafilatura")
