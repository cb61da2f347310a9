"""Unit tests for the exact extraction chain (reference preprocessing.py:8-87).

These are the in-repo oracle copies of the reference's two-line bs4 chain
(H1), trailing-period (H4), mojibake map (H5), and tag-span strip (H3); the
byte-identity pipeline test in test_pipeline.py asserts the Spark UDF output
equals the template oracle — these pin the plain-Python functions themselves.
"""

from __future__ import annotations

from entity_extraction_svc_spark.functions import htmltext


def test_parse_html_basic():
    html = (
        "<!DOCTYPE html><html><head><title>T</title></head>"
        "<body><nav>Nav</nav><p>Hello   world</p><footer>F</footer></body></html>"
    )
    assert htmltext.parse_html(html) == "T Nav Hello world F"


def test_parse_html_strips_and_joins_with_single_space():
    # bs4 get_text(separator=" ", strip=True): strip each node, drop empties
    assert htmltext.parse_html("<p>  a  </p>\n\n<p> b </p>") == "a b"


def test_parse_html_entities_unescaped():
    assert htmltext.parse_html("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_parse_html_comments_dropped():
    assert htmltext.parse_html("<p>x</p><!-- hidden -->") == "x"


def test_parse_html_bytes_utf8():
    assert htmltext.parse_html("<p>café</p>".encode()) == "café"


def test_trailing_period():
    # reference preprocessing.py:18-30: append "." unless last in .,?!
    assert htmltext.add_trailing_period("abc") == "abc."
    assert htmltext.add_trailing_period("abc.") == "abc."
    assert htmltext.add_trailing_period("abc,") == "abc,"
    assert htmltext.add_trailing_period("abc?") == "abc?"
    assert htmltext.add_trailing_period("abc!") == "abc!"
    assert htmltext.add_trailing_period("abc:") == "abc:."
    assert htmltext.add_trailing_period("") == ""


def test_mojibake_map_order():
    # reference preprocessing.py:8-15 replacement map incl. multi-byte mojibake;
    # note: only the RIGHT double-quote is mapped — left stays, per reference
    assert htmltext.replace_unprocessable_chars("it’s “x” â€™ â€œ") == "it's “x\" ' \""


def test_remove_tag_spans():
    # reference preprocessing.py:48-57: re.sub('<[^<]+>', '', text).strip()
    assert htmltext.remove_tag_spans("a <b>bold</b> c") == "a bold c"
    assert htmltext.remove_tag_spans("x < 10 degrees") == "x < 10 degrees"


def test_preprocess_html_full_chain():
    html = "<html><body><p>Temperatures rose â€œfastâ€\x9d</p></body></html>"
    assert htmltext.preprocess_html(html) == 'Temperatures rose "fast".'
