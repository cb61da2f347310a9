"""HTML -> text extraction, byte-identical to the reference chain.

Reference semantics (``/root/reference/agent/server_utils/preprocessing.py:18-74``
and ``/root/reference/agent/server.py:215-236``):

    parse_html_bs4(html)            # soup.get_text(separator=" ", strip=True)
                                    # then re.sub(r"\\s+", " ", doc)
    add_trailing_period(text)       # append "." unless last char in .,?!
    replace_unprocessable_chars(t)  # mojibake map

bs4 is not available in this environment, so ``get_text(separator=" ",
strip=True)`` is re-implemented on the stdlib ``html.parser``: collect every
text node (including <script>/<style> contents, as bs4 does), strip each,
drop empties, join with a single space.  Entity references are unescaped by
the parser (``convert_charrefs=True``), matching bs4's html.parser backend.

These are plain-Python functions so the very same code runs (a) inside the
Arrow-batched pandas UDF on executors and (b) as the in-repo oracle for the
byte-identity pytest (BASELINE.json input_hint per-row invariant).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

CORRECT_TRAILING_PUNCTUATION = (".", ",", "?", "!")

# reference: agent/server_utils/preprocessing.py:9-15 (insertion order matters:
# dict iteration order is the replacement order)
UNPROCESSABLE_CHAR_MAP = (
    ("’", "'"),
    ("”", '"'),
    ("â€™", "'"),
    ("â€œ", '"'),
    ("â€\x9d", '"'),
)

_WS_RE = re.compile(r"\s+")
_TAG_SPAN_RE = re.compile("<[^<]+>")


class _TextCollector(HTMLParser):
    """Collects all text nodes like bs4's ``soup.get_text``."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pieces: list[str] = []

    def handle_data(self, data: str) -> None:
        self.pieces.append(data)

    # comments / doctype / processing instructions are not text nodes
    def handle_comment(self, data: str) -> None:  # noqa: D102
        pass

    def handle_decl(self, decl: str) -> None:  # noqa: D102
        pass

    def handle_pi(self, data: str) -> None:  # noqa: D102
        pass


def parse_html(raw_html: bytes | str) -> str:
    """``BeautifulSoup(html, "html.parser").get_text(" ", strip=True)`` +
    whitespace collapse (reference preprocessing.py:60-74)."""
    if isinstance(raw_html, (bytes, bytearray)):
        raw_html = raw_html.decode("utf-8", errors="replace")
    parser = _TextCollector()
    parser.feed(raw_html)
    parser.close()
    doc = " ".join(s for piece in parser.pieces if (s := piece.strip()))
    return _WS_RE.sub(" ", doc)


def add_trailing_period(text: str) -> str:
    """reference preprocessing.py:18-30."""
    if text and text[-1] not in CORRECT_TRAILING_PUNCTUATION:
        text = f"{text}."
    return text


def replace_unprocessable_chars(text: str) -> str:
    """reference preprocessing.py:33-45."""
    for old_symb, new_symb in UNPROCESSABLE_CHAR_MAP:
        text = text.replace(old_symb, new_symb)
    return text


def remove_tag_spans(text: str) -> str:
    """reference preprocessing.py:48-57."""
    return _TAG_SPAN_RE.sub("", text).strip()


def preprocess_text(text: str) -> str:
    """reference agent/server.py:215-219."""
    return replace_unprocessable_chars(add_trailing_period(text))


def preprocess_html(raw_html: bytes | str) -> str:
    """reference agent/server.py:222-236 with engine="bs4" (the deterministic
    engine; trafilatura is the other request-time option, out of scope)."""
    return preprocess_text(parse_html(raw_html))
