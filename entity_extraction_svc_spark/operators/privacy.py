"""PII detection and redaction for training-data pipelines.

Web corpora ship emails, phone numbers, IPs and SSN-shaped identifiers that
must be counted (corpus audits) and scrubbed (training exports).  Both
operators are pure built-in column expressions — ``regexp_extract_all`` /
``regexp_replace`` stay in whole-stage codegen, so a 100 TB scan runs at
parquet throughput with only ``text`` read.

Pattern dialect is deliberately the portable common subset of Java regex
(Spark) and RE2 (DuckDB): character classes, bounded repetition, ``\\b``,
non-capturing groups — no lookaround, no backrefs — so the DuckDB oracle
runs the IDENTICAL patterns and the contract checks real parity, not two
implementations of different specs.

The reference has no PII stage (it serves per-request annotation, not
corpus export); this is part of the training-data surface the engine adds
(brief: "operations a large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The phone pattern is a shape ALLOWLIST, not a digit-run catchall: the
# former `\+?[0-9][0-9 ().-]{6,}[0-9]` also swallowed ISO dates, year
# lists, ISBNs and "1 000 000"-style groupings — systematic corpus
# corruption the parity contract cannot see because both engines ran the
# identical wrong pattern.  Without lookaround (kept out for RE2 parity)
# total-digit counts can't be asserted, so each alternative pins one
# concrete phone shape with \b / '+' / '(' guarding the start so a match
# can never begin mid-digit-run:
#   +CC 3-3-4   | (415) 555-0199 | 555-123-4567 | +44 20 7946 0958 (1-4
#   digit groups, 3-5 of them) | 07700 900123 | 020 7946 0958 (trunk-0)
# Deliberately NOT matched: bare 10+ digit runs (epoch timestamps, order
# ids), 4-2-2 / 4-4 date shapes, thousands groupings, dotted quads.
_PHONE = (
    r"\+[0-9]{1,3}[ .-]?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}\b"
    r"|\([0-9]{3}\)[ .-]?[0-9]{3}[ .-][0-9]{4}\b"
    r"|\b[0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}\b"
    r"|\+[0-9]{1,3}(?:[ .-]?\(?[0-9]{1,4}\)?){3,5}\b"
    r"|\b0[0-9]{3,4}[ .-][0-9]{3,6}\b"
    r"|\b0[0-9]{1,3}(?:[ .-][0-9]{3,4}){2,3}\b"
)

# ordered: redaction applies top to bottom (email before phone so the
# digits inside a local-part are never half-eaten by the phone pattern)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("phone", _PHONE, "[PHONE]"),
]


def pii_count_exprs(text_col: str = "text") -> dict[str, "F.Column"]:
    """The cascade count COLUMNS keyed ``n_<kind>`` plus ``has_pii`` —
    exposed so composed pipelines can inline the scan next to other
    row-local gates in one projection (no per-id join)."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out: dict = {}
    flags = None
    for kind, pat, placeholder in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        out[f"n_{kind}"] = n
        flags = n > 0 if flags is None else flags | (n > 0)
        cur = F.regexp_replace(cur, pat, placeholder)
    out["has_pii"] = flags
    return out


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts: one ``n_<kind>`` column per pattern plus a
    ``has_pii`` flag.  Counts mirror the redaction cascade — each pattern
    is evaluated on the text with all EARLIER patterns already replaced by
    their placeholders, so ``n_<kind>`` is exactly the number of
    ``[<KIND>]`` placeholders ``pii_redact`` inserts (an SSN no longer
    double-counts as a phone).  Still pure nested codegen expressions."""
    e = pii_count_exprs(text_col)
    return docs.select(
        F.col(id_col), *[c.alias(name) for name, c in e.items()]
    )


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Replace every PII match with its typed placeholder, in the fixed
    PII_PATTERNS order (email first — see module docstring).  Returns
    (id, redacted)."""
    out = F.coalesce(F.col(text_col), F.lit(""))
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return docs.select(F.col(id_col), out.alias("redacted"))
