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

# ordered: redaction applies top to bottom (email before phone so the
# digits inside a local-part are never half-eaten by the phone pattern)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+?[0-9][0-9 ().-]{6,}[0-9]", "[PHONE]"),
]


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts: one ``n_<kind>`` column per pattern plus a
    ``has_pii`` flag.  Counts overlap-free left-to-right matches (the
    engines' shared regex semantics)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col)]
    flags = None
    for kind, pat, _ in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        cols.append(n.alias(f"n_{kind}"))
        flags = n > 0 if flags is None else flags | (n > 0)
    cols.append(flags.alias("has_pii"))
    return docs.select(*cols)


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Replace every PII match with its typed placeholder, in the fixed
    PII_PATTERNS order (email first — see module docstring).  Returns
    (id, redacted)."""
    out = F.coalesce(F.col(text_col), F.lit(""))
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return docs.select(F.col(id_col), out.alias("redacted"))
