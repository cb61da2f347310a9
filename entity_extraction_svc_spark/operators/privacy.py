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

# IBAN: CC + 2 check digits + 4-char groups (spaced or contiguous); shape
# candidates are gated by the REAL mod-97 checksum below, so an all-caps
# token that happens to look IBAN-ish survives unredacted 96/97 of the time
_IBAN = r"\b[A-Z]{2}[0-9]{2}(?: ?[A-Z0-9]{4}){2,7}(?: ?[A-Z0-9]{1,3})?\b"
# payment card: 13-19 digits, contiguous or 4-grouped with space/dash;
# gated by the Luhn mod-10 checksum (16-digit order ids stay untouched)
_CARD = r"\b(?:[0-9]{4}[ -]?){3}[0-9]{1,7}\b"

# ordered: redaction applies top to bottom (email before phone so the
# digits inside a local-part are never half-eaten by the phone pattern;
# iban/card before phone so the trunk-0 / grouped-digit phone shapes never
# eat the middle of an account number).  4th field: checksum validator
# name (None = every pattern match counts) — validators run as pure
# column expressions in BOTH engines, see luhn_valid/iban_valid.
PII_SPEC: list[tuple[str, str, str, str | None]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]", None),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]", None),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]", None),
    ("iban", _IBAN, "[IBAN]", "iban"),
    ("card", _CARD, "[CARD]", "luhn"),
    ("phone", _PHONE, "[PHONE]", None),
]

# back-compat view (kind, pattern, placeholder)
PII_PATTERNS: list[tuple[str, str, str]] = [
    (k, p, ph) for k, p, ph, _ in PII_SPEC
]


def luhn_valid(c: "F.Column") -> "F.Column":
    """Luhn mod-10 over the candidate's digits (separators stripped),
    13-19 digits — pure column expressions (sequence/transform/aggregate
    stay in codegen)."""
    ds = F.regexp_replace(c, r"[^0-9]", "")
    rev = F.reverse(ds)
    n = F.length(ds)
    digit = lambda i: F.ascii(F.substr(rev, i, F.lit(1))) - 48  # noqa: E731

    def step(acc, i):
        d = digit(i)
        d2 = F.when(i % 2 == 0, d * 2).otherwise(d)
        return acc + F.when(d2 > 9, d2 - 9).otherwise(d2)

    total = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))), F.lit(0), step
    )
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def iban_valid(c: "F.Column") -> "F.Column":
    """ISO 13616 mod-97: move the first 4 chars to the end, map letters to
    10..35, fold (acc*base + v) % 97 over the characters, valid iff 1."""
    s = F.upper(F.regexp_replace(c, r" ", ""))
    n = F.length(s)
    rearranged = F.concat(F.substring(s, 5, 40), F.substring(s, 1, 4))

    def step(acc, i):
        ch = F.ascii(F.substr(rearranged, i, F.lit(1)))
        return F.when(
            ch.between(48, 57), (acc * 10 + ch - 48) % 97
        ).otherwise((acc * 100 + ch - 55) % 97)

    acc = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))), F.lit(0), step
    )
    return (n >= 15) & (n <= 34) & (acc == 1)


_VALIDATORS = {"luhn": luhn_valid, "iban": iban_valid}


def pii_count_exprs(text_col: str = "text") -> dict[str, "F.Column"]:
    """The cascade count COLUMNS keyed ``n_<kind>`` plus ``has_pii`` —
    exposed so composed pipelines can inline the scan next to other
    row-local gates in one projection (no per-id join).  Checksummed kinds
    count (and the cascade replaces) only validator-passing candidates."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out: dict = {}
    flags = None
    for kind, pat, placeholder, validator in PII_SPEC:
        if validator is None:
            n = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            nxt = F.regexp_replace(cur, pat, placeholder)
        else:
            ms = F.regexp_extract_all(cur, F.lit(pat), 0)
            valids = F.filter(ms, _VALIDATORS[validator])
            n = F.size(valids)
            # POSITIONAL reconstruction, not replace-by-value: rebuild the
            # text as seg0 + (valid(m1) ? placeholder : m1) + seg1 + ...
            # from split() segments and the scan's own match list, so
            # redaction touches EXACTLY the scan's matches by position.
            # Any replace-by-candidate-string form (literal or
            # boundary-guarded) also rewrites a valid candidate where it
            # occurs inside or overlapping a checksum-FAILING candidate's
            # span — the scan, being non-overlapping left-to-right, never
            # matched there, so count and placeholders would disagree and
            # the failing shape the design promises to keep would be
            # mangled ('ref 9998 4111 1111 1111 1111' kept intact here).
            segs = F.split(cur, pat, -1)
            pieces = F.transform(
                ms,
                lambda c, i: F.concat(
                    F.when(_VALIDATORS[validator](c),
                           F.lit(placeholder)).otherwise(c),
                    F.element_at(segs, i + F.lit(2)),
                ),
            )
            nxt = F.concat(
                F.element_at(segs, F.lit(1)),
                F.aggregate(pieces, F.lit(""),
                            lambda a, b: F.concat(a, b)),
            )
        out[f"n_{kind}"] = n
        flags = n > 0 if flags is None else flags | (n > 0)
        cur = nxt
    out["has_pii"] = flags
    out["_redacted"] = cur
    return out


def _luhn_sql(c: str) -> str:
    ds = f"regexp_replace({c}, '[^0-9]', '', 'g')"
    d = f"(ascii(substring(reverse({ds}), i, 1)) - 48)"
    term = (f"CASE WHEN i % 2 = 0 THEN "
            f"CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 ELSE 2*{d} END "
            f"ELSE {d} END")
    return (f"(len({ds}) BETWEEN 13 AND 19 AND "
            f"list_sum(list_transform(range(1, len({ds})+1), i -> {term}))"
            f" % 10 = 0)")


def _iban_sql(c: str) -> str:
    s = f"upper(replace({c}, ' ', ''))"
    re_ = f"(substring({s}, 5) || substring({s}, 1, 4))"
    chars = (f"list_transform(range(1, len({re_})+1), "
             f"i -> ascii(substring({re_}, i, 1)))")
    fold = (f"list_reduce(list_prepend(0, {chars}), (acc, ch) -> "
            f"CASE WHEN ch BETWEEN 48 AND 57 THEN (acc*10 + ch - 48) % 97 "
            f"ELSE (acc*100 + ch - 55) % 97 END)")
    return f"(len({s}) BETWEEN 15 AND 34 AND {fold} = 1)"


_SQL_VALIDATORS = {"luhn": _luhn_sql, "iban": _iban_sql}


def duckdb_pii_exprs(text_expr: str = "text") -> tuple[list[tuple[str, str]], str]:
    """The DuckDB rendition of the SAME cascade: ordered
    [(kind, count_sql)] plus the final redacted_sql.  Patterns are the
    byte-identical RE2/Java common-subset strings; the checksum validators
    are re-expressed in DuckDB's list functions with the same arithmetic.
    Living in this module keeps ONE ordered spec for both engines — the
    contract oracle composes these strings verbatim."""
    cur = f"coalesce({text_expr}, '')"
    counts: list[tuple[str, str]] = []
    for kind, pat, ph, validator in PII_SPEC:
        if validator is None:
            counts.append((kind, f"len(regexp_extract_all({cur}, '{pat}'))"))
            cur = f"regexp_replace({cur}, '{pat}', '{ph}', 'g')"
        else:
            valid = _SQL_VALIDATORS[validator]("c")
            ms = f"regexp_extract_all({cur}, '{pat}')"
            valids = f"list_filter({ms}, c -> {valid})"
            counts.append((kind, f"len({valids})"))
            # positional reconstruction, the exact twin of the Spark side
            # (see pii_count_exprs): seg0 + (valid ? ph : match_i) +
            # seg_i, via DuckDB's (value, 1-based index) lambdas;
            # list_prepend('') makes the reduce total on zero matches
            segs = f"regexp_split_to_array({cur}, '{pat}')"
            pieces = (f"list_transform({ms}, (c, i) -> "
                      f"(CASE WHEN {valid} THEN '{ph}' ELSE c END) "
                      f"|| ({segs})[i+1])")
            cur = (f"(({segs})[1] || list_reduce("
                   f"list_prepend('', {pieces}), (a, b) -> a || b))")
    return counts, cur


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
        F.col(id_col),
        *[c.alias(name) for name, c in e.items() if not name.startswith("_")],
    )


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Replace every (validator-passing) PII match with its typed
    placeholder, in the fixed PII_SPEC order (email first — see module
    docstring).  The redacted text is the cascade's final state, so it is
    definitionally consistent with ``pii_scan``'s counts.  Returns
    (id, redacted)."""
    out = pii_count_exprs(text_col)["_redacted"]
    return docs.select(F.col(id_col), out.alias("redacted"))
