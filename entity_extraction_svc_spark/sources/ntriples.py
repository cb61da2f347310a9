"""Custom-KB ingest: N-triples lines -> KB tables (reference S7/S8).

The reference parses ``"<subj> <rel> <obj> ."`` lines, groups them by
subject, and inserts label/type rows into its FTS5 index
(``src/entity_linking.py:202-267`` ``parse_custom_database``; single-row
upsert ``add_entity`` at ``entity_linking.py:188-200``).  Here the same ETL
is a line scan -> regexp projection -> groupBy(subj) aggregation -> KB
tables, all JVM-side:

    lines -> parse_ntriples -> triples(subj, pred, obj)
          -> build_kb_entities -> (qid, label, tag, num_rels, p31)

At corpus scale the line source is a distributed text scan (one task per
split); the only shuffle is the per-subject aggregation, map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# "<subj> <rel> <obj> ." with <obj> either an IRI or a quoted literal;
# the literal body admits backslash-escaped characters (incl. \") so a
# formatted line with special characters re-parses instead of dropping.
# Literals may carry a language tag (@en, @zh-Hans — group 5) or a
# datatype IRI (^^<...#integer> — group 6), the remaining N-Triples
# object forms; both optional and mutually exclusive per the spec.
NT_RE = (
    r'^<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|"((?:[^"\\]|\\.)*)"'
    r'(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\^\^<([^>]+)>)?)\s*\.\s*$'
)

# sentinel for the single-pass unescape below: escaped backslashes park
# here so later replacements never mistake "\\t" (backslash + t) for a
# tab escape.  NUL cannot appear in an N-Triples line (the spec's literal
# charset excludes raw control characters), so the slot is free.
_SENTINEL = "\x00"


def _unescape_literal(c: "F.Column") -> "F.Column":
    """Inverse of :func:`_escape_literal` (\\\\ \\" \\n \\r \\t): escaped
    backslashes move to a sentinel first, the remaining backslash pairs
    are true escapes, then the sentinel restores the backslash."""
    c = F.regexp_replace(c, r"\\\\", _SENTINEL)
    c = F.regexp_replace(c, r'\\"', '"')
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    return F.regexp_replace(c, _SENTINEL, r"\\")


def parse_ntriples(lines: DataFrame, col: str = "value",
                   keep_annotations: bool = False) -> DataFrame:
    """Text lines -> (subj, pred, obj); malformed lines are dropped.

    The IRI prefix is stripped to the local name (the reference keys
    everything by bare QID/PID, ``wiki_parser.py:30-37``); literal
    objects are UNESCAPED, so parse is the true inverse of
    :func:`format_ntriples` including special characters.  Language tags
    and datatype IRIs on literals are accepted either way;
    ``keep_annotations=True`` surfaces them as nullable ``lang`` /
    ``dtype`` columns (dtype = the full IRI, so formatting round-trips)
    instead of dropping them."""
    local = lambda c: F.element_at(F.split(c, "/"), -1)  # noqa: E731
    parsed = lines.select(
        F.regexp_extract(F.col(col), NT_RE, 1).alias("s_iri"),
        F.regexp_extract(F.col(col), NT_RE, 2).alias("p_iri"),
        F.regexp_extract(F.col(col), NT_RE, 3).alias("o_iri"),
        F.regexp_extract(F.col(col), NT_RE, 4).alias("o_lit"),
        F.regexp_extract(F.col(col), NT_RE, 5).alias("o_lang"),
        F.regexp_extract(F.col(col), NT_RE, 6).alias("o_dtype"),
    )
    cols = [
        local(F.col("s_iri")).alias("subj"),
        local(F.col("p_iri")).alias("pred"),
        F.when(F.col("o_iri") != "", local(F.col("o_iri")))
        .otherwise(_unescape_literal(F.col("o_lit")))
        .alias("obj"),
    ]
    if keep_annotations:
        cols += [
            F.when(F.col("o_lang") != "", F.col("o_lang")).alias("lang"),
            F.when(F.col("o_dtype") != "", F.col("o_dtype")).alias("dtype"),
        ]
    return (
        parsed.filter((F.col("s_iri") != "") & (F.col("p_iri") != ""))
        .select(*cols)
        .filter(F.col("obj") != "")
    )


def build_kb_entities(triples: DataFrame, label_rel: str = "label",
                      type_rel: str = "P31",
                      type_to_tag: dict[str, str] | None = None) -> DataFrame:
    """Per-subject KB rows: label, routing tag (via the type->tag map, the
    reference's ``type_to_tag`` parameter), popularity prior num_rels.

    One groupBy(subj) with map-side partial aggregation; the type->tag map
    rides as a column literal (no join needed — it is config, not data)."""
    type_to_tag = type_to_tag or {}
    tag_map = (
        F.create_map(*[F.lit(x) for kv in type_to_tag.items() for x in kv])
        if type_to_tag
        else None
    )
    agg = triples.groupBy("subj").agg(
        F.max(F.when(F.col("pred") == label_rel, F.col("obj"))).alias("label"),
        F.sort_array(
            F.collect_set(F.when(F.col("pred") == type_rel, F.col("obj")))
        ).alias("p31"),
        F.count("*").alias("num_rels"),
    )
    tag = F.lit("MISC")
    if tag_map is not None:
        # try_element_at: an entity with labels but no type rows has an
        # EMPTY p31 array (the escape-fixture QESC entities exposed this
        # — plain element_at throws INVALID_ARRAY_INDEX on it)
        tag = F.coalesce(
            tag_map[F.try_element_at(F.col("p31"), F.lit(1))],
            F.lit("MISC"),
        )
    return agg.select(
        F.col("subj").alias("qid"),
        "label",
        tag.alias("tag"),
        F.col("num_rels").cast("long").alias("num_rels"),
        "p31",
    ).filter(F.col("label").isNotNull())


def upsert_entities(existing: DataFrame, new_rows: DataFrame,
                    key: str = "qid") -> DataFrame:
    """S8 MERGE semantics without a table format: new rows win on key
    collision (an Iceberg deployment replaces this with MERGE INTO)."""
    cols = existing.columns
    return new_rows.select(cols).unionByName(
        existing.join(new_rows.select(key), key, "left_anti")
    )


# export bases — wikidata-style entity/predicate IRS namespaces; the
# parser's local-name strip is their inverse, so format -> parse is the
# identity on (subj, pred, obj)
ENTITY_BASE = "http://www.wikidata.org/entity/"
PRED_BASE = "http://www.wikidata.org/prop/direct/"


def _escape_literal(c: "F.Column") -> "F.Column":
    """N-Triples literal escapes (\\ " \\n \\r \\t), backslash first so the
    later escapes aren't double-escaped — a regexp_replace chain, pure
    codegen."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    return F.regexp_replace(c, "\t", r"\\t")


def format_ntriples(triples: DataFrame, entity_base: str = ENTITY_BASE,
                    pred_base: str = PRED_BASE) -> DataFrame:
    """(subj, pred, obj) -> one canonical N-Triples ``line`` per row — the
    export sink inverse of :func:`parse_ntriples` (reference S7's ingest
    direction), for interchange with standard RDF tooling.  QID-shaped
    objects serialize as IRIs, everything else as escaped literals; if
    the input carries ``lang`` / ``dtype`` columns (a
    ``parse_ntriples(keep_annotations=True)`` output) they serialize back
    as ``@lang`` / ``^^<dtype>`` suffixes, lang winning when both are set
    (the spec makes them mutually exclusive).  Row-local string concat,
    zero exchanges: a 10^12-triple export runs at scan throughput and
    ``write.text`` shards it per partition."""
    suffix = F.lit("")
    if "lang" in triples.columns or "dtype" in triples.columns:
        lang = F.col("lang") if "lang" in triples.columns else F.lit(None)
        dtype = F.col("dtype") if "dtype" in triples.columns else F.lit(None)
        suffix = F.coalesce(
            F.when(lang.isNotNull(), F.concat(F.lit("@"), lang)),
            F.when(dtype.isNotNull(),
                   F.concat(F.lit("^^<"), dtype, F.lit(">"))),
            F.lit(""),
        )
    obj = F.when(
        F.col("obj").rlike("^Q[0-9]+$"),
        F.concat(F.lit("<" + entity_base), F.col("obj"), F.lit(">")),
    ).otherwise(
        F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'),
                 suffix)
    )
    return triples.select(
        F.concat(
            F.lit("<" + entity_base), F.col("subj"), F.lit("> <" + pred_base),
            F.col("pred"), F.lit("> "), obj, F.lit(" ."),
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str, **format_kwargs) -> None:
    """Materialize the export: one text file per partition (repartition
    upstream to choose shard count)."""
    format_ntriples(triples, **format_kwargs).write.mode("overwrite").text(path)
