"""Knowledge-base tables -> broadcast linker dictionaries.

The reference keeps its KB in per-tag SQLite FTS5 files plus pickle dicts
(``src/entity_linking.py:140-183``); the pickle layout (name_to_q, word_to_q,
entity_ranking_dict, entity_to_tag, q_to_name, p131, p641, types, q_to_page,
wikidata) is the data model replicated here.  On Spark the KB is a set of
parquet/Iceberg dimension tables; the linker dictionaries are built once on
the driver and shipped as a single ``sc.broadcast`` so each executor
deserializes them once (north rule: "dictionaries shipped as broadcast
variables", "model broadcast per executor").

At 10^12-doc scale the KB stays a dimension (orders of magnitude smaller
than the fact table), so broadcast — not a shuffle join — is the right
physical plan for candidate generation.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_NORM_WS = re.compile(r"\s+")


def normalize_label(label: str) -> str:
    """Normalization applied to both index keys and query strings.

    Mirrors the reference's FTS5 'porter ascii' tokenizer equality modulo
    stemming plus its query-side cleanup (``entity_linking.py:1026-1037``):
    lowercase, drop '.'/',', hyphens/apostrophes/etc -> space, collapse ws.
    """
    s = label.lower().replace(".", "").replace(",", "")
    # parens/quotes are tokenized away by FTS5 too — without this, the index
    # key for "Mona Lisa (Prado)" keeps its parens while the decoded mention
    # drops them, and the exact match misses
    for old, new in (("-", " "), ("'", " "), ("&", ""), ("/", " "), (":", " "),
                     ("(", " "), (")", " "), ('"', " ")):
        s = s.replace(old, new)
    return _NORM_WS.sub(" ", s).strip()


@dataclass
class LinkerDicts:
    """The broadcastable KB image (reference pickle dicts, entity_linking.py:170-183)."""

    # normalized label/alias -> [(qid, "name"|"alias", raw_label)]
    name_to_q: dict[str, list[tuple[str, str, str]]] = field(default_factory=dict)
    # word -> set of qids whose label/alias contains the word
    word_to_q: dict[str, set[str]] = field(default_factory=dict)
    entity_ranking_dict: dict[str, int] = field(default_factory=dict)
    entity_to_tag: dict[str, str] = field(default_factory=dict)
    # qid -> [(raw_label, "name"|"alias")]
    q_to_name: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    p131_dict: dict[str, list[str]] = field(default_factory=dict)
    p641_dict: dict[str, list[str]] = field(default_factory=dict)
    types_dict: dict[str, list[str]] = field(default_factory=dict)
    q_to_page: dict[str, str] = field(default_factory=dict)
    q_to_descr: dict[str, str] = field(default_factory=dict)
    # qid -> [[rel, obj1, obj2, ...], ...] (sqlite triplets_str, pre-split)
    wikidata: dict[str, list[list[str]]] = field(default_factory=dict)
    # occupation qid -> fine tag (entity_linking.py:1541)
    occ_labels_dict: dict[str, str] = field(default_factory=dict)
    # qid -> (image_link, categories, first_par, dbpedia_types)
    add_info: dict[str, tuple[str, list[str], str, list[str]]] = field(default_factory=dict)


def build_linker_dicts(
    entities: list[dict],
    aliases: list[dict],
    triples: list[tuple[str, str, str]],
    occ_labels: dict[str, str] | None = None,
) -> LinkerDicts:
    """Build the broadcast image from collected KB rows (plain dicts)."""
    d = LinkerDicts()
    d.occ_labels_dict = dict(occ_labels or {})

    per_subj: dict[str, dict[str, list[str]]] = defaultdict(lambda: defaultdict(list))
    for s, p, o in triples:
        per_subj[s][p].append(o)
    for s, rels in per_subj.items():
        # tuples: candidate score tuples containing these must be hashable
        d.wikidata[s] = tuple((rel, *objs) for rel, objs in rels.items())

    def _index_surface(surface: str, qid: str, kind: str) -> None:
        norm = normalize_label(surface)
        if not norm:
            return
        d.name_to_q.setdefault(norm, []).append((qid, kind, surface))
        for word in norm.split():
            if len(word) > 1:
                d.word_to_q.setdefault(word, set()).add(qid)

    for row in entities:
        qid = row["qid"]
        d.entity_ranking_dict[qid] = int(row.get("num_rels") or 0)
        d.entity_to_tag[qid] = row.get("tag") or "MISC"
        d.q_to_page[qid] = row.get("page") or ""
        d.q_to_descr[qid] = row.get("descr") or ""
        d.types_dict[qid] = list(row.get("p31") or [])
        d.p131_dict[qid] = list(row.get("p131") or [])
        d.p641_dict[qid] = list(row.get("p641") or [])
        label = row["label"]
        d.q_to_name.setdefault(qid, []).append((label, "name"))
        _index_surface(label, qid, "name")
        d.add_info[qid] = (
            row.get("image_link") or "",
            list(row.get("categories") or []),
            row.get("descr") or "",
            list(row.get("dbpedia_types") or []),
        )

    for row in aliases:
        qid = row["qid"]
        kind = row.get("name_or_alias") or "alias"
        d.q_to_name.setdefault(qid, []).append((row["alias"], kind))
        _index_surface(row["alias"], qid, kind)

    return d


def read_dim_rows(spark: SparkSession, path: str) -> list[dict]:
    """Driver-side rows of a small dimension table: pyarrow for local paths
    (no Spark job), Spark collect otherwise."""
    try:
        import pyarrow.parquet as pq

        return pq.read_table(path).to_pylist()
    except (OSError, FileNotFoundError):
        return [r.asDict() for r in spark.read.parquet(path).collect()]


def load_kb(spark: SparkSession, kb_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read the KB dimension tables (parquet; Iceberg at production scale)."""
    ents = spark.read.parquet(f"{kb_dir}/kb_entities.parquet")
    aliases = spark.read.parquet(f"{kb_dir}/kb_aliases.parquet")
    triples = spark.read.parquet(f"{kb_dir}/kb_triples.parquet")
    return ents, aliases, triples


def collect_linker_dicts(spark: SparkSession, kb_dir: str) -> LinkerDicts:
    """Collect KB tables on the driver and build the broadcast image.

    The KB is a dimension table; collecting it here is the deliberate
    broadcast-build step (not a distributed-compute shortcut).  Driver-local
    parquet reads go through pyarrow directly — four Spark collect jobs for
    a dimension table cost seconds of scheduling that would otherwise charge
    every plan build (measured: ~6s -> ~0.2s); remote KB locations fall back
    to Spark reads.

    Ceiling: this driver-side build is sized for a dimension KB (tested to
    ~140k labels in seconds, tests/test_kb_scale.py; a few GB of driver RAM
    at low tens of millions).  A full-Wikidata image (~100M labels) needs
    the chunked variant: build per-tag sub-dicts from partitioned parquet
    (the per-tag DBs ARE the reference's own layout), broadcast each once,
    and let executors mmap-share via TorrentBroadcast — no API change above
    this function; the fused plan already takes the broadcast handle.
    """
    try:
        import pyarrow.parquet as pq

        ent_rows = pq.read_table(f"{kb_dir}/kb_entities.parquet").to_pylist()
        alias_rows = pq.read_table(f"{kb_dir}/kb_aliases.parquet").to_pylist()
        tr = pq.read_table(f"{kb_dir}/kb_triples.parquet")
        triple_rows = list(
            zip(tr["subj"].to_pylist(), tr["pred"].to_pylist(), tr["obj"].to_pylist())
        )
        occ = {}
        try:
            ot = pq.read_table(f"{kb_dir}/kb_occ_labels.parquet")
            occ = dict(zip(ot["occ_qid"].to_pylist(), ot["fine_tag"].to_pylist()))
        except Exception:
            pass
        return build_linker_dicts(ent_rows, alias_rows, triple_rows, occ)
    except (OSError, FileNotFoundError):
        pass
    ents, aliases, triples = load_kb(spark, kb_dir)
    ent_rows = [r.asDict() for r in ents.collect()]
    alias_rows = [r.asDict() for r in aliases.collect()]
    triple_rows = [(r.subj, r.pred, r.obj) for r in triples.collect()]
    occ = {}
    try:
        occ_df = spark.read.parquet(f"{kb_dir}/kb_occ_labels.parquet")
        occ = {r.occ_qid: r.fine_tag for r in occ_df.collect()}
    except Exception:
        pass
    return build_linker_dicts(ent_rows, alias_rows, triple_rows, occ)
