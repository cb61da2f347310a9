"""Fused pipeline: extract -> chunk -> NER -> link in ONE mapInPandas pass.

Every stage of the KG pipeline up to linking is per-document work (the
reference processes each request doc independently end-to-end), so the
staged plan's shuffles — the offset-shift window, the mention/chunk cogroup
exchange — exist only because the stages were materialized as separate
tables.  This plan fuses them into a single narrow ``mapInPandas`` over the
pages scan: zero shuffles until the final triples aggregation, no chunk
cache, one Arrow round trip per input split.

At 100 TB this is the difference between shuffling the full chunked corpus
twice and never shuffling document payloads at all: the only wide exchanges
left in the job are the distinct-QID semi-join and the subject-hash
repartition of the (tiny) triples output.  A BERT tagger slots in by
batching the chunk texts accumulated per Arrow batch (the per-doc loop
already collects them) — same plumbing, model call instead of gazetteer.

The staged plan (plans/pipeline.py) remains the testing/debugging surface;
both produce identical linked rows (asserted by tests/test_fused.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_extraction_svc_spark.functions import htmltext
from entity_extraction_svc_spark.operators.chunker import chunk_doc
from entity_extraction_svc_spark.operators.eltags import ALT_FINE
from entity_extraction_svc_spark.operators.linker import (
    LINKED_SCHEMA,
    link_doc,
)
from entity_extraction_svc_spark.operators.tagger import (
    decode_tagged,
    load_tagger,
)
from entity_extraction_svc_spark.operators.triples import materialize_triples
from entity_extraction_svc_spark.sources.kb import (
    collect_linker_dicts,
    normalize_label,
)


def _fine_tag_lookup(gaz_rows: list[dict]) -> dict[str, str]:
    """norm surface -> fine tag of the most popular owner (the broadcast twin
    of eltags.classify_tags' max_by join)."""
    best: dict[str, tuple[int, str]] = {}
    for r in gaz_rows:
        k = normalize_label(r["surface"])
        cur = best.get(k)
        if cur is None or r["num_rels"] > cur[0]:
            best[k] = (r["num_rels"], r["fine_tag"])
    return {k: v[1] for k, v in best.items()}


def _chunk_doc_for_tagging(text: str, texts_flat: list[str],
                           subword_len=None):
    """Chunk one doc, append the (soft-hyphen-stripped) chunk texts to the
    batch-wide ``texts_flat`` accumulator, and return per-chunk metadata
    (flat index, doc offset shift, sentences, sentence offsets)."""
    metas = []
    shift = 0
    for chunk_text, sents, soffs in chunk_doc(text, subword_len):
        metas.append((len(texts_flat), shift, sents, soffs))
        texts_flat.append(chunk_text.replace("\xad", " "))  # H7
        shift += len(chunk_text) + 1
    return metas


def _assemble_doc(d, tagger, fine_lookup, url, text, metas, tagged,
                  lang: str = "en") -> list[dict]:
    """Decode the tagged chunks of one doc and link it (N4-N8, G-R-P).

    A two-headed tagger (SPARK_KG_MODEL=gazetteer2 / hf2) decodes through
    merge_markups — the fine tag (or MISC after the 0.88 gate) comes from
    the types head directly, not the fine_lookup join.
    """
    from entity_extraction_svc_spark.operators.tagger import decode_two_headed

    two_headed = hasattr(tagger, "fine_tags")
    mentions: list[dict] = []
    sentences: list[str] = []
    sentences_offsets: list[tuple[int, int]] = []
    for ti, shift, sents, soffs in metas:
        if two_headed:
            for substr, start, end, proba, fine, coarse in decode_two_headed(
                tagged[ti], tagger, lang=lang
            ):
                mentions.append({
                    "url": url, "substr": substr, "start": start + shift,
                    "end": end + shift, "proba": proba, "tag": coarse,
                    "fine_tag": None if fine == "MISC" else fine,
                    "alt_tag": ALT_FINE.get(fine, "MISC"),
                })
        else:
            for substr, start, end, proba, tag in decode_tagged(
                tagged[ti], tagger.tags_init, lang=lang
            ):
                fine = fine_lookup.get(normalize_label(substr))
                mentions.append({
                    "url": url, "substr": substr, "start": start + shift,
                    "end": end + shift, "proba": proba, "tag": tag,
                    "fine_tag": fine,
                    "alt_tag": ALT_FINE.get(fine or "", "MISC") if fine else "MISC",
                })
        for sent, (s, e) in zip(sents, soffs):
            sentences.append(sent)
            sentences_offsets.append((s + shift, e + shift))
    if not mentions:
        return []
    mentions.sort(key=lambda m: (m["start"], m["end"], m["substr"]))
    return link_doc(d, text, sentences, sentences_offsets, mentions, lang)


def link_page(d, tagger, fine_lookup: dict[str, str],
              url: str, text: str, lang: str = "en") -> list[dict]:
    """One document end-to-end: chunk, tag, decode, classify, link.
    ``tagger`` is any ``tag_batch`` protocol implementation."""
    if not text:
        return []
    texts_flat: list[str] = []
    metas = _chunk_doc_for_tagging(text, texts_flat,
                                   getattr(tagger, "subword_len", None))
    tagged = tagger.tag_batch(texts_flat)
    return _assemble_doc(d, tagger, fine_lookup, url, text, metas, tagged, lang)


def fused_link(pages: DataFrame, tagger_bc, dicts_bc, fine_bc,
               source: str = "html") -> DataFrame:
    """pages -> linked rows, one narrow mapInPandas (no shuffle).

    Model work is batched ACROSS documents: every chunk text of the Arrow
    batch goes through ONE ``tag_batch`` call (a real checkpoint sees one
    padded forward per Arrow batch, not one per chunk or per doc — the
    tag_batch protocol of operators/tagger.py).
    """
    lang_col = (F.col("lang") if "lang" in pages.columns
                else F.lit("en")).alias("lang")
    if source == "html":
        cols = pages.select("url", F.col("html").alias("payload"), lang_col)
    else:
        cols = pages.select("url", F.col("text").alias("payload"), lang_col)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        d = dicts_bc.value
        tagger = tagger_bc.value
        # N2: a real tagger's tokenizer drives the 300-subword chunk budget
        slen = getattr(tagger, "subword_len", None)
        fine_lookup: dict[str, str] = fine_bc.value
        out_cols = ["url", "mention_id", "substr", "start", "end", "rank", "qid",
                    "conf", "page", "ent_tag", "substr_score", "num_rels",
                    "conn_score_notag", "conn_score_tag"]
        for pdf in batches:
            docs: list[tuple[str, str, str, list]] = []
            texts_flat: list[str] = []
            for url, payload, lang in zip(pdf["url"], pdf["payload"],
                                          pdf["lang"]):
                if payload is None:
                    continue
                if source == "html":
                    text = htmltext.preprocess_html(payload)
                else:
                    text = htmltext.preprocess_text(payload)
                if not text:
                    continue
                docs.append((url, text, lang or "en",
                             _chunk_doc_for_tagging(text, texts_flat, slen)))
            tagged = tagger.tag_batch(texts_flat)  # one model call per batch
            rows: list[dict] = []
            for url, text, lang, metas in docs:
                rows.extend(
                    _assemble_doc(d, tagger, fine_lookup, url, text, metas,
                                  tagged, lang)
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return cols.mapInPandas(_run, LINKED_SCHEMA)


def build_fused(spark: SparkSession, pages: DataFrame, kb_dir: str,
                source: str = "html", num_partitions: int = 32):
    """Returns (linked, triples) via the fused plan."""
    from entity_extraction_svc_spark.sources.kb import read_dim_rows

    gaz_rows = read_dim_rows(spark, f"{kb_dir}/gazetteer.parquet")
    # SPARK_KG_MODEL switch: gazetteer stand-in (default) or hf:<checkpoint>
    # (HF weights are NOT in the broadcast — each executor lazy-loads once)
    tagger_bc = spark.sparkContext.broadcast(load_tagger(gaz_rows))
    fine_bc = spark.sparkContext.broadcast(_fine_tag_lookup(gaz_rows))
    dicts_bc = spark.sparkContext.broadcast(collect_linker_dicts(spark, kb_dir))
    linked = fused_link(pages, tagger_bc, dicts_bc, fine_bc, source)
    kb_triples = spark.read.parquet(f"{kb_dir}/kb_triples.parquet")
    triples = materialize_triples(linked, kb_triples, num_partitions)
    return linked, triples
