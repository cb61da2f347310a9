"""Description-similarity re-ranking (reference P10, north-rule TF-IDF path).

The reference's alternative ranker scores candidates with a BERT bi-encoder
over (mention context, candidate description) pairs
(``src/entity_linking.py:1598-1679``, ``src/torch_transformers_el_ranker.py``);
the base config never calls it (no caller of ``rank_by_description`` in
``entity_linking.py``), so it is an OPTIONAL re-rank stage here too.  The
deterministic stand-in is TF-IDF cosine between the mention's sentence
context and each candidate's first-paragraph description — the classical
formulation the bi-encoder approximates (north rule: "TF-IDF
description-similarity scoring").

Execution shape: document frequencies for the description corpus are a
KB-bounded dimension computed once and broadcast; scoring is vectorized
numpy inside one ``mapInPandas`` over candidate rows — no shuffle beyond
whatever produced the candidates.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_extraction_svc_spark.functions.stopwords import ENGLISH_STOPWORDS

_TOKEN_RE = re.compile(r"[a-z0-9']+")


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.findall((text or "").lower())
            if t not in ENGLISH_STOPWORDS]


def build_idf(descriptions: list[str]) -> dict[str, float]:
    """Smoothed idf over the description corpus: ln((1+N)/(1+df)) + 1."""
    n = len(descriptions)
    df: Counter[str] = Counter()
    for d in descriptions:
        df.update(set(_tokens(d)))
    return {t: math.log((1 + n) / (1 + c)) + 1.0 for t, c in df.items()}


def tfidf_cosine(a_tokens: list[str], b_tokens: list[str],
                 idf: dict[str, float]) -> float:
    """Cosine of tf-idf vectors (raw tf; unseen tokens get idf ln(1+N)+1 via
    the smoothing floor — here simply max idf fallback 1.0)."""
    if not a_tokens or not b_tokens:
        return 0.0
    ta, tb = Counter(a_tokens), Counter(b_tokens)
    dot = 0.0
    for t, ca in ta.items():
        cb = tb.get(t)
        if cb:
            w = idf.get(t, 1.0)
            dot += (ca * w) * (cb * w)
    if dot == 0.0:
        return 0.0
    na = math.sqrt(sum((c * idf.get(t, 1.0)) ** 2 for t, c in ta.items()))
    nb = math.sqrt(sum((c * idf.get(t, 1.0)) ** 2 for t, c in tb.items()))
    return dot / (na * nb)


def _tokens_col(col) -> "F.Column":
    """Catalyst twin of ``_tokens`` up to set semantics: lowercase, split on
    non-[a-z0-9'] runs, drop empties and stopwords, distinct.  Used for the
    relational document-frequency pass, where only the per-description
    DISTINCT token set matters."""
    stop = F.array(*[F.lit(s) for s in sorted(ENGLISH_STOPWORDS)])
    toks = F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), r"[^a-z0-9']+"),
        lambda t: t != "",
    )
    return F.array_except(toks, stop)


def rank_by_description(candidates: DataFrame, kb_entities: DataFrame,
                        context_col: str = "context",
                        id_cols: tuple[str, str] = ("url", "mention_id")) -> DataFrame:
    """candidates(url, mention_id, rank, qid, <context_col>) -> + descr_score,
    descr_rank.

    Nothing KB-sized ever reaches the driver: document frequencies are a
    distributed wordcount over ALL descriptions (so idf values are exactly
    ``build_idf``'s over the full KB), then semi-joined down to the tokens
    the batch can actually touch (candidate descriptions + contexts);
    descriptions are semi-joined to the candidates' distinct qids (bounded
    at top-30 per mention).  Both collects are candidate-batch-bounded —
    at 10^8 KB entities the driver holds only this batch's slice."""
    spark = candidates.sparkSession
    n_kb = kb_entities.count()
    cand_qids = candidates.select("qid").where(F.col("qid").isNotNull()).distinct()
    kb_cand = kb_entities.select("qid", "descr").join(F.broadcast(cand_qids), "qid")
    descr_map = {r.qid: (r.descr or "") for r in kb_cand.collect()}
    descr_toks = {q: _tokens(d) for q, d in descr_map.items()}

    # full-KB document frequencies (distributed), pruned to needed tokens
    df_tbl = (
        kb_entities.select(F.explode(_tokens_col(F.col("descr"))).alias("t"))
        .groupBy("t").agg(F.count("*").alias("df"))
    )
    needed = (
        candidates.select(F.explode(_tokens_col(F.col(context_col))).alias("t"))
        .unionByName(
            kb_cand.select(F.explode(_tokens_col(F.col("descr"))).alias("t"))
        )
        .distinct()
    )
    idf = {
        r.t: math.log((1 + n_kb) / (1 + r.df)) + 1.0
        for r in df_tbl.join(F.broadcast(needed), "t").collect()
    }
    bc = spark.sparkContext.broadcast((descr_toks, idf))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", descr_score double"

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        toks_map, idf_ = bc.value
        for pdf in batches:
            ctx_toks = [_tokens(c) for c in pdf[context_col]]
            scores = [
                round(tfidf_cosine(ct, toks_map.get(q, []), idf_), 6)
                if q is not None else None
                for ct, q in zip(ctx_toks, pdf["qid"])
            ]
            pdf = pdf.copy()
            pdf["descr_score"] = scores
            yield pdf

    scored = candidates.mapInPandas(_score, out_schema)
    from pyspark.sql.window import Window

    w = Window.partitionBy(*id_cols).orderBy(
        F.desc_nulls_last("descr_score"), F.asc("rank")
    )
    return scored.withColumn("descr_rank", F.row_number().over(w))
