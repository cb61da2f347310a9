"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL.  KG-pipeline
queries run on the committed deterministic fixture set (/root/repo/fixtures,
FIXTURES.md) whose golden tables are template-side oracles; relational and
training-data queries run on the driver's sf_dir tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "fixtures")

_PIPELINE_CACHE: dict = {}
_SHIPPED: set = set()


def _prep(spark: SparkSession) -> None:
    """Ship the package zip to this session's executors (the driver creates
    its own SparkSession without our get_spark, so pandas-UDF closures would
    otherwise fail to unpickle on workers launched outside the repo root)."""
    key = id(spark)
    if key not in _SHIPPED:
        from entity_extraction_svc_spark.session import _ship_package

        try:
            _ship_package(spark)
        except Exception:
            pass  # already-added file or a restricted session — imports may
            # still resolve via the driver's cwd
        _SHIPPED.add(key)


def _fixtures_pipeline(spark: SparkSession):
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.plans.pipeline import build_pipeline

    key = id(spark)
    if key not in _PIPELINE_CACHE:
        _prep(spark)
        ensure_fixtures(FIXTURES)
        _PIPELINE_CACHE.clear()
        _PIPELINE_CACHE[key] = build_pipeline(
            spark, f"{FIXTURES}/pages.parquet", FIXTURES
        )
    return _PIPELINE_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run the full KG-construction DAG over the sf0.001 documents
    table mapped to the pages shape (text source), with the fixture KB;
    return a per-document summary (one row per doc, stable schema)."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.plans.pipeline import build_pipeline_df

    _prep(spark)
    ensure_fixtures(FIXTURES)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    # the reference's own test payloads ride along so the flagship output
    # demonstrably links entities (the synthetic docs carry none)
    from entity_extraction_svc_spark.fixtures import MONA_LISA_TEXT, SPACEX_TEXT

    payloads = spark.createDataFrame(
        [("payload://mona_lisa", None, None, MONA_LISA_TEXT, "en"),
         ("payload://spacex", None, None, SPACEX_TEXT, "en")],
        pages.schema,
    )
    pages = pages.unionByName(payloads)
    arts = build_pipeline_df(spark, pages, FIXTURES, source="text")
    mentions = arts.mentions.groupBy("url").agg(F.count("*").alias("n_mentions"))
    linked = (
        arts.linked.filter((F.col("rank") == 0) & F.col("qid").isNotNull())
        .groupBy("url")
        .agg(F.count("*").alias("n_linked"))
    )
    return (
        arts.extracted.select("url", F.length("text").alias("n_chars"))
        .join(mentions, "url", "left")
        .join(linked, "url", "left")
        .select(
            "url",
            "n_chars",
            F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
            F.coalesce("n_linked", F.lit(0)).alias("n_linked"),
        )
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _kg_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fixtures_pipeline(spark).extracted.select("url", "text")


def _kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fixtures_pipeline(spark).mentions.select("url", "start", "end", "tag")


def _kg_linked_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _fixtures_pipeline(spark)
        .linked.filter((F.col("rank") == 0) & F.col("qid").isNotNull())
        .select("url", "start", "end", "qid")
    )


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fixtures_pipeline(spark).triples.select("subj", "pred", "obj")


def _kg_linked_top1_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production (fused, shuffle-free) plan against the same goldens —
    the driver gate validates both plans, not just the staged one."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.plans.fused import build_fused

    ensure_fixtures(FIXTURES)
    pages = spark.read.parquet(f"{FIXTURES}/pages.parquet")
    linked, _ = build_fused(spark, pages, FIXTURES)
    return linked.filter((F.col("rank") == 0) & F.col("qid").isNotNull()).select(
        "url", "start", "end", "qid"
    )


def _kg_triples_per_subject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subject triple counts through THREE plans in one contract row:
    the plain aggregation over the pipeline's triples (part=pipeline), the
    salted two-stage aggregation over the KB (part=kb_salted), and the
    exact two-stage top-k neighbor cut (part=kb_topk,
    kgquery.top_objects_per_subject with salt) — merged so each keeps a
    driver-verified row inside the 50-query window.  Non-topk parts carry
    sentinel obj=''/rank=0 (not NULL: the two engines stringify missing
    values differently under the driver's sorted-value hash)."""
    from entity_extraction_svc_spark.operators.kgquery import (
        top_objects_per_subject,
        triples_per_subject,
    )

    sent_obj, sent_rank = F.lit("").alias("obj"), F.lit(0).cast("long").alias("rank")
    plain = triples_per_subject(_fixtures_pipeline(spark).triples).select(
        F.lit("pipeline").alias("part"), "subj", "n_triples", sent_obj, sent_rank
    )
    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    salted = triples_per_subject(kb, salt=16).select(
        F.lit("kb_salted").alias("part"), "subj", "n_triples", sent_obj, sent_rank
    )
    topk = top_objects_per_subject(kb, k=3, salt=8).select(
        F.lit("kb_topk").alias("part"), "subj", "n_triples", "obj",
        F.col("rank").cast("long").alias("rank"),
    )
    return plain.unionByName(salted).unionByName(topk)


def _kg_find_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.kgquery import find_types

    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    return find_types(kb)


def _kg_types_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 2-hop type expansion (part=2hop) + its fixpoint generalization,
    types ∪ ALL transitive superclasses via log-round path-doubled P279
    closure (part=closure), + the raw taxonomy closure itself with minimal
    hop distances packed as type:dist (part=tax) so the driver row pins the
    doubling recurrence's distances against the linear recursive-CTE
    oracle, + the SAME closure reached incrementally (part=delta): the
    Q5/Q515 subtree edges held back as a second ingest and merged by
    semi-naive closure_delta — the oracle recomputes from scratch, so the
    row pins incremental == recompute — + the reverse edit (part=del): the
    SAME held-back edges DELETED from the full closure via DRed
    closure_delete, against a from-scratch recompute-on-survivors oracle,
    so insert and delete maintenance are both pinned on one fixture."""
    from entity_extraction_svc_spark.operators.graphwalk import (
        closure_delete,
        closure_delta,
        transitive_closure,
    )
    from entity_extraction_svc_spark.operators.kgquery import (
        find_types_2hop,
        find_types_closure,
    )

    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    two = find_types_2hop(kb).select(
        F.lit("2hop").alias("part"), "subj", "type"
    )
    clo = find_types_closure(kb).select(
        F.lit("closure").alias("part"), "subj", "type"
    )
    pack = F.concat_ws(":", "dst", "dist")
    clo_full = transitive_closure(kb, pred="P279")
    tax = clo_full.select(
        F.lit("tax").alias("part"),
        F.col("src").alias("subj"),
        pack.alias("type"),
    )
    held = F.col("subj").isin("Q5", "Q515")
    p279 = kb.filter(F.col("pred") == "P279")
    base = transitive_closure(p279.filter(~held))
    delta_edges = p279.filter(held).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    delta = closure_delta(base, delta_edges).select(
        F.lit("delta").alias("part"),
        F.col("src").alias("subj"),
        pack.alias("type"),
    )
    dele = closure_delete(
        clo_full,
        delta_edges,
        p279.filter(~held).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        ),
    ).select(
        F.lit("del").alias("part"),
        F.col("src").alias("subj"),
        pack.alias("type"),
    )
    return (
        two.unionByName(clo).unionByName(tax).unionByName(delta)
        .unionByName(dele)
    )


def _kg_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 find_intersection on the KB (part=kb) + the relational INTERSECT
    skeleton on orders (part=orders) + corpus-level co-occurrence PMI
    relatedness over the golden links (part=pmi; value packs
    a:b:n_ab:pmi-in-micros so the row stays integer-hashed), merged into
    one driver row."""
    from entity_extraction_svc_spark.operators.cooccur import pmi_relatedness
    from entity_extraction_svc_spark.operators.kgquery import find_intersection

    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    # shared P17 country of Boeing (Q66) and NASA (Q23548) -> Q30
    kb_part = find_intersection(kb, "Q66", "Q23548", "P17").select(
        F.lit("kb").alias("part"), F.col("value").cast("string").alias("value")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    ord_part = a.intersect(b).select(
        F.lit("orders").alias("part"), F.col("o_custkey").cast("string").alias("value")
    )
    links = spark.read.parquet(f"{FIXTURES}/golden_links.parquet")
    pack = F.concat_ws(
        ":",
        "ent_a", "ent_b", "n_ab",
        F.round(F.col("pmi") * 1e6).cast("long"),
    ).alias("value")
    pmi_part = pmi_relatedness(links, min_count=2).select(
        F.lit("pmi").alias("part"), pack
    )
    # part=pmitop runs the SALTED two-stage neighborhood cut (the
    # celebrity-safe path, VERDICT r4 #3) against a plain-window oracle —
    # the driver row itself pins salted == windowed
    top_part = pmi_relatedness(links, min_count=2, top_k=2, salt=8).select(
        F.lit("pmitop").alias("part"), pack
    )
    return (
        kb_part.unionByName(ord_part).unionByName(pmi_part)
        .unionByName(top_part)
    )


def _kg_connection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 pairwise connection probe (part=conn) + its k-hop
    generalization, the bounded BFS ball with minimal hop distances
    (part=bfs), + ONE deterministic shortest path between the two probe
    entities, min-parent walk-back (part=path: a=entity, b=step), + the
    global graph-shape pass, per-node triangle counts and clustering
    coefficients over the entity->entity edges (part=tri; b packs
    degree:n_tri:coeff-in-micros so the row stays integer-hashed), + the
    synchronous label-propagation communities over the same edge set
    (part=lpa: a=node, b=community — fixed 5 rounds, min-label tie rule,
    certified by an unrolled row_number-argmax oracle),
    merged into one driver row over the same fixture KB."""
    from entity_extraction_svc_spark.operators.graphstats import (
        label_propagation,
        triangle_counts,
    )
    from entity_extraction_svc_spark.operators.graphwalk import (
        bfs_distances,
        shortest_path,
    )
    from entity_extraction_svc_spark.operators.kgquery import find_connection

    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    # the two Mona Lisas: direct edges absent, shared creator via P170
    conn = find_connection(
        kb, "Q12418", "Q2126369", rels=["P170", "P276", "P131"]
    ).select(
        F.lit("conn").alias("part"),
        F.col("pred").alias("a"),
        F.col("via").alias("b"),
    )
    bfs = bfs_distances(kb, "Q12418", max_hops=3, direction="both").select(
        F.lit("bfs").alias("part"),
        F.col("entity").alias("a"),
        F.col("dist").cast("string").alias("b"),
    )
    ee = kb.filter(F.col("obj").rlike("^Q[0-9]+$")).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    tri = triangle_counts(ee).select(
        F.lit("tri").alias("part"),
        F.col("node").alias("a"),
        F.concat_ws(
            ":",
            F.col("degree"),
            F.col("n_tri"),
            F.round(F.col("coeff") * 1e6).cast("long"),
        ).alias("b"),
    )
    path = shortest_path(kb, "Q12418", "Q2126369", max_hops=4).select(
        F.lit("path").alias("part"),
        F.col("entity").alias("a"),
        F.col("step").cast("string").alias("b"),
    )
    lpa = label_propagation(ee).select(
        F.lit("lpa").alias("part"),
        F.col("node").alias("a"),
        F.col("community").alias("b"),
    )
    from entity_extraction_svc_spark.operators.graphstats import kcore

    core = kcore(ee, k=2).select(
        F.lit("kcore").alias("part"),
        F.col("node").alias("a"),
        F.col("degree").cast("string").alias("b"),
    )
    # part=wcc: weakly-connected components over the same edge set — the
    # alias-clustering primitive (canonicalize.connected_components)
    # pinned DIRECTLY against a reachability-min oracle, not just through
    # the kg_canonical row's composed use
    from entity_extraction_svc_spark.operators.canonicalize import (
        connected_components,
    )

    wcc = connected_components(ee).select(
        F.lit("wcc").alias("part"),
        F.col("node").alias("a"),
        F.col("comp").alias("b"),
    )
    # part=ccdelta: INCREMENTAL clustering maintenance (canonicalize.
    # cc_delta) over the sparse P131/P36/P47 place graph — remove the
    # Paris<->France pair (both stored orientations; Q142 isolates and
    # must drop out) and add two merging edges (Italy->Paris chain,
    # two synthetic stars); the oracle recomputes WCC on the edited edge
    # set from scratch, so the row pins incremental == recompute
    # cross-engine
    from entity_extraction_svc_spark.operators.canonicalize import cc_delta

    ccd_pre = (
        kb.filter(
            F.col("pred").isin("P131", "P36", "P47")
            & F.col("obj").rlike("^Q[0-9]+$")
        )
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )
    ccd = cc_delta(
        connected_components(ccd_pre),
        add_edges=spark.createDataFrame(
            [("Q82884", "Q19675"), ("Q9000002", "Q9000003")],
            "src string, dst string",
        ),
        remove_edges=spark.createDataFrame(
            [("Q90", "Q142")], "src string, dst string"
        ),
        edges=ccd_pre,
    ).select(
        F.lit("ccdelta").alias("part"),
        F.col("node").alias("a"),
        F.col("comp").alias("b"),
    )
    return (
        conn.unionByName(bfs).unionByName(tri).unionByName(path)
        .unionByName(lpa).unionByName(core).unionByName(wcc)
        .unionByName(ccd)
    )


def _kg_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data emission for KG embeddings, the other half of
    kg_negatives' TransE story: a deterministic DeepWalk corpus
    (part=walk: a=start, b packs walk:step:node — next hop = md5-argmin
    over out-neighbors, dead ends truncate) and a GraphSAGE-style
    bounded fan-out sample (part=fanout: a=src, b packs dst:rank — the
    k md5-smallest neighbors per node, run through the SALTED exact
    two-stage cut so the driver row pins salted == the plain-window
    oracle).  Both are pure functions of the edge set: re-runs,
    repartitioning, and executor count never change the corpus."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.walks import (
        random_walks,
        sample_neighbors,
    )

    ensure_fixtures(FIXTURES)
    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    ee = kb.filter(F.col("obj").rlike("^Q[0-9]+$"))
    w = random_walks(ee, num_walks=2, walk_length=3).select(
        F.lit("walk").alias("part"),
        F.col("start").alias("a"),
        F.concat_ws(":", F.col("walk"), F.col("step"), F.col("node")).alias("b"),
    )
    fo = sample_neighbors(ee, k=3, salt=4).select(
        F.lit("fanout").alias("part"),
        F.col("src").alias("a"),
        F.concat_ws(":", F.col("dst"), F.col("rank")).alias("b"),
    )
    return w.unionByName(fo)


def _kg_entity_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural entity-resolution candidates over the fixture KB:
    Jaccard over undirected neighbor sets, inverted-index pair
    generation (only entities sharing a neighbor are compared), exact
    (uncapped) so the row certifies values; the hub cap is pinned by
    tests instead.  jaccard is round(·,6) in BOTH engines."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.graphstats import neighbor_jaccard

    ensure_fixtures(FIXTURES)
    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    ee = kb.filter(F.col("obj").rlike("^Q[0-9]+$")).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return neighbor_jaccard(ee, min_shared=1, threshold=0.2)


def _kg_knn_gnn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph + one GraphSAGE-style message-passing layer over the
    driver's embeddings table (part=knn: per-vector top-5 cosine
    neighbors above floor 0.3, exact tiled-matmul candidates; part=feat:
    per-node elementwise MEAN of its kNN neighbors' vectors, posexploded
    to (node, dim, value) so the hash compares every coordinate).  The
    layer compiles to dim partial-agg-safe avg columns — no vector
    collect_list — so a hub's messages combine map-side."""
    from entity_extraction_svc_spark.operators.gnn import (
        knn_graph,
        neighbor_feature_agg,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # both parts consume the kNN edge set; localCheckpoint so the
    # O(n^2) candidate scan runs once, not once per union branch
    edges = knn_graph(emb, k=5, floor=0.3).localCheckpoint()
    knn = edges.select(
        F.lit("knn").alias("part"),
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("rank").cast("long").alias("r"),
        F.col("cos_sim").alias("v"),
    )
    feat = neighbor_feature_agg(edges, emb, dim=64)
    fe = feat.select(
        "vec_id", "n_nbr", F.posexplode("feat").alias("i", "val")
    ).select(
        F.lit("feat").alias("part"),
        F.col("vec_id").alias("a"),
        F.col("i").cast("long").alias("b"),
        F.col("n_nbr").cast("long").alias("r"),
        F.col("val").alias("v"),
    )
    return knn.unionByName(fe)


def _kg_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG-embedding negative sampling (filtered TransE corruption) over
    the fixture KB's entity->entity triples: k=2 md5-deterministic
    corruptions per true triple, true-triple collisions anti-joined out.
    The entity dimension is numbered by the same two-level order-prefix
    construction packing uses, so no task sorts the whole entity set."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.triples import negative_triples

    ensure_fixtures(FIXTURES)
    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    return negative_triples(kb, k=2).select(
        "subj", "pred", "obj", F.col("neg_rank").cast("long").alias("neg_rank")
    )


def _kg_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level entity salience over the golden linked mentions:
    tf-share x idf x early-position boost, per-doc rank — the aboutness
    layer above per-mention confidence (P9-P11 rank candidates WITHIN a
    mention; this ranks entities within the document)."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.annotations import entity_salience

    ensure_fixtures(FIXTURES)
    links = spark.read.parquet(f"{FIXTURES}/golden_links.parquet")
    return entity_salience(links)


def _kg_ner_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distant-supervision NER training-data emission over the fixture
    corpus: golden mention spans projected back onto the extracted text
    as per-token BIO rows — the weak-supervision loop that regenerates
    the tagger's training corpus from the pipeline's own output."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.ner import bio_training_rows

    ensure_fixtures(FIXTURES)
    docs = spark.read.parquet(f"{FIXTURES}/pages.parquet").select("url", "text")
    m = spark.read.parquet(f"{FIXTURES}/golden_mentions.parquet")
    return bio_training_rows(docs, m)


def _kg_rel_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distant-supervision relation-extraction pairs over the fixture
    corpus: ordered same-document linked-mention pairs labelled by the
    KB relation between their entities (least (pred, direction) when
    several) or NO_REL — the relation twin of kg_ner_training."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.triples import (
        relation_training_pairs,
    )

    ensure_fixtures(FIXTURES)
    links = spark.read.parquet(f"{FIXTURES}/golden_links.parquet").select(
        "url", "start", "end", "qid"
    )
    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    return relation_training_pairs(links, kb)


def _kg_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory skew telemetry over the fixture KB, both questions
    a salting/top-k/bucket-cap decision asks at corpus scale: part=cm is
    the count-min FREQUENCY sketch over subjects (d x w counters, every
    distinct subject probed, one-sided est >= true); part=hll is the
    HyperLogLog DISTINCT-cardinality sketch, per-predicate distinct
    objects (2^p registers/key, integer harmonic sum so the estimate is
    bit-stable under any partitioning) — the selectivity input BGP leg
    ordering and domain/range induction consume."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
        hll_distinct,
    )

    ensure_fixtures(FIXTURES)
    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    stream = kb.select(F.col("subj").alias("k"))
    counters = countmin_build(stream, "k", w=128, d=4)
    cm = countmin_estimate(counters, stream, "k", w=128, d=4).select(
        F.lit("cm").alias("part"), "k",
        F.lit(None).cast("long").alias("n_reg"),
        F.col("est").cast("double").alias("est"),
    )
    hll = hll_distinct(
        kb.select(F.col("pred").alias("k"), F.col("obj").alias("v")),
        "k", "v", p=6,
    ).select(F.lit("hll").alias("part"), "k", "n_reg", "est")
    # part=quant (r5): the DISTRIBUTION question — integer histogram
    # quantiles of the per-subject degree (the p99 degree IS the
    # salting-threshold input); k = q in micros, n_reg = bucket lower
    # edge, est = bucket upper edge (the bound a skew decision consumes)
    from entity_extraction_svc_spark.operators.sketch import (
        histogram_quantiles,
    )

    degrees = kb.groupBy("subj").agg(F.count("*").alias("deg"))
    quant = histogram_quantiles(
        degrees, "deg", qs=[0.5, 0.9, 0.99, 1.0], buckets=64,
    ).select(
        F.lit("quant").alias("part"),
        F.concat(F.lit("q"), F.col("q_micros").cast("string")).alias("k"),
        F.col("lo").alias("n_reg"),
        F.col("hi").cast("double").alias("est"),
    )
    return cm.unionByName(hll).unionByName(quant)


def _kg_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 date prettifier + the scalar-function surface (regex, datetime,
    concat) in one per-event projection — one driver row covers both."""
    from entity_extraction_svc_spark.operators.kgquery import format_date_col

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        format_date_col(F.date_format("ts", "yyyy-MM-dd")).alias("pretty_date"),
        F.regexp_replace(F.col("event_type"), "[aeiou]", "").alias("stripped_type"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.year("ts").alias("yr"),
        F.concat_ws("#", "event_type", F.col("user_id").cast("string")).alias("composed"),
    )


# the incremental-maintenance batch for kg_pattern_search part=rulesdelta
# (one shared definition, Spark + oracle): a new city instance that
# inherits the whole Q515 taxonomy branch, and a new capital fact whose
# consequences cascade subproperty -> range typing -> taxonomy climb
CHAIN_DELTA_FACTS = [
    ("Q99901", "P31", "Q515"),
    ("Q99902", "P1376", "Q99901"),
]

# the retraction batch for part=rulesdel: cutting the natural-person ->
# person taxonomy edge severs every human's climb past Q154954 — a
# DRed whose over-delete region spans many subjects but whose re-derive
# returns only alternative-path facts (oracle = recompute on survivors)
CHAIN_RETRACT_FACTS = [
    ("Q154954", "P279", "Q215627"),
]


def _kg_pattern_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 single-pattern probe (part=w1) + the general basic-graph-pattern
    matcher over the same store (part=bgp): the person→occupation,
    person→birthplace, birthplace→region 3-leg chain, compiled by
    ``match_bgp`` into selectivity-ordered self-joins."""
    from entity_extraction_svc_spark.operators.kgquery import (
        match_bgp,
        pattern_search,
    )

    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    pad = F.lit("").alias("d")
    w1 = pattern_search(kb, pred="P131").select(
        F.lit("w1").alias("part"), F.col("subj").alias("a"),
        F.col("pred").alias("b"), F.col("obj").alias("c"), pad,
    )
    bgp = match_bgp(
        kb,
        [("?person", "P106", "?occ"), ("?person", "P19", "?city"),
         ("?city", "P131", "?region")],
        select=["person", "occ", "city", "region"],
    ).select(
        F.lit("bgp").alias("part"), F.col("person").alias("a"),
        F.col("occ").alias("b"), F.col("city").alias("c"),
        F.col("region").alias("d"),
    )
    pad2 = [F.lit("").alias("c"), F.lit("").alias("d")]
    # r5 property-path operators: alternation (birthplace-or-headquarters
    # edges), inverse (who is located in a place: ^P131), and the
    # alternation closure ((P131|P279)+ — mixed located-in/subclass
    # chains compose transitively)
    alt = match_bgp(kb, [("?x", "P19|P159", "?place")],
                    select=["x", "place"]).select(
        F.lit("alt").alias("part"), F.col("x").alias("a"),
        F.col("place").alias("b"), *pad2,
    )
    inv = match_bgp(kb, [("Q30", "^P17", "?thing")],
                    select=["thing"]).select(
        F.lit("inv").alias("part"), F.col("thing").alias("a"),
        F.lit("Q30").alias("b"), *pad2,
    )
    altpath = match_bgp(kb, [("?x", "P131|P279+", "?anc")],
                        select=["x", "anc"]).select(
        F.lit("altpath").alias("part"), F.col("x").alias("a"),
        F.col("anc").alias("b"), *pad2,
    )
    # r5 OPTIONAL / MINUS: occupation with optional birthplace (nulls
    # packed as ''), and occupation-holders with NO birthplace
    opt = match_bgp(
        kb, [("?p", "P106", "?occ")],
        optional=[[("?p", "P19", "?city")]],
        select=["p", "occ", "city"],
    ).select(
        F.lit("opt").alias("part"), F.col("p").alias("a"),
        F.col("occ").alias("b"),
        F.coalesce(F.col("city"), F.lit("")).alias("c"),
        F.lit("").alias("d"),
    )
    neg = match_bgp(
        kb, [("?p", "P106", "?occ")],
        minus=[[("?p", "P19", "?c")]],
        select=["p", "occ"],
    ).select(
        F.lit("neg").alias("part"), F.col("p").alias("a"),
        F.col("occ").alias("b"), *pad2,
    )
    # r5 addendum: sequence paths (birthplace's region without naming the
    # city), negated property sets (everything about a subject EXCEPT its
    # type/taxonomy edges), and VALUES + FILTER (occupation restricted to
    # an explicit list, then one value filtered back out)
    seq = match_bgp(kb, [("?x", "P19/P131", "?region")],
                    select=["x", "region"]).select(
        F.lit("seq").alias("part"), F.col("x").alias("a"),
        F.col("region").alias("b"), *pad2,
    )
    npset = match_bgp(kb, [("?s", "!(P31|P279)", "?o")],
                      select=["s", "o"]).select(
        F.lit("npset").alias("part"), F.col("s").alias("a"),
        F.col("o").alias("b"), *pad2,
    )
    valfil = match_bgp(
        kb, [("?p", "P106", "?occ")],
        values={"?occ": ["Q639669", "Q1028181", "Q36180"]},
        filters=["occ != 'Q36180'"],
        select=["p", "occ"],
    ).select(
        F.lit("valfil").alias("part"), F.col("p").alias("a"),
        F.col("occ").alias("b"), *pad2,
    )
    # zero-or-more: the canonical "instance of, including the class itself
    # and its taxonomic ancestors" idiom (P31/P279*)
    star = match_bgp(kb, [("?x", "P31/P279*", "?cls")],
                     select=["x", "cls"]).select(
        F.lit("star").alias("part"), F.col("x").alias("a"),
        F.col("cls").alias("b"), *pad2,
    )
    # r5 CONSTRUCT: the single-rule enrichment step — born-in city +
    # city-in-region derives born-in-region triples (set semantics)
    from entity_extraction_svc_spark.operators.kgquery import construct_triples

    constr = construct_triples(
        kb,
        [("?x", "P19", "?c"), ("?c", "P131", "?r")],
        ("?x", "bornin_region", "?r"),
    ).select(
        F.lit("constr").alias("part"), F.col("subj").alias("a"),
        F.col("pred").alias("b"), F.col("obj").alias("c"),
        F.lit("").alias("d"),
    )
    # r5 aggregate SELECT: top occupations among humans — GROUP BY +
    # COUNT/COUNT DISTINCT + deterministic ORDER/LIMIT (ties broken by
    # the group key, same rule both engines)
    from entity_extraction_svc_spark.operators.kgquery import aggregate_bgp

    agg = aggregate_bgp(
        kb,
        [("?p", "P106", "?occ"), ("?p", "P31", "Q5")],
        group_by=["?occ"],
        aggregates=[("count", "*", "n"), ("count_distinct", "?p", "np")],
        having="n >= 1",
        order_by=[("n", "desc")],
        limit=5,
    ).select(
        F.lit("agg").alias("part"), F.col("occ").alias("a"),
        F.col("n").cast("string").alias("b"),
        F.col("np").cast("string").alias("c"), F.lit("").alias("d"),
    )
    # r5 multi-rule forward chaining (part=rules): the RDFS-style preset —
    # type inheritance through P279, P1647 subproperty expansion,
    # domain/range typing — run to fixpoint by semi-naive evaluation over
    # the KB + the shared RDFS_ONTOLOGY schema triples; derived facts only
    # (the entailment delta a construction pipeline would materialize)
    from entity_extraction_svc_spark.operators.chain import (
        RDFS_ONTOLOGY,
        RDFS_RULES,
        forward_chain,
    )

    onto = spark.createDataFrame(
        RDFS_ONTOLOGY, "subj string, pred string, obj string"
    )
    chain_base = kb.select("subj", "pred", "obj").unionByName(onto)
    entailed = forward_chain(chain_base, RDFS_RULES)
    base_facts = chain_base.distinct()
    rules = entailed.join(base_facts, ["subj", "pred", "obj"], "left_anti").select(
        F.lit("rules").alias("part"), F.col("subj").alias("a"),
        F.col("pred").alias("b"), F.col("obj").alias("c"),
        F.lit("").alias("d"),
    )
    # part=rulesdelta: incremental maintenance — a new-page batch (a new
    # city instance + a capital fact that cascades subprop -> range ->
    # taxonomy) against the ALREADY-entailed store; oracle = recompute on
    # the union EXCEPT recompute on the base (CHAIN_DELTA_FACTS is the
    # one shared definition)
    from entity_extraction_svc_spark.operators.chain import forward_chain_delta

    new_facts = spark.createDataFrame(
        CHAIN_DELTA_FACTS, "subj string, pred string, obj string"
    )
    rulesdelta = forward_chain_delta(entailed, new_facts, RDFS_RULES).select(
        F.lit("rulesdelta").alias("part"), F.col("subj").alias("a"),
        F.col("pred").alias("b"), F.col("obj").alias("c"),
        F.lit("").alias("d"),
    )
    # part=rulesdel: DRed retraction — cut a mid-taxonomy edge, emit the
    # post-retraction DERIVED set; oracle recomputes on the survivors
    from entity_extraction_svc_spark.operators.chain import (
        forward_chain_retract,
    )

    rm = spark.createDataFrame(
        CHAIN_RETRACT_FACTS, "subj string, pred string, obj string"
    )
    after = forward_chain_retract(entailed, chain_base, rm, RDFS_RULES)
    surv_base = base_facts.join(rm, ["subj", "pred", "obj"], "left_anti")
    rulesdel = after.join(surv_base, ["subj", "pred", "obj"], "left_anti") \
        .select(
            F.lit("rulesdel").alias("part"), F.col("subj").alias("a"),
            F.col("pred").alias("b"), F.col("obj").alias("c"),
            F.lit("").alias("d"),
        )
    return (
        w1.unionByName(bgp).unionByName(alt).unionByName(inv)
        .unionByName(altpath).unionByName(opt).unionByName(neg)
        .unionByName(seq).unionByName(npset).unionByName(valfil)
        .unionByName(star).unionByName(constr).unionByName(agg)
        .unionByName(rules).unionByName(rulesdelta).unionByName(rulesdel)
    )


# ontology domain/range constraints for the fixture KB (validate_triples):
# birthplace/citizenship take humans to cities/countries; located-in (P131)
# is declared country-valued so the city-valued fixture rows violate range.
_ONTOLOGY_CONSTRAINTS = [
    ("P19", "Q5", "Q515"),
    ("P27", "Q5", "Q6256"),
    ("P131", None, "Q6256"),
    ("P17", None, "Q6256"),
]


# a second ingest source for the QA parts of the kg_find_rels row: one
# birthplace contradiction, one capital contradiction (a classic
# extraction error), one exact duplicate (must NOT count as a conflict);
# the two new object QIDs are also dangling references, so the audits'
# composition is exercised by the same three rows
_SECOND_SOURCE = [
    ("Q762", "P19", "Q220"),
    ("Q30", "P36", "Q60"),
    ("Q66", "P159", "Q5083"),
]


def _kg_find_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 relation probe for Q30 (part=rels) + ontology domain/range
    validation over the whole store (part=violation) + the multi-source
    QA audits over KB ∪ second-source (part=func: functional-predicate
    contradictions; part=dangling: unresolvable entity references;
    part=predstats: per-predicate ingest profile) + crawl-over-crawl
    snapshot comparison (part=diff: set-semantics added/removed; part=
    change: functional edits paired as old→new)."""
    from entity_extraction_svc_spark.operators.kgqa import (
        dangling_objects,
        functional_changes,
        functional_conflicts,
        predicate_stats,
        snapshot_diff,
    )
    from entity_extraction_svc_spark.operators.kgquery import (
        find_rels,
        validate_triples,
    )

    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    blank = F.lit("")
    rels = find_rels(kb, "Q30").select(
        F.lit("rels").alias("part"), blank.alias("kind"), blank.alias("subj"),
        "pred", blank.alias("obj"), blank.alias("expected"),
    )
    cons = spark.createDataFrame(
        _ONTOLOGY_CONSTRAINTS, "pred string, domain string, range string"
    )
    viol = validate_triples(kb, cons).select(
        F.lit("violation").alias("part"), "kind", "subj", "pred", "obj", "expected"
    )
    merged = kb.unionByName(
        spark.createDataFrame(_SECOND_SOURCE, "subj string, pred string, obj string")
    )
    ents = spark.read.parquet(f"{FIXTURES}/kb_entities.parquet")
    func = functional_conflicts(merged).select(
        F.lit("func").alias("part"), F.lit("conflict").alias("kind"),
        "subj", "pred", F.array_join("objects", ",").alias("obj"),
        F.col("n_obj").cast("string").alias("expected"),
    )
    dang = dangling_objects(merged, ents).select(
        F.lit("dangling").alias("part"), F.lit("ref").alias("kind"),
        blank.alias("subj"), blank.alias("pred"), "obj",
        blank.alias("expected"),
    )
    stats = predicate_stats(merged).select(
        F.lit("predstats").alias("part"), F.lit("profile").alias("kind"),
        blank.alias("subj"), "pred",
        F.col("n_triples").cast("string").alias("obj"),
        F.col("n_subj").cast("string").alias("expected"),
    )
    # crawl-over-crawl diff: new snapshot = KB minus the Louvre's rows plus
    # the second source (whose exact-duplicate row must NOT appear as churn)
    new_snap = kb.filter(F.col("subj") != "Q19675").unionByName(
        spark.createDataFrame(_SECOND_SOURCE, "subj string, pred string, obj string")
    )
    diff = snapshot_diff(kb, new_snap).select(
        F.lit("diff").alias("part"), F.col("status").alias("kind"),
        "subj", "pred", "obj", blank.alias("expected"),
    )
    chg = functional_changes(kb, new_snap).select(
        F.lit("change").alias("part"), F.lit("edit").alias("kind"),
        "subj", "pred", F.col("new_obj").alias("obj"),
        F.col("old_obj").alias("expected"),
    )
    # part=schema: domain/range INDUCED from the merged store (the inverse
    # of part=violation's declared-ontology check) — subj carries the modal
    # domain type, obj the modal range type, expected packs
    # n_triples:n_dom_typed:dom_cover:n_rng_typed:rng_cover (covers in
    # micros, -1 = no typed rows on that side)
    from entity_extraction_svc_spark.operators.kgqa import induce_schema

    def _micros(c):
        return F.coalesce(
            F.round(F.col(c) * 1e6).cast("long"), F.lit(-1)
        ).cast("string")

    schema = induce_schema(merged).select(
        F.lit("schema").alias("part"), F.lit("induced").alias("kind"),
        F.coalesce("domain", blank).alias("subj"), "pred",
        F.coalesce("rng", blank).alias("obj"),
        F.concat_ws(
            ":", F.col("n_triples").cast("string"),
            F.col("n_dom_typed").cast("string"), _micros("dom_cover"),
            F.col("n_rng_typed").cast("string"), _micros("rng_cover"),
        ).alias("expected"),
    )
    return (
        rels.unionByName(viol).unionByName(func).unionByName(dang)
        .unionByName(stats).unionByName(diff).unionByName(chg)
        .unionByName(schema)
    )


def _kg_find_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.kgquery import find_objects

    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    return find_objects(kb, "Q30", "P17", direction="backw")


def _kg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components alias clustering (part=cc: a=qid,
    b=canonical_qid) + dictionary-delta alias MINING from the corpus's own
    linked mentions (part=alias: a=normalized surface, b packs
    qid:support:purity-in-micros), merged into one driver row — the KB
    side and the corpus side of the same alias loop."""
    from entity_extraction_svc_spark.operators.canonicalize import (
        canonical_qids,
        mine_aliases,
    )

    ents = spark.read.parquet(f"{FIXTURES}/kb_entities.parquet")
    aliases = spark.read.parquet(f"{FIXTURES}/kb_aliases.parquet")
    cc = canonical_qids(ents, aliases).select(
        F.lit("cc").alias("part"),
        F.col("qid").alias("a"),
        F.col("canonical_qid").alias("b"),
    )
    linked = spark.read.parquet(f"{FIXTURES}/golden_links.parquet")
    mined = mine_aliases(linked, aliases, min_support=2).select(
        F.lit("alias").alias("part"),
        F.col("alias").alias("a"),
        F.concat_ws(
            ":", "qid", "support",
            F.round(F.col("purity") * 1e6).cast("long"),
        ).alias("b"),
    )
    return cc.unionByName(mined)


# --- relational skeletons on the driver's TPC-H-ish tables ------------------

def _rel_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both window-function shapes in one row: ranked top-k (row_number
    over a composite order) and the running value-framed prefix sum.
    One shuffle on l_orderkey serves both frames."""
    from pyspark.sql.window import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    # RANGE (not ROWS): l_linenumber has duplicates within an order, so a
    # row-based frame is nondeterministic; value-based framing is stable.
    ws = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(wr).alias("rk"),
        F.round(F.coalesce(F.sum("l_quantity").over(ws), F.lit(0.0)), 4).alias("offset_shift"),
    )


def _rel_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation + exact per-group percentiles (p50/p95 of
    extended price per returnflag) joined onto the (flag, status) rows."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    grouped = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count("*").alias("n_rows"),
    )
    pct = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
    )
    return grouped.join(F.broadcast(pct), "l_returnflag")


def _rel_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both broadcast-dimension join shapes in one row: orders->customer->
    nation fact agg (part=orders_nations) and the supplier->nation->region
    two-hop (part=supplier_regions)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    orders = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(F.lit("orders_nations").alias("part"), F.col("n_name").alias("name"),
                "n", "sum_price")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    two_hop = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count("*").alias("n"))
        .select(F.lit("supplier_regions").alias("part"), F.col("r_name").alias("name"),
                "n", F.lit(0.0).alias("sum_price"))
    )
    return orders.unionByName(two_hop)


def _rel_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event aggregation through both shapes, tagged and unioned:
    plain groupBy per (user, event_type) and 30-min-gap session windows
    (the batch face of streaming sessionization — F.session_window works
    in both)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    by_type = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value")
    ).select(
        F.lit("by_type").alias("part"), "user_id",
        F.col("event_type").alias("key"), "n_events", "sum_value",
    )
    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.lit("session").alias("part"), "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("key"),
            "n_events", "sum_value",
        )
    )
    return by_type.unionByName(sessions)


def _rel_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets over the documents corpus: cube(lang, source) AND
    rollup(lang, source), tagged and unioned into one driver row."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aggs = [F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")]
    cube = docs.cube("lang", "source").agg(*aggs).select(
        F.lit("cube").alias("part"), "lang", "source", "n_docs", "sum_chars"
    )
    roll = docs.rollup("lang", "source").agg(*aggs).select(
        F.lit("rollup").alias("part"), "lang", "source", "n_docs", "sum_chars"
    )
    return cube.unionByName(roll)


_PPR_SEEDS = ["Q30", "Q762"]  # USA + Leonardo: two well-connected fixture hubs


def _kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (10 iterations, d=0.85) over the entity->entity
    edges of the fixture KB triple store — the corpus-level generalization
    of the reference's per-request connection ranking (entity_linking.py
    rel-ranking + wiki_parser top-people caches) — as part=global, plus
    personalized PageRank from two seed hubs (part=ppr): relatedness-to-
    seed-set, the closure of the reference's candidate-scoring-by-
    connections-to-other-document-entities heuristic, plus Kleinberg HITS
    over the same edges (parts hits_hub / hits_auth) — the directed
    hub-vs-authority split PageRank's single importance score can't
    express (a page linking many good entities vs an entity many pages
    assert claims about)."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.graphstats import hits
    from entity_extraction_svc_spark.operators.pagerank import (
        pagerank,
        pagerank_warm,
        personalized_pagerank,
    )

    ensure_fixtures(FIXTURES)
    _prep(spark)
    tr = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    edges = tr.filter(F.col("obj").rlike("^Q[0-9]+$")).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    glob = pagerank(edges, iterations=10).select(
        F.lit("global").alias("part"), "node", "rank"
    )
    ppr = personalized_pagerank(edges, _PPR_SEEDS, iterations=10).select(
        F.lit("ppr").alias("part"), "node", "rank"
    )
    ha = hits(edges, iterations=10)
    hub = ha.select(
        F.lit("hits_hub").alias("part"), "node", F.col("hub").alias("rank")
    )
    auth = ha.select(
        F.lit("hits_auth").alias("part"), "node", F.col("auth").alias("rank")
    )
    # part=warm pins the warm-start machinery (init injection: outer-match
    # to nodes, 1/n floor, renormalize) over 3 fixed iterations from a
    # deterministic non-uniform init (out-degree + 1) — the oracle unrolls
    # the SAME recurrence from the SAME init; the tol-convergence
    # behavior is unit-tested (iterative stop depends on scalar reads, so
    # the fixed-count form is what cross-engine hashing certifies)
    init = edges.distinct().groupBy(F.col("src").alias("node")).agg(
        (F.count("*") + F.lit(1)).cast("double").alias("rank")
    )
    warm_df, _ = pagerank_warm(edges, init_ranks=init, max_iterations=3)
    warm = warm_df.select(
        F.lit("warm").alias("part"), "node",
        F.round("rank", 6).alias("rank"),
    )
    # part=wpr: evidence-weighted rank — edges weighted idf-style by their
    # predicate's corpus frequency (rare predicates carry more signal),
    # w = 1/ln(1 + count(pred)); exercises the non-uniform distribution
    # path (parallel-edge weight SUMMING included, since two predicates
    # can connect the same entity pair)
    from entity_extraction_svc_spark.operators.pagerank import weighted_pagerank

    qq = tr.filter(F.col("obj").rlike("^Q[0-9]+$"))
    pred_n = qq.groupBy("pred").agg(F.count("*").alias("pn"))
    wedges = qq.join(F.broadcast(pred_n), "pred").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"),
        (F.lit(1.0) / F.log(F.lit(1.0) + F.col("pn"))).alias("w"),
    )
    wpr = weighted_pagerank(wedges, iterations=10).select(
        F.lit("wpr").alias("part"), "node", "rank"
    )
    return (
        glob.unionByName(ppr).unionByName(hub).unionByName(auth)
        .unionByName(warm).unionByName(wpr)
    )


def _doc_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set n-gram decontamination audit.  The deterministic "eval
    benchmark" is derived from the corpus itself (first 240 normalized
    chars of every doc_id % 97 == 0 document) so the contract has true
    positives without external data; real use passes the real benchmark
    table.  Corpus side stays unshuffled (broadcast gram join)."""
    from entity_extraction_svc_spark.operators.decontam import contamination

    docs = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce("text", F.lit(""))), r"\s+", " ")
    )
    ev = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.substring(norm, 1, 240).alias("text")
    )
    return contamination(docs, ev, n=8)


def _doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-LM self-audit (CCNet-style): add-k bigram cross-entropy AND
    the Jelinek-Mercer-interpolated trigram cross-entropy per document,
    both trained on the documents table (order parameter surface)."""
    from entity_extraction_svc_spark.operators.lm import score_cross_entropy

    docs = _docs(spark, sf_dir)
    bi = score_cross_entropy(docs)
    tri = score_cross_entropy(docs, order=3).select(
        "doc_id", "n_trigrams",
        F.col("cross_entropy").alias("cross_entropy3"),
    )
    return bi.join(tri, "doc_id")


# --- training-data ops on documents / embeddings ----------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality stats + language-ID + fingerprint joined per doc_id: the
    three row-local text profilers in one driver row (each remains an
    independent operator; the join is on the id, so Catalyst collapses it
    to one scan + three expression bundles)."""
    from entity_extraction_svc_spark.operators.textstats import (
        doc_stats,
        fingerprint,
        lang_id,
    )

    docs = _docs(spark, sf_dir)
    stats = doc_stats(docs)
    lang = lang_id(docs).select("doc_id", "lang_pred")
    fp = fingerprint(docs)
    return stats.join(lang, "doc_id").join(fp, "doc_id")


# v5: overlapping valid-inside-failing candidate row (positional
# reconstruction contract); v4 added the embedded-in-digit-run row; v3
# iban/card rows (valid + checksum-failing near-misses); v2 the phone
# near-misses — new filename per change so a cached older parquet can
# never serve the extended contract
_PII_FIXTURE = os.path.join(FIXTURES, "pii_samples_v5.parquet")

# deterministic PII-bearing corpus: the sf documents carry no real PII, so
# a zero-vs-zero count match would prove nothing — these rows give every
# pattern positive AND near-miss coverage (ids offset to 10^9 so the union
# with the documents table never collides)
_PII_ROWS = [
    (1_000_000_000, "contact me at jane.doe+spam@example.co.uk for details"),
    (1_000_000_001, "Email sales@corp.io or SUPPORT@CORP.IO; no other PII."),
    (1_000_000_002, "my ssn is 123-45-6789 please keep it private"),
    (1_000_000_003, "server at 192.168.0.1 and backup at 10.0.255.254"),
    (1_000_000_004, "call +1 (415) 555-0199 after hours"),
    (1_000_000_005, "office: 020 7946 0958, mobile 07700-900123"),
    (1_000_000_006, "mixed: a@b.org, 8.8.8.8, 555-867-5309 all in one line"),
    (1_000_000_007, "clean prose with no identifiers at all"),
    (1_000_000_008, ""),
    (1_000_000_009, "semver 1.2.3 is not an ip; user at host dot com either"),
    (1_000_000_010, "short digits 12345 should not be a phone"),
    (1_000_000_011, "unicode reseau 127.0.0.1 e-mail: zoe@ecole.fr tel +33 1 42 68 53 00"),
    # near-misses for the phone shape-allowlist: every row must scan clean
    (1_000_000_012, "dates 2026-08-17 and 17.08.2026 and range 2021-2022 stay"),
    (1_000_000_013, "years 2021 2022 2023 amount 1 000 000 isbn 978-3-16-148410-0"),
    (1_000_000_014, "epoch 1692230400 order 123456789012 invoice 45-678 kept"),
    (1_000_000_015, "phones (415) 555-0199 and 555.123.4567 and +49 30 901820"),
    # checksummed kinds: valid instances redact, checksum-failing shapes stay
    (1_000_000_016, "iban GB82 WEST 1234 5698 7654 32 pays card 4111 1111 1111 1111"),
    (1_000_000_017, "not iban GB82 WEST 1234 5698 7654 33 not card 4111-1111-1111-1112"),
    (1_000_000_018, "compact iban DE89370400440532013000 card 4012888888881881 ok"),
    (1_000_000_019, "order 1234 5678 9012 3456 fails luhn; ref AB12 CDEF 3456 too"),
    # embedded occurrence: the valid card also appears INSIDE a longer
    # digit run — the \b-guarded redaction must touch only the standalone
    (1_000_000_020, "card 4111 1111 1111 1111 once; ref 94111 1111 1111 11117 intact"),
    # a VALID candidate overlapping a checksum-FAILING candidate's span:
    # the scan (non-overlapping, left-to-right) consumes the failing
    # '9998 4111 1111 1111' first and never matches the valid run inside
    # it — redaction must mirror that positionally and keep it verbatim
    (1_000_000_021, "ref 9998 4111 1111 1111 1111 end; card 4111 1111 1111 1111 pay"),
]


def _ensure_pii_samples() -> str:
    if not os.path.exists(_PII_FIXTURE):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in _PII_ROWS], pa.int64()),
                "text": pa.array([r[1] for r in _PII_ROWS], pa.string()),
            }
        )
        tmp = f"{_PII_FIXTURE}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, _PII_FIXTURE)
    return _PII_FIXTURE


def _doc_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan counts + typed redaction over the PII fixture corpus UNION
    the sf documents (fixture rows exercise every pattern positively; the
    documents rows prove the scan runs clean at table scale)."""
    from entity_extraction_svc_spark.operators.privacy import (
        pii_redact,
        pii_scan,
    )

    fx = spark.read.parquet(_ensure_pii_samples())
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    both = fx.unionByName(docs)
    return pii_scan(both).join(pii_redact(both), "doc_id")


def _doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucket train/val/test assignment (stable across
    runs, partitionings and engines — the oracle recomputes it from the
    same md5 bytes)."""
    from entity_extraction_svc_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf_dir)).select("doc_id", "bucket", "split")


def _doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk training-sequence packing (seq_len=128) over the
    documents table: every token of every non-empty doc assigned to
    exactly one fixed-length sequence, docs laid out in md5(doc_id)
    shuffle order.  The Spark side computes the global prefix sum
    two-level (256 order-prefix buckets, index-sized totals frame); the
    oracle uses one flat window — same definition, different physical
    plan."""
    from entity_extraction_svc_spark.operators.packing import pack_sequences

    # dtype parity with the oracle: DuckDB types the windowed sum(n_tokens)
    # as HUGEINT and fetchdf() returns the three off-derived columns as
    # float64 (verified: 64.0 vs 64) — the driver's value hash is dtype-
    # sensitive, so the Spark side emits the same doubles (token offsets are
    # far below 2^53, the cast is exact; VERDICT r5 "What's wrong #1")
    return pack_sequences(_docs(spark, sf_dir), seq_len=128).select(
        "seq_id",
        "doc_id",
        F.col("tok_start").cast("double").alias("tok_start"),
        F.col("tok_end").cast("double").alias("tok_end"),
        F.col("seq_pos").cast("double").alias("seq_pos"),
        "n_tokens",
    )


def _doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-level exact dedup over the documents table.
    The flat word-stream docs are first reshaped into 3-word lines (the
    same fixed non-overlapping chunking in BOTH engines — with the
    driver's ~30-word vocabulary that construction yields real cross-doc
    duplicate lines, standing in for repeated web boilerplate); then
    each normalized line keeps only its corpus-wide first occurrence
    ((doc_id, idx)-least), docs reassemble in order, and fully-deduped
    docs disappear."""
    from entity_extraction_svc_spark.operators.dedup import line_dedup

    toks = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(toks) / F.lit(3.0)).cast("int")
    reshaped = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(1), nlines),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, (i - F.lit(1)) * 3 + 1, 3)
                ),
            ),
        ).alias("text"),
    )
    return line_dedup(reshaped)


def _doc_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language mixture (alpha=0.5, T=corpus size):
    per-language keep fraction min(1, T * n_l**alpha / sum(n**alpha) / n_l)
    — the majority language is sampled down, minority languages keep
    everything (the documents table's lang column is naturally skewed;
    its source column is uniform, which would make temperature a no-op) —
    membership by the row-local md5-bucket rule (shuffle-free,
    join-compatible with hash_split/hash_sample)."""
    from entity_extraction_svc_spark.operators.packing import temperature_sample

    return temperature_sample(
        _docs(spark, sf_dir), source_col="lang", alpha=0.5
    ).select("doc_id", F.col("lang").alias("source"), "keep_frac")


def _doc_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE trainer + token counter over the documents table: 10 learned
    merges (part=merge: a/b/c = left/right/merged, n = rank) and the
    per-document subword token count under them (part=count: a = doc_id,
    n = tokens).  The merge loop runs on the VOCABULARY frame; the corpus
    is touched once for word counts and once for the final count join."""
    from entity_extraction_svc_spark.operators.bpe import (
        bpe_token_counts,
        learn_bpe,
        merges_df,
    )

    docs = _docs(spark, sf_dir)
    merges, vocab = learn_bpe(docs, n_merges=10)
    blank = F.lit("")
    m = merges_df(spark, merges).select(
        F.lit("merge").alias("part"),
        F.col("left").alias("a"), F.col("right").alias("b"),
        F.col("merged").alias("c"), F.col("rank").alias("n"),
    )
    c = bpe_token_counts(docs, vocab).select(
        F.lit("count").alias("part"),
        F.col("doc_id").cast("string").alias("a"), blank.alias("b"),
        blank.alias("c"), F.col("n_bpe").cast("long").alias("n"),
    )
    return m.unionByName(c)


def _doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.textstats import quality_filter

    out = quality_filter(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "keep", F.concat_ws(",", "reasons").alias("reasons_csv")
    )


def _doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def _doc_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hash document embeddings (vector projected to CSV for the
    driver canonicalizer, like mm_features)."""
    from entity_extraction_svc_spark.operators.embed import hash_embed

    out = hash_embed(_docs(spark, sf_dir), dim=16)
    return out.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("embedding", lambda x: x.cast("string"))
        ).alias("embedding_csv"),
    )


def _rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: every purchase matched to the user's latest prior-or-
    equal click (union + running-last window; one shuffle, no theta join)."""
    from entity_extraction_svc_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(purchases, clicks, on=["user_id"], ts_col="ts",
                    tie_col="event_id")
    return out.select(
        "event_id", "user_id",
        F.col("r_event_id").alias("click_event_id"),
        F.round("r_value", 4).alias("click_value"),
    )


_ASOF_PROBE_TS = "2024-01-15 00:00:00"


def _rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, purchases landing inside [signup, signup + 2h) windows
    of the same user — bucketed equi-join, not a per-key theta join
    (part=range) — merged with fact VERSIONING over the same event log:
    each user's event_type stream collapsed to validity intervals
    (part=facts; b packs the epoch-second interval, -1 = open) and the
    snapshot believed at the probe instant (part=asof), the KG twin of
    Iceberg time travel."""
    from entity_extraction_svc_spark.operators.temporal import (
        fact_intervals,
        kb_as_of,
        range_join,
        set_fact_intervals,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    iv = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
        F.col("event_id").alias("signup_id"),
    )
    rng = range_join(pts, iv, on=["user_id"]).select(
        F.lit("range").alias("part"),
        F.col("purchase_id").cast("string").alias("a"),
        F.col("signup_id").cast("string").alias("b"),
    )
    obs = ev.select(
        F.col("user_id").alias("subj"), F.lit("status").alias("pred"),
        F.col("event_type").alias("obj"), F.col("ts").alias("observed_ts"),
    )
    fi = fact_intervals(obs, ["subj", "pred"], "obj")
    pack = F.concat_ws(
        ":",
        F.unix_timestamp("valid_from"),
        F.coalesce(F.unix_timestamp("valid_to"), F.lit(-1)),
    )
    facts = fi.select(
        F.lit("facts").alias("part"),
        F.concat_ws(":", "subj", "value").alias("a"),
        pack.alias("b"),
    )
    asof = kb_as_of(fi, _ASOF_PROBE_TS).select(
        F.lit("asof").alias("part"),
        F.col("subj").cast("string").alias("a"),
        F.col("value").alias("b"),
    )
    # part=setfacts (VERDICT r4 #7): SET-VALUED versioning — a day of
    # events is one observation snapshot of the user's activity set, and
    # each activity's validity is a presence/absence run over the user's
    # snapshots (multiple simultaneous values per key, unlike part=facts)
    sobs = ev.select(
        F.col("user_id").alias("subj"),
        F.lit("activity").alias("pred"),
        F.col("event_type").alias("obj"),
        F.date_trunc("day", F.col("ts")).alias("observed_ts"),
    )
    sfi = set_fact_intervals(sobs, ["subj", "pred"], "obj")
    setfacts = sfi.select(
        F.lit("setfacts").alias("part"),
        F.concat_ws(":", "subj", "value").alias("a"),
        pack.alias("b"),
    )
    return (
        rng.unionByName(facts).unionByName(asof).unionByName(setfacts)
    )


def _web_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus hygiene in one row: URL decomposition (url_parts) joined
    with the per-domain crawl-balance cap (cap_per_domain); capped-out urls
    carry domain_rank = -1 (sentinel, not NULL, for the driver hasher)."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.textstats import (
        cap_per_domain,
        url_parts,
    )

    ensure_fixtures(FIXTURES)
    pages = spark.read.parquet(f"{FIXTURES}/pages.parquet")
    parts = url_parts(pages)
    cap = cap_per_domain(pages, max_per_domain=50).select("url", "domain_rank")
    return parts.join(cap, "url", "left").select(
        "url", "host", "domain", "path",
        F.coalesce("domain_rank", F.lit(-1)).alias("domain_rank"),
    )


def _rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: JSON props parsed in codegen
    (get_json_object) and aggregated per event_type."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


def _rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# ---------------------------------------------------------------------------
# part-union plumbing for merged driver rows
# ---------------------------------------------------------------------------
#
# The driver's correctness gate checks the FIRST 50 queries() entries in
# dict order (see _raw_queries docstring); round 5 grew the surface past
# 50, so — exactly as round 3 did — overlapping rows are merged into one
# driver row per family: each constituent still runs in full, tagged by a
# `part` value, over the UNION of the constituents' columns (NULL-padded;
# NULLs are engine-stable in the compare, proven since the r3 cube row).

def _part_union(parts, schema):
    """Union constituent DataFrames into one (part, <superset>) frame.
    ``parts``: list of (tag, df) — tag None keeps the df's own part
    column (for constituents that are themselves part-tagged).
    ``schema``: ordered (name, sparktype) pairs for the superset."""
    outs = []
    for tag, df in parts:
        have = set(df.columns)
        cols = [(F.col("part") if tag is None else F.lit(tag))
                .cast("string").alias("part")]
        for name, typ in schema:
            src = F.col(name) if name in have else F.lit(None)
            cols.append(src.cast(typ).alias(name))
        outs.append(df.select(*cols))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


_SQL_TYPES = {"string": "VARCHAR", "long": "BIGINT", "int": "INTEGER",
              "double": "DOUBLE", "boolean": "BOOLEAN"}


def _sql_part_union(parts, schema):
    """DuckDB rendition of _part_union.  ``parts``: list of
    (tag_or_None, sql, present_cols)."""
    selects = []
    for tag, sql_text, present in parts:
        cols = ["part" if tag is None else f"'{tag}' AS part"]
        for name, typ in schema:
            if name in present:
                cols.append(f'CAST("{name}" AS {_SQL_TYPES[typ]}) AS "{name}"')
            else:
                cols.append(f'NULL::{_SQL_TYPES[typ]} AS "{name}"')
        selects.append(f"SELECT {', '.join(cols)} FROM ({sql_text})")
    return " UNION ALL ".join(selects)


_REL_AGG_SCHEMA = [
    ("l_orderkey", "long"), ("l_linenumber", "int"), ("rk", "int"),
    ("offset_shift", "double"), ("l_returnflag", "string"),
    ("l_linestatus", "string"), ("sum_qty", "double"),
    ("sum_price", "double"), ("n_rows", "long"), ("p50", "double"),
    ("p95", "double"),
]


def _rel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (part=win: top-k rank + running prefix sum) and
    grouped aggregation with percentiles (part=agg) — the r5 part merge
    of rel_windows + rel_grouped_agg."""
    return _part_union(
        [("win", _rel_windows(spark, sf_dir)),
         ("agg", _rel_grouped_agg(spark, sf_dir))],
        _REL_AGG_SCHEMA,
    )


_REL_JOINS_SCHEMA = [
    ("name", "string"), ("n", "long"), ("sum_price", "double"),
    ("event_id", "long"), ("user_id", "long"), ("click_event_id", "long"),
    ("click_value", "double"), ("a", "string"), ("b", "string"),
]


def _rel_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-strategy surface in one row: broadcast dim + two-hop dim
    chain (parts from rel_broadcast_join), AS-OF join (part=asof), and
    the interval/range-join family incl. set-valued fact versioning
    (parts from rel_range_join) — the r5 merge of rel_broadcast_join +
    rel_asof_join + rel_range_join."""
    return _part_union(
        [(None, _rel_broadcast_join(spark, sf_dir)),
         ("asof", _rel_asof_join(spark, sf_dir)),
         (None, _rel_range_join(spark, sf_dir))],
        _REL_JOINS_SCHEMA,
    )


_REL_SHAPES_SCHEMA = [
    ("lang", "string"), ("source", "string"), ("n_docs", "long"),
    ("sum_chars", "long"), ("l_linestatus", "string"), ("A", "double"),
    ("N", "double"), ("R", "double"),
]


def _rel_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set shapes: cube + rollup (parts from rel_cube_stats) and
    pivot (part=pivot) — the r5 merge of rel_cube_stats + rel_pivot."""
    return _part_union(
        [(None, _rel_cube_stats(spark, sf_dir)),
         ("pivot", _rel_pivot(spark, sf_dir))],
        _REL_SHAPES_SCHEMA,
    )


_REL_EVENTS_SCHEMA = [
    ("user_id", "long"), ("key", "string"), ("n_events", "long"),
    ("sum_value", "double"), ("event_type", "string"), ("n", "long"),
    ("sum_k", "long"), ("avg_k", "double"),
]


def _rel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream shapes: per-type aggregation + session windows (parts
    from rel_events_agg) and JSON payload extraction (part=json) — the
    r5 merge of rel_events_agg + rel_json_extract."""
    return _part_union(
        [(None, _rel_events_agg(spark, sf_dir)),
         ("json", _rel_json_extract(spark, sf_dir))],
        _REL_EVENTS_SCHEMA,
    )


_DEDUP_MINHASH_SCHEMA = [
    ("doc_id", "long"), ("sig_str", "string"), ("a", "long"), ("b", "long"),
    ("score", "double"),
]


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash both halves in one row: per-doc signatures (part=sig) and
    the LSH-banded candidate pairs (parts from dedup_minhash_pairs) — the
    r5 merge of dedup_minhash_sig + dedup_minhash_pairs."""
    return _part_union(
        [("sig", _dedup_minhash_sig(spark, sf_dir)),
         (None, _dedup_minhash_pairs(spark, sf_dir))],
        _DEDUP_MINHASH_SCHEMA,
    )


_DOC_SPLIT_SCHEMA = [
    ("doc_id", "long"), ("bucket", "long"), ("split", "string"),
    ("source", "string"), ("keep_frac", "double"),
]


def _doc_split_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic membership family: md5-bucket train/val/test split
    (part=split) and temperature source re-weighting (part=mixture) —
    the r5 merge of doc_split + doc_mixture."""
    return _part_union(
        [("split", _doc_split(spark, sf_dir)),
         ("mixture", _doc_mixture(spark, sf_dir))],
        _DOC_SPLIT_SCHEMA,
    )


_DOC_PPL_SCHEMA = [
    ("doc_id", "long"), ("n_bigrams", "long"), ("cross_entropy", "double"),
    ("n_trigrams", "long"), ("cross_entropy3", "double"),
    ("n_overlap", "long"), ("contaminated", "long"),
]


def _doc_perplexity_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-protection family: corpus-trained bigram+trigram LM
    cross-entropy (part=ppl) and eval-set n-gram decontamination
    (part=decontam) — the r5 merge of doc_perplexity + doc_decontam."""
    return _part_union(
        [("ppl", _doc_perplexity(spark, sf_dir)),
         ("decontam", _doc_decontam(spark, sf_dir))],
        _DOC_PPL_SCHEMA,
    )


_DOC_PII_SCHEMA = [
    ("doc_id", "long"), ("n_email", "int"), ("n_ssn", "int"),
    ("n_ipv4", "int"), ("n_iban", "int"), ("n_card", "int"),
    ("n_phone", "int"), ("has_pii", "long"), ("redacted", "string"),
    ("url", "string"), ("host", "string"), ("domain", "string"),
    ("path", "string"), ("domain_rank", "int"),
]


def _doc_pii_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local hygiene family: PII scan + typed redaction (part=pii)
    and URL decomposition + per-domain crawl-balance cap (part=web) —
    the r5 merge of doc_pii + web_hygiene."""
    return _part_union(
        [("pii", _doc_pii(spark, sf_dir)),
         ("web", _web_hygiene(spark, sf_dir))],
        _DOC_PII_SCHEMA,
    )


_DOC_QF_SCHEMA = [
    ("doc_id", "long"), ("keep", "long"), ("reasons_csv", "string"),
    ("k", "string"), ("v", "long"), ("y", "long"), ("pred", "long"),
]


def _doc_quality_filter_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality family: the heuristic keep/drop gate with reason codes
    (part=gate) PLUS its distillation into a linear model trained ON the
    cluster in exact fixed-point arithmetic — part=w pins the learned
    weight vector bit-for-bit against the unrolled-CTE training oracle
    (bit-reproducible across partitionings/executor counts by
    construction), part=score the per-doc calibrated scores."""
    from entity_extraction_svc_spark.operators.classifier import (
        FEATURES,
        train_quality_model,
    )

    gate = _doc_quality_filter(spark, sf_dir)
    w, scored = train_quality_model(_docs(spark, sf_dir))
    wdf = spark.createDataFrame(
        [(k, int(v)) for k, v in zip(FEATURES, w)], "k string, v long")
    scores = scored.select(
        F.col("id").alias("doc_id"), F.col("score").alias("v"), "y", "pred")
    return _part_union(
        [("gate", gate), ("w", wdf), ("score", scores)], _DOC_QF_SCHEMA)


_KG_TRAINING_SCHEMA = [
    ("url", "string"), ("tok_idx", "int"), ("token", "string"),
    ("tok_start", "long"), ("tok_end", "long"), ("bio", "string"),
    ("start_a", "long"), ("end_a", "long"), ("qid_a", "string"),
    ("start_b", "long"), ("end_b", "long"), ("qid_b", "string"),
    ("label", "string"), ("direction", "string"),
]


def _kg_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both directions of the distant-supervision loop in one row:
    per-token BIO rows (part=ner) and KB-labelled relation pairs
    (part=rel) — the r5 merge of kg_ner_training + kg_rel_training."""
    return _part_union(
        [("ner", _kg_ner_training(spark, sf_dir)),
         ("rel", _kg_rel_training(spark, sf_dir))],
        _KG_TRAINING_SCHEMA,
    )


def _kg_walks_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG-embedding training data, all three emitters: DeepWalk corpus
    (part=walk), GraphSAGE fan-out sample (part=fanout), and filtered
    TransE negatives (part=neg, b packs pred:obj:rank) — the r5 merge of
    kg_walks + kg_negatives."""
    neg = _kg_negatives(spark, sf_dir).select(
        F.lit("neg").alias("part"),
        F.col("subj").alias("a"),
        F.concat_ws(":", "pred", "obj",
                    F.col("neg_rank").cast("string")).alias("b"),
    )
    return _kg_walks(spark, sf_dir).unionByName(neg)


_KG_SALIENCE_SCHEMA = [
    ("url", "string"), ("qid", "string"), ("tf", "long"),
    ("first_pos", "long"), ("salience", "double"), ("sal_rank", "int"),
    ("ent_a", "string"), ("ent_b", "string"), ("n_shared", "long"),
    ("deg_a", "long"), ("deg_b", "long"), ("jaccard", "double"),
]


def _kg_salience_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity ranking surfaces: per-doc aboutness salience (part=sal)
    and structural neighbor-Jaccard ER candidates (part=njac) — the r5
    merge of kg_salience + kg_entity_sim."""
    return _part_union(
        [("sal", _kg_salience(spark, sf_dir)),
         ("njac", _kg_entity_sim(spark, sf_dir))],
        _KG_SALIENCE_SCHEMA,
    )


_SIM_COSINE_SCHEMA = [
    ("vec_id", "long"), ("cos_sim", "double"), ("a", "long"),
    ("b", "long"), ("r", "long"), ("v", "double"),
]


def _sim_cosine_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-similarity family: brute-force cosine top-k (part=topk)
    plus the kNN graph + GraphSAGE-style neighbor feature aggregation
    (parts knn/feat) — the r5 merge of sim_cosine_topk + kg_knn_gnn."""
    return _part_union(
        [("topk", _sim_cosine_topk(spark, sf_dir)),
         (None, _kg_knn_gnn(spark, sf_dir))],
        _SIM_COSINE_SCHEMA,
    )


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup through both surfaces in one row: real dup GROUPS on the
    fixture corpus, whose repeated payload bodies make >1-member groups
    (part=pages_groups), and the full fingerprint/keeper-key projection
    over the driver's documents table, which has no dups (part=docs_keys)."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.dedup import (
        exact_dedup,
        exact_dup_groups,
    )

    ensure_fixtures(FIXTURES)
    pages = spark.read.parquet(f"{FIXTURES}/pages.parquet")
    groups = exact_dup_groups(pages, text_col="text", id_col="url").select(
        F.lit("pages_groups").alias("part"), "fp_md5",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("keeper_id").cast("string").alias("keeper_id"),
    )
    keys = exact_dedup(_docs(spark, sf_dir)).select(
        F.lit("docs_keys").alias("part"), "fp_md5",
        F.lit(1).cast("long").alias("n_docs"),
        F.col("doc_id").cast("string").alias("keeper_id"),
    )
    return groups.unionByName(keys)


def _dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(_docs(spark, sf_dir))
    return sigs.select(
        "doc_id",
        F.concat_ws(",", F.transform("sig", lambda x: x.cast("string"))).alias("sig_str"),
    )


def _dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH pairs + their connected-component RESOLUTION (keeper
    per dup group, keep flag for every doc), tagged and unioned.  The pair
    set is localCheckpoint-ed so the signature/bucket work runs once for
    both halves."""
    from entity_extraction_svc_spark.operators.dedup import (
        minhash_dup_pairs,
        resolve_near_dups,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_dup_pairs(docs, threshold=0.5).localCheckpoint(eager=True)
    res = resolve_near_dups(docs, pairs)
    pair_rows = pairs.select(
        F.lit("pair").alias("part"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        F.col("est_jaccard").alias("score"),
    )
    res_rows = res.select(
        F.lit("resolve").alias("part"),
        F.col("doc_id").alias("a"),
        F.col("keeper_id").alias("b"),
        F.col("keep").cast("double").alias("score"),
    )
    return pair_rows.unionByName(res_rows)


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir))


def _dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


def _dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.dedup import embedding_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_dup_pairs(emb, threshold=0.35)


def _dedup_embedding_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-dup recall contract: the LSH pair set is a subset of the
    exact pair set by construction (candidates are exact-cosine verified),
    so the check is (a) n_exact cross-verified by the DuckDB oracle and
    (b) recall = n_lsh/n_exact >= 0.9 (measured 0.985 at sf0.01)."""
    from entity_extraction_svc_spark.operators.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = embedding_dup_pairs(emb, threshold=0.35).select("id_a", "id_b")
    lsh = embedding_dup_pairs_lsh(emb, threshold=0.35).select("id_a", "id_b")
    hits = lsh.join(exact, ["id_a", "id_b"]).agg(F.count("*").alias("n_hit"))
    totals = exact.agg(F.count("*").alias("n_exact"))
    return totals.crossJoin(hits).select(
        "n_exact",
        (F.col("n_hit") >= F.ceil(F.col("n_exact") * 0.9)).alias("recall_ok"),
    )


def _dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup contract: n_exact (corpus-wide pairs >= tau) is the DuckDB
    crosscheck; recall_ok asserts within-cluster pairs >= 0.25 of them
    (near-random embeddings split pairs across clusters — measured
    0.39/0.31 at sf0.01/sf0.1 with 8 clusters); drops_ok ties the keep
    flags to the pair set (dropped == distinct larger-id pair members)."""
    from entity_extraction_svc_spark.operators.dedup import (
        embedding_dup_pairs,
        semantic_assign,
        semantic_dedup,
        semantic_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = embedding_dup_pairs(emb, threshold=0.35).agg(
        F.count("*").alias("n_exact")
    )
    # ONE k-means fit + assignment shared by the pair set and the keep
    # flags (the r2 shape ran the fit twice and leaked two persisted copies)
    assigned = semantic_assign(emb, n_clusters=8)
    within = semantic_dup_pairs(threshold=0.35, assigned=assigned)
    n_within = within.agg(F.count("*").alias("n_within"))
    n_dup_ids = within.select("id_b").distinct().agg(
        F.count("*").alias("n_dup_ids")
    )
    dropped = semantic_dedup(threshold=0.35, assigned=assigned).filter(
        ~F.col("keep")
    ).agg(F.count("*").alias("n_dropped"))
    return (
        exact.crossJoin(n_within).crossJoin(n_dup_ids).crossJoin(dropped)
        .select(
            "n_exact",
            (F.col("n_within") >= F.col("n_exact") * 0.25).alias("recall_ok"),
            (F.col("n_dropped") == F.col("n_dup_ids")).alias("drops_ok"),
        )
    )


def _dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better", re-expressed as a window-fingerprint
    join instead of their single-machine suffix array): part=win is the
    duplicated k-token windows on the fixture pages — whose repeated
    "Boilerplate Nav/Footer" blocks are exactly the in-page boilerplate
    the paper targets — with occurrence/doc counts and the keeper
    occurrence; part=span merges adjacent duplicated windows into maximal
    duplicated token ranges; part=winfp is the winnowed fingerprint set
    (Schleimer et al. 2003) over the driver's documents table, the
    shuffle-volume scale path, pinned value-for-value against a
    window-function oracle plan."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.dedup import (
        substring_dup_spans,
        substring_dup_windows,
        winnow_fingerprints,
    )

    ensure_fixtures(FIXTURES)
    pages = spark.read.parquet(f"{FIXTURES}/pages.parquet")
    win = substring_dup_windows(pages, id_col="url", k=6).select(
        F.lit("win").alias("part"),
        F.col("keeper_id").alias("rid"),
        F.col("keeper_pos").cast("long").alias("a"),
        F.col("n_occ").cast("long").alias("b"),
        F.col("n_docs").cast("long").alias("c"),
        "wh",
    )
    span = substring_dup_spans(pages, id_col="url", k=6).select(
        F.lit("span").alias("part"),
        F.col("url").alias("rid"),
        F.col("span_start").cast("long").alias("a"),
        F.col("span_end").cast("long").alias("b"),
        F.col("span_tokens").cast("long").alias("c"),
        F.lit(None).cast("string").alias("wh"),
    )
    fp = winnow_fingerprints(_docs(spark, sf_dir), k=6, w=4).select(
        F.lit("winfp").alias("part"),
        F.col("doc_id").cast("string").alias("rid"),
        F.col("pos").cast("long").alias("a"),
        F.col("h").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
        F.lit(None).cast("string").alias("wh"),
    )
    return win.unionByName(span).unionByName(fp)


def _sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_extraction_svc_spark.operators.simsearch import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, query_id=0, k=10)


# 16 fixed query ids for the ANN recall contracts (every 10th vector; all
# SF tables have >= 500 vectors, so these always exist)
_ANN_QIDS = list(range(0, 160, 10))

# DuckDB side of the ANN recall contracts: the exact batch top-10 cosine sum
# (grounded crosscheck of the Spark-side brute-force baseline the ANN probes
# are measured against) + the recall_ok constant the Spark side must earn.
def _ann_recall_oracle(src: str, extra_bools: tuple[str, ...] = ()) -> str:
    extra = "".join(f", true AS {b}" for b in extra_bools)
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, list_transform(embedding, x -> x::DOUBLE) AS qvec
      FROM {src} WHERE vec_id IN ({", ".join(str(q) for q in _ANN_QIDS)})
    ), scored AS (
      SELECT q.qid, e.vec_id,
             round(
               list_sum(list_transform(generate_series(1, len(e.embedding)),
                                       i -> e.embedding[i]::DOUBLE * q.qvec[i]))
               / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(q.qvec, x -> x * x)))),
             6) AS cos_sim
      FROM {src} e, q WHERE e.vec_id != q.qid
    ), ranked AS (
      SELECT qid, cos_sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT round(sum(cos_sim), 4) AS exact_cos_sum, true AS recall_ok{extra}
    FROM ranked WHERE rn <= 10
"""


def _ann_index_dir(src: str, kind: str) -> str:
    """Cache key includes the embeddings file's (mtime, size) so a
    regenerated source table never probes a stale index."""
    import hashlib

    try:
        st = os.stat(src)
        sig = f"{src}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        sig = src
    tag = hashlib.md5(sig.encode()).hexdigest()[:10]
    return f"/tmp/ann_index_cache/{tag}/{kind}"


def _ann_queries(emb: DataFrame) -> list:
    rows = emb.filter(F.col("vec_id").isin(_ANN_QIDS)).select(
        "vec_id", "embedding"
    ).collect()
    return [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]


def _ann_recall_contract(spark: SparkSession, sf_dir: str, kind: str,
                         tau: float) -> DataFrame:
    """Shared shape of the ANN recall contracts.

    Returns ONE row (exact_cos_sum, recall_ok):
    * exact_cos_sum — sum of the exact top-10 cosines over the 16 fixed
      queries, computed by Spark's brute-force batch scorer and
      independently by the DuckDB oracle (the grounded crosscheck);
    * recall_ok — mean ANN recall@10 against that exact top-10 >= tau.
      The sf embeddings are near-random (top-10 cosine ~0.3-0.4 against a
      ~0 mean), which is the worst case for any LSH/IVF scheme, so the
      honest bar is a threshold, not parity: measured mean recall is
      0.63/0.58 (rp, sf0.01/sf0.1) and 0.79/0.76 (ivf) vs taus 0.45/0.60.
    """
    from entity_extraction_svc_spark.operators import annindex as ai

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = _ann_queries(emb)
    idx_dir = _ann_index_dir(f"{sf_dir}/embeddings.parquet", kind)
    if not ai.index_ready(idx_dir):
        if kind == "rp8":
            ai.build_rp_index(emb, idx_dir, bits=8)
        else:
            ai.build_ivf_index(emb, idx_dir, n_lists=32)
    exact = ai.batch_exact_topk(emb, queries, k=10)
    if kind == "rp8":
        ann = ai.batch_probe_rp(spark, idx_dir, queries, k=10, probe_hamming=3)
    else:
        ann = ai.batch_probe_ivf(spark, idx_dir, queries, k=10, n_probe=12)
    hits = exact.join(ann.select("qid", "vec_id"), ["qid", "vec_id"]).agg(
        F.count("*").alias("n_hit")
    )
    base = exact.agg(
        F.round(F.sum("cos_sim"), 4).alias("exact_cos_sum"),
        F.count("*").alias("n_exact"),
    )
    return base.crossJoin(hits).select(
        "exact_cos_sum",
        (F.col("n_hit") >= F.col("n_exact") * tau).alias("recall_ok"),
    )


def _sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-LSH ANN over a PREBUILT signature-partitioned index: recall@10
    over 16 queries vs the exact batch baseline (see _ann_recall_contract)."""
    return _ann_recall_contract(spark, sf_dir, "rp8", tau=0.45)


def _kg_canonical_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized pipeline triples (part=canon) + multi-document triple
    evidence aggregation (part=evidence).  The evidence part feeds the
    golden links with a deterministic md5-derived per-(url, qid) confidence
    so both engines hand the noisy-OR identical inputs; in pipeline use the
    linker's final_conf flows in instead (tests/test_triples.py pins that
    path against a pandas recomputation)."""
    from entity_extraction_svc_spark.operators.canonicalize import (
        canonical_qids,
        canonicalize_triples,
    )
    from entity_extraction_svc_spark.operators.triples import triple_evidence

    arts = _fixtures_pipeline(spark)
    ents = spark.read.parquet(f"{FIXTURES}/kb_entities.parquet")
    aliases = spark.read.parquet(f"{FIXTURES}/kb_aliases.parquet")
    zero = F.lit(0).cast("long")
    canon = canonicalize_triples(arts.triples, canonical_qids(ents, aliases)).select(
        F.lit("canon").alias("part"), "subj", "pred", "obj",
        zero.alias("n_docs"), zero.alias("n_support"),
        F.lit(0.0).alias("evidence"),
    )
    g = spark.read.parquet(f"{FIXTURES}/golden_links.parquet")
    conf = F.round(
        (F.conv(F.substring(F.md5(F.concat_ws(":", "url", "qid")), 1, 4), 16, 10)
         .cast("long") % 90 + 5) / 100.0, 2,
    )
    linked = g.select("url", "qid", F.lit(0).alias("rank"), conf.alias("conf"))
    kb = spark.read.parquet(f"{FIXTURES}/kb_triples.parquet")
    ev = triple_evidence(linked, kb).select(
        F.lit("evidence").alias("part"), "subj", "pred", "obj",
        "n_docs", "n_support", "evidence",
    )
    return canon.unionByName(ev)


def _kg_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both agent response arrays in one row: linked annotations with KB
    add-info (part=listed) and the unlisted_annotations emitted for
    unlinked mentions (part=unlisted, agent/server.py:292-331; fixture
    pages 200-202 carry gazetteer-only surfaces with no KB entity)."""
    from entity_extraction_svc_spark.operators.annotations import (
        assemble_annotations,
        assemble_unlisted_annotations,
    )

    arts = _fixtures_pipeline(spark)
    kb = spark.read.parquet(f"{FIXTURES}/kb_entities.parquet")
    nulls = F.lit(None).cast("string")
    listed = assemble_annotations(arts.linked, kb).select(
        F.lit("listed").alias("part"),
        "url", "spot", "start", "end", "id", "title", "wiki_uri", "abstract",
        nulls.alias("tag"),
    )
    unlisted = assemble_unlisted_annotations(arts.linked).select(
        F.lit("unlisted").alias("part"),
        "url", "spot", "start", "end", "id",
        nulls.alias("title"), nulls.alias("wiki_uri"), nulls.alias("abstract"),
        "tag",
    )
    return listed.unionByName(unlisted)


def _kb_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-KB ingest ETL (S7/S8) in one row: the parsed N-triples table
    (part=triples: a/b/c = subj/pred/obj), the derived entity registry
    (part=entities: a/b/c = qid/label/tag, num_rels populated), and the
    export direction (part=nt: canonical N-Triples lines from
    format_ntriples — the ingest's inverse, byte-pinned by the oracle's
    independent string rendition)."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.sources.ntriples import (
        build_kb_entities,
        format_ntriples,
        parse_ntriples,
    )

    ensure_fixtures(FIXTURES)
    lines = spark.read.text(f"{FIXTURES}/custom_kb.nt")
    triples = parse_ntriples(lines)
    blank = F.lit("")
    nt_part = format_ntriples(triples).select(
        F.lit("nt").alias("part"),
        F.col("line").alias("a"), blank.alias("b"), blank.alias("c"),
        F.lit(0).cast("long").alias("num_rels"),
    )
    t_part = triples.select(
        F.lit("triples").alias("part"),
        F.col("subj").alias("a"), F.col("pred").alias("b"), F.col("obj").alias("c"),
        F.lit(0).cast("long").alias("num_rels"),
    )
    e_part = build_kb_entities(
        triples,
        label_rel="label",
        type_rel="P31",
        type_to_tag={"Q5": "PER", "Q515": "CITY", "Q6256": "COUNTRY"},
    ).select(
        F.lit("entities").alias("part"),
        F.col("qid").alias("a"), F.col("label").alias("b"), F.col("tag").alias("c"),
        F.col("num_rels").cast("long").alias("num_rels"),
    )
    return t_part.unionByName(e_part).unionByName(nt_part)


def _sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN over a PREBUILT list_id-partitioned index with k-means
    centroids: recall@10 over 16 queries (see _ann_recall_contract)."""
    return _ann_recall_contract(spark, sf_dir, "ivf32", tau=0.60)


_CLUSTERED_EMB = os.path.join(FIXTURES, "clustered_embeddings.parquet")


def _ensure_clustered_embeddings() -> str:
    """Deterministic CLUSTERED embedding fixture (8 Gaussian clusters x 50
    vectors, dim 32, fixed seed) — the regime IVF actually targets.  The sf
    embeddings are near-random (worst case for any ANN index, hence the low
    honest taus of sim_lsh_ann / sim_ivf_topk); this fixture grades the
    index where ANN matters, with tau = 0.9."""
    if not os.path.exists(_CLUSTERED_EMB):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.RandomState(7)
        centers = rng.randn(8, 32) * 5.0
        noise = rng.randn(400, 32) * 0.3
        vecs = np.stack([centers[i % 8] + noise[i] for i in range(400)])
        tbl = pa.table(
            {
                "vec_id": pa.array(range(400), pa.int64()),
                "embedding": pa.array(
                    [v.astype("float32").tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
        tmp = f"{_CLUSTERED_EMB}.tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, _CLUSTERED_EMB)
    return _CLUSTERED_EMB


def _sim_ivf_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF and IVF-PQ recall on clustered embeddings.  IVF-flat at
    n_probe=2 of 8 lists (25% scan) must reach mean recall@10 >= 0.9 vs
    the exact top-10 (measured ~0.99); IVF-PQ (8x1-byte codes per 32-dim
    vector, ADC shortlist 50 + exact refine join) must hold the same 0.9
    bar while its index stores NO float vectors.  exact_cos_sum is the
    DuckDB-grounded crosscheck of the shared exact baseline."""
    from entity_extraction_svc_spark.operators import annindex as ai

    path = _ensure_clustered_embeddings()
    emb = spark.read.parquet(path)
    queries = _ann_queries(emb)
    idx_dir = _ann_index_dir(path, "ivf8c")
    if not ai.index_ready(idx_dir):
        ai.build_ivf_index(emb, idx_dir, n_lists=8)
    # "r" = residual-encoded (round 4 default); the kind string is part of
    # the cache key, so a flat-coded r3 index can never serve this contract
    pq_dir = _ann_index_dir(path, "ivfpq8r")
    if not ai.index_ready(pq_dir):
        ai.build_ivfpq_index(emb, pq_dir, n_lists=8, m_sub=8)
    exact = ai.batch_exact_topk(emb, queries, k=10).localCheckpoint(eager=True)
    ann = ai.batch_probe_ivf(spark, idx_dir, queries, k=10, n_probe=2)
    pq = ai.batch_probe_ivfpq(spark, pq_dir, queries, k=10, n_probe=2,
                              shortlist=50, refine_with=emb)
    hits = exact.join(ann.select("qid", "vec_id"), ["qid", "vec_id"]).agg(
        F.count("*").alias("n_hit")
    )
    pq_hits = exact.join(pq.select("qid", "vec_id"), ["qid", "vec_id"]).agg(
        F.count("*").alias("n_pq_hit")
    )
    base = exact.agg(
        F.round(F.sum("cos_sim"), 4).alias("exact_cos_sum"),
        F.count("*").alias("n_exact"),
    )
    return base.crossJoin(hits).crossJoin(pq_hits).select(
        "exact_cos_sum",
        (F.col("n_hit") >= F.col("n_exact") * 0.9).alias("recall_ok"),
        (F.col("n_pq_hit") >= F.col("n_exact") * 0.9).alias("pq_recall_ok"),
    )


def _mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing in one row: JVM-side magic-sniff
    metadata (binary_meta) joined per-key with the mapInPandas byte-
    histogram featurizer (extract_features)."""
    from entity_extraction_svc_spark.fixtures import ensure_fixtures
    from entity_extraction_svc_spark.operators.multimodal import (
        binary_meta,
        extract_features,
    )

    ensure_fixtures(FIXTURES)
    pages = spark.read.parquet(f"{FIXTURES}/pages.parquet")
    meta = binary_meta(pages, bin_col="html", key_col="url")
    out = extract_features(pages, bin_col="html", key_col="url")
    # project the vector to a string: the driver canonicalizer sorts columns
    # by value and dies on list cells (unhashable) — same trick as
    # _dedup_minhash_sig above.  float32 -> double BEFORE rounding so the
    # string matches the DuckDB oracle's REAL::DOUBLE formatting.
    feats = out.select(
        "url",
        F.coalesce(
            F.concat_ws(
                ",",
                F.transform(
                    "feature",
                    lambda x: F.round(x.cast("double"), 6).cast("string"),
                ),
            ),
            F.lit(""),
        ).alias("feature_csv"),
    )
    return meta.join(feats, "url")


def _with_prep(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prep(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _with_prep(v) for k, v in _raw_queries().items()}


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries: the driver's correctness gate checks the first
    50 in dict order (CORRECTNESS_r02 cut at 50 of 59), so round 3 merged
    overlapping rows — each merged row still runs BOTH constituent
    operators, tagged by a `part` column (or joined per-key), with the
    oracle SQL unioned/joined the same way.  Merge map (old -> new):
      kg_triples_per_subject_salted -> kg_triples_per_subject (part)
      kg_annotations_unlisted       -> kg_annotations (part)
      rel_intersect                 -> kg_intersection (part)
      rel_scalar_funcs              -> kg_date_format (joined projection)
      rel_two_hop                   -> rel_broadcast_join (part)
      rel_rollup                    -> rel_cube_stats (part)
      dedup_exact_docs              -> dedup_exact (part)
      web_url_parts + web_domain_cap -> web_hygiene (per-url join)
      kb_ingest_ntriples + _entities -> kb_ingest (part)
      mm_binary_meta + mm_features   -> mm_pipeline (per-url join)
      doc_stats + doc_lang_id + doc_fingerprint -> doc_profile (per-id join)
      rel_topk_window + rel_running_offset -> rel_windows (one projection)
      rel_grouped_agg + rel_percentiles    -> rel_grouped_agg (per-flag join)
      rel_count_per_subject + rel_session_windows -> rel_events_agg (part)
    New this round: sim_ivf_clustered (ANN recall >= 0.9 on clustered
    embeddings, the regime the index targets), doc_pii (PII scan +
    redaction), doc_split (deterministic md5-bucket train/val/test),
    kg_pagerank (iterative entity importance, unrolled-SQL oracle),
    doc_decontam (eval-set n-gram overlap), doc_perplexity (corpus-trained
    bigram-LM cross-entropy, CCNet-style).
    Round-4 part merges (same both-run + unioned-oracle rule): kg_connection
    += tri (triangles/clustering), kg_pagerank += hits_hub/hits_auth,
    kg_find_rels += QA audits, kg_pattern_search += bgp, kg_types_2hop
    += closure/tax (path-doubled taxonomy closure).
    Round-5 part merges (dict grew to 63; re-compressed to exactly 50 via
    _part_union NULL-padded supersets — see that helper's note):
      kg_ner_training + kg_rel_training     -> kg_training (ner/rel)
      kg_walks + kg_negatives               -> kg_walks (+part=neg)
      kg_salience + kg_entity_sim           -> kg_salience (sal/njac)
      sim_cosine_topk + kg_knn_gnn          -> sim_cosine_topk (topk/knn/feat)
      dedup_minhash_sig + dedup_minhash_pairs -> dedup_minhash (sig/+)
      doc_split + doc_mixture               -> doc_split (split/mixture)
      doc_perplexity + doc_decontam         -> doc_perplexity (ppl/decontam)
      doc_pii + web_hygiene                 -> doc_pii (pii/web)
      doc_quality_filter + fixed-point classifier -> doc_quality_filter
                                               (gate/w/score)
      rel_windows + rel_grouped_agg         -> rel_agg (win/agg)
      rel_broadcast_join + rel_asof_join + rel_range_join -> rel_joins
      rel_cube_stats + rel_pivot            -> rel_shapes (+part=pivot)
      rel_events_agg + rel_json_extract     -> rel_events (+part=json)"""
    return {
        # KG pipeline (SURVEY §2.2-2.9) on the deterministic fixture corpus
        "kg_extract_text": _kg_extract_text,
        "kg_mentions": _kg_mentions,
        "kg_linked_top1": _kg_linked_top1,
        "kg_linked_top1_fused": _kg_linked_top1_fused,
        "kg_triples": _kg_triples,
        "kg_triples_per_subject": _kg_triples_per_subject,  # + salted plan
        "kg_find_types": _kg_find_types,
        "kg_types_2hop": _kg_types_2hop,
        "kg_intersection": _kg_intersection,  # + orders INTERSECT skeleton
        "kg_pattern_search": _kg_pattern_search,
        "kg_find_rels": _kg_find_rels,
        "kg_find_objects": _kg_find_objects,
        "kg_canonical": _kg_canonical,
        "kg_annotations": _kg_annotations,  # + unlisted_annotations
        "kg_canonical_triples": _kg_canonical_triples,
        "kg_connection": _kg_connection,
        "kg_salience": _kg_salience_merged,  # aboutness + neighbor-Jaccard ER
        "kg_walks": _kg_walks_merged,  # walks + fan-out + TransE negatives
        "kg_training": _kg_training,  # BIO + relation distant supervision
        "kg_sketch": _kg_sketch,  # count-min head-key telemetry
        "kg_date_format": _kg_date_format,  # + scalar-function surface
        "kg_pagerank": _kg_pagerank,  # iterative entity importance
        # dedup family
        "dedup_exact": _dedup_exact,  # pages groups + docs keys
        "dedup_minhash": _dedup_minhash,  # signatures + LSH pairs (r5 merge)
        "dedup_simhash": _dedup_simhash,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_embedding_pairs": _dedup_embedding_pairs,
        "dedup_embedding_pairs_lsh": _dedup_embedding_pairs_lsh,  # recall contract
        "dedup_semantic": _dedup_semantic,  # SemDeDup recall contract
        "dedup_substring": _dedup_substring,  # Lee et al. windows + winnow
        # similarity search / ANN
        "sim_cosine_topk": _sim_cosine_merged,  # + kNN graph/GNN agg (r5 merge)
        "sim_lsh_ann": _sim_lsh_ann,  # prebuilt-index recall contract
        "sim_ivf_topk": _sim_ivf_topk,  # prebuilt-index recall contract
        "sim_ivf_clustered": _sim_ivf_clustered,  # tau 0.9 on clustered data
        # custom-KB ingest ETL (S7/S8) + multimodal plumbing
        "kb_ingest": _kb_ingest,
        "mm_pipeline": _mm_pipeline,
        # training-data pipeline operators
        "doc_profile": _doc_profile,  # stats + lang-id + fingerprint joined
        "doc_quality_filter": _doc_quality_filter_merged,  # gate + distilled model
        "doc_repetition": _doc_repetition,  # Gopher repetition stats
        "doc_embed": _doc_embed,  # feature-hash embedder (docs -> vectors)
        "doc_pii": _doc_pii_merged,  # PII scan/redaction + web hygiene
        "doc_split": _doc_split_merged,  # md5 split + temperature mixture
        "doc_pack": _doc_pack,  # concat-and-chunk sequence packing
        "doc_line_dedup": _doc_line_dedup,  # CCNet paragraph-level dedup
        "doc_bpe": _doc_bpe,  # BPE merge learning + subword token counts
        "doc_perplexity": _doc_perplexity_merged,  # LM x-entropy + decontam
        # relational skeletons (SURVEY §2.10) on the driver's tables —
        # merged to four family rows in r5 (see _part_union note)
        "rel_agg": _rel_agg,  # windows + grouped agg/percentiles
        "rel_joins": _rel_joins,  # broadcast/two-hop + asof + range/setfacts
        "rel_shapes": _rel_shapes,  # cube + rollup + pivot
        "rel_events": _rel_events,  # per-type/session windows + json
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

_STOPWORDS_SQL = (
    "['the','of','and','to','in','a','is','that','it','was','for','on','are',"
    "'with','as','be','at','by','this','have','from','or','had','not','but',"
    "'what','all','were','when','we','there','can','an','your','which','their']"
)

_NORM = "trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))"
_TOKS = f"list_filter(string_split({_NORM}, ' '), t -> t != '')"
_SHINGLES = (
    f"case when len({_TOKS}) >= 3 then "
    f"list_transform(generate_series(1, len({_TOKS}) - 2), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]) "
    f"else [{_NORM}] end"
)
_H64 = "('0x' || substr(md5({X}), 1, 15))::BIGINT"

# N-triples line pattern (sources/ntriples.py NT_RE), single-quote escaped;
# groups 5/6 (lang tag / datatype IRI) are accepted-and-ignored here, the
# same annotation-dropping default parse_ntriples applies
NT_RE_SQL = (
    '^<([^>]+)>\\s+<([^>]+)>\\s+(?:<([^>]+)>|"((?:[^"\\\\]|\\\\.)*)"'
    '(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\\^\\^<([^>]+)>)?)'
    '\\s*\\.\\s*$'
)

# N-Triples literal escape/unescape as DuckDB expressions, built from
# chr(92) so no Python string layer can eat the backslashes (VERDICT r4
# ADVICE #1: the old f-string rendition collapsed to no-ops and the
# escaping contract was vacuous).  BS = one backslash at SQL runtime.
_BS = "chr(92)"
_NT_UNESCAPE_SQL = (
    "replace(replace(replace(replace(replace(replace({col}, "
    f"{_BS} || {_BS}, chr(0)), "
    f"{_BS} || '\"', '\"'), "
    f"{_BS} || 'n', chr(10)), "
    f"{_BS} || 'r', chr(13)), "
    f"{_BS} || 't', chr(9)), "
    f"chr(0), {_BS})"
)
_NT_ESCAPE_SQL = (
    "replace(replace(replace(replace(replace({col}, "
    f"{_BS}, {_BS} || {_BS}), "
    f"'\"', {_BS} || '\"'), "
    f"chr(10), {_BS} || 'n'), "
    f"chr(13), {_BS} || 'r'), "
    f"chr(9), {_BS} || 't')"
)


def _whitelist_sql() -> str:
    from entity_extraction_svc_spark.operators.triples import TRIPLE_WHITELIST

    return ", ".join(f"'{p}'" for p in TRIPLE_WHITELIST)


def _constraints_values_sql() -> str:
    """_ONTOLOGY_CONSTRAINTS as a VALUES list — one source of truth for the
    Spark row and the DuckDB oracle."""
    def q(x: str | None) -> str:
        return "NULL" if x is None else f"'{x}'"

    return ", ".join(
        f"({q(p)}, {q(d)}, {q(r)})" for p, d, r in _ONTOLOGY_CONSTRAINTS
    )


def _second_source_values_sql() -> str:
    """_SECOND_SOURCE as a VALUES list — one source of truth for the Spark
    kg_find_rels QA parts and the DuckDB oracle."""
    return ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in _SECOND_SOURCE)


def _functional_preds_sql() -> str:
    from entity_extraction_svc_spark.operators.kgqa import FUNCTIONAL_PREDS

    return ", ".join(f"'{p}'" for p in FUNCTIONAL_PREDS)


def _induce_schema_oracle_sql(triples_sql: str) -> str:
    from entity_extraction_svc_spark.operators.kgqa import (
        induce_schema_oracle_sql,
    )

    return induce_schema_oracle_sql(triples_sql)


def _minhash_sql_mins() -> str:
    from entity_extraction_svc_spark.operators.dedup import MERSENNE_P, _coeffs

    base = f"list_transform(sh, s -> {_H64.format(X='s')} % {MERSENNE_P})"
    mins = ", ".join(
        f"list_min(list_transform({base}, h -> ({a} * h + {b}) % {MERSENNE_P}))"
        for a, b in _coeffs(16)
    )
    return f"[{mins}]"


def _bfs_oracle(fx: str) -> str:
    """The BFS half of the kg_connection row: same source/hops/direction
    constants as the Spark side in _kg_connection."""
    from entity_extraction_svc_spark.operators.graphwalk import bfs_oracle_sql

    return bfs_oracle_sql(
        f"SELECT * FROM read_parquet('{fx}/kb_triples.parquet')",
        "Q12418", 3, direction="both",
    )


def oracle_sql() -> dict[str, str]:
    fx = FIXTURES
    toks_lower = "list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), t -> t != '')"
    sw_count = f"len(list_filter({toks_lower}, t -> list_contains({_STOPWORDS_SQL}, t)))"
    mins = _minhash_sql_mins()

    sql = {
        # --- KG: goldens are the oracle ------------------------------------
        "kg_extract_text": f"SELECT url, text FROM read_parquet('{fx}/pages.parquet')",
        "kg_mentions": (
            f"SELECT url, start, \"end\", tag "
            f"FROM read_parquet('{fx}/golden_mentions.parquet')"
        ),
        "kg_linked_top1": (
            f"SELECT url, start, \"end\", qid "
            f"FROM read_parquet('{fx}/golden_links.parquet')"
        ),
        "kg_linked_top1_fused": (
            f"SELECT url, start, \"end\", qid "
            f"FROM read_parquet('{fx}/golden_links.parquet')"
        ),
        "kg_triples": (
            f"SELECT subj, pred, obj FROM read_parquet('{fx}/golden_triples.parquet')"
        ),
        "kg_triples_per_subject": (
            f"SELECT 'pipeline' AS part, subj, count(*) AS n_triples, "
            f"       '' AS obj, 0::BIGINT AS rank "
            f"FROM read_parquet('{fx}/golden_triples.parquet') GROUP BY subj "
            f"UNION ALL "
            f"SELECT 'kb_salted', subj, count(*), '', 0::BIGINT "
            f"FROM read_parquet('{fx}/kb_triples.parquet') GROUP BY subj "
            f"UNION ALL "
            f"SELECT 'kb_topk', subj, n_triples, obj, rank FROM ("
            f"  SELECT subj, obj, count(*) AS n_triples, "
            f"         row_number() OVER (PARTITION BY subj "
            f"           ORDER BY count(*) DESC, obj ASC)::BIGINT AS rank "
            f"  FROM read_parquet('{fx}/kb_triples.parquet') GROUP BY subj, obj"
            f") WHERE rank <= 3"
        ),
        "kg_find_types": (
            f"WITH t AS (SELECT * FROM read_parquet('{fx}/kb_triples.parquet')), "
            "p31 AS (SELECT subj, obj AS type FROM t WHERE pred = 'P31'), "
            "h AS (SELECT DISTINCT subj FROM p31 WHERE type = 'Q5'), "
            "occ AS (SELECT t.subj, t.obj AS type FROM t JOIN h ON t.subj = h.subj "
            "        WHERE t.pred = 'P106') "
            "SELECT DISTINCT subj, type FROM (SELECT * FROM p31 UNION ALL SELECT * FROM occ)"
        ),
        "kg_types_2hop": (
            f"WITH t AS (SELECT * FROM read_parquet('{fx}/kb_triples.parquet')), "
            "t1 AS (SELECT subj, obj AS type FROM t WHERE pred = 'P31'), "
            "sup AS (SELECT t1.subj, b.obj AS type FROM t1 "
            "        JOIN t b ON t1.type = b.subj AND b.pred = 'P279'), "
            "clo AS (SELECT * FROM ({CLOSURE_SQL}) c), "
            "supall AS (SELECT t1.subj, clo.dst AS type FROM t1 "
            "           JOIN clo ON t1.type = clo.src) "
            "SELECT '2hop' AS part, subj, type FROM (SELECT DISTINCT * FROM "
            "  (SELECT * FROM t1 UNION ALL SELECT * FROM sup)) "
            "UNION ALL "
            "SELECT 'closure', subj, type FROM (SELECT DISTINCT * FROM "
            "  (SELECT * FROM t1 UNION ALL SELECT * FROM supall)) "
            "UNION ALL "
            "SELECT 'tax', src, dst || ':' || dist::VARCHAR FROM clo "
            "UNION ALL "
            "SELECT 'delta', src, dst || ':' || dist::VARCHAR FROM clo "
            "UNION ALL "
            "SELECT 'del', src, dst || ':' || dist::VARCHAR "
            "FROM ({CLOSURE_BASE_SQL}) cb"
        ),
        "kg_intersection": (
            f"WITH t AS (SELECT * FROM read_parquet('{fx}/kb_triples.parquet')) "
            "SELECT 'kb' AS part, value FROM ("
            "  SELECT obj AS value FROM t WHERE subj = 'Q66' AND pred = 'P17' "
            "  INTERSECT "
            "  SELECT obj AS value FROM t WHERE subj = 'Q23548' AND pred = 'P17') "
            "UNION ALL "
            "SELECT 'orders', o_custkey::VARCHAR FROM ("
            "  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
            "  INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')"
        ),
        "kg_pattern_search": (
            f"WITH t AS (SELECT * FROM read_parquet('{fx}/kb_triples.parquet')) "
            "SELECT 'w1' AS part, subj AS a, pred AS b, obj AS c, '' AS d "
            "FROM t WHERE pred = 'P131' "
            "UNION ALL "
            "SELECT 'bgp', p.subj, p.obj, b.obj, c.obj "
            "FROM t p JOIN t b ON p.subj = b.subj AND b.pred = 'P19' "
            "         JOIN t c ON b.obj = c.subj AND c.pred = 'P131' "
            "WHERE p.pred = 'P106' "
            "UNION ALL "
            "SELECT 'alt', subj, obj, '', '' FROM t "
            "WHERE pred IN ('P19', 'P159') "
            "UNION ALL "
            "SELECT 'inv', subj, 'Q30', '', '' FROM t "
            "WHERE pred = 'P17' AND obj = 'Q30' "
            "UNION ALL "
            "SELECT 'altpath', src, dst, '', '' FROM ({ALTPATH_SQL}) ap "
            "UNION ALL "
            "SELECT 'opt', p.subj, p.obj, coalesce(b.obj, ''), '' "
            "FROM t p LEFT JOIN t b ON p.subj = b.subj AND b.pred = 'P19' "
            "WHERE p.pred = 'P106' "
            "UNION ALL "
            "SELECT 'neg', p.subj, p.obj, '', '' FROM t p "
            "WHERE p.pred = 'P106' AND NOT EXISTS ("
            "  SELECT 1 FROM t b WHERE b.subj = p.subj AND b.pred = 'P19') "
            "UNION ALL "
            "SELECT 'seq', x.subj, y.obj, '', '' FROM t x "
            "JOIN t y ON x.obj = y.subj "
            "WHERE x.pred = 'P19' AND y.pred = 'P131' "
            "UNION ALL "
            "SELECT 'npset', subj, obj, '', '' FROM t "
            "WHERE pred NOT IN ('P31', 'P279') "
            "UNION ALL "
            "SELECT 'valfil', subj, obj, '', '' FROM t "
            "WHERE pred = 'P106' AND obj IN ('Q639669', 'Q1028181') "
            "UNION ALL "
            # bag multiplicity mirrors the Spark plan: one row per P31
            # edge x distinct star pair (closure UNION identity dedupes
            # exactly like the operator's .distinct())
            "SELECT 'star', x.subj, sp.t, '', '' FROM t x JOIN ("
            "  WITH RECURSIVE cp(s, t) AS ("
            "    SELECT subj, obj FROM t WHERE pred = 'P279' "
            "    UNION "
            "    SELECT c.s, y.obj FROM cp c "
            "    JOIN t y ON y.subj = c.t AND y.pred = 'P279') "
            "  SELECT s, t FROM cp "
            "  UNION "
            "  SELECT n, n FROM ("
            "    SELECT subj AS n FROM t UNION SELECT obj FROM t) u"
            ") sp ON sp.s = x.obj WHERE x.pred = 'P31' "
            "UNION ALL "
            "SELECT DISTINCT 'constr', x.subj, 'bornin_region', y.obj, '' "
            "FROM t x JOIN t y ON x.obj = y.subj "
            "WHERE x.pred = 'P19' AND y.pred = 'P131' "
            "UNION ALL "
            "SELECT 'agg', occ, CAST(n AS VARCHAR), CAST(np AS VARCHAR), '' "
            "FROM ("
            "  SELECT a.obj AS occ, count(*) AS n, "
            "         count(DISTINCT a.subj) AS np "
            "  FROM t a JOIN t b ON a.subj = b.subj "
            "  WHERE a.pred = 'P106' AND b.pred = 'P31' AND b.obj = 'Q5' "
            "  GROUP BY a.obj HAVING count(*) >= 1 "
            "  ORDER BY n DESC, occ ASC LIMIT 5)"
        ),
        "kg_find_rels": (
            f"WITH t AS (SELECT * FROM read_parquet('{fx}/kb_triples.parquet')), "
            f"c(pred, dom, rng) AS (VALUES {_constraints_values_sql()}), "
            "m AS (SELECT subj, pred, obj FROM t UNION ALL "
            f"      SELECT * FROM (VALUES {_second_source_values_sql()}) s(subj, pred, obj)), "
            "ty AS (SELECT subj, list(obj) AS types FROM t WHERE pred = 'P31' "
            "       GROUP BY subj), "
            "tc AS (SELECT t.*, c.dom, c.rng FROM t JOIN c ON t.pred = c.pred) "
            "SELECT 'rels' AS part, '' AS kind, '' AS subj, pred, '' AS obj, "
            "       '' AS expected FROM ("
            "  SELECT DISTINCT pred FROM ("
            "    SELECT pred FROM t WHERE subj = 'Q30' "
            "    UNION ALL SELECT pred FROM t WHERE obj = 'Q30')) "
            "UNION ALL "
            "SELECT 'violation', 'domain', tc.subj, tc.pred, tc.obj, dom "
            "FROM tc JOIN ty ON tc.subj = ty.subj "
            "WHERE dom IS NOT NULL AND NOT list_contains(types, dom) "
            "UNION ALL "
            "SELECT 'violation', 'range', tc.subj, tc.pred, tc.obj, rng "
            "FROM tc JOIN ty ON tc.obj = ty.subj "
            "WHERE rng IS NOT NULL AND NOT list_contains(types, rng) "
            "UNION ALL "
            "SELECT 'func', 'conflict', subj, pred, "
            "       array_to_string(list_sort(list(DISTINCT obj)), ','), "
            "       count(DISTINCT obj)::VARCHAR "
            f"FROM m WHERE pred IN ({_functional_preds_sql()}) "
            "GROUP BY subj, pred HAVING count(DISTINCT obj) > 1 "
            "UNION ALL "
            "SELECT 'dangling', 'ref', '', '', obj, '' FROM ("
            "  SELECT DISTINCT obj FROM m WHERE regexp_matches(obj, '^Q[0-9]+$')) "
            "WHERE obj NOT IN (SELECT DISTINCT subj FROM m) "
            f"  AND obj NOT IN (SELECT qid FROM read_parquet('{fx}/kb_entities.parquet')) "
            "UNION ALL "
            "SELECT 'predstats', 'profile', '', pred, count(*)::VARCHAR, "
            "       count(DISTINCT subj)::VARCHAR FROM m GROUP BY pred "
            "UNION ALL "
            "SELECT 'diff', status, subj, pred, obj, '' FROM ("
            "  SELECT 'added' AS status, subj, pred, obj FROM ("
            "    SELECT DISTINCT subj, pred, obj FROM ("
            "      SELECT subj, pred, obj FROM t WHERE subj <> 'Q19675' "
            f"     UNION ALL SELECT * FROM (VALUES {_second_source_values_sql()}) n2(subj, pred, obj)) "
            "    EXCEPT SELECT DISTINCT subj, pred, obj FROM t) "
            "  UNION ALL "
            "  SELECT 'removed', subj, pred, obj FROM ("
            "    SELECT DISTINCT subj, pred, obj FROM t "
            "    EXCEPT SELECT DISTINCT subj, pred, obj FROM ("
            "      SELECT subj, pred, obj FROM t WHERE subj <> 'Q19675' "
            f"     UNION ALL SELECT * FROM (VALUES {_second_source_values_sql()}) n3(subj, pred, obj)))"
            ") d "
            "UNION ALL "
            "SELECT 'change', 'edit', a.subj, a.pred, a.obj, r.obj FROM ("
            "  SELECT subj, pred, obj FROM ("
            "    SELECT DISTINCT subj, pred, obj FROM ("
            "      SELECT subj, pred, obj FROM t WHERE subj <> 'Q19675' "
            f"     UNION ALL SELECT * FROM (VALUES {_second_source_values_sql()}) n4(subj, pred, obj)) "
            "    EXCEPT SELECT DISTINCT subj, pred, obj FROM t) "
            f"  WHERE pred IN ({_functional_preds_sql()})) a "
            "JOIN ("
            "  SELECT subj, pred, obj FROM ("
            "    SELECT DISTINCT subj, pred, obj FROM t "
            "    EXCEPT SELECT DISTINCT subj, pred, obj FROM ("
            "      SELECT subj, pred, obj FROM t WHERE subj <> 'Q19675' "
            f"     UNION ALL SELECT * FROM (VALUES {_second_source_values_sql()}) n5(subj, pred, obj))) "
            f"  WHERE pred IN ({_functional_preds_sql()})) r "
            "ON a.subj = r.subj AND a.pred = r.pred "
            "UNION ALL "
            "SELECT 'schema', 'induced', coalesce(domain, ''), pred, "
            "       coalesce(rng, ''), "
            "       n_triples::VARCHAR || ':' || n_dom_typed::VARCHAR || ':' "
            "       || coalesce(CAST(round(dom_cover * 1e6) AS BIGINT), -1)::VARCHAR "
            "       || ':' || n_rng_typed::VARCHAR || ':' "
            "       || coalesce(CAST(round(rng_cover * 1e6) AS BIGINT), -1)::VARCHAR "
            "FROM ("
            + _induce_schema_oracle_sql("SELECT subj, pred, obj FROM m")
            + ") sc"
        ),
        "kg_find_objects": (
            f"SELECT subj AS value FROM read_parquet('{fx}/kb_triples.parquet') "
            "WHERE obj = 'Q30' AND pred = 'P17'"
        ),
        "kg_canonical": (
            # connected components over (alias-node, qid-node) edges via
            # recursive CTE: reachability from every qid node, component id =
            # min reachable node; canonical qid = min qid in the component
            f"WITH RECURSIVE ents AS (SELECT qid, label FROM read_parquet('{fx}/kb_entities.parquet')), "
            f"als AS (SELECT alias, qid FROM read_parquet('{fx}/kb_aliases.parquet')), "
            "edges AS ("
            "  SELECT 'a:' || trim(regexp_replace(lower(label), '\\s+', ' ', 'g')) AS src, "
            "         'q:' || qid AS dst FROM ents "
            "  UNION "
            "  SELECT 'a:' || trim(regexp_replace(lower(alias), '\\s+', ' ', 'g')), "
            "         'q:' || qid FROM als"
            "), sym AS ("
            "  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges"
            "), reach AS ("
            "  SELECT DISTINCT src AS node, src AS r FROM sym"
            "  UNION"
            "  SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src"
            "), comp AS ("
            "  SELECT node, min(r) AS comp FROM reach GROUP BY node"
            "), qn AS ("
            "  SELECT substr(node, 3) AS qid, comp FROM comp WHERE node LIKE 'q:%'"
            ") "
            "SELECT qn.qid, c.canonical_qid FROM qn "
            "JOIN (SELECT comp, min(qid) AS canonical_qid FROM qn GROUP BY comp) c "
            "USING (comp)"
        ),
        # --- relational -----------------------------------------------------
        "rel_windows": (
            "SELECT l_orderkey, l_linenumber, row_number() OVER ("
            "  PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber ASC"
            ") AS rk, round(coalesce(sum(l_quantity) OVER ("
            "PARTITION BY l_orderkey ORDER BY l_linenumber "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0), 4) AS offset_shift "
            "FROM lineitem"
        ),
        "rel_grouped_agg": (
            "SELECT g.l_returnflag, l_linestatus, sum_qty, sum_price, n_rows, p50, p95 "
            "FROM ("
            "  SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n_rows "
            "  FROM lineitem GROUP BY l_returnflag, l_linestatus) g "
            "JOIN ("
            "  SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, "
            "  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95 "
            "  FROM lineitem GROUP BY l_returnflag) p "
            "ON g.l_returnflag = p.l_returnflag"
        ),
        "rel_broadcast_join": (
            "SELECT 'orders_nations' AS part, n_name AS name, count(*) AS n, "
            "round(sum(o_totalprice), 2) AS sum_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name "
            "UNION ALL "
            "SELECT 'supplier_regions', r_name, count(*), 0.0 FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "rel_events_agg": (
            # session half = gaps-and-islands: a new session starts when the
            # gap from the previous event of the same user exceeds 30 min
            """
            SELECT 'by_type' AS part, user_id, event_type AS key,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY user_id, event_type
            UNION ALL
            SELECT 'session', user_id, strftime(session_start, '%Y-%m-%d %H:%M:%S'),
                   n_events, sum_value
            FROM (
              WITH marked AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
              ), sess AS (
                SELECT user_id, ts, value,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked
              )
              SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
                     round(sum(value), 4) AS sum_value
              FROM sess GROUP BY user_id, sid
            )
            """
        ),
        "rel_cube_stats": (
            # CAST: DuckDB sum(int) is HUGEINT which lands in pandas as
            # float64 and hash-mismatches Spark's BIGINT ('73327.0' vs '73327')
            "SELECT 'cube' AS part, lang, source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY CUBE (lang, source) "
            "UNION ALL "
            "SELECT 'rollup', lang, source, count(*), CAST(sum(n_chars) AS BIGINT) "
            "FROM documents GROUP BY ROLLUP (lang, source)"
        ),
        # --- training-data ops ----------------------------------------------
        "doc_stats": (
            f"""
            WITH base AS (
              SELECT doc_id,
                     coalesce(text, '') AS text,
                     {toks_lower} AS toks
              FROM documents
            ), m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(toks) AS n_ws_tokens,
                     len(list_filter(regexp_extract_all(text, '[\\w'']+|[^\\w\\s]'), t -> t != '')) AS n_re_tokens,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
                     {sw_count} AS n_stop,
                     CASE WHEN len(toks) > 0
                          THEN list_sum(list_transform(toks, t -> length(t)))
                          ELSE NULL END AS tok_len_sum
              FROM base
            )
            SELECT doc_id, n_chars, n_ws_tokens, n_re_tokens,
                   round(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END, 6) AS punct_ratio,
                   round(CASE WHEN n_ws_tokens > 0 THEN n_stop / n_ws_tokens ELSE 0.0 END, 6) AS stopword_ratio,
                   round(CASE WHEN n_ws_tokens > 0 THEN tok_len_sum / n_ws_tokens ELSE 0.0 END, 6) AS mean_token_len,
                   round(CASE WHEN n_chars > 0 THEN
                     least(n_ws_tokens / 50.0, 1.0) * 0.4
                     + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 4.0, 1.0)) * 0.3
                     + least((CASE WHEN n_ws_tokens > 0 THEN n_stop / n_ws_tokens ELSE 0.0 END) * 3.0, 1.0) * 0.3
                   ELSE 0.0 END, 6) AS quality_score
            FROM m
            """
        ),
        "doc_lang_id": (
            f"""
            WITH base AS (
              SELECT doc_id, coalesce(text, '') AS text, {toks_lower} AS toks FROM documents
            ), m AS (
              SELECT doc_id, text, len(toks) AS n, {sw_count} AS n_stop,
                     length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS n_cyr
              FROM base
            )
            SELECT doc_id,
                   round(CASE WHEN n > 0 THEN n_stop / n ELSE 0.0 END, 6) AS stopword_ratio,
                   CASE WHEN length(text) = 0 THEN 'unk'
                        WHEN n_cyr * 2 > length(text) THEN 'ru'
                        WHEN (CASE WHEN n > 0 THEN n_stop / n ELSE 0.0 END) >= 0.08 THEN 'en'
                        ELSE 'unk' END AS lang_pred
            FROM m
            """
        ),
        "doc_fingerprint": (
            f"SELECT doc_id, md5({_NORM}) AS fp_md5, "
            f"('0x' || substr(md5({_NORM}), 1, 15))::BIGINT AS fp_int64 FROM documents"
        ),
        "rel_json_extract": (
            "SELECT event_type, count(*) AS n, "
            "CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k, "
            "round(avg(json_extract(props, '$.k')::BIGINT), 4) AS avg_k "
            "FROM events GROUP BY event_type"
        ),
        "web_hygiene": (
            f"""
            WITH p AS (SELECT url FROM read_parquet('{fx}/pages.parquet')),
            h AS (
              SELECT url,
                     regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                     regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path
              FROM p
            ), d AS (
              SELECT url, host, path,
                     CASE WHEN len(string_split(host, '.')) >= 2 THEN
                       string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
                     ELSE host END AS domain
              FROM h
            ), r AS (
              SELECT url, host, domain, path,
                     row_number() OVER (PARTITION BY domain ORDER BY url) AS rn
              FROM d
            )
            SELECT url, host, domain, path,
                   CAST(CASE WHEN rn <= 50 THEN rn ELSE -1 END AS INT) AS domain_rank
            FROM r
            """
        ),
        "rel_asof_join": (
            # same spec, independent engine: union + running last_value
            # (IGNORE NULLS) — right rows sort before left at equal ts,
            # largest event_id wins among equal right ts
            """
            WITH l AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
            ), r AS (
              SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
            ), u AS (
              SELECT user_id, ts AS _ts, event_id AS _tie, 1 AS is_left,
                     event_id, NULL::BIGINT AS re, NULL::DOUBLE AS rv
              FROM l
              UNION ALL
              SELECT user_id, ts, event_id, 0, NULL, event_id, value FROM r
            ), m AS (
              SELECT *,
                     last_value(re IGNORE NULLS) OVER w AS click_event_id,
                     last_value(rv IGNORE NULLS) OVER w AS mv
              FROM u
              WINDOW w AS (PARTITION BY user_id ORDER BY _ts, is_left, _tie
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT event_id, user_id, click_event_id,
                   round(mv, 4) AS click_value
            FROM m WHERE is_left = 1
            """
        ),
        "rel_range_join": (
            # part=range: the naive theta join IS the oracle; the Spark
            # side must reach the same pairs through the bucketed plan.
            # parts facts/asof: {FACTS_SQL} is generated by the temporal
            # module (shared run-collapse definition, independent plan)
            """
            WITH fi AS ({FACTS_SQL})
            SELECT 'range' AS part, p.event_id::VARCHAR AS a,
                   s.event_id::VARCHAR AS b
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events WHERE event_type = 'signup') s
              ON p.user_id = s.user_id
             AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 2 HOUR
            UNION ALL
            SELECT 'facts', subj::VARCHAR || ':' || value,
                   floor(epoch(valid_from))::BIGINT::VARCHAR || ':' ||
                   coalesce(floor(epoch(valid_to))::BIGINT, -1)::VARCHAR
            FROM fi
            UNION ALL
            SELECT 'asof', subj::VARCHAR, value FROM fi
            WHERE valid_from <= TIMESTAMP '{ASOF_TS}'
              AND (valid_to IS NULL OR valid_to > TIMESTAMP '{ASOF_TS}')
            UNION ALL
            SELECT 'setfacts', subj::VARCHAR || ':' || value,
                   floor(epoch(valid_from))::BIGINT::VARCHAR || ':' ||
                   coalesce(floor(epoch(valid_to))::BIGINT, -1)::VARCHAR
            FROM ({SETFACTS_SQL}) sfi
            """
        ),
        "doc_embed": (
            f"""
            WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            h AS (
              SELECT doc_id,
                     list_transform(toks, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
              FROM base
            ),
            raw AS (
              SELECT doc_id,
                     list_transform(generate_series(0, 15), j ->
                       coalesce(list_sum(list_transform(hs, x ->
                         CASE WHEN x % 16 = j
                              THEN ((x >> 8) % 2) * 2.0 - 1.0
                              ELSE 0.0 END)), 0.0)) AS r
              FROM h
            ),
            n AS (
              SELECT doc_id, r,
                     sqrt(coalesce(list_sum(list_transform(r, v -> v * v)), 0.0)) AS nrm
              FROM raw
            )
            SELECT doc_id,
                   array_to_string(
                     list_transform(r, v -> round(v / greatest(nrm, 1e-12), 6)::VARCHAR),
                     ',') AS embedding_csv
            FROM n
            """
        ),
        "doc_repetition": (
            f"""
            WITH base AS (
              SELECT doc_id, {_TOKS} AS toks, len({_NORM}) AS n_chars
              FROM documents
            ),
            g2 AS (
              SELECT doc_id, n_chars,
                CASE WHEN len(toks) >= 2 THEN
                  list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1])
                ELSE [array_to_string(toks, ' ')] END AS grams
              FROM base
            ),
            c2 AS (
              SELECT doc_id, gram, count(*) AS cnt
              FROM (SELECT doc_id, unnest(grams) AS gram FROM g2)
              GROUP BY 1, 2
            ),
            t2 AS (
              -- most-frequent gram's coverage (Gopher), deterministic
              -- (cnt, len, gram) tie-break — same rule as the Spark struct-max
              SELECT doc_id,
                     (max({{'cnt': cnt, 'glen': len(gram), 'gram': gram}})).cnt
                     * (max({{'cnt': cnt, 'glen': len(gram), 'gram': gram}})).glen
                       AS chars2
              FROM c2 GROUP BY 1),
            g5 AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 5 THEN
                  list_transform(generate_series(1, len(toks) - 4),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                                      toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
                ELSE [array_to_string(toks, ' ')] END AS grams
              FROM base
            ),
            c5 AS (
              SELECT doc_id, gram, count(*) AS cnt
              FROM (SELECT doc_id, unnest(grams) AS gram FROM g5)
              GROUP BY 1, 2
            ),
            t5 AS (
              SELECT doc_id,
                     sum(CASE WHEN cnt > 1 THEN cnt * len(gram) ELSE 0 END) AS chars5
              FROM c5 GROUP BY 1
            )
            SELECT b.doc_id,
                   round(coalesce(t2.chars2, 0) / greatest(b.n_chars, 1), 6)
                     AS top_2gram_char_frac,
                   round(coalesce(t5.chars5, 0) / greatest(b.n_chars, 1), 6)
                     AS dup_5gram_char_frac
            FROM base b
            LEFT JOIN t2 ON b.doc_id = t2.doc_id
            LEFT JOIN t5 ON b.doc_id = t5.doc_id
            """
        ),
        "doc_quality_filter": (
            f"""
            WITH base AS (
              SELECT doc_id, coalesce(text, '') AS text, {toks_lower} AS toks FROM documents
            ), m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(toks) AS n_ws_tokens,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
                     {sw_count} AS n_stop
              FROM base
            ), s AS (
              SELECT doc_id, n_ws_tokens,
                     CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
                     round(CASE WHEN n_chars > 0 THEN
                       least(n_ws_tokens / 50.0, 1.0) * 0.4
                       + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 4.0, 1.0)) * 0.3
                       + least((CASE WHEN n_ws_tokens > 0 THEN n_stop / n_ws_tokens ELSE 0.0 END) * 3.0, 1.0) * 0.3
                     ELSE 0.0 END, 6) AS quality_score
              FROM m
            ), r AS (
              SELECT doc_id,
                     list_filter([
                       CASE WHEN n_ws_tokens < 5 THEN 'too_short' END,
                       CASE WHEN round(punct_ratio, 6) > 0.2 THEN 'punct_soup' END,
                       CASE WHEN quality_score < 0.5 THEN 'low_quality' END
                     ], x -> x IS NOT NULL) AS reasons
              FROM s
            )
            SELECT doc_id, len(reasons) = 0 AS keep,
                   coalesce(array_to_string(reasons, ','), '') AS reasons_csv
            FROM r
            """
        ),
        "rel_pivot": (
            "SELECT l_linestatus, "
            "round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A, "
            "round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N, "
            "round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R "
            "FROM lineitem GROUP BY l_linestatus"
        ),
        "dedup_exact": (
            f"SELECT 'pages_groups' AS part, md5({_NORM}) AS fp_md5, "
            f"count(*) AS n_docs, min(url) AS keeper_id "
            f"FROM read_parquet('{fx}/pages.parquet') GROUP BY 2 HAVING count(*) > 1 "
            f"UNION ALL "
            f"SELECT 'docs_keys', md5({_NORM}), 1::BIGINT, min(doc_id)::VARCHAR "
            "FROM documents GROUP BY 2"
        ),
        "dedup_minhash_sig": (
            f"WITH s AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents) "
            f"SELECT doc_id, array_to_string(list_transform({mins}, x -> x::VARCHAR), ',') AS sig_str FROM s"
        ),
        "dedup_minhash_pairs": (
            # pair half: LSH candidate gen + signature-agreement estimate;
            # resolve half: recursive-CTE connected components over the
            # kept pairs, keeper = min doc_id per component, every doc row
            f"""
            WITH RECURSIVE s AS MATERIALIZED (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
            sig AS MATERIALIZED (SELECT doc_id, {mins} AS sig FROM s),
            bands AS (
              SELECT doc_id, b AS band,
                     md5(array_to_string(list_transform(list_slice(sig, b*4+1, b*4+4), x -> x::VARCHAR), ',')) AS band_hash
              FROM sig, unnest([0,1,2,3]) AS t(b)
            ),
            cand AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
              FROM bands l JOIN bands r
                ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
            ),
            est AS (
              SELECT id_a, id_b,
                     len(list_filter(generate_series(1, 16), i -> a.sig[i] = b.sig[i])) / 16.0 AS est_jaccard
              FROM cand JOIN sig a ON cand.id_a = a.doc_id JOIN sig b ON cand.id_b = b.doc_id
            ),
            kept AS MATERIALIZED (SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5),
            sym AS (
              SELECT id_a AS src, id_b AS dst FROM kept
              UNION SELECT id_b, id_a FROM kept
            ),
            reach AS (
              SELECT DISTINCT src AS node, src AS r FROM sym
              UNION
              SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src
            ),
            comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
            keeper AS (SELECT comp, min(node) AS keeper_id FROM comp GROUP BY comp),
            assigned AS (
              SELECT node AS doc_id, keeper_id FROM comp JOIN keeper USING (comp)
            )
            SELECT 'pair' AS part, id_a AS a, id_b AS b,
                   round(est_jaccard, 6) AS score FROM kept
            UNION ALL
            SELECT 'resolve', d.doc_id, coalesce(a.keeper_id, d.doc_id),
                   CASE WHEN coalesce(a.keeper_id, d.doc_id) = d.doc_id
                        THEN 1.0 ELSE 0.0 END
            FROM documents d LEFT JOIN assigned a USING (doc_id)
            """
        ),
        "dedup_simhash": (
            f"""
            WITH base AS (
              SELECT doc_id,
                     list_transform(list_filter(string_split({_NORM}, ' '), t -> t != ''),
                                    t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
              FROM documents
            )
            SELECT doc_id,
                   -- CAST: list_sum on BIGINTs yields HUGEINT -> pandas float64,
                   -- which hash-mismatches Spark's bit-identical BIGINT values
                   CAST(CASE WHEN len(hs) > 0 THEN
                     list_sum(list_transform(generate_series(0, 31), j ->
                       CASE WHEN list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0
                            THEN (1::BIGINT << j) ELSE 0::BIGINT END))
                   ELSE 0 END AS BIGINT) AS simhash
            FROM base
            """
        ),
        "dedup_ngram_jaccard": (
            # AS MATERIALIZED on the shingle CTE is the oracle's whole cost
            # story: `s` is referenced by sizes + inv0, and DuckDB inlines
            # plain CTEs, re-running the per-doc list_transform gram build
            # per reference (~90s at sf0.1 without it)
            f"""
            WITH s AS MATERIALIZED (
              SELECT doc_id AS id, list_distinct({_SHINGLES}) AS sh FROM documents
            ),
            sizes AS (SELECT id, len(sh) AS n_sh FROM s),
            inv0 AS MATERIALIZED (SELECT id, unnest(sh) AS shingle FROM s),
            keep AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING count(*) <= 1000),
            inv AS (SELECT inv0.* FROM inv0 JOIN keep USING (shingle)),
            shared AS (
              SELECT l.id AS id_a, r.id AS id_b, count(*) AS n_shared
              FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.id < r.id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(n_shared / (a.n_sh + b.n_sh - n_shared), 6) AS jaccard
            FROM shared JOIN sizes a ON id_a = a.id JOIN sizes b ON id_b = b.id
            WHERE n_shared / (a.n_sh + b.n_sh - n_shared) >= 0.5
            """
        ),
        "kg_connection": (
            f"""
            WITH t AS (SELECT * FROM read_parquet('{fx}/kb_triples.parquet')),
            direct AS (
              SELECT pred, NULL::VARCHAR AS via FROM t
              WHERE (subj = 'Q12418' AND obj = 'Q2126369')
                 OR (subj = 'Q2126369' AND obj = 'Q12418')
            ),
            e1 AS (SELECT pred, obj FROM t WHERE subj = 'Q12418'
                   AND pred IN ('P170','P276','P131')),
            e2 AS (SELECT pred, obj FROM t WHERE subj = 'Q2126369'
                   AND pred IN ('P170','P276','P131')),
            shared AS (
              SELECT e1.pred, e1.obj AS via FROM e1
              JOIN e2 ON e1.obj = e2.obj AND e1.pred = e2.pred
            ),
            conn AS (
              SELECT DISTINCT * FROM (SELECT * FROM direct UNION ALL SELECT * FROM shared)
            )
            SELECT 'conn' AS part, pred AS a, via AS b FROM conn
            UNION ALL
            SELECT 'bfs' AS part, entity AS a, dist::VARCHAR AS b
            FROM ({_bfs_oracle(fx)})
            """
        ),
        "kg_date_format": (
            "SELECT event_id, strftime(ts, '%d %B %Y') AS pretty_date, "
            "regexp_replace(event_type, '[aeiou]', '', 'g') AS stripped_type, "
            "strftime(ts, '%Y-%m-%d') AS day, year(ts) AS yr, "
            "event_type || '#' || user_id::VARCHAR AS composed FROM events"
        ),
        "kg_canonical_triples": (
            f"WITH RECURSIVE ents AS (SELECT qid, label FROM read_parquet('{fx}/kb_entities.parquet')), "
            f"als AS (SELECT alias, qid FROM read_parquet('{fx}/kb_aliases.parquet')), "
            "edges AS ("
            "  SELECT 'a:' || trim(regexp_replace(lower(label), '\\s+', ' ', 'g')) AS src, "
            "         'q:' || qid AS dst FROM ents "
            "  UNION "
            "  SELECT 'a:' || trim(regexp_replace(lower(alias), '\\s+', ' ', 'g')), "
            "         'q:' || qid FROM als"
            "), sym AS ("
            "  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges"
            "), reach AS ("
            "  SELECT DISTINCT src AS node, src AS r FROM sym"
            "  UNION"
            "  SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src"
            "), comp AS ("
            "  SELECT node, min(r) AS comp FROM reach GROUP BY node"
            "), qn AS ("
            "  SELECT substr(node, 3) AS qid, comp FROM comp WHERE node LIKE 'q:%'"
            "), canon AS ("
            "  SELECT qn.qid, c.canonical_qid FROM qn "
            "  JOIN (SELECT comp, min(qid) AS canonical_qid FROM qn GROUP BY comp) c "
            "  USING (comp)"
            "), g AS ("
            f"  SELECT * FROM read_parquet('{fx}/golden_triples.parquet')"
            "), links AS ("
            "  SELECT url, qid, round(((('0x' || substr(md5(url || ':' || qid), 1, 4))::BIGINT "
            f"         % 90 + 5) / 100.0), 2)::DOUBLE AS conf "
            f"  FROM read_parquet('{fx}/golden_links.parquet')"
            "), de AS ("
            "  SELECT url, qid AS subj, max(conf) AS conf FROM links GROUP BY url, qid"
            "), tr AS ("
            f"  SELECT t.* FROM read_parquet('{fx}/kb_triples.parquet') t "
            f"  WHERE t.pred IN ({_whitelist_sql()}) "
            "    AND t.subj IN (SELECT DISTINCT subj FROM de)"
            ") "
            "SELECT 'canon' AS part, subj, pred, obj, 0::BIGINT AS n_docs, "
            "       0::BIGINT AS n_support, CAST(0.0 AS DOUBLE) AS evidence FROM ("
            "  SELECT DISTINCT coalesce(ms.canonical_qid, g.subj) AS subj, g.pred, "
            "         coalesce(mo.canonical_qid, g.obj) AS obj "
            "  FROM g LEFT JOIN canon ms ON g.subj = ms.qid "
            "  LEFT JOIN canon mo ON g.obj = mo.qid) "
            "UNION ALL "
            "SELECT 'evidence', tr.subj, tr.pred, tr.obj, "
            "       count(DISTINCT de.url)::BIGINT, count(*)::BIGINT, "
            "       round(1 - exp(sum(ln(1 - least(de.conf, 0.999999)))), 6) "
            "FROM de JOIN tr ON de.subj = tr.subj "
            "GROUP BY tr.subj, tr.pred, tr.obj"
        ),
        "kg_annotations": (
            f"""
            SELECT 'listed' AS part, g.url, g.substr AS spot, g.start, g."end",
                   g.qid AS id, e.page AS title,
                   'https://en.wikipedia.org/wiki/' || replace(e.page, ' ', '_') AS wiki_uri,
                   e.descr AS abstract, CAST(NULL AS VARCHAR) AS tag
            FROM read_parquet('{fx}/golden_links.parquet') g
            LEFT JOIN read_parquet('{fx}/kb_entities.parquet') e ON g.qid = e.qid
            UNION ALL
            SELECT 'unlisted', url, spot, start, "end", CAST(NULL AS VARCHAR),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
                   CAST(NULL AS VARCHAR), tag
            FROM read_parquet('{fx}/golden_unlisted.parquet')
            """
        ),
        "kb_ingest": (
            f"""
            WITH lines AS (
              SELECT value FROM read_csv('{fx}/custom_kb.nt', delim='|',
                                         header=false, quote='',
                                         columns={{'value': 'VARCHAR'}})
            ), p AS (
              SELECT regexp_extract(value, '{NT_RE_SQL}', 1) AS s_iri,
                     regexp_extract(value, '{NT_RE_SQL}', 2) AS p_iri,
                     regexp_extract(value, '{NT_RE_SQL}', 3) AS o_iri,
                     regexp_extract(value, '{NT_RE_SQL}', 4) AS o_lit
              FROM lines
            ), t AS (
              SELECT string_split(s_iri, '/')[-1] AS subj,
                     string_split(p_iri, '/')[-1] AS pred,
                     CASE WHEN o_iri != '' THEN string_split(o_iri, '/')[-1]
                          ELSE {_NT_UNESCAPE_SQL.format(col='o_lit')} END AS obj
              FROM p WHERE s_iri != '' AND p_iri != ''
            ), agg AS (
              SELECT subj,
                     max(CASE WHEN pred = 'label' THEN obj END) AS label,
                     list_sort(list_distinct(
                       list_filter(list(CASE WHEN pred = 'P31' THEN obj END),
                                   x -> x IS NOT NULL))) AS p31,
                     count(*) AS num_rels
              FROM t WHERE obj != '' GROUP BY subj
            )
            SELECT 'triples' AS part, subj AS a, pred AS b, obj AS c,
                   0::BIGINT AS num_rels
            FROM t WHERE obj != ''
            UNION ALL
            SELECT 'entities', subj, label,
                   coalesce(CASE p31[1] WHEN 'Q5' THEN 'PER'
                                        WHEN 'Q515' THEN 'CITY'
                                        WHEN 'Q6256' THEN 'COUNTRY' END,
                            'MISC'),
                   num_rels
            FROM agg WHERE label IS NOT NULL
            UNION ALL
            SELECT 'nt',
                   '<http://www.wikidata.org/entity/' || subj ||
                   '> <http://www.wikidata.org/prop/direct/' || pred || '> ' ||
                   CASE WHEN regexp_matches(obj, '^Q[0-9]+$')
                        THEN '<http://www.wikidata.org/entity/' || obj || '>'
                        ELSE '"' ||
                             {_NT_ESCAPE_SQL.format(col='obj')}
                             || '"'
                   END || ' .',
                   '', '', 0::BIGINT
            FROM t WHERE obj != ''
            """
        ),
        "mm_pipeline": (
            # byte-histogram featurizer: bucket = byte >> 4 (dim 16), L1
            # normalized in float32 — REAL::DOUBLE before round matches the
            # Spark projection's float->double cast; joined per-url with the
            # magic-sniff metadata columns
            f"""
            WITH pages AS (SELECT url, html FROM read_parquet('{fx}/pages.parquet')),
            nonempty AS (
              SELECT url, html FROM pages
              WHERE html IS NOT NULL AND octet_length(html) > 0
            ),
            bytes AS (
              SELECT url, ('0x' || substr(hex(html), 2*i - 1, 2))::INT >> 4 AS b
              FROM nonempty, unnest(generate_series(1, octet_length(html))) AS t(i)
            ),
            tot AS (SELECT url, count(*)::DOUBLE AS t FROM bytes GROUP BY url),
            counts AS (SELECT url, b, count(*)::DOUBLE AS c FROM bytes GROUP BY url, b),
            grid AS (SELECT tot.url, g.k, tot.t
                     FROM tot, unnest(generate_series(0, 15)) AS g(k)),
            dense AS (
              SELECT grid.url, grid.k,
                     round(CAST(coalesce(c.c, 0) / grid.t AS REAL)::DOUBLE, 6) AS v
              FROM grid LEFT JOIN counts c ON c.url = grid.url AND c.b = grid.k
            ),
            feats AS (
              SELECT url, string_agg(v::VARCHAR, ',' ORDER BY k) AS feature_csv
              FROM dense GROUP BY url
            )
            SELECT p.url, octet_length(p.html)::BIGINT AS n_bytes,
                   lower(substr(hex(p.html), 1, 8)) AS magic_hex,
                   CASE WHEN substring(decode(p.html), 1, 9) = '<!DOCTYPE' THEN 'html'
                        WHEN substring(decode(p.html), 1, 5) = '<html' THEN 'html'
                        ELSE 'unknown' END AS media_kind,
                   coalesce(f.feature_csv, '') AS feature_csv
            FROM pages p LEFT JOIN feats f ON p.url = f.url
            """
        ),
        "dedup_embedding_pairs": (
            """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings
            ), pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_sum(list_transform(generate_series(1, len(a.v)),
                                             i -> a.v[i] * b.v[i]))
                     / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos_sim
              FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim
            FROM pairs WHERE cos_sim >= 0.35
            """
        ),
        "dedup_embedding_pairs_lsh": (
            # n_exact is the grounded crosscheck (same pair SQL as
            # dedup_embedding_pairs); recall_ok >= 0.9 is asserted Spark-side
            """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings
            ), pairs AS (
              SELECT a.vec_id AS id_a,
                     list_sum(list_transform(generate_series(1, len(a.v)),
                                             i -> a.v[i] * b.v[i]))
                     / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos_sim
              FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT CAST(count(*) AS BIGINT) AS n_exact, true AS recall_ok
            FROM pairs WHERE cos_sim >= 0.35
            """
        ),
        "sim_lsh_ann": _ann_recall_oracle("embeddings"),
        "sim_ivf_topk": _ann_recall_oracle("embeddings"),
        "sim_ivf_clustered": _ann_recall_oracle(
            f"read_parquet('{_ensure_clustered_embeddings()}')",
            extra_bools=("pq_recall_ok",),
        ),
        "dedup_semantic": (
            # n_exact = corpus-wide near-dup pair count (the crosscheck);
            # the recall/consistency booleans are earned Spark-side
            """
            WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings
            ), pairs AS (
              SELECT a.vec_id AS id_a,
                     list_sum(list_transform(generate_series(1, len(a.v)),
                                             i -> a.v[i] * b.v[i]))
                     / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos_sim
              FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT CAST(count(*) AS BIGINT) AS n_exact,
                   true AS recall_ok, true AS drops_ok
            FROM pairs WHERE cos_sim >= 0.35
            """
        ),
        "dedup_substring": (
            # win/span: stride-1 k=6 window fingerprints on the fixture
            # pages (real repeated boilerplate), islands-merged to maximal
            # spans; winfp: leftmost-min winnowing (w=4) over documents,
            # computed here as a WINDOW-FUNCTION plan vs the Spark side's
            # row-local array expressions — independent plans, same set
            f"""
            WITH pt AS (
              SELECT url, {_TOKS} AS toks
              FROM read_parquet('{fx}/pages.parquet')
            ),
            w AS (
              SELECT url, i::BIGINT AS pos, 6::BIGINT AS wlen,
                     md5(array_to_string(list_slice(toks, i, i + 5), ' ')) AS wh
              FROM pt, unnest(generate_series(1, len(toks) - 5)) AS u(i)
              WHERE len(toks) >= 6
              UNION ALL
              SELECT url, 1::BIGINT, len(toks)::BIGINT,
                     md5(array_to_string(toks, ' '))
              FROM pt WHERE len(toks) > 0 AND len(toks) < 6
            ),
            g AS (
              SELECT wh, count(*)::BIGINT AS n_occ,
                     count(DISTINCT url)::BIGINT AS n_docs,
                     min(struct_pack(i := url, p := pos)) AS kp
              FROM w GROUP BY wh HAVING count(*) > 1
            ),
            dup AS (SELECT w.url, w.pos, w.wlen
                    FROM w SEMI JOIN g ON w.wh = g.wh),
            isl AS (
              SELECT url, pos, wlen,
                     pos - row_number() OVER (PARTITION BY url ORDER BY pos) AS grp
              FROM dup
            ),
            spans AS (
              SELECT url, min(pos) AS s, max(pos + wlen - 1) AS e
              FROM isl GROUP BY url, grp
            ),
            dt AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 6 THEN
                       list_transform(generate_series(1, len(toks) - 5),
                                      i -> array_to_string(list_slice(toks, i, i + 5), ' '))
                     ELSE [array_to_string(toks, ' ')] END AS gs
              FROM dt WHERE len(toks) > 0
            ),
            h AS (
              SELECT doc_id, i::BIGINT AS pos,
                     ('0x' || substr(md5(gs[i]), 1, 15))::BIGINT AS hh,
                     len(gs)::BIGINT AS nh
              FROM grams, unnest(generate_series(1, len(gs))) AS u(i)
            ),
            selw AS (
              SELECT doc_id, pos, nh,
                     min(struct_pack(h := hh, p := pos)) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
              FROM h
            ),
            selected AS (
              SELECT DISTINCT doc_id, (sel).p AS pos, (sel).h AS hh
              FROM selw WHERE pos <= greatest(nh - 3, 1)
            )
            SELECT 'win' AS part, kp.i AS rid, kp.p AS a,
                   n_occ AS b, n_docs AS c, wh
            FROM g
            UNION ALL
            SELECT 'span', url, s, e, e - s + 1, NULL FROM spans
            UNION ALL
            SELECT 'winfp', doc_id::VARCHAR, pos, hh, NULL, NULL
            FROM selected
            """
        ),
        "sim_cosine_topk": (
            """
            WITH q AS (
              SELECT list_transform(embedding, x -> x::DOUBLE) AS qvec
              FROM embeddings WHERE vec_id = 0
            ), scored AS (
              SELECT vec_id,
                     round(
                       list_sum(list_transform(generate_series(1, len(embedding)),
                                               i -> embedding[i]::DOUBLE * qvec[i]))
                       / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                          * sqrt(list_sum(list_transform(qvec, x -> x * x)))),
                     6) AS cos_sim
              FROM embeddings, q WHERE vec_id != 0
            )
            SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
            """
        ),
    }
    # doc_profile = the three per-doc profilers joined on doc_id (DuckDB
    # allows a WITH inside a parenthesized subquery, so each component SQL
    # embeds unchanged — same texts the standalone rows used through r2)
    _doc_stats_sql = sql.pop('doc_stats')
    sql["doc_profile"] = (
        f"SELECT s.*, l.lang_pred, f.fp_md5, f.fp_int64 "
        f"FROM ({_doc_stats_sql}) s "
        f"JOIN ({sql.pop('doc_lang_id')}) l USING (doc_id) "
        f"JOIN ({sql.pop('doc_fingerprint')}) f USING (doc_id)"
    )

    # doc_pii: patterns come FROM the operator module, so the oracle runs
    # the byte-identical regexes (portable Java-regex/RE2 subset by design)
    from entity_extraction_svc_spark.operators.privacy import duckdb_pii_exprs

    # cascade parity: counts run on the text with all EARLIER kinds
    # already replaced and checksummed kinds (iban/card) count only
    # validator-passing candidates — both generated by the operator
    # module itself, so the oracle runs the one ordered spec verbatim
    kcounts, redacted_sql = duckdb_pii_exprs("text")
    counts = ", ".join(f"{c} AS n_{kind}" for kind, c in kcounts)
    flags = " OR ".join(f"n_{kind} > 0" for kind, _ in kcounts)
    ncols = ", ".join(f"n_{kind}" for kind, _ in kcounts)
    sql["doc_pii"] = f"""
        WITH u AS (
          SELECT doc_id, text FROM read_parquet('{_ensure_pii_samples()}')
          UNION ALL SELECT doc_id, text FROM documents
        ), c AS (
          SELECT doc_id, {counts}, {redacted_sql} AS redacted FROM u
        )
        SELECT doc_id, {ncols}, ({flags}) AS has_pii, redacted FROM c
    """

    sql["doc_split"] = """
        WITH b AS (
          SELECT doc_id,
                 ('0x' || substr(md5(coalesce(doc_id::VARCHAR, chr(0))), 1, 8))::BIGINT % 10000
                   AS bucket
          FROM documents
        )
        SELECT doc_id, bucket,
               CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """

    # doc_line_dedup: the 3-word reshape shared with the Spark side, then
    # the module-generated CCNet line-dedup rendition (first-occurrence
    # winner, ordered reassembly)
    from entity_extraction_svc_spark.operators.dedup import line_dedup_oracle_sql

    sql["doc_line_dedup"] = line_dedup_oracle_sql(
        """
        SELECT doc_id, array_to_string(
                 list_transform(
                   generate_series(1, ceil(len(parts) / 3.0)::INT),
                   i -> array_to_string(parts[(i-1)*3+1:(i-1)*3+3], ' ')),
                 chr(10)) AS text
        FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
        """
    )

    # doc_pack: same definition as packing.pack_sequences but with ONE flat
    # cumulative window over (md5, id) order — the two-level Spark plan must
    # equal it exactly because the 256-bucket key is a PREFIX of the order key
    sql["doc_pack"] = """
        WITH toks AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(lower(coalesce(text,'')),
                                                    '\\s+'), t -> t != ''))::BIGINT
                   AS n_tokens,
                 md5(coalesce(doc_id::VARCHAR, chr(0))) AS h
          FROM documents
        ), nz AS (SELECT * FROM toks WHERE n_tokens > 0),
        offs AS (
          SELECT doc_id, n_tokens,
                 coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
          FROM nz
        ), chunks AS (
          SELECT doc_id, n_tokens, off,
                 unnest(generate_series((off // 128)::BIGINT,
                                        ((off + n_tokens - 1) // 128)::BIGINT))
                   AS seq_id
          FROM offs
        )
        SELECT seq_id, doc_id,
               greatest(0, seq_id * 128 - off) AS tok_start,
               least(n_tokens, (seq_id + 1) * 128 - off) AS tok_end,
               greatest(0, off - seq_id * 128) AS seq_pos,
               n_tokens
        FROM chunks
    """

    # doc_mixture: keep fraction min(1, T * n^alpha / sum(n^alpha) / n) with
    # alpha=0.5, T=corpus size; membership = the doc_split md5 bucket rule
    sql["doc_mixture"] = """
        WITH c AS (
          SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang
        ), w AS (
          SELECT sum(pow(n, 0.5)) AS wsum, sum(n) AS t FROM c
        ), f AS (
          SELECT lang,
                 least(1.0, w.t * pow(c.n, 0.5) / w.wsum / c.n) AS frac
          FROM c, w
        )
        SELECT d.doc_id, d.lang AS source, round(f.frac, 6) AS keep_frac
        FROM documents d JOIN f ON d.lang = f.lang
        WHERE ('0x' || substr(md5(coalesce(d.doc_id::VARCHAR, chr(0))), 1, 8))::BIGINT
              % 10000 < floor(f.frac * 10000)
    """

    # kg_pagerank: the unrolled-iteration SQL is generated by the operator
    # module itself, so Spark and oracle share ONE recurrence definition
    from entity_extraction_svc_spark.operators.graphstats import (
        hits_oracle_sql,
        kcore_oracle_sql,
        lpa_oracle_sql,
    )
    from entity_extraction_svc_spark.operators.pagerank import (
        pagerank_oracle_sql,
        ppr_oracle_sql,
        weighted_pagerank_oracle_sql,
    )

    _pr_edges = (
        f"SELECT subj AS src, obj AS dst FROM read_parquet('{fx}/kb_triples.parquet') "
        "WHERE regexp_matches(obj, '^Q[0-9]+$')"
    )
    sql["kg_pagerank"] = (
        f"SELECT 'global' AS part, * FROM ({pagerank_oracle_sql(_pr_edges)})"
        " UNION ALL "
        f"SELECT 'ppr' AS part, * FROM ({ppr_oracle_sql(_pr_edges, _PPR_SEEDS)})"
        " UNION ALL "
        f"SELECT 'hits_hub' AS part, node, hub AS rank"
        f" FROM ({hits_oracle_sql(_pr_edges)})"
        " UNION ALL "
        f"SELECT 'hits_auth' AS part, node, auth AS rank"
        f" FROM ({hits_oracle_sql(_pr_edges)})"
        " UNION ALL "
        f"SELECT 'warm' AS part, node, rank FROM ("
        + pagerank_oracle_sql(
            _pr_edges, iterations=3,
            init_sql=(
                "SELECT src AS node, count(*)::DOUBLE + 1 AS rank FROM "
                f"(SELECT DISTINCT src, dst FROM ({_pr_edges})) GROUP BY src"
            ),
        )
        + ")"
        " UNION ALL "
        "SELECT 'wpr' AS part, node, rank FROM ("
        + weighted_pagerank_oracle_sql(
            f"SELECT t.subj AS src, t.obj AS dst, "
            f"1.0 / ln(1.0 + pn.pn) AS w "
            f"FROM read_parquet('{fx}/kb_triples.parquet') t "
            f"JOIN (SELECT pred, count(*) AS pn "
            f"      FROM read_parquet('{fx}/kb_triples.parquet') "
            f"      WHERE regexp_matches(obj, '^Q[0-9]+$') "
            f"      GROUP BY pred) pn USING (pred) "
            f"WHERE regexp_matches(t.obj, '^Q[0-9]+$')"
        )
        + ")"
    )

    # kg_types_2hop parts closure/tax: the linear recursive-CTE closure
    # from the operator module (shared reachability definition; the Spark
    # side path-doubles, the oracle grows one edge per recursion step)
    from entity_extraction_svc_spark.operators.graphwalk import (
        closure_oracle_sql,
    )

    # kg_canonical: part=cc wraps the recursive-CC SQL; part=alias is the
    # mining module's own rendition over the same golden links + alias dim
    from entity_extraction_svc_spark.operators.canonicalize import (
        mine_aliases_oracle_sql,
        wcc_oracle_sql,
    )

    sql["kg_canonical"] = (
        f"SELECT 'cc' AS part, qid AS a, canonical_qid AS b"
        f" FROM ({sql['kg_canonical']})"
        " UNION ALL "
        "SELECT 'alias', alias, qid || ':' || support::VARCHAR || ':' || "
        "round(purity * 1000000)::BIGINT::VARCHAR"
        " FROM ("
        + mine_aliases_oracle_sql(
            f"SELECT * FROM read_parquet('{fx}/golden_links.parquet')",
            f"SELECT * FROM read_parquet('{fx}/kb_aliases.parquet')",
            min_support=2,
        )
        + ")"
    )

    # rel_range_join parts facts/asof: the run-collapse SQL comes from the
    # temporal module so both engines share one interval definition
    from entity_extraction_svc_spark.operators.temporal import (
        fact_intervals_oracle_sql,
    )

    sql["rel_range_join"] = sql["rel_range_join"].replace(
        "{FACTS_SQL}",
        fact_intervals_oracle_sql(
            "SELECT user_id AS subj, 'status' AS pred, "
            "event_type AS obj, ts AS observed_ts FROM events",
            ["subj", "pred"], "obj",
        ),
    ).replace("{ASOF_TS}", _ASOF_PROBE_TS)

    from entity_extraction_svc_spark.operators.temporal import (
        set_fact_intervals_oracle_sql,
    )

    sql["rel_range_join"] = sql["rel_range_join"].replace(
        "{SETFACTS_SQL}",
        set_fact_intervals_oracle_sql(
            "SELECT user_id AS subj, 'activity' AS pred, "
            "event_type AS obj, date_trunc('day', ts) AS observed_ts "
            "FROM events",
            ["subj", "pred"], "obj",
        ),
    )

    from entity_extraction_svc_spark.operators.cooccur import (
        pmi_oracle_sql,
        pmi_topk_oracle_sql,
    )

    f_pmi_src = (
        f"SELECT url, qid FROM read_parquet('{fx}/golden_links.parquet')"
    )
    sql["kg_intersection"] = (
        f"SELECT * FROM ({sql['kg_intersection']})"
        " UNION ALL "
        "SELECT 'pmi' AS part, ent_a || ':' || ent_b || ':' || "
        "n_ab::VARCHAR || ':' || round(pmi * 1000000)::BIGINT::VARCHAR AS value"
        f" FROM ({pmi_oracle_sql(f_pmi_src, min_count=2)})"
        " UNION ALL "
        "SELECT 'pmitop' AS part, ent_a || ':' || ent_b || ':' || "
        "n_ab::VARCHAR || ':' || round(pmi * 1000000)::BIGINT::VARCHAR AS value"
        f" FROM ({pmi_topk_oracle_sql(f_pmi_src, k=2, min_count=2)})"
    )

    # kg_pattern_search part=rules: the RDFS-style multi-rule forward
    # chain (type inheritance + subproperty + domain/range) — unrolled
    # naive-iteration CTEs from the module generator, derived facts only;
    # base = fixture KB + the shared RDFS_ONTOLOGY schema triples
    from entity_extraction_svc_spark.operators.chain import (
        RDFS_RULES,
        chain_oracle_sql,
        rdfs_ontology_values_sql,
    )

    _chain_base = (
        f"SELECT subj, pred, obj FROM read_parquet('{fx}/kb_triples.parquet') "
        f"UNION ALL SELECT * FROM (VALUES {rdfs_ontology_values_sql()}) "
        f"ont(subj, pred, obj)"
    )
    _chain_plus = (
        _chain_base + " UNION ALL SELECT * FROM (VALUES " +
        ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in CHAIN_DELTA_FACTS) +
        ") nf(subj, pred, obj)"
    )
    sql["kg_pattern_search"] += (
        " UNION ALL "
        "SELECT 'rules' AS part, subj, pred, obj, '' "
        f"FROM ({chain_oracle_sql(_chain_base, RDFS_RULES, rounds=8, derived_only=True)})"
        " UNION ALL "
        "SELECT 'rulesdelta' AS part, subj, pred, obj, '' FROM ("
        f"SELECT subj, pred, obj FROM ({chain_oracle_sql(_chain_plus, RDFS_RULES, rounds=8)}) "
        "EXCEPT "
        f"SELECT subj, pred, obj FROM ({chain_oracle_sql(_chain_base, RDFS_RULES, rounds=8)})"
        ")"
    )

    # part=rulesdel oracle: from-scratch recompute on the survivor base —
    # the DRed result must land exactly on it (derived-only rows)
    _rm_values = ", ".join(
        f"('{s}', '{p}', '{o}')" for s, p, o in CHAIN_RETRACT_FACTS
    )
    _chain_surv = (
        f"SELECT cb.subj, cb.pred, cb.obj FROM ({_chain_base}) cb "
        f"ANTI JOIN (SELECT * FROM (VALUES {_rm_values}) "
        f"rmv(subj, pred, obj)) rm USING (subj, pred, obj)"
    )
    sql["kg_pattern_search"] += (
        " UNION ALL "
        "SELECT 'rulesdel' AS part, subj, pred, obj, '' "
        f"FROM ({chain_oracle_sql(_chain_surv, RDFS_RULES, rounds=8, derived_only=True)})"
    )

    # kg_pattern_search part=altpath: (P131|P279)+ = closure over the
    # UNION edge set — one capped recursive CTE, shared depth bound
    sql["kg_pattern_search"] = sql["kg_pattern_search"].replace(
        "{ALTPATH_SQL}",
        closure_oracle_sql(
            f"SELECT * FROM read_parquet('{fx}/kb_triples.parquet') "
            "WHERE pred IN ('P131', 'P279')",
        ),
    )

    sql["kg_types_2hop"] = sql["kg_types_2hop"].replace(
        "{CLOSURE_SQL}",
        closure_oracle_sql(
            f"SELECT * FROM read_parquet('{fx}/kb_triples.parquet')",
            pred="P279",
        ),
    ).replace(
        # part=del recompute-on-survivors oracle: the full P279 edge set
        # minus the held-back Q5/Q515 subjects — the DRed result must
        # equal closing the surviving edges from scratch
        "{CLOSURE_BASE_SQL}",
        closure_oracle_sql(
            f"SELECT * FROM read_parquet('{fx}/kb_triples.parquet') "
            "WHERE subj NOT IN ('Q5', 'Q515')",
            pred="P279",
        ),
    )

    # kg_connection part=tri: the naive three-way-join triangle count from
    # the operator module (shared DEFINITION, independent plan); b packs
    # degree:n_tri:coeff-in-micros exactly as the Spark side does
    from entity_extraction_svc_spark.operators.graphstats import (
        triangles_oracle_sql,
    )

    from entity_extraction_svc_spark.operators.graphwalk import (
        shortest_path_oracle_sql,
    )

    sql["kg_connection"] = (
        f"SELECT * FROM ({sql['kg_connection']})"
        " UNION ALL "
        "SELECT 'tri' AS part, node AS a, "
        "degree::VARCHAR || ':' || n_tri::VARCHAR || ':' || "
        "round(coeff * 1000000)::BIGINT::VARCHAR AS b"
        f" FROM ({triangles_oracle_sql(_pr_edges)})"
        " UNION ALL "
        "SELECT 'path' AS part, entity AS a, step::VARCHAR AS b FROM ("
        + shortest_path_oracle_sql(
            f"SELECT * FROM read_parquet('{fx}/kb_triples.parquet')",
            "Q12418", "Q2126369", 4,
        )
        + ")"
        " UNION ALL "
        "SELECT 'lpa' AS part, node AS a, community AS b FROM ("
        + lpa_oracle_sql(_pr_edges)
        + ")"
        " UNION ALL "
        "SELECT 'kcore' AS part, node AS a, degree::VARCHAR AS b FROM ("
        + kcore_oracle_sql(_pr_edges, k=2)
        + ")"
        " UNION ALL "
        "SELECT 'wcc' AS part, node AS a, comp AS b FROM ("
        + wcc_oracle_sql(_pr_edges)
        + ")"
        " UNION ALL "
        # part=ccdelta: recompute-on-the-edited-set oracle — the same
        # remove (both orientations of Q90<->Q142) + add VALUES the Spark
        # side applies through cc_delta
        "SELECT 'ccdelta' AS part, node AS a, comp AS b FROM ("
        + wcc_oracle_sql(
            "SELECT src, dst FROM ("
            "  SELECT DISTINCT subj AS src, obj AS dst"
            f"  FROM read_parquet('{fx}/kb_triples.parquet')"
            "  WHERE pred IN ('P131','P36','P47')"
            "    AND regexp_matches(obj, '^Q[0-9]+$')"
            ") WHERE NOT ((src = 'Q90' AND dst = 'Q142')"
            "          OR (src = 'Q142' AND dst = 'Q90'))"
            " UNION ALL SELECT * FROM (VALUES"
            " ('Q82884','Q19675'), ('Q9000002','Q9000003')) v(src, dst)"
        )
        + ")"
    )

    # doc_bpe: the whole trainer unrolled — 10 (pairs, argmax, rewrite)
    # rounds in MATERIALIZED CTEs; generated next to the operator so both
    # engines share one greedy-fold definition
    from entity_extraction_svc_spark.operators.bpe import bpe_oracle_sql

    sql["doc_bpe"] = bpe_oracle_sql(
        "SELECT doc_id, text FROM documents", toks_lower, 10
    )

    # kg_negatives: the module's own SQL rendition (flat row_number index,
    # same (md5, e) total order as the two-level Spark numbering)
    from entity_extraction_svc_spark.operators.triples import (
        negative_triples_oracle_sql,
    )

    sql["kg_negatives"] = negative_triples_oracle_sql(
        f"SELECT subj, pred, obj FROM read_parquet('{fx}/kb_triples.parquet')",
        k=2,
    )

    # kg_walks: the walk loop unrolled (one CTE per step, row_number
    # argmin over the same md5 choice key) + the fan-out sample's plain
    # one-window total order (the Spark side runs the SALTED cut, so this
    # row pins salted == plain across engines)
    from entity_extraction_svc_spark.operators.walks import (
        fanout_oracle_sql,
        walks_oracle_sql,
    )

    ee_sql = (
        f"SELECT subj, pred, obj FROM read_parquet('{fx}/kb_triples.parquet') "
        "WHERE regexp_matches(obj, '^Q[0-9]+$')"
    )

    # kg_entity_sim: exact neighbor-Jaccard (module-generated SQL, shared
    # definition of the undirected neighbor set)
    from entity_extraction_svc_spark.operators.graphstats import (
        neighbor_jaccard_oracle_sql,
    )

    sql["kg_entity_sim"] = neighbor_jaccard_oracle_sql(
        f"SELECT subj AS src, obj AS dst FROM ({ee_sql})",
        min_shared=1, threshold=0.2,
    )

    # kg_ner_training: module-generated BIO rendition over the same
    # fixture parquets (shared tokenization/overlap/first-token rules)
    from entity_extraction_svc_spark.operators.ner import bio_training_oracle_sql

    sql["kg_ner_training"] = bio_training_oracle_sql(
        f"SELECT url, text FROM read_parquet('{fx}/pages.parquet')",
        f"SELECT url, start AS m_start, \"end\" AS m_end, tag AS m_tag "
        f"FROM read_parquet('{fx}/golden_mentions.parquet')",
    )

    # kg_sketch: module-generated renditions of both sketches — count-min
    # (same md5 bucket definition, same (w, d)) unioned with the HLL
    # distinct sketch (same md5 register math, same (p), same injected
    # alpha constant)
    from entity_extraction_svc_spark.operators.sketch import (
        countmin_oracle_sql,
        hll_oracle_sql,
    )

    _subj = (f"SELECT subj AS k "
             f"FROM read_parquet('{fx}/kb_triples.parquet')")
    _po = (f"SELECT pred AS k, obj AS v "
           f"FROM read_parquet('{fx}/kb_triples.parquet')")
    from entity_extraction_svc_spark.operators.sketch import (
        histogram_quantiles_oracle_sql,
    )

    _deg = (f"SELECT count(*) AS v "
            f"FROM read_parquet('{fx}/kb_triples.parquet') GROUP BY subj")
    sql["kg_sketch"] = f"""
        SELECT 'cm' AS part, k, NULL::BIGINT AS n_reg, CAST(est AS DOUBLE) AS est
        FROM ({countmin_oracle_sql(_subj, _subj, w=128, d=4)})
        UNION ALL
        SELECT 'hll' AS part, k, n_reg, est
        FROM ({hll_oracle_sql(_po, p=6)})
        UNION ALL
        SELECT 'quant' AS part, 'q' || q_micros::VARCHAR AS k,
               lo AS n_reg, hi::DOUBLE AS est
        FROM ({histogram_quantiles_oracle_sql(_deg,
                                              qs=[0.5, 0.9, 0.99, 1.0],
                                              buckets=64)})
    """

    # kg_rel_training: module-generated rendition over the same fixture
    # parquets (shared pair/gap/least-label rules)
    from entity_extraction_svc_spark.operators.triples import (
        relation_training_oracle_sql,
    )

    sql["kg_rel_training"] = relation_training_oracle_sql(
        f"SELECT url, start, \"end\", qid "
        f"FROM read_parquet('{fx}/golden_links.parquet')",
        f"SELECT subj, pred, obj FROM read_parquet('{fx}/kb_triples.parquet')",
    )

    # kg_knn_gnn: COMPOSED from the module-generated oracles (one
    # definition per operator — a semantics change updates tests and
    # this row together), with the feat list unnested to (node, dim,
    # value) for the hash compare
    from entity_extraction_svc_spark.operators.gnn import (
        knn_graph_oracle_sql,
        neighbor_feature_agg_oracle_sql,
    )

    sql["kg_knn_gnn"] = f"""
        WITH knn AS ({knn_graph_oracle_sql(k=5, floor=0.3)}),
        feat0 AS (
          {neighbor_feature_agg_oracle_sql("SELECT src, dst FROM knn",
                                           dim=64)}
        ),
        feat AS (
          SELECT vec_id, g.i - 1 AS dim_idx, n_nbr, feat[g.i] AS val
          FROM feat0, unnest(generate_series(1, 64)) AS g(i)
        )
        SELECT 'knn' AS part, src AS a, dst AS b,
               rank::BIGINT AS r, cos_sim AS v
        FROM knn
        UNION ALL
        SELECT 'feat', vec_id, dim_idx, n_nbr, val FROM feat
    """

    sql["kg_walks"] = f"""
        WITH w AS ({walks_oracle_sql(ee_sql, 2, 3)}),
        f AS ({fanout_oracle_sql(ee_sql, 3)})
        SELECT 'walk' AS part, start AS a,
               CAST(walk AS VARCHAR) || ':' || CAST(step AS VARCHAR)
                 || ':' || node AS b
        FROM w
        UNION ALL
        SELECT 'fanout', src, dst || ':' || CAST(rank AS VARCHAR) FROM f
    """

    # kg_salience: tf-share x idf x rational position boost over the golden
    # linked mentions; rank window ordered by the ROUNDED score (both sides)
    # with qid tie-break so the order is total
    sql["kg_salience"] = f"""
        WITH m AS (SELECT url, qid, start
                   FROM read_parquet('{fx}/golden_links.parquet')),
        per AS (SELECT url, qid, count(*) AS tf, min(start) AS first_pos
                FROM m GROUP BY url, qid),
        docm AS (SELECT url, sum(tf) AS m_doc FROM per GROUP BY url),
        dfreq AS (SELECT qid, count(*) AS df FROM per GROUP BY qid),
        n AS (SELECT count(*) AS n_docs FROM docm),
        scored AS (
          SELECT per.url, per.qid, tf, first_pos,
                 round((tf::DOUBLE / m_doc)
                       * ln(n_docs::DOUBLE / df)
                       * (1.0 + 1.0 / (1.0 + first_pos / 1000.0)), 6)
                   AS salience
          FROM per JOIN docm USING (url) JOIN dfreq USING (qid) CROSS JOIN n
        )
        SELECT url, qid, tf, first_pos, salience,
               row_number() OVER (PARTITION BY url
                                  ORDER BY salience DESC, qid ASC) AS sal_rank
        FROM scored
    """

    # doc_decontam: word 8-grams (with_shingles semantics incl. the
    # shorter-than-n whole-text fallback), eval side = substr-240 of every
    # doc_id % 97 == 0 document
    g8 = " || ' ' || ".join(f"t[i+{j}]" for j in range(8))
    sh8 = (
        "case when len(t) >= 8 then "
        f"list_transform(generate_series(1, len(t) - 7), i -> {g8}) "
        "else [array_to_string(t, ' ')] end"
    )
    sql["doc_decontam"] = f"""
        WITH dt AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        et AS (SELECT {_TOKS} AS t FROM (
                 SELECT substr({_NORM}, 1, 240) AS text
                 FROM documents WHERE doc_id % 97 = 0)),
        eg AS (SELECT DISTINCT unnest({sh8}) AS gram FROM et),
        dg AS (SELECT DISTINCT doc_id, unnest({sh8}) AS gram FROM dt),
        hits AS (SELECT doc_id, count(*) AS n_overlap
                 FROM dg JOIN eg USING (gram) GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_overlap, 0) AS n_overlap,
               coalesce(n_overlap, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits USING (doc_id)
    """

    # doc_perplexity: add-k bigram LM self-audit (k=0.5) + Jelinek-Mercer
    # interpolated trigram (0.5/0.3/0.2), expression order mirroring the
    # Spark column math exactly; ln/ln(2) is the same libm double math
    # Spark's log runs, so round(...,6) is stable.  The count CTEs are
    # MATERIALIZED — each is referenced 2-4x and DuckDB inlines plain CTEs
    sql["doc_perplexity"] = f"""
        WITH t AS MATERIALIZED (SELECT doc_id, {_TOKS} AS toks FROM documents),
        uc AS MATERIALIZED (
          SELECT w, count(*) AS c1
          FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
        dims AS (SELECT count(*)::DOUBLE AS v, sum(c1)::DOUBLE AS n FROM uc),
        bg AS MATERIALIZED (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
                 SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
                 FROM t)),
        bc AS MATERIALIZED (
          SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        scored AS (
          SELECT doc_id,
                 -ln((coalesce(c12, 0) + 0.5) / (coalesce(c1, 0) + 0.5 * dims.v))
                   / ln(2) AS bits
          FROM bg LEFT JOIN bc USING (w1, w2)
          LEFT JOIN uc ON bg.w1 = uc.w CROSS JOIN dims),
        per AS (SELECT doc_id, count(*) AS n_bigrams,
                       round(avg(bits), 6) AS cross_entropy
                FROM scored GROUP BY doc_id),
        tg AS MATERIALIZED (SELECT doc_id, s.w1 AS w1, s.w2 AS w2, s.w3 AS w3 FROM (
                 SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(toks) - 2),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i+1],
                                    w3 := toks[i+2]))) AS s
                 FROM t)),
        tc AS MATERIALIZED (
          SELECT w1, w2, w3, count(*) AS c123 FROM tg GROUP BY w1, w2, w3),
        scored3 AS (
          SELECT doc_id,
                 -ln(0.5 * ((coalesce(c123, 0) + 0.5) / (coalesce(c12_h, 0) + 0.5 * dims.v))
                   + 0.3 * ((coalesce(c23, 0) + 0.5) / (coalesce(c1_2, 0) + 0.5 * dims.v))
                   + 0.2 * ((coalesce(c1_3, 0) + 0.5) / (dims.n + 0.5 * dims.v)))
                   / ln(2) AS bits
          FROM tg LEFT JOIN tc USING (w1, w2, w3)
          LEFT JOIN (SELECT w1, w2, c12 AS c12_h FROM bc) USING (w1, w2)
          LEFT JOIN (SELECT w1 AS w2, w2 AS w3, c12 AS c23 FROM bc) USING (w2, w3)
          LEFT JOIN (SELECT w AS w2, c1 AS c1_2 FROM uc) USING (w2)
          LEFT JOIN (SELECT w AS w3, c1 AS c1_3 FROM uc) USING (w3)
          CROSS JOIN dims),
        per3 AS (SELECT doc_id, count(*) AS n_trigrams,
                        round(avg(bits), 6) AS cross_entropy3
                 FROM scored3 GROUP BY doc_id)
        SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
               per.cross_entropy,
               coalesce(per3.n_trigrams, 0) AS n_trigrams,
               per3.cross_entropy3
        FROM documents d LEFT JOIN per USING (doc_id)
        LEFT JOIN per3 USING (doc_id)
    """

    # -----------------------------------------------------------------
    # r5 part merges — MUST run after every constituent's post-processing
    # above; each merged key is the NULL-padded UNION the Spark wrapper
    # (_part_union) produces, composed by the same schema lists
    # -----------------------------------------------------------------
    sql["kg_training"] = _sql_part_union(
        [("ner", sql.pop("kg_ner_training"),
          {"url", "tok_idx", "token", "tok_start", "tok_end", "bio"}),
         ("rel", sql.pop("kg_rel_training"),
          {"url", "start_a", "end_a", "qid_a", "start_b", "end_b",
           "qid_b", "label", "direction"})],
        _KG_TRAINING_SCHEMA,
    )
    sql["kg_walks"] = (
        f"SELECT * FROM ({sql['kg_walks']}) UNION ALL "
        "SELECT 'neg' AS part, subj AS a, "
        "pred || ':' || obj || ':' || CAST(neg_rank AS VARCHAR) AS b "
        f"FROM ({sql.pop('kg_negatives')})"
    )
    sql["kg_salience"] = _sql_part_union(
        [("sal", sql.pop("kg_salience"),
          {"url", "qid", "tf", "first_pos", "salience", "sal_rank"}),
         ("njac", sql.pop("kg_entity_sim"),
          {"ent_a", "ent_b", "n_shared", "deg_a", "deg_b", "jaccard"})],
        _KG_SALIENCE_SCHEMA,
    )
    sql["sim_cosine_topk"] = _sql_part_union(
        [("topk", sql.pop("sim_cosine_topk"), {"vec_id", "cos_sim"}),
         (None, sql.pop("kg_knn_gnn"), {"a", "b", "r", "v"})],
        _SIM_COSINE_SCHEMA,
    )
    sql["dedup_minhash"] = _sql_part_union(
        [("sig", sql.pop("dedup_minhash_sig"), {"doc_id", "sig_str"}),
         (None, sql.pop("dedup_minhash_pairs"), {"a", "b", "score"})],
        _DEDUP_MINHASH_SCHEMA,
    )
    sql["doc_split"] = _sql_part_union(
        [("split", sql.pop("doc_split"), {"doc_id", "bucket", "split"}),
         ("mixture", sql.pop("doc_mixture"),
          {"doc_id", "source", "keep_frac"})],
        _DOC_SPLIT_SCHEMA,
    )
    sql["doc_perplexity"] = _sql_part_union(
        [("ppl", sql.pop("doc_perplexity"),
          {"doc_id", "n_bigrams", "cross_entropy", "n_trigrams",
           "cross_entropy3"}),
         ("decontam", sql.pop("doc_decontam"),
          {"doc_id", "n_overlap", "contaminated"})],
        _DOC_PPL_SCHEMA,
    )
    sql["doc_pii"] = _sql_part_union(
        [("pii", sql.pop("doc_pii"),
          {"doc_id", "n_email", "n_ssn", "n_ipv4", "n_iban", "n_card",
           "n_phone", "has_pii", "redacted"}),
         ("web", sql.pop("web_hygiene"),
          {"url", "host", "domain", "path", "domain_rank"})],
        _DOC_PII_SCHEMA,
    )
    # doc_quality_filter: gate + the fixed-point classifier (module-
    # generated training recurrence over the SAME stats SQL doc_profile
    # uses; score rows carry doc_id, weight rows the feature name)
    from entity_extraction_svc_spark.operators.classifier import (
        features_oracle_sql,
        train_oracle_sql,
    )

    _clf_sql = (
        "SELECT part, CASE WHEN part = 'w' THEN k END AS k, "
        "CASE WHEN part = 'score' THEN CAST(k AS BIGINT) END AS doc_id, "
        "v, y, pred FROM ("
        + train_oracle_sql(features_oracle_sql(_doc_stats_sql)) + ")"
    )
    sql["doc_quality_filter"] = _sql_part_union(
        [("gate", sql.pop("doc_quality_filter"),
          {"doc_id", "keep", "reasons_csv"}),
         (None, _clf_sql, {"doc_id", "k", "v", "y", "pred"})],
        _DOC_QF_SCHEMA,
    )
    sql["rel_agg"] = _sql_part_union(
        [("win", sql.pop("rel_windows"),
          {"l_orderkey", "l_linenumber", "rk", "offset_shift"}),
         ("agg", sql.pop("rel_grouped_agg"),
          {"l_returnflag", "l_linestatus", "sum_qty", "sum_price",
           "n_rows", "p50", "p95"})],
        _REL_AGG_SCHEMA,
    )
    sql["rel_joins"] = _sql_part_union(
        [(None, sql.pop("rel_broadcast_join"),
          {"name", "n", "sum_price"}),
         ("asof", sql.pop("rel_asof_join"),
          {"event_id", "user_id", "click_event_id", "click_value"}),
         (None, sql.pop("rel_range_join"), {"a", "b"})],
        _REL_JOINS_SCHEMA,
    )
    sql["rel_shapes"] = _sql_part_union(
        [(None, sql.pop("rel_cube_stats"),
          {"lang", "source", "n_docs", "sum_chars"}),
         ("pivot", sql.pop("rel_pivot"),
          {"l_linestatus", "A", "N", "R"})],
        _REL_SHAPES_SCHEMA,
    )
    sql["rel_events"] = _sql_part_union(
        [(None, sql.pop("rel_events_agg"),
          {"user_id", "key", "n_events", "sum_value"}),
         ("json", sql.pop("rel_json_extract"),
          {"event_type", "n", "sum_k", "avg_k"})],
        _REL_EVENTS_SCHEMA,
    )
    return sql
