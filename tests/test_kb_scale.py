"""Linker behavior under a KB orders of magnitude larger than the fixture:
20k distractor entities join the index, the broadcast image builds fast,
and linking on the reference payloads still resolves to the golden QIDs
(popularity + connection ranking beat the distractors)."""

from __future__ import annotations

import time

from entity_extraction_svc_spark.operators.linker import link_doc
from entity_extraction_svc_spark.operators.tagger import SoftGazetteerTagger
from entity_extraction_svc_spark.plans.fused import _fine_tag_lookup, link_page
from entity_extraction_svc_spark.fixtures import MONA_LISA_TEXT, build_kb, kb_rows
from entity_extraction_svc_spark.sources.kb import build_linker_dicts


def _distractors(n=20000):
    ents, aliases, triples = [], [], []
    for i in range(n):
        qid = f"Q77{i:06d}"
        label = f"Distract{i:05d} {'Mona' if i % 97 == 0 else 'Entity'}"
        ents.append({
            "qid": qid, "label": label, "num_rels": 1 + i % 7, "tag": "MISC",
            "page": label, "descr": f"{label} is a distractor.",
            "p31": ["Q35120"], "p131": [], "p641": [],
            "image_link": "", "categories": [], "dbpedia_types": [],
        })
        triples.append((qid, "P31", "Q35120"))
        if i % 13 == 0:
            aliases.append({"alias": f"Lisa {i:05d}", "qid": qid,
                            "name_or_alias": "alias"})
    return ents, aliases, triples


def test_large_kb_build_and_link():
    kb = build_kb()
    ent_rows, alias_rows, triple_rows, gaz_rows = kb_rows(kb)
    d_ents, d_aliases, d_triples = _distractors()
    t0 = time.time()
    dicts = build_linker_dicts(
        ent_rows + d_ents, alias_rows + d_aliases,
        [tuple(t.values()) if isinstance(t, dict) else t for t in
         ([(r["subj"], r["pred"], r["obj"]) for r in triple_rows] + d_triples)],
    )
    build_sec = time.time() - t0
    assert build_sec < 30, f"broadcast image build took {build_sec:.1f}s"
    assert len(dicts.entity_ranking_dict) > 20000

    tagger = SoftGazetteerTagger.from_rows(gaz_rows)
    fine = _fine_tag_lookup(gaz_rows)
    rows = link_page(dicts, tagger, fine, "u1", MONA_LISA_TEXT + ".")
    top1 = {r["substr"]: r["qid"] for r in rows if r["rank"] == 0}
    assert top1["mona lisa"] == "Q12418"
    assert top1["leonardo"] == "Q762"
    assert top1["louvre"] == "Q19675"
    assert top1["paris"] == "Q90"
