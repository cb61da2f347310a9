"""Linking-quality scorer (the reference's scoring harness analogue,
utils/scoring/score_wned.py + dp.py): run the fused plan over a corpus with
golden links and print accuracy / precision / recall as one JSON line.

Usage: python tools/score_links.py [fixture_dir] [n_docs]
Defaults to the committed 200-doc corpus; pass a doc count to score a larger
regenerated corpus (e.g. 5000).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def score(fixture_dir: str, master: str = "local[16]") -> dict:
    import duckdb

    from entity_extraction_svc_spark.plans.fused import build_fused
    from entity_extraction_svc_spark.session import get_spark

    spark = get_spark(app_name="score-links", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    linked, _ = build_fused(spark, pages, fixture_dir)
    top1 = {
        (r.url, r.start, r.end): r.qid
        for r in linked.filter("rank = 0 and qid is not null").collect()
    }
    gold = {
        (u, s, e): q
        for (u, s, e, q) in duckdb.sql(
            f'select url, start, "end", qid from \'{fixture_dir}/golden_links.parquet\''
        ).fetchall()
    }
    url_lang = dict(duckdb.sql(
        f"select url, lang from '{fixture_dir}/pages.parquet'"
    ).fetchall())

    def _row(gold_d: dict, top_d: dict) -> dict:
        tp = sum(1 for k, q in gold_d.items() if top_d.get(k) == q)
        span_hits = sum(1 for k in gold_d if k in top_d)
        return {
            "n_gold": len(gold_d),
            "n_predicted": len(top_d),
            "true_positives": tp,
            "precision": round(tp / len(top_d), 4) if top_d else 0.0,
            "recall": round(tp / len(gold_d), 4) if gold_d else 0.0,
            "span_recall": round(span_hits / len(gold_d), 4) if gold_d else 0.0,
            "target": 0.95,
            "pass": bool(top_d and gold_d and tp / len(top_d) >= 0.95
                         and tp / len(gold_d) >= 0.95),
        }

    out = _row(gold, top1)
    # per-language slices (BASELINE cites EN/RU sample docs)
    out["by_lang"] = {
        L: _row(
            {k: v for k, v in gold.items() if url_lang.get(k[0]) == L},
            {k: v for k, v in top1.items() if url_lang.get(k[0]) == L},
        )
        for L in sorted({url_lang.get(k[0], "en") for k in gold})
    }
    return out


def main() -> None:
    fixture_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "fixtures")
    if len(sys.argv) > 2:
        from entity_extraction_svc_spark.fixtures import ensure_fixtures

        n = int(sys.argv[2])
        fixture_dir = f"/tmp/kg_score_fixtures_{n}"
        ensure_fixtures(fixture_dir, n)
    print(json.dumps(score(fixture_dir)))


if __name__ == "__main__":
    main()
