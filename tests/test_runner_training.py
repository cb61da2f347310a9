"""runner.py --emit-training: distant-supervision emission wired
end-to-end from the batch run's own linked output."""

from __future__ import annotations

from entity_extraction_svc_spark.runner import main


def test_emit_training_end_to_end(spark, fixture_dir, tmp_path):
    out = str(tmp_path / "kg")
    rc = main([
        "--pages", f"{fixture_dir}/pages.parquet",
        "--kb", fixture_dir,
        "--out", out,
        "--emit-training",
    ])
    assert rc == 0
    ner = spark.read.parquet(f"{out}/training/ner")
    rel = spark.read.parquet(f"{out}/training/rel")
    # the pipeline's top-1 links equal the goldens (P/R=1.0), so the
    # emitted supervision matches the fixture-based driver rows
    n_b = ner.filter("bio like 'B-%'").count()
    n_gold = spark.read.parquet(
        f"{fixture_dir}/golden_mentions.parquet").count()
    assert 0 < n_b <= n_gold and n_b >= n_gold * 0.95
    assert ner.filter("bio = 'O'").count() > 0
    labels = {r.label for r in rel.select("label").distinct().collect()}
    assert "NO_REL" in labels and len(labels) > 1


def test_emit_training_refused_under_resume(tmp_path):
    rc = main([
        "--pages", "x", "--kb", "y", "--out", str(tmp_path / "o"),
        "--resume", "--emit-training",
    ])
    assert rc == 2
