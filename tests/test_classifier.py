"""Fixed-point distributed classifier training (operators/classifier.py)."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from entity_extraction_svc_spark.operators.classifier import (
    FEATURES,
    SCALE,
    _class_weights,
    quality_features,
    score_linear,
    train_linear,
    train_oracle_sql,
)

_COLS = "id string, x_bias long, x_len long, x_punct long, x_stop long, x_toklen long, y long"


def _synth_rows(n=240):
    rows = []
    for i in range(n):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        xl = (h % 400) * 2500
        xp = (h // 7) % 200000
        xs = (h // 13) % 300000
        xt = ((h // 17) % 100) * 10000
        y = 1 if (xl > 500000 and xp < 150000) else 0
        rows.append((f"d{i}", SCALE, xl, xp, xs, xt, y))
    return rows


def test_weights_and_scores_match_oracle_bit_for_bit(spark):
    rows = _synth_rows()
    feats = spark.createDataFrame(rows, _COLS)
    w = train_linear(feats, iters=6, lr_den=2)
    got = sorted(map(tuple, score_linear(feats, w).collect()))
    con = duckdb.connect()
    con.register("clf_in", pd.DataFrame(
        rows, columns=["id"] + FEATURES + ["y"]))
    ora = con.sql(train_oracle_sql("SELECT * FROM clf_in", iters=6,
                                   lr_den=2)).df()
    ow = {r.k: int(r.v) for _, r in ora[ora.part == "w"].iterrows()}
    assert ow == dict(zip(FEATURES, w))
    want = sorted((r.k, int(r.v), int(r.y), int(r.pred))
                  for _, r in ora[ora.part == "score"].iterrows())
    assert got == want


def test_training_is_partitioning_invariant(spark):
    """The reproducibility claim itself: same multiset of rows, any
    physical layout, bit-identical weights — the property float-sum GD
    does NOT have."""
    feats = spark.createDataFrame(_synth_rows(), _COLS)
    w1 = train_linear(feats, iters=5)
    w13 = train_linear(feats.repartition(13), iters=5)
    w1p = train_linear(feats.coalesce(1), iters=5)
    assert w1 == w13 == w1p


def test_distillation_learns_the_gate(spark, docs_df=None):
    """On the quality-gate distillation task the balanced model must beat
    the majority-class collapse: both classes predicted, balanced
    accuracy well above 0.5."""
    docs = spark.createDataFrame(
        [(i, ("the of and to in a is that it was for on are with " * 6)
          if i % 5 else "!!!??? ### $$$ %%% ^^^") for i in range(50)],
        "doc_id long, text string")
    feats = quality_features(docs)
    w = train_linear(feats, iters=16, lr_den=2)
    s = score_linear(feats, w)
    tp = s.filter("pred=1 and y=1").count()
    tn = s.filter("pred=0 and y=0").count()
    fn = s.filter("pred=0 and y=1").count()
    fp = s.filter("pred=1 and y=0").count()
    bal = (tp / max(tp + fn, 1) + tn / max(tn + fp, 1)) / 2
    assert bal > 0.9
    assert tp > 0 and tn > 0   # no majority collapse


def test_class_weight_rule():
    assert _class_weights(100, 50) == (1, 1)
    assert _class_weights(100, 91) == (1, 10)   # upweight rare negatives
    assert _class_weights(100, 9) == (10, 1)    # upweight rare positives
    assert _class_weights(100, 0) == (1, 1)
    assert _class_weights(100, 100) == (1, 1)


def test_validation(spark):
    feats = spark.createDataFrame(_synth_rows(4), _COLS)
    with pytest.raises(ValueError):
        train_linear(feats, iters=0)
    with pytest.raises(ValueError):
        train_linear(feats.filter("y = 2"))   # empty frame
