"""Planted-corpus arms for the r16 contract graduations
(ml_ridge_perm_importance, ml_tfidf_top_terms — the r15 planted-arm
discipline applied to the new pairs): each live-fit flag must FIRE
POSITIVE on structured data where the agreement is unambiguous, and
FLIP TO 0 when its floor is made unsatisfiable — proving the flags
are computed live from the fits, not constant-folded to the oracle's
literal 1."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _planted_events(spark, tmp_path, hours=240):
    """Hourly events where the bucket's own event count EXACTLY
    determines its mean value (value = 5·count for every event in the
    bucket): n_events is a perfect predictor of avg_value, the lag is
    not — so permuting n_events must blow up the MSE while permuting
    prev_n_events barely moves it, for the frozen twin AND the live
    ridge alike."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for et in ("A", "B"):
        for h in range(hours):
            c = 1 + (h * 7 + (0 if et == "A" else 11)) % 23
            # per-bucket noise floor (same for every event in the
            # bucket, so avg_value = 5c + eta exactly): keeps base MSE
            # well away from zero — a relative tolerance on two
            # near-perfect fits would compare rounding dust — and wide
            # enough (±200 vs signal sd ~33) that the live ridge's ~1%
            # regularization shrinkage stays inside the MSE agreement
            # bound while the signal's permutation lift still dwarfs
            # the lag's
            eta = float(((h * 1237) % 41 - 20) * 10)
            for k in range(c):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=k),
                             eid % 97, et, 5.0 * c + eta, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sfev")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_ridge_perm_flags_fire_and_signal_dominates(spark, tmp_path):
    from big_data_crypto_sentiment_spark.queries.ml import (
        q_ml_ridge_perm_importance,
    )
    d = _planted_events(spark, tmp_path)
    out = {r["feature"]: r
           for r in q_ml_ridge_perm_importance(spark, d).collect()}
    assert set(out) == {"n_events", "prev_n_events"}
    # live fit reproduces the frozen closed form on clean planted data
    for r in out.values():
        assert r["live_base_agree"] == 1
        assert r["live_perm_agree"] == 1
    # the planted signal feature's permutation lift dwarfs the lag's:
    # the operator measures real importance, not an artifact
    assert out["n_events"]["delta_mse"] > 100 * max(
        abs(out["prev_n_events"]["delta_mse"]), 1e-9)
    assert out["n_events"]["mse_base"] == out["prev_n_events"]["mse_base"]


def test_ridge_perm_flags_are_live_not_constant(spark, tmp_path,
                                                monkeypatch):
    from big_data_crypto_sentiment_spark.queries import ml as M
    d = _planted_events(spark, tmp_path, hours=120)
    monkeypatch.setattr(M, "RIDGE_PERM_TOL", -1.0)  # unsatisfiable
    out = M.q_ml_ridge_perm_importance(spark, d).collect()
    assert out and all(r["live_base_agree"] == 0
                       and r["live_perm_agree"] == 0 for r in out)


def _planted_documents(spark, tmp_path, n=120):
    """Strongly polar texts over the lexicon anchors plus neutral
    filler drawn from the frozen vocabulary: the live TF-IDF+Ridge fit
    must put the anchors at the coefficient extremes, and every frozen
    term appears often enough to enter the vocabulary."""
    filler = ["table", "join", "merge", "window", "hash", "stream",
              "query", "filter", "vector", "column", "batch", "data"]
    rows = []
    for i in range(n):
        extra = f"{filler[i % 12]} {filler[(i + 5) % 12]}"
        if i % 3 == 0:
            text = f"fast big fast big market {extra}"
        elif i % 3 == 1:
            text = f"slow small slow small market {extra}"
        else:
            text = f"market update number {extra}"
        rows.append((i, text, "en", "src0"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df = df.withColumn("n_chars", F.length("text"))
    d = str(tmp_path / "sfdocs")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_tfidf_top_terms_flags_fire_on_polar_corpus(spark, tmp_path):
    from big_data_crypto_sentiment_spark.queries.ml import (
        TFIDF_FROZEN_VOCAB,
        q_ml_tfidf_top_terms,
    )
    d = _planted_documents(spark, tmp_path)
    out = q_ml_tfidf_top_terms(spark, d).collect()
    assert len(out) == len(TFIDF_FROZEN_VOCAB)
    # ranks are a permutation of 1..16; anchors carry the top ranks
    assert sorted(r["rank"] for r in out) == list(range(1, 17))
    by_term = {r["term"]: r for r in out}
    assert {t for t, r in by_term.items() if r["rank"] <= 4} == \
        {"fast", "big", "slow", "small"}
    assert by_term["fast"]["sign"] == "pos"
    assert by_term["slow"]["sign"] == "neg"
    # live fit on the cleanly polar corpus: both flags fire
    for r in out:
        assert r["live_in_topk_ge_min"] == 1
        assert r["live_anchors_extreme"] == 1


def test_tfidf_top_terms_flags_are_live_not_constant(spark, tmp_path,
                                                     monkeypatch):
    from big_data_crypto_sentiment_spark.queries import ml as M
    d = _planted_documents(spark, tmp_path, n=90)
    monkeypatch.setattr(M, "TFIDF_TT_MIN_IN_TOPK", 17)   # > 16 terms
    monkeypatch.setattr(M, "TFIDF_TT_ANCHOR_MARGIN", 1e9)
    out = M.q_ml_tfidf_top_terms(spark, d).collect()
    assert out and all(r["live_in_topk_ge_min"] == 0
                       and r["live_anchors_extreme"] == 0 for r in out)
