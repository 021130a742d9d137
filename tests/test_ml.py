"""Unit tests for the ML operator family's edge paths that the oracle
harness doesn't exercise: the MIN_TRAIN null-row guard, AR(1) recovery
of a known process, and the sentiment-math invariants."""

import math

import pandas as pd
import pytest

from big_data_crypto_sentiment_spark.queries.ml import (
    HOLDOUT,
    MIN_TRAIN,
    _ar1_train,
    _ar_train,
    _yule_walker,
)


def _grid(values, sym="ETH"):
    return pd.DataFrame({
        "event_type": sym,
        "bucket": pd.date_range("2024-01-01", periods=len(values), freq="h"),
        "value_ffill": values,
    })


def test_ar1_short_series_returns_null_row():
    out = _ar1_train(_grid([1.0] * (MIN_TRAIN + HOLDOUT)))
    assert len(out) == 1
    assert out["phi"].iloc[0] is None
    assert out["n_train"].iloc[0] == MIN_TRAIN + HOLDOUT


def test_ar1_recovers_known_phi():
    # exactly alternating series: x_t = mu + a·(−1)^t is AR(1) with φ = −1
    # (train length 188 is even → the train mean is exactly mu, the lag
    # regression is exactly −1, and the holdout forecast is exact)
    mu, a = 10.0, 2.0
    xs = [mu + a * (1 if t % 2 == 0 else -1) for t in range(200)]
    out = _ar1_train(_grid(xs))
    assert out["phi"].iloc[0] == pytest.approx(-1.0, abs=1e-9)
    assert out["mu"].iloc[0] == pytest.approx(mu, abs=1e-9)
    assert out["mae"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_ar1_constant_series_zero_denominator():
    out = _ar1_train(_grid([5.0] * 200))
    assert out["phi"].iloc[0] == 0.0
    assert out["mae"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_yule_walker_recovers_ar2_and_ar3_coefficients():
    """The YW normal-equation solve must recover the generating
    coefficients of seeded synthetic AR(p) series (the accuracy pin for
    the order-search trainer's numeric core)."""
    import numpy as np

    def gen(phis, n, seed, sigma=0.5):
        rng = np.random.default_rng(seed)
        x = np.zeros(n + 100)
        for t in range(len(phis), len(x)):
            x[t] = sum(phis[i] * x[t - 1 - i]
                       for i in range(len(phis))) + rng.normal(0, sigma)
        return x[100:]

    for phis, seed in [([0.6, -0.3], 7), ([0.4, -0.3, 0.25], 11)]:
        est = _yule_walker(gen(phis, 4000, seed), len(phis))
        assert est == pytest.approx(phis, abs=0.05), (phis, est)


def test_ar_train_order_search_beats_ar1_on_cycle():
    """A period-3 cycle is AR(2)-representable but impossible for AR(1);
    the holdout search must pick an order >= 2 and forecast it nearly
    exactly (deterministic input, deterministic search)."""
    xs = [50.0 + [2.0, -1.0, -1.0][t % 3] for t in range(300)]
    out = _ar_train(_grid(xs))
    r = out.iloc[0]
    assert r["chosen_p"] >= 2
    assert r["mu"] == pytest.approx(50.0, abs=1e-9)
    assert r["mae"] < 0.1        # near-exact; an AR(1) fit is off by O(1)
    assert r["n_train"] == 300 - HOLDOUT


def test_ar_train_constant_series_returns_null_row():
    """Constant train series → singular YW matrix for every p; the
    trainer must emit the null-metrics row, not crash the job."""
    out = _ar_train(_grid([5.0] * 200))
    r = out.iloc[0]
    assert r["chosen_p"] is None and r["phi"] is None
    assert r["mae"] is None
    assert r["mu"] == pytest.approx(5.0)
    assert r["n_train"] == 200 - HOLDOUT


def test_ar_train_short_series_returns_null_row():
    out = _ar_train(_grid([1.0, 2.0] * ((MIN_TRAIN + HOLDOUT) // 2)))
    assert out["chosen_p"].iloc[0] is None
    assert out["n_train"].iloc[0] == MIN_TRAIN + HOLDOUT


def test_sentiment_math_invariants(spark):
    from big_data_crypto_sentiment_spark.queries.ml import q_ml_sentiment
    df = q_ml_sentiment(spark, "/root/testdata/sf0.001").toPandas()
    ok = df[df["sentiment_score"].notna()]
    assert (ok["sentiment_score"].abs() <= 1.0 + 1e-12).all()
    assert ((ok["sentiment_magnitude"] >= 0) &
            (ok["sentiment_magnitude"] <= 1.0 + 1e-12)).all()
    buys = ok[ok["action_signal"] == "buy"]
    assert (buys["sentiment_score"] > 0).all()
    assert set(ok["sentiment_label"]) <= {"POSITIVE", "NEUTRAL", "NEGATIVE"}
    # null-input path produces a fully-null sentiment row
    nulls = df[df["sentiment_score"].isna()]
    if len(nulls):
        assert nulls["sentiment_label"].isna().all()
        assert nulls["action_signal"].isna().all()


def _gen_arma(phis, thetas, n, seed, sigma=0.5):
    import numpy as np
    rng = np.random.default_rng(seed)
    p, q = len(phis), len(thetas)
    burn = 200
    e = rng.normal(0, sigma, n + burn)
    x = np.zeros(n + burn)
    for t in range(max(p, q), len(x)):
        x[t] = (sum(phis[i] * x[t - 1 - i] for i in range(p))
                + e[t]
                + sum(thetas[j] * e[t - 1 - j] for j in range(q)))
    return x[burn:]


def test_hannan_rissanen_recovers_arma11_and_arma22():
    """The two-stage HR closed form must recover the generating (phi,
    theta) of seeded synthetic ARMA series at the true order — the
    numeric-core pin for the MA-side order search (the reference's
    auto_arima max_q=5 analog)."""
    import pytest as pt

    from big_data_crypto_sentiment_spark.queries.ml import _hannan_rissanen

    cases = [
        (([0.6], [0.4]), 3),
        (([0.5, -0.25], [0.4, 0.2]), 5),
    ]
    for (phis, thetas), seed in cases:
        x = _gen_arma(phis, thetas, 20000, seed)
        phi, theta, _ = _hannan_rissanen(x - x.mean(),
                                         len(phis), len(thetas))
        assert phi == pt.approx(phis, abs=0.1), (phis, phi)
        assert theta == pt.approx(thetas, abs=0.1), (thetas, theta)


def test_arma_train_selects_and_forecasts_on_ma_series():
    """On a pure MA(1) series the search must return a finite fit with
    some order (holdout-MAE selection may legitimately pick a long-AR
    approximation of the MA process — beyond lag q an iterated MA
    forecast is just mu, so q >= 1 is not guaranteed to win the
    holdout; the theta-recovery accuracy is pinned separately on
    _hannan_rissanen at the true order)."""
    from big_data_crypto_sentiment_spark.queries.ml import _arma_train

    x = _gen_arma([], [0.8], 600, seed=9) + 100.0
    out = _arma_train(_grid(list(x)))
    r = out.iloc[0]
    assert (r["chosen_p"] or 0) + (r["chosen_q"] or 0) >= 1
    assert r["mu"] == pytest.approx(100.0, abs=0.5)
    assert r["mae"] is not None and r["mae"] < 2.0


def test_arma_train_constant_and_short_series_null_rows():
    from big_data_crypto_sentiment_spark.queries.ml import _arma_train

    const = _arma_train(_grid([5.0] * 200)).iloc[0]
    # constant series: lstsq yields all-zero coefficients and an exact
    # forecast, OR degenerates to the null row — either way no crash and
    # no spurious error metrics
    assert const["mae"] is None or const["mae"] == pytest.approx(0.0, abs=1e-6)
    short = _arma_train(_grid([1.0, 2.0] * ((MIN_TRAIN + HOLDOUT) // 2)))
    assert short["chosen_p"].iloc[0] is None
    assert short["n_train"].iloc[0] == MIN_TRAIN + HOLDOUT


def test_arma_cv_expanding_folds_and_min_train_gate():
    """Expanding-window CV contract: fold k trains on everything
    strictly before its HOLDOUT-sized test block (monotonically
    growing n_train, no future leakage by construction), and any fold
    whose train slice has < MIN_TRAIN points is emitted gated with
    null metrics — the reference's too-little-history skip
    (analytical_module/arima.py's >=50-train-points gate) made
    visible per fold."""
    from big_data_crypto_sentiment_spark.queries.ml import (
        ARMA_CV_FOLDS,
        _arma_cv,
    )

    # series sized so the FIRST fold's train slice falls below
    # MIN_TRAIN but later folds clear it:
    # n = MIN_TRAIN + ARMA_CV_FOLDS*HOLDOUT - 1 -> fold-1 train =
    # MIN_TRAIN - 1 (gated), fold-2 train = MIN_TRAIN - 1 + HOLDOUT
    n = MIN_TRAIN + ARMA_CV_FOLDS * HOLDOUT - 1
    x = _gen_arma([0.7], [], n, seed=3) + 50.0
    out = _arma_cv(_grid(list(x)))
    folds = out[out["fold"] != "mean"].sort_values("fold")
    assert len(folds) == ARMA_CV_FOLDS
    trains = folds["n_train"].tolist()
    assert trains == sorted(trains)                      # expanding
    assert trains[1] - trains[0] == HOLDOUT              # by one block
    g1 = folds.iloc[0]
    assert g1["n_train"] == MIN_TRAIN - 1 and bool(g1["gated"])
    assert pd.isna(g1["mae"])                            # gate: no metric
    ungated = folds[~folds["gated"]]
    assert len(ungated) == ARMA_CV_FOLDS - 1
    assert (ungated["n_train"] >= MIN_TRAIN).all()
    assert ungated["mae"].notna().all()
    # mean row aggregates only the ungated folds
    mean = out[out["fold"] == "mean"].iloc[0]
    assert mean["n_train"] == ungated["n_train"].sum()
    assert mean["mae"] == pytest.approx(
        round(ungated["mae"].mean(), 6), abs=1e-9)


def test_arma_cv_all_gated_short_series_has_no_mean_row():
    from big_data_crypto_sentiment_spark.queries.ml import _arma_cv

    out = _arma_cv(_grid([1.0, 2.0] * 10))
    assert out["gated"].all()
    assert "mean" not in set(out["fold"])


# --- r13: auto-ARIMA analog (KPSS d-selection + AIC stepwise walk) ---
def _ar1(n, phi, sigma, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + rng.normal(0, sigma)
    return x


def test_kpss_d_selection_recovers_integration_order():
    import numpy as np
    from big_data_crypto_sentiment_spark.queries.ml import _select_d
    stat = _ar1(400, 0.5, 1.0, 1)
    assert _select_d(stat) == 0
    walk = np.cumsum(_ar1(400, 0.3, 1.0, 2))          # I(1)
    assert _select_d(walk) == 1
    walk2 = np.cumsum(np.cumsum(_ar1(400, 0.2, 1.0, 3)))  # I(2)
    assert _select_d(walk2) == 2


def test_stepwise_walk_finds_ar_order_and_prunes_grid():
    import numpy as np
    from big_data_crypto_sentiment_spark.queries.ml import _stepwise_arma
    x = _ar1(600, 0.8, 1.0, 4)
    p, q, phi, theta, resid, aic, n_fits = _stepwise_arma(x - x.mean())
    # AR(1) signal: the AIC walk lands on a small order dominated by
    # the first AR lag, and visits a fraction of the 36-point grid
    assert p >= 1
    assert abs(phi[0] - 0.8) < 0.15
    assert n_fits < 20
    assert np.isfinite(aic)


def test_auto_arima_forecasts_integrated_series(spark):
    """End-to-end: an I(1) series through the applyInPandas trainer —
    d recovered, forecast integrated back to the level scale (a naive
    unintegrated forecast of a random walk far from 0 would miss by
    the full level magnitude)."""
    import numpy as np
    import pandas as pd
    from big_data_crypto_sentiment_spark.queries.ml import (
        HOLDOUT,
        auto_arima_train,
    )
    n = 300
    # white-noise increments: an unambiguous I(1) (autocorrelated
    # increments sit near KPSS's designed 5% false-reject band and can
    # legitimately over-difference — the direct _select_d pin covers
    # the statistical recovery; this test pins the PLUMBING)
    rng = np.random.default_rng(5)
    level = 1000.0 + np.cumsum(rng.normal(0, 1.0, n))
    pdf = pd.DataFrame({
        "event_type": ["walk"] * n,
        "bucket": pd.date_range("2024-01-01", periods=n, freq="h"),
        "value_ffill": level,
    })
    out = auto_arima_train(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.chosen_d == 1
    assert r.n_fits is not None and r.n_fits < 20
    # forecast stays on the level scale: MAE within a few innovation
    # sigmas, nowhere near the ~1000 a non-integrated forecast gives
    assert r.mae is not None and r.mae < 20
    assert r.mse is not None and r.aic is not None


def test_integrate_forecast_inverts_diff():
    import numpy as np
    from big_data_crypto_sentiment_spark.queries.ml import (
        _integrate_forecast,
    )
    rng = np.random.default_rng(6)
    full = np.cumsum(np.cumsum(rng.normal(0, 1, 60)))
    for d in (0, 1, 2):
        train, future = full[:50], full[50:]
        fc_diff = np.diff(full, n=d)[50 - d:] if d else future
        got = _integrate_forecast(train, fc_diff, d)
        assert np.allclose(got, future), d
