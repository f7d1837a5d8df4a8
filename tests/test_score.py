"""Scoring tests (reference R/score.R semantics over families and measures)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from sgdnet_tpu.api.score import auc
from tests.helpers import random_data


def test_gaussian_scores_match_manual():
    x, y = random_data(n=120, p=4, seed=1)
    fit = st.fit(x, y, nlambda=5, dtype=np.float64)
    pred = fit.predict(x)
    np.testing.assert_allclose(fit.score(x, y, "mse"), ((pred - y[:, None]) ** 2).mean(0))
    np.testing.assert_allclose(fit.score(x, y, "mae"), np.abs(pred - y[:, None]).mean(0))
    np.testing.assert_allclose(fit.score(x, y, "deviance"), fit.score(x, y, "mse"))


def test_binomial_deviance_and_class():
    x, y = random_data(n=150, p=4, family="binomial", seed=2)
    fit = st.fit(x, y, family="binomial", nlambda=6, dtype=np.float64)
    dev = fit.score(x, y, "deviance")
    cls = fit.score(x, y, "class")
    assert np.all(dev > 0)
    assert np.all((cls >= 0) & (cls <= 1))
    # error should not increase as penalty decreases (training data)
    assert dev[-1] <= dev[0] + 1e-10


def test_binomial_auc():
    x, y = random_data(n=200, p=4, family="binomial", seed=3)
    fit = st.fit(x, y, family="binomial", nlambda=6, dtype=np.float64)
    a = fit.score(x, y, "auc")
    assert np.all((a >= 0) & (a <= 1))
    assert a[-1] > 0.7  # informative fit beats chance on train data


def test_auc_function_known_value():
    y = np.array([0, 0, 1, 1])
    prob = np.array([0.1, 0.4, 0.35, 0.8])
    # hand-computed ROC AUC = 0.75
    assert auc(y, prob) == pytest.approx(0.75)
    assert auc(y, np.array([0.0, 0.1, 0.8, 0.9])) == 1.0


def test_multinomial_scores():
    x, y = random_data(n=150, p=4, family="multinomial", n_classes=3, seed=4)
    fit = st.fit(x, y, family="multinomial", nlambda=5, dtype=np.float64)
    for m in ["deviance", "mse", "mae", "class"]:
        s = fit.score(x, y, m)
        assert s.shape == (5,)
        assert np.isfinite(s).all()
    with pytest.raises(ValueError, match="auc"):
        fit.score(x, y, "auc")


def test_mgaussian_scores():
    x, y = random_data(n=120, p=4, family="mgaussian", seed=5)
    fit = st.fit(x, y, family="mgaussian", nlambda=5, dtype=np.float64)
    pred = fit.predict(x)  # (n, 2, nl)
    mse = fit.score(x, y, "mse")
    np.testing.assert_allclose(mse, ((pred - y[:, :, None]) ** 2).sum(1).mean(0))


def test_score_at_interpolated_lambda():
    x, y = random_data(n=100, p=4, seed=6)
    fit = st.fit(x, y, nlambda=8, dtype=np.float64)
    s_mid = np.sqrt(fit.lambda_[3] * fit.lambda_[4])
    val = fit.score(x, y, "mse", s=s_mid)
    assert val.shape == (1,)
    lo = min(fit.score(x, y, "mse", s=fit.lambda_[3])[0], fit.score(x, y, "mse", s=fit.lambda_[4])[0])
    hi = max(fit.score(x, y, "mse", s=fit.lambda_[3])[0], fit.score(x, y, "mse", s=fit.lambda_[4])[0])
    assert lo - 1e-9 <= val[0] <= hi + 0.01


def test_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(9)
    y = (rng.random(300) < 0.4).astype(int)
    prob = np.clip(0.4 * y + 0.3 * rng.random(300) + 0.2, 0, 1)
    assert auc(y, prob) == pytest.approx(roc_auc_score(y, prob), abs=1e-10)
