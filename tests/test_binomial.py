"""Binomial family tests (reference tests/testthat/test-binomial.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data, sklearn_logistic


def test_unregularized_matches_glm():
    """Near-zero penalty reproduces unpenalized logistic regression
    (reference test-binomial.R:3-14)."""
    x, y = random_data(n=300, p=3, family="binomial", seed=1)
    fit = st.fit(
        x, y, family="binomial", lambda_path=[1e-7], thresh=1e-7, maxit=5000, dtype=np.float64
    )
    a0_o, beta_o = sklearn_logistic(x, y, 1e-7, mix=1.0)
    np.testing.assert_allclose(fit.beta[0, 0], beta_o, atol=5e-3)
    assert abs(fit.a0[0] - a0_o) < 5e-3


@pytest.mark.parametrize("alpha", [1.0, 0.5, 0.0])
def test_against_sklearn(alpha):
    """Coefficient agreement with the SAGA logistic oracle
    (reference test-binomial.R:16-35 uses glmnet)."""
    x, y = random_data(n=400, p=6, family="binomial", seed=2)
    lam = 0.01
    fit = st.fit(
        x,
        y,
        family="binomial",
        alpha=alpha,
        lambda_path=[lam],
        thresh=1e-7,
        maxit=5000,
        dtype=np.float64,
    )
    a0_o, beta_o = sklearn_logistic(x, y, lam, mix=alpha)
    np.testing.assert_allclose(fit.beta[0, 0], beta_o, atol=2e-3)
    assert abs(fit.a0[0] - a0_o) < 2e-3


def test_class_predictions_and_labels():
    x, y_num = random_data(n=200, p=4, family="binomial", seed=3)
    labels = np.where(y_num > 0.5, "pres", "abs")
    fit = st.fit(x, labels, family="binomial", nlambda=5, dtype=np.float64)
    assert fit.classnames == ["abs", "pres"]
    cls = fit.predict(x, type="class")
    assert set(np.unique(cls)) <= {"abs", "pres"}
    resp = fit.predict(x, type="response")
    assert np.all((resp >= 0) & (resp <= 1))
    # accuracy at the least-penalized end should beat chance
    acc = (cls[:, -1] == labels).mean()
    assert acc > 0.7


def test_heart_dataset():
    from sgdnet_tpu.data import load_heart

    x, y = load_heart()
    fit = st.fit(x, y, family="binomial", nlambda=20, dtype=np.float64)
    assert (fit.return_codes == 0).all()
    assert fit.dev_ratio[-1] > 0.3
    assert fit.classnames == ["absence", "presence"]


def test_errors():
    x, _ = random_data(n=30, p=3, seed=4)
    with pytest.raises(ValueError, match="more than two classes"):
        st.fit(x, np.arange(30) % 3, family="binomial")
    with pytest.raises(ValueError, match="only one class"):
        st.fit(x, np.zeros(30), family="binomial")
    y = np.zeros(30)
    y[0] = 1
    with pytest.raises(ValueError, match="observations"):
        st.fit(x, y, family="binomial")
