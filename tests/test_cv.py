"""Cross-validation tests (reference tests/testthat/test-cross-validation.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data


def test_cv_gaussian_basic():
    x, y = random_data(n=200, p=6, seed=1)
    cv = st.cv_fit(x, y, nfolds=5, nlambda=10, dtype=np.float64)
    assert cv.lambda_min > 0
    assert cv.lambda_1se >= cv.lambda_min
    assert cv.fit.family == "gaussian"
    assert cv.cv_raw[0].shape == (5, 10)
    assert np.isfinite(cv.cv_summary["mean"]).all()


def test_cv_alpha_grid():
    """Multiple alphas; optimum selected across the grid
    (reference R/cv_sgdnet.R:217-226)."""
    x, y = random_data(n=150, p=5, seed=2)
    cv = st.cv_fit(x, y, alpha=[0.0, 1.0], nfolds=4, nlambda=8, dtype=np.float64)
    assert cv.alpha_min in (0.0, 1.0)
    assert len(cv.fits) == 2
    assert cv.fit is cv.fits[[0.0, 1.0].index(cv.alpha_min)]


@pytest.mark.parametrize("measure", ["deviance", "mse", "mae", "class", "auc"])
def test_cv_binomial_measures(measure):
    """Every score type works for binomial
    (reference test-cross-validation.R:13-27)."""
    x, y = random_data(n=150, p=4, family="binomial", seed=3)
    cv = st.cv_fit(x, y, family="binomial", nfolds=4, nlambda=6, type_measure=measure, dtype=np.float64)
    assert np.isfinite(cv.lambda_min)
    if measure == "auc":
        assert cv.name == "AUC"


def test_cv_predict_at_selected_lambda():
    x, y = random_data(n=150, p=5, seed=4)
    cv = st.cv_fit(x, y, nfolds=4, nlambda=8, dtype=np.float64)
    p_min = cv.predict(x, s="lambda_min")
    p_1se = cv.predict(x, s="lambda_1se")
    assert p_min.shape == (150, 1)
    assert p_1se.shape == (150, 1)
    c = cv.coef()
    assert c.shape == (1, 6)


def test_cv_fold_errors():
    x, y = random_data(n=30, p=3, seed=5)
    with pytest.raises(ValueError, match="folds than samples"):
        st.cv_fit(x, y, nfolds=31, dtype=np.float64)
    with pytest.raises(ValueError, match="greater than 2"):
        st.cv_fit(x, y, nfolds=2, dtype=np.float64)
    with pytest.raises(ValueError, match="list of lambdas"):
        st.cv_fit(x, y, alpha=[0.1, 0.9], lambda_path=[0.1, 0.01], dtype=np.float64)


def test_cv_explicit_foldid():
    x, y = random_data(n=100, p=4, seed=6)
    foldid = np.arange(100) % 4
    cv = st.cv_fit(x, y, foldid=foldid, nlambda=6, dtype=np.float64)
    assert cv.cv_raw[0].shape[0] == 4
