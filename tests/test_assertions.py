"""Input validation tests (reference tests/testthat/test-assertions.R)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data

X, Y = random_data(n=30, p=3, seed=1)


def test_mismatched_rows():
    with pytest.raises(ValueError, match="must match"):
        st.fit(X, Y[:-1])


def test_empty_inputs():
    with pytest.raises(ValueError):
        st.fit(np.zeros((0, 3)), np.zeros(0))


def test_nan_rejected():
    y_bad = Y.copy()
    y_bad[0] = np.nan
    with pytest.raises(ValueError, match="NA values"):
        st.fit(X, y_bad)
    x_bad = X.copy()
    x_bad[0, 0] = np.nan
    with pytest.raises(ValueError, match="NA values"):
        st.fit(x_bad, Y)


def test_alpha_range():
    for bad in [-0.1, 1.1]:
        with pytest.raises(ValueError, match="alpha"):
            st.fit(X, Y, alpha=bad)


def test_negative_lambda():
    with pytest.raises(ValueError, match="positive"):
        st.fit(X, Y, lambda_path=[-1.0])


def test_zero_length_lambda():
    with pytest.raises(ValueError, match="zero length"):
        st.fit(X, Y, nlambda=0)


def test_negative_thresh():
    with pytest.raises(ValueError, match="negative"):
        st.fit(X, Y, thresh=-1.0)


def test_bad_maxit():
    with pytest.raises(ValueError, match="iterations"):
        st.fit(X, Y, maxit=0)


def test_unknown_family():
    with pytest.raises(ValueError, match="family"):
        st.fit(X, Y, family="poisson")


def test_bad_sample_weight():
    with pytest.raises(ValueError, match="sample_weight"):
        st.fit(X, Y, sample_weight=np.ones(5))
    with pytest.raises(ValueError, match="nonnegative"):
        st.fit(X, Y, sample_weight=-np.ones(30))
