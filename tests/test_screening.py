"""Strong-rule screening tests (solver/screening.py — a north-star subsystem
absent in the reference)."""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data


def test_screened_matches_unscreened():
    """Screening is exact (KKT-checked): same coefficients as the full fit."""
    rng = np.random.default_rng(0)
    n, p = 200, 400  # wide: most features inactive along the path
    x = rng.normal(size=(n, p))
    beta = np.zeros(p)
    beta[:8] = rng.normal(size=8) * 2
    y = x @ beta + 0.5 * rng.normal(size=n)

    full = st.fit(x, y, nlambda=12, thresh=1e-6, maxit=2000, dtype=np.float64)
    scr = st.fit(
        x, y, lambda_path=full.lambda_, thresh=1e-6, maxit=2000, dtype=np.float64, screen=True
    )
    scale = max(1.0, np.abs(full.beta).max())
    np.testing.assert_allclose(scr.beta, full.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(scr.a0, full.a0, atol=5e-3 * scale)
    np.testing.assert_allclose(scr.dev_ratio, full.dev_ratio, atol=1e-3)


def test_screened_binomial():
    x, y = random_data(n=150, p=120, family="binomial", seed=1)
    full = st.fit(x, y, family="binomial", nlambda=8, thresh=1e-6, maxit=2000, dtype=np.float64)
    scr = st.fit(
        x, y, family="binomial", lambda_path=full.lambda_, thresh=1e-6, maxit=2000,
        dtype=np.float64, screen=True,
    )
    scale = max(1.0, np.abs(full.beta).max())
    np.testing.assert_allclose(scr.beta, full.beta, atol=2e-3 * scale)


def test_screen_rejects_unsupported():
    x, y = random_data(n=50, p=10, seed=2)
    with pytest.raises(ValueError, match="screen=True"):
        st.fit(x, y, alpha=0.0, screen=True, dtype=np.float64)
