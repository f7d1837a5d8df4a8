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


@pytest.mark.parametrize("layout", ["csr", "hybrid"])
def test_screened_sparse_layouts(layout):
    """Round-2 generalization (VERDICT item 4): screening on PaddedCSR /
    HybridCSR designs — exactly the layouts where it pays — matches the
    unscreened fit, and the active set actually shrinks."""
    import scipy.sparse as sp

    rng = np.random.default_rng(5)
    n, p = 250, 800
    x = (rng.random((n, p)) < 0.05) * rng.normal(size=(n, p))
    beta = np.zeros(p)
    beta[:6] = rng.normal(size=6) * 3
    y = x @ beta + 0.3 * rng.normal(size=n)
    xs = sp.csr_matrix(x)
    hybrid = layout == "hybrid"
    common = dict(nlambda=10, thresh=1e-6, maxit=2000, dtype=np.float64, hybrid=hybrid)
    full = st.fit(xs, y, **common)
    scr = st.fit(xs, y, lambda_path=full.lambda_, screen=True, **common)
    scale = max(1.0, np.abs(full.beta).max())
    np.testing.assert_allclose(scr.beta, full.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(scr.a0, full.a0, atol=5e-3 * scale)
    assert scr.stats["screening"]["mean_active"] < 0.6 * p


def test_screened_penalty_factors_and_box():
    """Screening honors penalty factors (pf=0 always active; thresholds
    scale per-feature), box limits, and exclusions."""
    rng = np.random.default_rng(6)
    n, p = 200, 300
    x = rng.normal(size=(n, p))
    beta = np.zeros(p)
    beta[:5] = [2.0, -1.5, 1.0, -0.8, 0.6]
    y = x @ beta + 0.4 * rng.normal(size=n)
    pf = np.ones(p)
    pf[0] = 0.0  # unpenalized: must always be active
    pf[5] = 4.0
    kw = dict(
        nlambda=8, thresh=1e-6, maxit=2000, dtype=np.float64,
        penalty_factor=pf, lower_limits=-1.2, upper_limits=1.2, exclude=[7],
    )
    full = st.fit(x, y, **kw)
    scr = st.fit(x, y, lambda_path=full.lambda_, screen=True, **kw)
    scale = max(1.0, np.abs(full.beta).max())
    np.testing.assert_allclose(scr.beta, full.beta, atol=2e-3 * scale)
    assert np.all(scr.beta[:, :, 7] == 0.0)
    assert np.abs(scr.beta).max() <= 1.2 + 1e-9
