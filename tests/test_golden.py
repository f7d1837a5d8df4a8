"""Stored golden oracle paths (reference tests/testthat/setup.R:56-100).

The reference pins correctness by comparing same-input fits against glmnet
at 1e-3.  tools/gen_golden.py computed f64 sklearn oracle paths ONCE for
the four bundled datasets over the alpha x standardize grid and checked
them in as tests/golden/*.npz; these tests assert our fits reproduce them —
the durable, fast form of the 1e-3 coefficient contract (SURVEY §4(b)).
"""

import os

import numpy as np
import pytest

import sgdnet_tpu as st
from sgdnet_tpu.data import load_abalone, load_heart, load_student, load_wine

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

COMMON = dict(thresh=1e-6, maxit=5000, dtype=np.float64)


def _check(fit, g, key, skip, atol_scale=2e-3):
    lam_g = g[f"{key}_lambda"]
    np.testing.assert_allclose(fit.lambda_, lam_g, rtol=1e-8)
    beta_g = g[f"{key}_a0"], g[f"{key}_beta"]
    a0_g, beta_g = beta_g
    beta = fit.beta[skip:]
    a0 = np.asarray(fit.a0)[skip:]
    if beta_g.ndim == 2:  # single-response: (nl, p)
        beta = beta[:, 0, :]
    scale = max(1.0, np.abs(beta_g).max())
    np.testing.assert_allclose(beta, beta_g, atol=atol_scale * scale)
    np.testing.assert_allclose(a0, a0_g, atol=atol_scale * max(1.0, np.abs(a0_g).max()))


@pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0])
@pytest.mark.parametrize("std", [True, False])
def test_abalone_golden(alpha, std):
    g = np.load(os.path.join(GOLDEN, "abalone.npz"))
    x, y = load_abalone()
    fit = st.fit(x, y, alpha=alpha, nlambda=10, standardize=std, **COMMON)
    _check(fit, g, f"a{alpha}_s{int(std)}", skip=1 if alpha == 0.0 else 0)


@pytest.mark.parametrize("alpha", [0.0, 1.0])
def test_heart_golden(alpha):
    g = np.load(os.path.join(GOLDEN, "heart.npz"))
    x, y = load_heart()
    fit = st.fit(x, y, family="binomial", alpha=alpha, nlambda=8, **COMMON)
    _check(fit, g, f"a{alpha}_s1", skip=1 if alpha == 0.0 else 0)


@pytest.mark.parametrize("alpha", [0.0, 1.0])
def test_wine_golden(alpha):
    g = np.load(os.path.join(GOLDEN, "wine.npz"))
    x, y = load_wine()
    fit = st.fit(x, y, family="multinomial", alpha=alpha, nlambda=6,
                 lambda_min_ratio=0.05, **COMMON)
    key = f"a{alpha}_s1"
    skip = int(g[f"{key}_skip"])
    lam_g = g[f"{key}_lambda"]
    np.testing.assert_allclose(fit.lambda_, lam_g, rtol=1e-8)
    beta_g, a0_g = g[f"{key}_beta"], g[f"{key}_a0"]
    scale = max(1.0, np.abs(beta_g).max())
    np.testing.assert_allclose(fit.beta[skip:], beta_g, atol=2e-3 * scale)
    np.testing.assert_allclose(fit.a0[skip:], a0_g, atol=5e-3 * max(1.0, np.abs(a0_g).max()))


@pytest.mark.parametrize("alpha", [0.5, 1.0])
def test_student_golden(alpha):
    g = np.load(os.path.join(GOLDEN, "student.npz"))
    x, y = load_student()
    fit = st.fit(x, y, family="mgaussian", alpha=alpha, nlambda=8, **COMMON)
    _check(fit, g, f"a{alpha}_s1", skip=1)
