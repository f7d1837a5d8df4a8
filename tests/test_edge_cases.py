"""Edge cases and small API contracts."""

import numpy as np
import pytest
import scipy.sparse as sp

import sgdnet_tpu as st
from sgdnet_tpu.core.sparse import PaddedCSR
from tests.helpers import random_data


def test_fit_accepts_padded_csr_directly():
    x, y = random_data(n=100, p=6, density=0.4, seed=1)
    csr = PaddedCSR.from_scipy(sp.csr_matrix(x), dtype=np.float64)
    fit = st.fit(csr, y, nlambda=5, dtype=np.float64)
    fit2 = st.fit(sp.csr_matrix(x), y, nlambda=5, hybrid=False, dtype=np.float64)
    np.testing.assert_allclose(fit.beta, fit2.beta, atol=1e-10)


def test_single_row_prediction():
    x, y = random_data(n=80, p=4, seed=2)
    fit = st.fit(x, y, nlambda=5, dtype=np.float64)
    one = fit.predict(x[0])
    assert one.shape == (1, 5)
    np.testing.assert_allclose(one[0], fit.predict(x)[0], atol=1e-12)


def test_max_iter_reached_return_code():
    x, y = random_data(n=120, p=5, seed=3)
    fit = st.fit(x, y, lambda_path=[1e-6], maxit=2, thresh=1e-12, dtype=np.float64)
    assert fit.return_codes[0] == 1
    # the in-program step backoff retries a suspicious (code-1, large
    # final-change) lambda up to twice at halved steps, and every attempt
    # counts toward npasses: 1-3 attempts x maxit=2 epochs
    assert 2 <= fit.npasses <= 6


def test_feature_names_passthrough():
    x, y = random_data(n=60, p=3, seed=4)
    fit = st.fit(x, y, nlambda=4, feature_names=["a", "b", "c"], dtype=np.float64)
    assert fit.feature_names == ["a", "b", "c"]


def test_jnp_input():
    import jax.numpy as jnp

    x, y = random_data(n=60, p=3, seed=5)
    fit = st.fit(jnp.asarray(x), jnp.asarray(y), nlambda=4, dtype=np.float64)
    assert fit.beta.shape == (4, 1, 3)


def test_nlambda_one():
    x, y = random_data(n=60, p=3, seed=6)
    fit = st.fit(x, y, lambda_path=0.1, dtype=np.float64)
    assert fit.n_lambda == 1
    # interpolation with a single path point
    p1 = fit.predict(x, s=0.05)
    np.testing.assert_allclose(p1, fit.predict(x), atol=1e-12)


def test_intercept_false_gaussian():
    x, y = random_data(n=100, p=4, seed=7)
    fit = st.fit(x, y, intercept=False, nlambda=5, standardize=False, dtype=np.float64)
    # reported intercept is y_center only via rescale path; predictions use it
    assert fit.beta.shape == (5, 1, 4)


def test_warm_state_requires_matching_shapes():
    x, y = random_data(n=64, p=4, seed=8)
    f1 = st.fit(x, y, nlambda=3, dtype=np.float64)
    x2, y2 = random_data(n=128, p=4, seed=9)
    with pytest.raises(Exception):
        st.fit(x2, y2, nlambda=3, warm_state=f1.final_state, dtype=np.float64)


def test_cv_invalid_measure():
    x, y = random_data(n=60, p=3, seed=10)
    with pytest.raises((KeyError, ValueError)):
        st.cv_fit(x, y, type_measure="bogus", nfolds=3, dtype=np.float64)
