"""Debug diagnostics, observation weights, and misc options
(reference tests/testthat/test-options.R, test-package-load.R)."""

import numpy as np

import sgdnet_tpu as st
from tests.helpers import random_data


def test_debug_loss_trace():
    """debug=True records per-epoch losses that decrease
    (reference R/zzz.R:17, test-options.R:3-18, src/saga-dense.h:191-206)."""
    x, y = random_data(n=120, p=5, seed=1)
    fit = st.fit(x, y, nlambda=4, debug=True, dtype=np.float64)
    assert fit.diagnostics is not None
    loss = fit.diagnostics["loss"]  # (n_lambda, max_iter), nan-padded
    assert loss.shape[0] == 4
    for l in range(4):
        tr = loss[l][np.isfinite(loss[l])]
        assert len(tr) >= 1
    # the trace excludes the penalty term (reference src/utils.h:199-227), so
    # it is only monotone-ish at small lambda: check the least-penalized fit
    tr_last = loss[-1][np.isfinite(loss[-1])]
    assert tr_last[-1] <= tr_last[0] + 1e-12


def test_no_debug_by_default():
    x, y = random_data(n=60, p=4, seed=2)
    fit = st.fit(x, y, nlambda=3, dtype=np.float64)
    assert fit.diagnostics is None


def test_observation_weights():
    """sample_weight: zero-weight samples are ignored (an extension; the
    reference documents but does not implement weights, R/sgdnet.R:341)."""
    x, y = random_data(n=200, p=4, seed=3)
    w = np.ones(200)
    w[100:] = 0.0
    fit_w = st.fit(x, y, sample_weight=w, nlambda=6, thresh=1e-6, dtype=np.float64)
    fit_sub = st.fit(x[:100], y[:100], nlambda=6, thresh=1e-6, dtype=np.float64)
    np.testing.assert_allclose(fit_w.lambda_, fit_sub.lambda_, rtol=1e-7)
    scale = max(1.0, np.abs(fit_sub.beta).max())
    np.testing.assert_allclose(fit_w.beta, fit_sub.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(fit_w.nulldev, fit_sub.nulldev, rtol=1e-8)


def test_reproducible_given_seed():
    """Determinism: same seed -> bitwise-identical fits (SURVEY.md §5:
    determinism tests substitute for sanitizers)."""
    x, y = random_data(n=100, p=4, seed=4)
    f1 = st.fit(x, y, nlambda=5, seed=7, dtype=np.float64)
    f2 = st.fit(x, y, nlambda=5, seed=7, dtype=np.float64)
    np.testing.assert_array_equal(f1.beta, f2.beta)
    np.testing.assert_array_equal(f1.a0, f2.a0)


def test_fit_repr_and_print_path():
    x, y = random_data(n=60, p=4, seed=5)
    fit = st.fit(x, y, nlambda=5, dtype=np.float64)
    s = repr(fit)
    assert "gaussian" in s and "n_lambda=5" in s
    table = fit.print_path()
    assert "Df" in table and "%Dev" in table and "Lambda" in table
    assert len(table.splitlines()) == 6
