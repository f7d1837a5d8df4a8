"""Linear-predictor offsets.

The reference documents an `offset` argument but never implements it
(`offset <- FALSE`, reference R/sgdnet.R:341-342).  Here offsets are a real
feature with glmnet semantics: identity-link families absorb the offset into
the response, link families carry it through the solver / null model /
lambda_max, and predictions from an offset fit require `newoffset`.

Oracles: exact fold-into-response equality for identity links, constant-
offset intercept-shift invariance and a float64 scipy.optimize minimizer of
the penalized objective for link families.
"""

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data


# ---------------------------------------------------------------------------
# identity-link families: offset == shifted response, exactly
# ---------------------------------------------------------------------------


def test_gaussian_offset_equals_shifted_response():
    x, y = random_data(120, 6, "gaussian", seed=1)
    rng = np.random.default_rng(2)
    o = rng.normal(size=120)

    f_off = st.fit(x, y, family="gaussian", alpha=0.5, nlambda=12, offset=o, thresh=1e-5)
    f_shift = st.fit(x, y - o, family="gaussian", alpha=0.5, nlambda=12, thresh=1e-5)

    np.testing.assert_allclose(f_off.lambda_, f_shift.lambda_, rtol=1e-12)
    np.testing.assert_allclose(f_off.beta, f_shift.beta, atol=1e-12)
    np.testing.assert_allclose(f_off.a0, f_shift.a0, atol=1e-12)
    assert f_off.nulldev == pytest.approx(f_shift.nulldev, rel=1e-12)

    # predictions add the new offset back
    p_off = f_off.predict(x, newoffset=o)
    p_shift = f_shift.predict(x)
    np.testing.assert_allclose(p_off, p_shift + o[:, None], atol=1e-12)


def test_mgaussian_offset_equals_shifted_response():
    x, y = random_data(80, 5, "mgaussian", seed=3)
    rng = np.random.default_rng(4)
    o = rng.normal(size=y.shape)

    f_off = st.fit(x, y, family="mgaussian", alpha=0.8, nlambda=8, offset=o, thresh=1e-5)
    f_shift = st.fit(x, y - o, family="mgaussian", alpha=0.8, nlambda=8, thresh=1e-5)
    np.testing.assert_allclose(f_off.beta, f_shift.beta, atol=1e-12)
    np.testing.assert_allclose(f_off.a0, f_shift.a0, atol=1e-12)


# ---------------------------------------------------------------------------
# link families: invariance checks
# ---------------------------------------------------------------------------


def test_binomial_zero_offset_matches_none():
    x, y = random_data(100, 5, "binomial", seed=5)
    f0 = st.fit(x, y, family="binomial", alpha=0.5, nlambda=10, thresh=1e-5)
    fz = st.fit(x, y, family="binomial", alpha=0.5, nlambda=10, thresh=1e-5,
                offset=np.zeros(100))
    np.testing.assert_allclose(f0.lambda_, fz.lambda_, rtol=1e-10)
    np.testing.assert_allclose(f0.beta, fz.beta, atol=1e-8)
    np.testing.assert_allclose(np.atleast_1d(f0.a0), np.atleast_1d(fz.a0), atol=1e-8)


def test_multinomial_zero_offset_matches_none():
    x, y = random_data(120, 4, "multinomial", seed=6)
    f0 = st.fit(x, y, family="multinomial", alpha=1.0, nlambda=8, thresh=1e-5)
    fz = st.fit(x, y, family="multinomial", alpha=1.0, nlambda=8, thresh=1e-5,
                offset=np.zeros((120, 3)))
    np.testing.assert_allclose(f0.lambda_, fz.lambda_, rtol=1e-10)
    np.testing.assert_allclose(f0.beta, fz.beta, atol=1e-8)


def test_binomial_constant_offset_shifts_intercept():
    """With a constant offset c, the optimum has identical slopes and an
    intercept shifted by -c; lambda_max is unchanged (null gradient is)."""
    x, y = random_data(150, 6, "binomial", seed=7)
    c = 0.7
    f_plain = st.fit(x, y, family="binomial", alpha=0.5, nlambda=10, thresh=1e-6)
    f_off = st.fit(x, y, family="binomial", alpha=0.5, nlambda=10, thresh=1e-6,
                   offset=np.full(150, c))
    np.testing.assert_allclose(f_plain.lambda_, f_off.lambda_, rtol=1e-8)
    np.testing.assert_allclose(f_plain.beta, f_off.beta, atol=2e-4)
    np.testing.assert_allclose(np.atleast_1d(f_plain.a0),
                               np.atleast_1d(f_off.a0) + c, atol=2e-4)


# ---------------------------------------------------------------------------
# link families: float64 scipy oracle on the exact penalized objective
# ---------------------------------------------------------------------------


def _logistic_ridge_oracle(x, y01, o, lam, intercept=True):
    """argmin (1/n) sum [log(1+e^lp) - y lp] + lam/2 ||w||^2, lp = o + a + x w."""
    from scipy.optimize import minimize

    n, p = x.shape

    def obj(theta):
        a, w = theta[0], theta[1:]
        lp = o + a + x @ w
        loss = np.logaddexp(0.0, lp) - y01 * lp
        return loss.mean() + 0.5 * lam * w @ w

    res = minimize(obj, np.zeros(p + 1), method="BFGS",
                   options={"gtol": 1e-12, "maxiter": 2000})
    return res.x[0], res.x[1:]


def test_binomial_ridge_offset_scipy_oracle():
    x, y = random_data(200, 5, "binomial", seed=8)
    rng = np.random.default_rng(9)
    o = rng.normal(scale=0.8, size=200)
    lam = 0.05

    a_ref, w_ref = _logistic_ridge_oracle(x, y, o, lam)
    f = st.fit(x, y, family="binomial", alpha=0.0, lambda_path=[lam], offset=o,
               standardize=False, thresh=1e-8, maxit=3000)
    np.testing.assert_allclose(f.beta[0, 0], w_ref, atol=1e-3)
    assert float(np.atleast_1d(f.a0)[0]) == pytest.approx(a_ref, abs=1e-3)


def test_multinomial_ridge_offset_scipy_oracle():
    """Compare predicted class probabilities (shift-invariant) against a
    float64 BFGS minimizer of the softmax ridge objective with offsets."""
    from scipy.optimize import minimize

    x, y = random_data(150, 4, "multinomial", seed=10)
    rng = np.random.default_rng(11)
    k = 3
    o = rng.normal(scale=0.6, size=(150, k))
    lam = 0.05
    onehot = np.eye(k)[y.astype(int)]
    n, p = x.shape

    def obj(theta):
        a = theta[:k]
        w = theta[k:].reshape(k, p)
        lp = o + a + x @ w.T
        lse = np.log(np.exp(lp - lp.max(1, keepdims=True)).sum(1)) + lp.max(1)
        loss = lse - (lp * onehot).sum(1)
        return loss.mean() + 0.5 * lam * (w**2).sum()

    res = minimize(obj, np.zeros(k + k * p), method="BFGS",
                   options={"gtol": 1e-11, "maxiter": 5000})
    a_ref, w_ref = res.x[:k], res.x[k:].reshape(k, p)
    lp_ref = o + a_ref + x @ w_ref.T
    prob_ref = np.exp(lp_ref - lp_ref.max(1, keepdims=True))
    prob_ref /= prob_ref.sum(1, keepdims=True)

    f = st.fit(x, y, family="multinomial", alpha=0.0, lambda_path=[lam], offset=o,
               standardize=False, thresh=1e-8, maxit=3000)
    prob = f.predict(x, type="response", newoffset=o)[:, :, 0]
    np.testing.assert_allclose(prob, prob_ref, atol=1e-3)


# ---------------------------------------------------------------------------
# consistency: sparse / sharded paths honor the offset
# ---------------------------------------------------------------------------


def test_sparse_binomial_offset_matches_dense():
    import scipy.sparse as sp

    x, y = random_data(128, 10, "binomial", density=0.4, seed=12)
    rng = np.random.default_rng(13)
    o = rng.normal(scale=0.5, size=128)
    f_dense = st.fit(x, y, family="binomial", alpha=1.0, nlambda=8, offset=o,
                     thresh=1e-6, seed=42)
    f_sparse = st.fit(sp.csr_matrix(x), y, family="binomial", alpha=1.0, nlambda=8,
                      offset=o, thresh=1e-6, seed=42, hybrid=False)
    np.testing.assert_allclose(f_dense.lambda_, f_sparse.lambda_, rtol=1e-6)
    scale = max(1.0, np.abs(f_dense.beta).max())
    assert np.max(np.abs(f_dense.beta - f_sparse.beta)) <= 2e-3 * scale


def test_sharded_binomial_offset_matches_single():
    import jax

    from sgdnet_tpu.parallel.dist import make_mesh

    x, y = random_data(160, 6, "binomial", seed=14)
    rng = np.random.default_rng(15)
    o = rng.normal(scale=0.5, size=160)
    f1 = st.fit(x, y, family="binomial", alpha=0.5, nlambda=6, offset=o,
                batch_size=8, thresh=1e-6)
    mesh = make_mesh(min(8, len(jax.devices())))
    fN = st.fit(x, y, family="binomial", alpha=0.5, nlambda=6, offset=o,
                batch_size=8, thresh=1e-6, mesh=mesh)
    scale = max(1.0, np.abs(f1.beta).max())
    assert np.max(np.abs(f1.beta - fN.beta)) <= 2e-3 * scale


# ---------------------------------------------------------------------------
# API surface: errors, prediction contract, CV
# ---------------------------------------------------------------------------


def test_predict_requires_newoffset():
    x, y = random_data(60, 4, "binomial", seed=16)
    f = st.fit(x, y, family="binomial", nlambda=5, offset=np.zeros(60))
    with pytest.raises(ValueError, match="newoffset"):
        f.predict(x)
    # coefficients don't need one
    f.coef()


def test_offset_shape_errors():
    x, y = random_data(60, 4, "multinomial", seed=17)
    with pytest.raises(ValueError, match="offset must have shape"):
        st.fit(x, y, family="multinomial", nlambda=5, offset=np.zeros(60))
    xg, yg = random_data(60, 4, "gaussian", seed=18)
    with pytest.raises(ValueError, match="offset must have shape"):
        st.fit(xg, yg, family="gaussian", nlambda=5, offset=np.zeros(59))


def test_cv_with_offset():
    x, y = random_data(90, 5, "binomial", seed=19)
    rng = np.random.default_rng(20)
    o = rng.normal(scale=0.3, size=90)
    cv = st.cv_fit(x, y, family="binomial", alpha=1.0, nfolds=3, nlambda=8,
                   offset=o, thresh=1e-4)
    assert np.isfinite(cv.lambda_min)
    assert cv.fit.offset


def test_exact_refit_carries_offset():
    x, y = random_data(80, 5, "binomial", seed=21)
    rng = np.random.default_rng(22)
    o = rng.normal(scale=0.4, size=80)
    f = st.fit(x, y, family="binomial", alpha=1.0, nlambda=8, offset=o, thresh=1e-5)
    s = float(np.sqrt(f.lambda_[2] * f.lambda_[3]))
    coefs = f.predict(s=s, type="coefficients", exact=True, x=x, y=y)
    assert coefs.shape == (1, x.shape[1] + 1)
    assert np.all(np.isfinite(coefs))


def test_binomial_large_offset_null_model():
    """Large offsets must not blow up the null-intercept solve (bisection;
    undamped Newton diverged here — found by review, regression-pinned)."""
    x, y = random_data(120, 5, "binomial", seed=23)
    for c in (3.0, -8.0, 20.0):
        f = st.fit(x, y, family="binomial", alpha=1.0, nlambda=6,
                   offset=np.full(120, c), thresh=1e-5)
        assert np.isfinite(f.nulldev) and f.nulldev < 1e4
        assert np.all(np.isfinite(f.beta)) and np.all(np.isfinite(np.atleast_1d(f.a0)))
        # constant offset ~ intercept shift: deviance path stays sane
        assert np.all(f.dev_ratio >= -1e-6)

    # the solved intercept satisfies the null optimality condition
    from sgdnet_tpu.families import get_family
    import jax.numpy as jnp

    fam = get_family("binomial")
    y01, _ = fam.encode(y)
    offs = jnp.asarray(np.full((120, 1), 3.0))
    b0 = fam.null_intercept_offset(jnp.asarray(y01), offs, True)
    p = 1.0 / (1.0 + np.exp(-(float(b0[0]) + 3.0)))
    assert abs(p - y01.mean()) < 1e-8


def test_multinomial_large_offset_null_model():
    x, y = random_data(120, 4, "multinomial", seed=24)
    rng = np.random.default_rng(25)
    o = rng.normal(scale=6.0, size=(120, 3))
    f = st.fit(x, y, family="multinomial", alpha=0.5, nlambda=6, offset=o, thresh=1e-5)
    assert np.isfinite(f.nulldev)
    assert np.all(np.isfinite(f.beta))


def test_newoffset_shape_contract_matches_fit():
    """predict enforces the same per-class offset shape as fit (a 1-D
    newoffset on a multinomial fit was silently broadcast — review find)."""
    x, y = random_data(90, 4, "multinomial", seed=26)
    o = np.zeros((90, 3))
    f = st.fit(x, y, family="multinomial", nlambda=5, offset=o)
    with pytest.raises(ValueError, match="newoffset must have shape"):
        f.predict(x, newoffset=np.zeros(90))
    f.predict(x, newoffset=o)  # correct shape passes
