"""Poisson family (log-link counts) — an extension beyond the reference's
four families (glmnet has it; count models with log-exposure offsets are
its canonical use).

Oracles:
* ridge == sklearn PoissonRegressor (identical objective: mean unit
  deviance / 2 + alpha/2 ||w||^2)
* lasso == hand-rolled proximal-gradient (ISTA) solve in float64
* offsets: constant-offset invariance is exact; log-exposure null model
  has a closed form
* internal consistency: sparse == dense, first path point all-zero,
  deviance decreasing on the training path
"""

import numpy as np
import pytest

import sgdnet_tpu as st


def _counts(n=300, p=8, seed=0, b0=0.5):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, p)) * 0.5
    w = np.zeros(p)
    w[: min(p, 4)] = [0.8, -0.5, 0.3, 0.4][: min(p, 4)]
    y = rng.poisson(np.exp(b0 + x @ w)).astype(float)
    return x, y


def test_ridge_vs_sklearn():
    from sklearn.linear_model import PoissonRegressor

    x, y = _counts()
    lam = 0.1
    f = st.fit(x, y, family="poisson", alpha=0.0, lambda_path=[lam],
               standardize=False, dtype=np.float64, thresh=1e-9, maxit=20000)
    sk = PoissonRegressor(alpha=lam, tol=1e-12, max_iter=10000).fit(x, y)
    scale = max(np.abs(sk.coef_).max(), 1.0)
    assert np.abs(f.beta[0, 0] - sk.coef_).max() <= 1e-3 * scale
    assert abs(float(f.a0[0]) - sk.intercept_) <= 1e-3


def test_lasso_vs_ista():
    x, y = _counts(seed=5)
    n, p = x.shape
    lam = 0.05

    f = st.fit(x, y, family="poisson", alpha=1.0, lambda_path=[lam],
               standardize=False, dtype=np.float64, thresh=1e-9, maxit=20000)

    # proximal gradient (ISTA) on (1/n) sum(mu - y*lp) + lam*||w||_1 with a
    # free intercept, fixed step from the curvature bound at the optimum
    w = np.zeros(p)
    b = np.log(max(y.mean(), 1e-10))
    L = np.exp(b) * 4 * (np.linalg.norm(x, axis=1) ** 2).max() / 1.0
    step = 1.0 / max(L, 1.0)
    for _ in range(60000):
        mu = np.exp(b + x @ w)
        g = x.T @ (mu - y) / n
        w_new = w - step * g
        w_new = np.sign(w_new) * np.maximum(np.abs(w_new) - step * lam, 0.0)
        b_new = b - step * (mu - y).mean()
        if max(np.abs(w_new - w).max(), abs(b_new - b)) < 1e-13:
            w, b = w_new, b_new
            break
        w, b = w_new, b_new
    scale = max(np.abs(w).max(), 1.0)
    assert np.abs(f.beta[0, 0] - w).max() <= 1e-3 * scale
    assert abs(float(f.a0[0]) - b) <= 1e-3


def test_lambda_max_and_path_shape():
    x, y = _counts(seed=7)
    f = st.fit(x, y, family="poisson", alpha=1.0, nlambda=12, dtype=np.float64)
    assert f.df[0] == 0  # first path point all-zero
    assert np.all(np.diff(f.df) >= 0) or f.df[-1] == x.shape[1]
    assert np.all(np.diff(f.dev_ratio) >= -1e-8)
    sc = f.score(x, y, "deviance")
    assert np.all(np.diff(sc) <= 1e-8)  # training deviance decreases


def test_predict_types():
    x, y = _counts(seed=9)
    f = st.fit(x, y, family="poisson", nlambda=6, dtype=np.float64)
    link = f.predict(x, type="link")
    resp = f.predict(x, type="response")
    np.testing.assert_allclose(np.exp(np.asarray(link)), np.asarray(resp), rtol=1e-12)
    assert np.asarray(resp).min() > 0
    with pytest.raises(ValueError):
        f.predict(x, type="class")  # not a classification family
    # score measures
    for m in ("deviance", "mse", "mae"):
        assert np.all(np.isfinite(f.score(x, y, m)))
    with pytest.raises(ValueError):
        f.score(x, y, "auc")


def test_constant_offset_shifts_intercept_exactly():
    x, y = _counts(seed=11)
    c = 0.7
    f_off = st.fit(x, y, family="poisson", alpha=1.0, nlambda=5,
                   offset=np.full(len(y), c), dtype=np.float64)
    f_ref = st.fit(x, y, family="poisson", alpha=1.0, lambda_path=f_off.lambda_,
                   dtype=np.float64)
    assert np.abs(f_off.beta - f_ref.beta).max() <= 1e-12
    assert np.abs((np.asarray(f_ref.a0) - np.asarray(f_off.a0)) - c).max() <= 1e-10
    # predictions from the offset fit require newoffset
    with pytest.raises(ValueError):
        f_off.predict(x)
    r = f_off.predict(x, type="response", newoffset=np.full(len(y), c))
    np.testing.assert_allclose(np.asarray(r), np.asarray(f_ref.predict(x, type="response")), rtol=1e-8)


def test_log_exposure_null_model_closed_form():
    rng = np.random.default_rng(13)
    x, y = _counts(seed=13)
    expo = rng.uniform(0.5, 3.0, size=len(y))
    offs = np.log(expo)
    # at a huge lambda every coefficient is zero: a0 must equal the
    # closed-form offset null intercept log(sum y / sum exposure)
    f = st.fit(x, y, family="poisson", alpha=1.0, lambda_path=[1e3],
               offset=offs, dtype=np.float64)
    assert f.df[0] == 0
    b0 = np.log(y.sum() / expo.sum())
    # the intercept is warm-started exactly at b0 but takes SAGA steps with
    # an up-to-an-epoch-stale gradient average, so allow solver tolerance
    assert abs(float(f.a0[0]) - b0) <= 2e-3


def test_sparse_equals_dense():
    import scipy.sparse as sp

    rng = np.random.default_rng(17)
    n, p = 250, 30
    x = rng.normal(size=(n, p)) * (rng.random((n, p)) < 0.3)
    y = rng.poisson(np.exp(0.3 + x @ (np.where(rng.random(p) < 0.3, 0.5, 0.0)))).astype(float)
    kw = dict(family="poisson", alpha=0.9, nlambda=8, dtype=np.float64,
              thresh=1e-7, maxit=3000)
    fd = st.fit(x, y, **kw)
    fs = st.fit(sp.csr_matrix(x), y, hybrid=False, **kw)
    fh = st.fit(sp.csr_matrix(x), y, hybrid=True, hybrid_max_head=12, **kw)
    scale = max(np.abs(fd.beta).max(), 1.0)
    assert np.abs(fd.beta - fs.beta).max() <= 2e-3 * scale
    assert np.abs(fd.beta - fh.beta).max() <= 2e-3 * scale


def test_sharded_equals_single():
    import jax

    from sgdnet_tpu.parallel.dist import make_mesh

    x, y = _counts(n=256, seed=19)
    kw = dict(family="poisson", alpha=1.0, nlambda=5, dtype=np.float64,
              thresh=1e-6, maxit=500, batch_size=8, seed=2)
    f1 = st.fit(x, y, **kw)
    fm = st.fit(x, y, mesh=make_mesh(len(jax.devices())), **kw)
    scale = max(np.abs(f1.beta).max(), 1.0)
    assert np.abs(f1.beta - fm.beta).max() <= 2e-3 * scale


def test_cv_and_weights():
    x, y = _counts(seed=23)
    w = np.random.default_rng(23).uniform(0.5, 2.0, size=len(y))
    cv = st.cv_fit(x, y, family="poisson", alpha=1.0, nfolds=3, nlambda=8,
                   sample_weight=w, dtype=np.float64)
    assert np.isfinite(cv.lambda_min) and np.isfinite(cv.lambda_1se)
    # round 2: poisson fold-parallel CV is supported (full-data smoothness
    # bound reused per fold) — covered in depth by test_parallel
    cv_p = st.cv_fit(x, y, family="poisson", alpha=1.0, nfolds=3, nlambda=8,
                     sample_weight=w, dtype=np.float64, parallel=True, seed=0)
    assert np.isfinite(cv_p.lambda_min)


def test_validation():
    x, y = _counts()
    with pytest.raises(ValueError):
        st.fit(x, -y - 1.0, family="poisson")  # negative counts
    # constraints compose with poisson
    f = st.fit(x, y, family="poisson", nlambda=5, lower_limits=0.0,
               exclude=[0], dtype=np.float64)
    assert np.all(f.beta[:, :, 0] == 0.0)
    assert f.beta.min() >= -1e-12


def test_reported_deviance_is_unclamped():
    """Reported deviance/dev_ratio must use the exact Poisson loss, not the
    solver's smoothness-clamped loss (round-1 VERDICT item): recompute the
    deviance from the returned coefficients with exact numpy and compare."""
    x, y = _counts(seed=41)
    f = st.fit(x, y, family="poisson", nlambda=6, dtype=np.float64, thresh=1e-7)
    # exact deviance at each path point
    lp = x @ f.beta[:, 0, :].T + f.a0[None, :]  # (n, nl)
    mu = np.exp(lp)
    with np.errstate(divide="ignore", invalid="ignore"):
        ylogy = np.where(y > 0, y * np.log(np.maximum(y, 1e-300)), 0.0)
    dev_exact = 2.0 * (mu - y[:, None] * lp + ylogy[:, None] - y[:, None]).sum(axis=0)
    dev_reported = (1.0 - f.dev_ratio) * f.nulldev
    np.testing.assert_allclose(dev_reported, dev_exact, rtol=1e-5)

    # force an ACTIVE clamp at the solution: fit() must warn that the solver
    # optimized the clamped objective
    with pytest.warns(RuntimeWarning, match="smoothness clamp"):
        st.fit(x, y, family="poisson", nlambda=6, dtype=np.float64, thresh=1e-7,
               poisson_smoothness=max(float(y.mean()), 2.0))
