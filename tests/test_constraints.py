"""Penalty factors, coefficient box constraints, and feature exclusion.

All three are glmnet-semantics extensions absent from the reference (its
API has neither `penalty.factor` nor `lower.limits`/`upper.limits` nor
`exclude`).  Oracles:

* penalty-factor lasso == column-rescaled plain lasso (exact algebraic
  identity: min 1/2W ||y - Xw||^2 + lam * sum pf_j |w_j| maps to a plain
  lasso on X diag(1/pf) via u_j = pf_j w_j)
* penalty-factor ridge == closed form (X'X/W + lam diag(pf))^{-1} X'y/W
* nonnegative lasso == sklearn ElasticNet(positive=True)
* general box == scipy L-BFGS-B with bounds (smooth ridge case)
* exclude == refit on the reduced design matrix
"""

import numpy as np
import pytest

import sgdnet_tpu as st


def _gauss(n=120, p=10, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, p))
    w = rng.normal(size=p) * (rng.random(p) < 0.6)
    y = x @ w + 0.3 * rng.normal(size=n)
    return x, y


class TestPenaltyFactor:
    def test_lasso_equals_column_rescaled_lasso(self):
        x, y = _gauss()
        n, p = x.shape
        rng = np.random.default_rng(0)
        pf = rng.uniform(0.3, 3.0, size=p)
        pf = pf / pf.mean()  # mean 1 -> internal rescale is a no-op
        lam = [0.2, 0.1, 0.05]

        kw = dict(family="gaussian", alpha=1.0, lambda_path=lam,
                  standardize=False, dtype=np.float64, thresh=1e-7, maxit=3000)
        f_pf = st.fit(x, y, penalty_factor=pf, **kw)
        f_eq = st.fit(x / pf[None, :], y, **kw)
        beta_eq = f_eq.beta / pf[None, None, :]  # u_j = pf_j w_j
        scale = max(np.abs(beta_eq).max(), 1.0)
        assert np.abs(f_pf.beta - beta_eq).max() <= 2e-3 * scale
        assert np.abs(f_pf.a0 - f_eq.a0).max() <= 2e-3

    def test_ridge_closed_form(self):
        x, y = _gauss(seed=7)
        n, p = x.shape
        pf = np.linspace(0.2, 2.0, p)
        pf = pf / pf.mean()
        lam = 0.7

        f = st.fit(x, y, family="gaussian", alpha=0.0, lambda_path=[lam],
                   penalty_factor=pf, standardize=False, intercept=False,
                   dtype=np.float64, thresh=1e-8, maxit=5000)
        # gaussian standardizes y internally (centering included, even with
        # intercept=False — reference src/families.h:69-79), so the effective
        # L2 strength is lam / pop-sd(y) and the oracle uses centered y
        lam_eff = lam / y.std()
        yc = y - y.mean()
        w_ref = np.linalg.solve(x.T @ x / n + lam_eff * np.diag(pf), x.T @ yc / n)
        scale = max(np.abs(w_ref).max(), 1.0)
        assert np.abs(f.beta[0, 0] - w_ref).max() <= 1e-3 * scale

    def test_zero_factor_feature_unpenalized(self):
        x, y = _gauss(seed=11)
        p = x.shape[1]
        pf = np.ones(p)
        pf[2] = 0.0  # feature 2 never penalized
        # huge lambda: every penalized coefficient zero, feature 2 survives
        f = st.fit(x, y, family="gaussian", alpha=1.0, lambda_path=[50.0],
                   penalty_factor=pf, standardize=False, dtype=np.float64,
                   thresh=1e-8, maxit=3000)
        beta = f.beta[0, 0]
        assert np.all(beta[np.arange(p) != 2] == 0.0)
        # remaining problem is a 1-feature OLS with intercept
        x2 = x[:, 2]
        xc = x2 - x2.mean()
        w_ref = (xc @ (y - y.mean())) / (xc @ xc)
        assert abs(beta[2] - w_ref) <= 1e-3 * max(abs(w_ref), 1.0)

    def test_lambda_max_scales_with_factors(self):
        x, y = _gauss(seed=5)
        p = x.shape[1]
        pf = np.full(p, 2.0)  # rescaled to all-ones internally -> same path
        f1 = st.fit(x, y, family="gaussian", alpha=1.0, nlambda=5)
        f2 = st.fit(x, y, family="gaussian", alpha=1.0, nlambda=5, penalty_factor=pf)
        np.testing.assert_allclose(f1.lambda_, f2.lambda_, rtol=1e-10)
        # first path point all-zero in both
        assert f2.df[0] == 0

    def test_inf_factor_is_exclude(self):
        x, y = _gauss(seed=13)
        p = x.shape[1]
        pf = np.ones(p)
        pf[4] = np.inf
        f = st.fit(x, y, family="gaussian", alpha=1.0, nlambda=8, penalty_factor=pf)
        assert np.all(f.beta[:, :, 4] == 0.0)


class TestExclude:
    @pytest.mark.parametrize("family", ["gaussian", "binomial"])
    def test_exclude_equals_reduced_fit(self, family):
        x, y = _gauss(seed=17)
        if family == "binomial":
            y = (y > np.median(y)).astype(float)
        drop = [1, 6]
        keep = [j for j in range(x.shape[1]) if j not in drop]
        lam = [0.1, 0.03]
        kw = dict(family=family, alpha=1.0, lambda_path=lam, dtype=np.float64,
                  thresh=1e-7, maxit=3000)
        f_ex = st.fit(x, y, exclude=drop, **kw)
        f_red = st.fit(x[:, keep], y, **kw)
        assert np.all(f_ex.beta[:, :, drop] == 0.0)
        scale = max(np.abs(f_red.beta).max(), 1.0)
        assert np.abs(f_ex.beta[:, :, keep] - f_red.beta).max() <= 2e-3 * scale
        assert np.abs(np.asarray(f_ex.a0) - np.asarray(f_red.a0)).max() <= 2e-3


class TestBoxConstraints:
    def test_nonnegative_lasso_vs_sklearn(self):
        from sklearn.linear_model import ElasticNet

        x, y = _gauss(seed=19)
        n = x.shape[0]
        lam = 0.05
        f = st.fit(x, y, family="gaussian", alpha=1.0, lambda_path=[lam],
                   lower_limits=0.0, standardize=False, dtype=np.float64,
                   thresh=1e-8, maxit=5000)
        sk = ElasticNet(alpha=lam, l1_ratio=1.0, positive=True, tol=1e-10,
                        max_iter=100000).fit(x, y)
        scale = max(np.abs(sk.coef_).max(), 1.0)
        assert f.beta[0, 0].min() >= 0.0
        assert np.abs(f.beta[0, 0] - sk.coef_).max() <= 2e-3 * scale
        assert abs(float(f.a0[0]) - sk.intercept_) <= 2e-3

    def test_box_ridge_vs_scipy_bounded(self):
        from scipy.optimize import minimize

        x, y = _gauss(seed=23)
        n, p = x.shape
        lam, lo, hi = 0.3, -0.15, 0.25

        f = st.fit(x, y, family="gaussian", alpha=0.0, lambda_path=[lam],
                   lower_limits=lo, upper_limits=hi, standardize=False,
                   intercept=False, dtype=np.float64, thresh=1e-8, maxit=5000)

        # internal y standardization: effective L2 = lam / pop-sd(y), oracle
        # on centered y (gaussian preprocess centers even with intercept=False)
        lam_eff = lam / y.std()
        yc = y - y.mean()

        def obj(w):
            r = yc - x @ w
            return 0.5 * (r @ r) / n + 0.5 * lam_eff * (w @ w)

        res = minimize(obj, np.zeros(p), jac=lambda w: -x.T @ (yc - x @ w) / n + lam_eff * w,
                       method="L-BFGS-B", bounds=[(lo, hi)] * p,
                       options={"ftol": 1e-15, "gtol": 1e-12})
        scale = max(np.abs(res.x).max(), 1.0)
        assert f.beta[0, 0].min() >= lo - 1e-9 and f.beta[0, 0].max() <= hi + 1e-9
        assert np.abs(f.beta[0, 0] - res.x).max() <= 2e-3 * scale

    def test_limits_are_original_scale_under_standardize(self):
        from scipy.optimize import minimize

        x, y = _gauss(seed=29)
        x = x * np.linspace(0.5, 4.0, x.shape[1])[None, :]  # uneven scales
        n, p = x.shape
        lam, hi = 0.2, 0.1

        # standardize=True: bounds still apply to ORIGINAL-scale coefficients
        f = st.fit(x, y, family="gaussian", alpha=0.0, lambda_path=[lam],
                   upper_limits=hi, standardize=True, dtype=np.float64,
                   thresh=1e-9, maxit=8000)
        assert f.beta[0, 0].max() <= hi + 1e-8

        # oracle: ridge on the standardized design with bounds mapped in,
        # solved in original coordinates
        mu, sd = x.mean(0), x.std(0)
        xs = (x - mu) / sd

        def obj(wb):
            w, b = wb[:p], wb[p]
            r = y - b - xs @ w
            return 0.5 * (r @ r) / n + 0.5 * lam / y.std() * (w @ w)

        # oracle w here multiplies the standardized design predicting RAW y
        # (w = w_internal * sd_y), so beta_orig = w / sd_x <= hi maps to
        # bounds w <= hi * sd_x
        res = minimize(obj, np.zeros(p + 1), method="L-BFGS-B",
                       bounds=[(-np.inf, hi * s) for s in sd] + [(-np.inf, np.inf)],
                       options={"ftol": 1e-16, "gtol": 1e-14, "maxiter": 20000})
        beta_ref = res.x[:p] / sd
        scale = max(np.abs(beta_ref).max(), 1.0)
        assert np.abs(f.beta[0, 0] - beta_ref).max() <= 3e-3 * scale

    def test_validation(self):
        x, y = _gauss()
        with pytest.raises(ValueError):
            st.fit(x, y, lower_limits=0.5)  # must be <= 0
        with pytest.raises(ValueError):
            st.fit(x, y, upper_limits=-0.5)  # must be >= 0
        with pytest.raises(ValueError):
            st.fit(x, y, penalty_factor=-np.ones(x.shape[1]))
        with pytest.raises(ValueError):
            st.fit(x, y, penalty_factor=np.ones(3))
        with pytest.raises(ValueError):
            st.fit(x, y, exclude=[x.shape[1]])


class TestLayoutsAndFamilies:
    def test_sparse_equals_dense_with_constraints(self):
        import scipy.sparse as sp

        rng = np.random.default_rng(31)
        n, p = 200, 40
        xd = rng.normal(size=(n, p)) * (rng.random((n, p)) < 0.3)
        w = rng.normal(size=p) * (rng.random(p) < 0.5)
        y = xd @ w + 0.2 * rng.normal(size=n)
        pf = rng.uniform(0.5, 2.0, size=p)
        kw = dict(family="gaussian", alpha=0.9, nlambda=8, dtype=np.float64,
                  thresh=1e-7, maxit=2000, penalty_factor=pf,
                  lower_limits=-0.8, upper_limits=0.9)
        fd = st.fit(xd, y, **kw)
        fs = st.fit(sp.csr_matrix(xd), y, hybrid=False, **kw)
        fh = st.fit(sp.csr_matrix(xd), y, hybrid=True, hybrid_max_head=16, **kw)
        scale = max(np.abs(fd.beta).max(), 1.0)
        assert np.abs(fd.beta - fs.beta).max() <= 2e-3 * scale
        assert np.abs(fd.beta - fh.beta).max() <= 2e-3 * scale
        np.testing.assert_allclose(fd.lambda_, fh.lambda_, rtol=1e-9)

    def test_sharded_equals_single_with_constraints(self):
        import jax

        from sgdnet_tpu.parallel.dist import make_mesh

        rng = np.random.default_rng(37)
        n, p = 256, 12
        x = rng.normal(size=(n, p))
        y = (x @ rng.normal(size=p) + 0.3 * rng.normal(size=n) > 0).astype(float)
        pf = rng.uniform(0.5, 2.0, size=p)
        kw = dict(family="binomial", alpha=1.0, nlambda=5, dtype=np.float64,
                  thresh=1e-6, maxit=500, penalty_factor=pf, lower_limits=-1.0,
                  batch_size=8, seed=4)
        f1 = st.fit(x, y, **kw)
        fm = st.fit(x, y, mesh=make_mesh(len(jax.devices())), **kw)
        scale = max(np.abs(f1.beta).max(), 1.0)
        assert np.abs(f1.beta - fm.beta).max() <= 2e-3 * scale

    def test_group_lasso_penalty_factor_rescale_identity(self):
        # mgaussian group lasso: pf_j ||w_.j||_2 maps to plain group lasso on
        # X diag(1/pf) with u_j = pf_j w_j (positive homogeneity of the norm)
        rng = np.random.default_rng(41)
        n, p, k = 150, 8, 3
        x = rng.normal(size=(n, p))
        y = x @ rng.normal(size=(p, k)) + 0.3 * rng.normal(size=(n, k))
        pf = rng.uniform(0.5, 2.0, size=p)
        pf = pf / pf.mean()
        lam = [0.3, 0.1]
        kw = dict(family="mgaussian", lambda_path=lam, standardize=False,
                  dtype=np.float64, thresh=1e-7, maxit=3000)
        f_pf = st.fit(x, y, penalty_factor=pf, **kw)
        f_eq = st.fit(x / pf[None, :], y, **kw)
        beta_eq = f_eq.beta / pf[None, None, :]
        scale = max(np.abs(beta_eq).max(), 1.0)
        assert np.abs(f_pf.beta - beta_eq).max() <= 2e-3 * scale

    def test_multinomial_exclude_and_bounds_smoke(self):
        rng = np.random.default_rng(43)
        n, p = 180, 9
        x = rng.normal(size=(n, p))
        y = rng.integers(0, 3, n)
        f = st.fit(x, y, family="multinomial", nlambda=6, exclude=[0],
                   upper_limits=0.5, dtype=np.float64)
        assert np.all(f.beta[:, :, 0] == 0.0)
        assert f.beta.max() <= 0.5 + 1e-8
        pred = f.predict(x, type="response")  # (n, k, nl)
        np.testing.assert_allclose(np.asarray(pred).sum(axis=1), 1.0, atol=1e-6)

    def test_cv_with_constraints(self):
        x, y = _gauss(seed=47)
        cv = st.cv_fit(x, y, family="gaussian", alpha=1.0, nfolds=3,
                       nlambda=8, lower_limits=0.0, dtype=np.float64)
        b = np.asarray(cv.coef())  # first entry is the (unconstrained) intercept
        assert b[..., 1:].min() >= -1e-12

    def test_parallel_cv_applies_constraints(self):
        # round 2: the vectorized fold kernel applies constraints (maps box
        # limits onto each fold's standardized scale) — must match serial CV
        x, y = _gauss(seed=53)
        foldid = np.arange(len(y)) % 3
        kw = dict(foldid=foldid, nlambda=4, lower_limits=0.0, dtype=np.float64,
                  thresh=1e-5)
        cv_s = st.cv_fit(x, y, **kw)
        cv_p = st.cv_fit(x, y, parallel=True, **kw)
        np.testing.assert_allclose(cv_p.cv_raw[0], cv_s.cv_raw[0], rtol=0.05, atol=1e-3)
        assert np.asarray(cv_p.coef())[..., 1:].min() >= -1e-12
