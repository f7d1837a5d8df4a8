"""Whole-epoch Pallas kernel (solver/epoch_kernel.py) equivalence tests.

The kernel is the small-problem latency path: one pallas_call per epoch
with the dataset VMEM-resident.  Off-TPU it runs in interpret mode on
explicit opt-in (`use_epoch_kernel=True`), which is how this suite
exercises the identical kernel code on the CPU backend.  Every test
asserts the kernel path matches the XLA block-sampling path — same batch
sequence, so agreement is reassociation-level (1e-4 in f32), far inside
the 1e-3 coefficient contract.
"""

import numpy as np
import pytest

import sgdnet_tpu as st
from sgdnet_tpu.solver.epoch_kernel import supported

DATASETS = {
    "gaussian": "abalone",
    "binomial": "heart",
    "multinomial": "wine",
    "mgaussian": "student",
}


def _load(family):
    d = np.load(f"sgdnet_tpu/data/{DATASETS[family]}.npz")
    return d["x"], d["y"]


def _pair(x, y, **kw):
    """Fit the XLA block path and the epoch-kernel path on identical data,
    sampling, and seed; return both fits."""
    common = dict(nlambda=8, sampling="block", dtype="float32", seed=3)
    common.update(kw)
    f_xla = st.fit(x, y, use_epoch_kernel=False, **common)
    f_ker = st.fit(x, y, use_epoch_kernel=True, **common)
    assert f_xla.stats["epoch_kernel"] is False
    assert f_ker.stats["epoch_kernel"] is True
    return f_xla, f_ker


def _assert_close(f_xla, f_ker, tol=1e-4):
    scale = max(1.0, np.abs(f_xla.beta).max())
    assert np.abs(f_ker.beta - f_xla.beta).max() / scale < tol
    assert np.abs(np.asarray(f_ker.a0) - np.asarray(f_xla.a0)).max() < 10 * tol
    assert np.abs(f_ker.dev_ratio - f_xla.dev_ratio).max() < 10 * tol


@pytest.mark.parametrize("family", list(DATASETS))
def test_families_match_xla(family):
    x, y = _load(family)
    _assert_close(*_pair(x, y, family=family, alpha=0.8))


def test_poisson_matches_xla():
    rng = np.random.default_rng(0)
    n, p = 300, 6
    x = rng.normal(size=(n, p))
    lam = np.exp(0.3 + x @ (rng.normal(size=p) * 0.3))
    y = rng.poisson(lam).astype(np.float64)
    _assert_close(*_pair(x, y, family="poisson", alpha=0.5))


def test_ridge_and_no_intercept_and_raw_scale():
    x, y = _load("gaussian")
    _assert_close(*_pair(x, y, family="gaussian", alpha=0.0))  # ridge prox
    _assert_close(*_pair(x, y, family="gaussian", alpha=1.0, intercept=False))
    _assert_close(*_pair(x, y, family="gaussian", alpha=0.5, standardize=False))


def test_grouped_multinomial():
    x, y = _load("multinomial")
    _assert_close(*_pair(x, y, family="multinomial", alpha=0.9, type_multinomial="grouped"))


def test_sample_weights():
    x, y = _load("binomial")
    w = np.random.default_rng(1).uniform(0.2, 2.0, size=len(y))
    _assert_close(*_pair(x, y, family="binomial", alpha=0.7, sample_weight=w))


def test_refresh_cadence():
    x, y = _load("gaussian")
    _assert_close(*_pair(x, y, family="gaussian", alpha=0.8, g_sum_refresh_every=4))


def test_gate_rejects_unsupported():
    # dtype, class count, batch alignment, and VMEM budget all gate
    assert not supported(4192, 9, 1, 32, dtype=np.float64)
    assert not supported(4192, 9, 9, 32)  # k > 8
    assert not supported(4190, 9, 1, 10)  # B not sublane-aligned
    assert not supported(3_000_000, 512, 1, 8192)  # exceeds VMEM budget
    assert supported(4192, 9, 1, 32)


def test_gate_falls_back_on_options():
    """Options outside the kernel surface (box limits, sparse input)
    silently use the XLA path even when the kernel is requested — stats
    record which ran.  Offsets and penalty factors are in the v2 surface
    and no longer fall back (see the dedicated equivalence tests)."""
    x, y = _load("gaussian")
    f = st.fit(x, y, family="gaussian", lower_limits=-1.0, upper_limits=1.0,
               nlambda=4, dtype="float32", use_epoch_kernel=True)
    assert f.stats["epoch_kernel"] is False

    import scipy.sparse as sp

    xs = sp.csr_matrix(np.where(np.abs(x) > 0.5, x, 0.0))
    f = st.fit(xs, y, family="gaussian", nlambda=4, dtype="float32")
    assert f.stats["epoch_kernel"] is False


def test_offsets_in_kernel():
    """v2 surface: linear-predictor offsets ride as a kernel operand — the
    kernel path must match the XLA path on an offset-carrying fit (both
    binomial link offsets and gaussian response-absorbed ones)."""
    x, y = _load("binomial")
    offs = np.random.default_rng(2).normal(size=len(y)) * 0.3
    f_xla, f_ker = _pair(x, y, family="binomial", alpha=0.6, offset=offs)
    _assert_close(f_xla, f_ker)
    # gaussian offsets are absorbed into the response pre-solver: the
    # kernel must engage (no offs operand) and agree too
    xg, yg = _load("gaussian")
    og = np.random.default_rng(3).normal(size=len(yg)) * 0.2
    f_xla, f_ker = _pair(xg, yg, family="gaussian", alpha=0.8, offset=og)
    _assert_close(f_xla, f_ker)


def test_penalty_factors_in_kernel():
    """v2 surface: per-feature penalty factors scale the decay and prox
    threshold inside the kernel; pf=0 features stay unpenalized."""
    x, y = _load("gaussian")
    pf = np.ones(x.shape[1])
    pf[0] = 0.0
    pf[3] = 4.0
    f_xla, f_ker = _pair(x, y, family="gaussian", alpha=1.0, penalty_factor=pf)
    _assert_close(f_xla, f_ker)
    # the unpenalized feature survives to the path start in both
    assert np.abs(f_ker.beta[0, :, 0]).max() > 0


def test_offsets_and_pf_in_kernel():
    x, y = _load("binomial")
    rng = np.random.default_rng(5)
    offs = rng.normal(size=len(y)) * 0.2
    pf = np.ones(x.shape[1])
    pf[1] = 2.0
    f_xla, f_ker = _pair(
        x, y, family="binomial", alpha=0.5, offset=offs, penalty_factor=pf
    )
    _assert_close(f_xla, f_ker)


def test_warm_path_predict_refit_consistency():
    """The exact-refit path (predict exact=True) carries warm_state, which
    the kernel gate excludes — the refit must still reproduce the kernel
    fit's coefficients at interpolation-free lambdas."""
    x, y = _load("gaussian")
    f = st.fit(x, y, family="gaussian", nlambda=6, dtype="float32", use_epoch_kernel=True)
    lam = float(f.lambda_[2])
    pred_exact = f.predict(x[:5], s=lam, exact=True, x=x, y=y)
    pred_interp = f.predict(x[:5], s=lam)
    assert np.abs(np.asarray(pred_exact) - np.asarray(pred_interp)).max() < 1e-3 * max(
        1.0, np.abs(pred_interp).max()
    )
