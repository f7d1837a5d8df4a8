"""Sparse-vs-dense equivalence (reference tests/testthat/test-sparse.R) and
PaddedCSR container semantics."""

import numpy as np
import pytest
import scipy.sparse as sp

import sgdnet_tpu as st
from sgdnet_tpu.core.sparse import PaddedCSR
from tests.helpers import random_data


def test_padded_csr_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 11)) * (rng.random((37, 11)) < 0.3)
    csr = PaddedCSR.from_scipy(sp.csr_matrix(x), dtype=np.float64)
    np.testing.assert_allclose(np.asarray(csr.to_dense()), x)
    assert csr.total_nnz() == np.count_nonzero(x)


def test_padded_csr_column_stats():
    """Sparse column stats count implicit zeros and guard zero variance
    (reference src/math.h:89-112)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 7)) * (rng.random((50, 7)) < 0.4)
    x[:, 3] = 0.0  # zero-variance column
    csr = PaddedCSR.from_scipy(sp.csr_matrix(x), dtype=np.float64)
    mean, sd = csr.column_stats()
    np.testing.assert_allclose(np.asarray(mean), x.mean(0), atol=1e-12)
    expected_sd = x.std(0)
    expected_sd[expected_sd == 0] = 1.0
    np.testing.assert_allclose(np.asarray(sd), expected_sd, atol=1e-12)


def test_padded_csr_matvec():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(30, 9)) * (rng.random((30, 9)) < 0.5)
    csr = PaddedCSR.from_scipy(sp.csr_matrix(x), dtype=np.float64)
    v = rng.normal(size=(30, 2))
    np.testing.assert_allclose(np.asarray(csr.matvec_T(v)), x.T @ v, atol=1e-12)
    w_t = rng.normal(size=(9, 2))
    np.testing.assert_allclose(np.asarray(csr.matmul_dense(w_t)), x @ w_t, atol=1e-12)


def test_max_squared_row_norm_centered():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 6)) * (rng.random((20, 6)) < 0.5)
    c = rng.normal(size=6)
    csr = PaddedCSR.from_scipy(sp.csr_matrix(x), dtype=np.float64)
    expected = ((x - c) ** 2).sum(axis=1).max()
    got = float(csr.max_squared_row_norm(np.asarray(c)))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


@pytest.mark.parametrize("family", ["gaussian", "binomial"])
@pytest.mark.parametrize("standardize", [True, False])
def test_sparse_equals_dense(family, standardize):
    """Sparse and dense fits agree at 1e-3 over the option grid
    (reference test-sparse.R:3-35)."""
    x, y = random_data(n=250, p=10, family=family, density=0.3, seed=7)
    common = dict(
        family=family,
        nlambda=10,
        standardize=standardize,
        thresh=1e-6,
        maxit=3000,
        dtype=np.float64,
    )
    dense_fit = st.fit(x, y, **common)
    sparse_fit = st.fit(sp.csr_matrix(x), y, lambda_path=dense_fit.lambda_, **common)
    np.testing.assert_allclose(sparse_fit.lambda_, dense_fit.lambda_, rtol=1e-10)
    scale = max(1.0, np.abs(dense_fit.beta).max())
    np.testing.assert_allclose(sparse_fit.beta, dense_fit.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(sparse_fit.a0, dense_fit.a0, atol=5e-3 * scale)


def test_sparse_gather_mode_equals_densify():
    """The two sparse batch strategies are numerically equivalent."""
    x, y = random_data(n=200, p=12, family="gaussian", density=0.25, seed=8)
    xs = sp.csr_matrix(x)
    common = dict(nlambda=8, thresh=1e-6, maxit=2000, dtype=np.float64)
    f1 = st.fit(xs, y, sparse_mode="densify", **common)
    f2 = st.fit(xs, y, sparse_mode="gather", **common)
    np.testing.assert_allclose(f1.beta, f2.beta, atol=1e-10)


def test_sparse_lambda_path_matches_dense():
    """Auto lambda path identical for sparse and dense input
    (scale-only standardization does not change lambda_max because the
    response is centered — see families._xty usage)."""
    x, y = random_data(n=150, p=8, family="gaussian", density=0.4, seed=9)
    f_dense = st.fit(x, y, nlambda=5, dtype=np.float64)
    f_sparse = st.fit(sp.csr_matrix(x), y, nlambda=5, dtype=np.float64)
    np.testing.assert_allclose(f_sparse.lambda_, f_dense.lambda_, rtol=1e-8)


def test_hybrid_equals_dense():
    """Hybrid head/tail layout (auto for p > 512) reproduces the dense fit —
    the column split + permutation is exact, not an approximation."""
    rng = np.random.default_rng(11)
    n, p = 300, 700
    # zipf-ish column usage so the head actually covers most nonzeros
    cols = (p * rng.random((n, 20)) ** 3).astype(int) % p
    x = np.zeros((n, p))
    for i in range(n):
        x[i, cols[i]] = rng.normal(size=20)
    beta_true = np.zeros(p)
    beta_true[:10] = rng.normal(size=10)
    y = x @ beta_true + 0.1 * rng.normal(size=n)

    common = dict(nlambda=8, thresh=1e-6, maxit=2000, dtype=np.float64)
    f_dense = st.fit(x, y, **common)
    xs = sp.csr_matrix(x)
    f_hybrid = st.fit(xs, y, lambda_path=f_dense.lambda_, **common)
    from sgdnet_tpu.api.fit import _as_design_matrix
    xh, is_sp, perm, _ = _as_design_matrix(xs, np.float64)
    assert is_sp and perm is not None
    from sgdnet_tpu.core.sparse import HybridCSR
    assert isinstance(xh, HybridCSR) and xh.n_head >= 128
    scale = max(1.0, np.abs(f_dense.beta).max())
    np.testing.assert_allclose(f_hybrid.beta, f_dense.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(f_hybrid.a0, f_dense.a0, atol=5e-3 * scale)


def test_hybrid_pure_csr_agree():
    """Hybrid and pure padded-CSR paths give the same solution."""
    rng = np.random.default_rng(12)
    n, p = 256, 600
    x = (rng.random((n, p)) < 0.05) * rng.normal(size=(n, p))
    y = x[:, 0] * 2.0 + 0.1 * rng.normal(size=n)
    xs = sp.csr_matrix(x)
    common = dict(nlambda=6, thresh=1e-6, maxit=2000, dtype=np.float64)
    f_hybrid = st.fit(xs, y, hybrid=True, **common)
    f_csr = st.fit(xs, y, hybrid=False, lambda_path=f_hybrid.lambda_, **common)
    scale = max(1.0, np.abs(f_csr.beta).max())
    np.testing.assert_allclose(f_hybrid.beta, f_csr.beta, atol=2e-3 * scale)


def test_block_sampling_matches_permutation():
    """sampling='block' (contiguous HBM-streaming batches over pre-shuffled
    rows) reaches the same solution as the default per-epoch permutation."""
    rng = np.random.default_rng(13)
    n, p = 300, 40
    x = rng.normal(size=(n, p))
    y = x @ (rng.normal(size=p) * (rng.random(p) < 0.3)) + 0.1 * rng.normal(size=n)
    common = dict(nlambda=8, thresh=1e-6, maxit=3000, dtype=np.float64, batch_size=32)
    f_perm = st.fit(x, y, **common)
    f_block = st.fit(x, y, sampling="block", lambda_path=f_perm.lambda_, **common)
    scale = max(1.0, np.abs(f_perm.beta).max())
    np.testing.assert_allclose(f_block.beta, f_perm.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(f_block.a0, f_perm.a0, atol=5e-3 * scale)

    # sparse + hybrid layouts under block sampling
    xs = sp.csr_matrix((rng.random((n, p)) < 0.2) * x)
    ys = np.asarray(xs @ (rng.normal(size=p) * 0.5)).ravel() + 0.05 * rng.normal(size=n)
    f_sp = st.fit(xs, ys, hybrid=False, **common)
    f_sb = st.fit(xs, ys, hybrid=False, sampling="block", lambda_path=f_sp.lambda_, **common)
    scale = max(1.0, np.abs(f_sp.beta).max())
    np.testing.assert_allclose(f_sb.beta, f_sp.beta, atol=2e-3 * scale)


@pytest.mark.parametrize("layout", ["csr", "hybrid"])
def test_sparse_weighted_equals_dense(layout):
    """Non-uniform sample_weight: sparse standardization must use the same
    weighted column stats as the dense path, so sparse == dense fits with
    identical lambda paths (round-1 VERDICT bug; contract anchor
    reference test-sparse.R:3-35)."""
    rng = np.random.default_rng(21)
    n, p = 260, 14
    x, y = random_data(n=n, p=p, family="gaussian", density=0.3, seed=22)
    w = rng.uniform(0.0, 2.0, size=n)
    common = dict(
        family="gaussian",
        alpha=0.5,
        nlambda=8,
        sample_weight=w,
        thresh=1e-6,
        maxit=3000,
        dtype=np.float64,
    )
    f_dense = st.fit(x, y, **common)
    hybrid = layout == "hybrid"
    f_sparse = st.fit(sp.csr_matrix(x), y, hybrid=hybrid, **common)
    # identical auto lambda paths (weighted lambda_max sees the same
    # weighted standardization on both layouts)
    np.testing.assert_allclose(f_sparse.lambda_, f_dense.lambda_, rtol=1e-8)
    scale = max(1.0, np.abs(f_dense.beta).max())
    np.testing.assert_allclose(f_sparse.beta, f_dense.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(f_sparse.a0, f_dense.a0, atol=5e-3 * scale)


def test_weighted_column_stats_sparse():
    """PaddedCSR/HybridCSR weighted column stats == dense weighted stats."""
    rng = np.random.default_rng(23)
    x = rng.normal(size=(60, 9)) * (rng.random((60, 9)) < 0.4)
    x[:, 4] = 0.0
    w = rng.uniform(0.1, 3.0, size=60)
    W = w.sum()
    mean_exp = (x * w[:, None]).sum(0) / W
    var_exp = (w[:, None] * (x - mean_exp) ** 2).sum(0) / W
    sd_exp = np.sqrt(var_exp)
    sd_exp[sd_exp == 0] = 1.0
    csr = PaddedCSR.from_scipy(sp.csr_matrix(x), dtype=np.float64)
    import jax.numpy as jnp
    mean, sd = csr.column_stats(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(mean), mean_exp, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sd), sd_exp, atol=1e-12)


def test_block_coo_tail_ops_exact():
    """BlockCOO packed-tail batch ops are bit-identical in exact arithmetic
    to the padded-tail ops (it is the same set of nonzeros)."""
    import jax.numpy as jnp

    from sgdnet_tpu.core.sparse import BlockCOO, HybridCSR
    from sgdnet_tpu.solver.saga import (
        _coo_batch_outer,
        _coo_batch_predict,
        _csr_batch_outer,
        _csr_batch_predict,
    )

    rng = np.random.default_rng(31)
    n, p, B, k = 64, 40, 16, 3
    x = (rng.random((n, p)) < 0.15) * rng.normal(size=(n, p))
    tail = PaddedCSR.from_scipy(sp.csr_matrix(x), dtype=np.float64)
    bt = BlockCOO.from_padded(tail, B, lane_multiple=8)
    w = jnp.asarray(rng.normal(size=(k, p)))
    gc = jnp.asarray(rng.normal(size=(B, k)))
    for blk in (0, 1, 3):
        sel = jnp.int32(blk * B)
        lp_pad = _csr_batch_predict(tail, w, sel, B)
        lp_coo = _coo_batch_predict(bt, w, jnp.int32(blk), B)
        np.testing.assert_allclose(np.asarray(lp_coo), np.asarray(lp_pad), atol=1e-12)
        c_pad = _csr_batch_outer(tail, gc, sel, B)
        c_coo = _coo_batch_outer(bt, gc, jnp.int32(blk))
        np.testing.assert_allclose(np.asarray(c_coo), np.asarray(c_pad), atol=1e-12)


def test_hybrid_block_coo_fit_equals_permutation():
    """End-to-end: hybrid + block sampling (BlockCOO tail active) matches the
    permutation-sampling fit at the coefficient contract."""
    rng = np.random.default_rng(32)
    n, p = 320, 600
    x = (rng.random((n, p)) < 0.04) * rng.normal(size=(n, p))
    y = x[:, 1] * 1.5 - x[:, 2] + 0.1 * rng.normal(size=n)
    xs = sp.csr_matrix(x)
    common = dict(nlambda=6, thresh=1e-6, maxit=2000, dtype=np.float64, batch_size=64)
    f_perm = st.fit(xs, y, hybrid=True, sampling="permutation", **common)
    f_blk = st.fit(xs, y, hybrid=True, sampling="block", lambda_path=f_perm.lambda_, **common)
    from sgdnet_tpu.api.fit import _as_design_matrix
    scale = max(1.0, np.abs(f_perm.beta).max())
    np.testing.assert_allclose(f_blk.beta, f_perm.beta, atol=2e-3 * scale)


def test_head_nnz_form_matches_dense_build():
    """split_columns(head_form="nnz") + materialize_int8_head reproduces the
    dense int8 head BITWISE — the round-5 ingestion path (upload ~nnz bytes,
    scatter-build on device) must be indistinguishable from uploading the
    dense block, including zero-row padding and both quantization modes
    (raw, and standardization fused via std_stats)."""
    import jax.numpy as jnp

    from sgdnet_tpu.core.sparse import HybridCSR, materialize_int8_head, scipy_column_stats

    rng = np.random.default_rng(77)
    x = sp.random(
        400, 350, density=0.06, random_state=5,
        data_rvs=lambda k: rng.normal(size=k),
    ).tocsr()
    m, s = scipy_column_stats(x)
    for std in (None, (m, s)):
        kw = dict(coverage=0.9, max_head=128, head_dtype=jnp.int8, as_host=True, std_stats=std)
        xd, pd_ = HybridCSR.split_columns(x, **kw)
        xn, pn_ = HybridCSR.split_columns(x, head_form="nnz", **kw)
        np.testing.assert_array_equal(pd_, pn_)
        np.testing.assert_allclose(xn.head_scale, xd.head_scale)
        np.testing.assert_array_equal(np.asarray(xn.tail.values), np.asarray(xd.tail.values))
        got = np.asarray(materialize_int8_head(xn.head))
        np.testing.assert_array_equal(got, xd.head)
        # padded build == dense head + int8 zero rows (what fit() pads with)
        got_pad = np.asarray(materialize_int8_head(xn.head, n_pad=xd.head.shape[0] + 13))
        ref_pad = np.concatenate([xd.head, np.zeros((13, xd.head.shape[1]), np.int8)])
        np.testing.assert_array_equal(got_pad, ref_pad)


def test_fit_int8_ingestion_nnz_path():
    """fit(hybrid_head_dtype="int8") on a scipy input — the host nnz-form
    ingestion — matches the f32-head fit at the coefficient contract."""
    rng = np.random.default_rng(41)
    n, p = 320, 600
    x = (rng.random((n, p)) < 0.05) * rng.normal(size=(n, p))
    y = x[:, 1] * 1.5 - x[:, 2] + 0.1 * rng.normal(size=n)
    xs = sp.csr_matrix(x)
    common = dict(nlambda=5, thresh=1e-6, maxit=2000, batch_size=64, hybrid=True)
    f32 = st.fit(xs, y, dtype=np.float64, **common)
    f8 = st.fit(xs, y, hybrid_head_dtype="int8", lambda_path=f32.lambda_, **common)
    scale = max(1.0, np.abs(f32.beta).max())
    np.testing.assert_allclose(f8.beta, f32.beta, atol=5e-3 * scale)
