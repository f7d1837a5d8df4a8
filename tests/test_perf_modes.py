"""Performance-mode options keep the solver's fixed point.

Two opt-in throughput knobs:
  * `g_sum_refresh_every=k` — the exact gradient-average recompute (which
    re-streams the whole design matrix) runs every k epochs instead of
    every epoch.  Same fixed point; only float accumulation-drift cadence
    changes, so coefficients must match the default at the usual tolerance.
  * `hybrid_head_dtype=bfloat16` — the dense head of a HybridCSR layout is
    stored in bf16 (matmuls still accumulate in f32).  This perturbs the
    data by ~0.4% relative, so the contract intentionally loosens to ~1e-2
    (validated on-chip by tools/validate_bf16.py against the f32 solve).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import sgdnet_tpu as st
from sgdnet_tpu.core.sparse import HybridCSR
from tests.helpers import random_data


def _sparse_problem(n=300, p=40, family="binomial", seed=11):
    x, y = random_data(n=n, p=p, family=family, density=0.3, seed=seed)
    return sp.csr_matrix(x), y


@pytest.mark.parametrize("family", ["gaussian", "binomial"])
def test_refresh_every_matches_default(family):
    xs, y = _sparse_problem(family=family)
    kw = dict(family=family, alpha=0.5, nlambda=8, batch_size=32, dtype=np.float64, seed=3)
    ref = st.fit(xs, y, g_sum_refresh_every=1, **kw)
    lazy = st.fit(xs, y, g_sum_refresh_every=4, **kw)
    scale = max(np.abs(ref.beta).max(), 1.0)
    np.testing.assert_allclose(lazy.beta, ref.beta, atol=2e-3 * scale)
    np.testing.assert_allclose(lazy.a0, ref.a0, atol=2e-3 * max(np.abs(ref.a0).max(), 1.0))


def test_refresh_every_dense_path():
    x, y = random_data(n=200, p=12, family="gaussian", seed=5)
    kw = dict(alpha=1.0, nlambda=6, batch_size=16, dtype=np.float64, seed=1)
    ref = st.fit(x, y, g_sum_refresh_every=1, **kw)
    lazy = st.fit(x, y, g_sum_refresh_every=3, **kw)
    scale = max(np.abs(ref.beta).max(), 1.0)
    np.testing.assert_allclose(lazy.beta, ref.beta, atol=2e-3 * scale)


def test_bf16_head_close_to_f32():
    """bf16 head storage converges to the same solution at the loosened
    (~1e-2 relative) contract; solver accumulation stays f32."""
    import jax.numpy as jnp

    xs, y = _sparse_problem(n=400, p=64, family="binomial", seed=21)
    kw = dict(
        family="binomial", alpha=0.5, nlambda=6, batch_size=32, seed=7,
        hybrid=True, hybrid_max_head=32, hybrid_coverage=0.8,
    )
    ref = st.fit(xs, y, dtype=np.float32, **kw)
    b16 = st.fit(xs, y, dtype=np.float32, hybrid_head_dtype=jnp.bfloat16, **kw)
    scale = max(np.abs(ref.beta).max(), 1.0)
    assert np.max(np.abs(b16.beta - ref.beta)) <= 2e-2 * scale
    assert np.max(np.abs(b16.a0 - ref.a0)) <= 2e-2 * max(np.abs(ref.a0).max(), 1.0)


def test_bf16_hybrid_layout_exact_split():
    """The bf16 head layout is still an exact column split (values rounded
    to bf16, tail untouched at full precision)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.normal(size=(50, 20)) * (rng.random((50, 20)) < 0.4)
    xh, perm = HybridCSR.split_columns(
        sp.csr_matrix(x), coverage=0.6, max_head=8, head_dtype=jnp.bfloat16
    )
    assert xh.head.dtype == jnp.bfloat16
    assert xh.tail.values.dtype == jnp.float32
    dense = np.asarray(xh.head.astype(jnp.float32)) + np.asarray(
        xh.tail.to_dense()[:, : xh.n_cols]
    )
    np.testing.assert_allclose(dense, x[:, perm], atol=4e-3 * max(np.abs(x).max(), 1))
    # matvec_T accumulates wider than bf16
    v = rng.normal(size=(50, 2)).astype(np.float32)
    got = np.asarray(xh.matvec_T(jnp.asarray(v)))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, x[:, perm].T @ v, atol=2e-2 * np.abs(x.T @ v).max())
