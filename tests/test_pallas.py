"""Fused Pallas head-step kernel tests (solver/pallas_kernels.py).

On CPU the kernel runs in interpret mode — numerically identical code path
to the TPU compile, exercised against the plain-XLA solver.  Only the
scalar-prefetch variant exists (the round-1 slice-fed kernel always lost
to XLA and was removed), so all tests drive `fused_head_step_at` and the
block-sampling solver path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdnet_tpu.solver.pallas_kernels import fused_head_step_at, supported
from tests.helpers import random_data

INTERPRET = jax.default_backend() != "tpu"


def _reference(xb, w, lpe, yb, gm, wb, family):
    lp = xb @ w.T + lpe
    if family in ("gaussian", "mgaussian"):
        gr = lp - yb
    elif family == "binomial":
        gr = jax.nn.sigmoid(lp) - yb
    else:
        gr = jax.nn.softmax(lp, axis=1) - yb
    g_ref = gr * wb[:, None]
    corr_ref = (g_ref - gm).T @ xb
    return g_ref, corr_ref


@pytest.mark.parametrize(
    "family,k",
    [("gaussian", 1), ("binomial", 1), ("multinomial", 3), ("mgaussian", 2)],
)
def test_kernel_matches_reference(family, k):
    rng = np.random.default_rng(0)
    n_pad, B, D = 256, 128, 256
    head = jnp.asarray(rng.normal(size=(n_pad, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, D)).astype(np.float32))
    lpe = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))
    if family == "binomial":
        y = jnp.asarray((rng.random((n_pad, k)) < 0.5).astype(np.float32))
    elif family == "multinomial":
        y = jnp.asarray(np.eye(k, dtype=np.float32)[rng.integers(0, k, n_pad)])
    else:
        y = jnp.asarray(rng.normal(size=(n_pad, k)).astype(np.float32))
    gm = jnp.asarray(rng.normal(size=(n_pad, k)).astype(np.float32))
    wb = jnp.asarray((rng.random(B) < 0.9).astype(np.float32))

    assert supported(B, D, k)
    for start in (0, 128):
        yb, gmb = y[start : start + B], gm[start : start + B]
        g, corr = fused_head_step_at(
            head, jnp.int32(start), w, lpe, yb, gmb, wb, B, family, interpret=INTERPRET
        )
        g_ref, corr_ref = _reference(head[start : start + B], w, lpe, yb, gmb, wb, family)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(corr), np.asarray(corr_ref), atol=2e-3)


@pytest.mark.parametrize("variant,kp_lanes", [("vpu", 8), ("mxu", 8), ("mxu", 128)])
def test_kernel_variants_match(variant, kp_lanes):
    """Both compute formulations and lane paddings agree."""
    rng = np.random.default_rng(3)
    n_pad, B, D, k = 512, 128, 256, 1
    head = jnp.asarray(rng.normal(size=(n_pad, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, D)).astype(np.float32))
    lpe = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))
    y = jnp.asarray((rng.random((n_pad, k)) < 0.5).astype(np.float32))
    gm = jnp.asarray(rng.normal(size=(n_pad, k)).astype(np.float32))
    wb = jnp.ones((B,), jnp.float32)
    for start in (0, 384):
        yb, gmb = y[start : start + B], gm[start : start + B]
        g, corr = fused_head_step_at(
            head, jnp.int32(start), w, lpe, yb, gmb, wb, B, "binomial",
            interpret=INTERPRET, variant=variant, kp_lanes=kp_lanes,
        )
        g_ref, corr_ref = _reference(head[start : start + B], w, lpe, yb, gmb, wb, "binomial")
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(corr), np.asarray(corr_ref), atol=2e-3)


def test_bf16_head_kernel():
    """bf16 tiles run the single-pass bf16 MXU path with f32 accumulation."""
    rng = np.random.default_rng(7)
    n_pad, B, D, k = 256, 128, 256, 1
    head32 = rng.normal(size=(n_pad, D)).astype(np.float32)
    head = jnp.asarray(head32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, D)).astype(np.float32))
    lpe = jnp.zeros((B, k), jnp.float32)
    y = jnp.asarray((rng.random((n_pad, k)) < 0.5).astype(np.float32))
    gm = jnp.zeros((n_pad, k), jnp.float32)
    wb = jnp.ones((B,), jnp.float32)
    g, corr = fused_head_step_at(
        head, jnp.int32(128), w, lpe, y[128:], gm[128:], wb, B, "binomial",
        interpret=INTERPRET,
    )
    xb = np.asarray(head[128:], np.float32)  # the bf16-rounded data IS the data
    g_ref, corr_ref = _reference(
        jnp.asarray(xb), w, lpe, y[128:], gm[128:], wb, "binomial"
    )
    # the kernel also casts w to bf16 for the single-pass MXU matmul, so lp
    # carries ~0.4% of the sum of |terms| — compare loosely
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=3e-2)
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(corr_ref), atol=2e-2 * max(np.abs(np.asarray(corr_ref)).max(), 1)
    )


def test_fit_block_pallas_matches_xla():
    """End-to-end block-sampling fit through the prefetch kernel."""
    import sgdnet_tpu as st

    x, y = random_data(n=256, p=16, family="binomial", seed=5)
    common = dict(
        family="binomial", nlambda=4, thresh=1e-5, maxit=300, batch_size=64,
        sampling="block",
    )
    f_xla = st.fit(x, y, use_pallas=False, **common)
    f_pal = st.fit(x, y, use_pallas=True, lambda_path=f_xla.lambda_, **common)
    np.testing.assert_allclose(f_pal.beta, f_xla.beta, atol=1e-4)


def test_permutation_mode_falls_back_to_xla():
    """use_pallas with permutation sampling silently uses the XLA step (the
    kernel needs a block offset); the fit must still be correct."""
    import sgdnet_tpu as st

    x, y = random_data(n=256, p=16, family="binomial", seed=5)
    common = dict(family="binomial", nlambda=4, thresh=1e-5, maxit=300, batch_size=64)
    f_ref = st.fit(x, y, sampling="permutation", use_pallas=False, **common)
    f_try = st.fit(
        x, y, sampling="permutation", use_pallas=True, lambda_path=f_ref.lambda_, **common
    )
    np.testing.assert_allclose(f_try.beta, f_ref.beta, atol=1e-12)
