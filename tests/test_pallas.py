"""Fused Pallas head-step kernel tests (solver/pallas_kernels.py).

On CPU the kernel runs in interpret mode — numerically identical code path
to the TPU compile, exercised against the plain-XLA solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdnet_tpu.solver.pallas_kernels import fused_head_step, supported
from tests.helpers import random_data

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize(
    "family,k",
    [("gaussian", 1), ("binomial", 1), ("multinomial", 3), ("mgaussian", 2)],
)
def test_kernel_matches_reference(family, k):
    rng = np.random.default_rng(0)
    B, D = 128, 256
    xb = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, D)).astype(np.float32))
    lpe = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))
    if family == "binomial":
        yb = jnp.asarray((rng.random((B, k)) < 0.5).astype(np.float32))
    elif family == "multinomial":
        yb = jnp.asarray(np.eye(k, dtype=np.float32)[rng.integers(0, k, B)])
    else:
        yb = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))
    gm = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))
    wb = jnp.asarray((rng.random(B) < 0.9).astype(np.float32))

    assert supported(B, D, k)
    g, corr = fused_head_step(xb, w, lpe, yb, gm, wb, family, interpret=INTERPRET)

    lp = xb @ w.T + lpe
    if family in ("gaussian", "mgaussian"):
        gr = lp - yb
    elif family == "binomial":
        gr = jax.nn.sigmoid(lp) - yb
    else:
        gr = jax.nn.softmax(lp, axis=1) - yb
    g_ref = gr * wb[:, None]
    corr_ref = (g_ref - gm).T @ xb
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(corr_ref), atol=2e-3)


def test_fit_with_pallas_matches_xla():
    """End-to-end: a fit with the fused kernel reproduces the XLA fit."""
    import sgdnet_tpu as st

    x, y = random_data(n=256, p=16, family="binomial", seed=1)
    common = dict(family="binomial", nlambda=4, thresh=1e-5, maxit=300, batch_size=64)
    f_xla = st.fit(x, y, use_pallas=False, **common)
    f_pal = st.fit(x, y, use_pallas=True, lambda_path=f_xla.lambda_, **common)
    np.testing.assert_allclose(f_pal.beta, f_xla.beta, atol=1e-4)
    np.testing.assert_allclose(f_pal.a0, f_xla.a0, atol=1e-4)


def test_unsupported_shapes_fall_back():
    from sgdnet_tpu.solver.pallas_kernels import supported as sup

    assert not sup(100, 64, 1)  # batch not divisible by a tile size
    assert not sup(256, 64, 200)  # too many classes


def test_kernel_bf16_head():
    """bf16 xb tiles: outputs stay f32 and match the f32 kernel at the
    bf16-rounding tolerance."""
    rng = np.random.default_rng(3)
    B, D, k = 128, 256, 1
    xb32 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, D)).astype(np.float32))
    lpe = jnp.zeros((B, k), jnp.float32)
    yb = jnp.asarray((rng.random((B, k)) < 0.5).astype(np.float32))
    gm = jnp.zeros((B, k), jnp.float32)
    wb = jnp.ones((B,), jnp.float32)

    g32, c32 = fused_head_step(xb32, w, lpe, yb, gm, wb, "binomial", interpret=INTERPRET)
    g16, c16 = fused_head_step(
        xb32.astype(jnp.bfloat16), w, lpe, yb, gm, wb, "binomial", interpret=INTERPRET
    )
    assert g16.dtype == jnp.float32 and c16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32), atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(c16), np.asarray(c32), atol=5e-2 * max(1.0, float(jnp.abs(c32).max()))
    )


@pytest.mark.parametrize("variant,kp_lanes", [("vpu", 8), ("mxu", 8), ("mxu", 128)])
def test_prefetch_kernel_matches_reference(variant, kp_lanes):
    """Full-head scalar-prefetch variant (block sampling path)."""
    from sgdnet_tpu.solver.pallas_kernels import fused_head_step_at

    rng = np.random.default_rng(3)
    n_pad, B, D, k = 512, 128, 256, 1
    head = jnp.asarray(rng.normal(size=(n_pad, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, D)).astype(np.float32))
    lpe = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))
    y = jnp.asarray((rng.random((n_pad, k)) < 0.5).astype(np.float32))
    gm = jnp.asarray(rng.normal(size=(n_pad, k)).astype(np.float32))
    wb = jnp.ones((B,), jnp.float32)
    for start in (0, 128, 384):
        yb, gmb = y[start : start + B], gm[start : start + B]
        g, corr = fused_head_step_at(
            head, jnp.int32(start), w, lpe, yb, gmb, wb, B, "binomial",
            interpret=INTERPRET, variant=variant, kp_lanes=kp_lanes,
        )
        xb = head[start : start + B]
        g_ref = (jax.nn.sigmoid(xb @ w.T + lpe) - yb) * wb[:, None]
        corr_ref = (g_ref - gmb).T @ xb
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(corr), np.asarray(corr_ref), atol=2e-3)


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
