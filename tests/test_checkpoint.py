"""Checkpoint/resume tests (SURVEY.md §5: warm-start state serialization)."""

import numpy as np

import sgdnet_tpu as st
from sgdnet_tpu.utils.checkpoint import load_state, save_state
from tests.helpers import random_data


def test_save_load_roundtrip(tmp_path):
    x, y = random_data(n=100, p=5, seed=1)
    fit = st.fit(x, y, nlambda=5, dtype=np.float64)
    path = str(tmp_path / "state.npz")
    save_state(path, fit.final_state, meta={"lambda": list(map(float, fit.lambda_))})
    state, meta = load_state(path)
    np.testing.assert_array_equal(np.asarray(state.w), np.asarray(fit.final_state.w))
    np.testing.assert_array_equal(np.asarray(state.g_mem), np.asarray(fit.final_state.g_mem))
    assert meta["lambda"][0] == fit.lambda_[0]


def test_warm_resume_extends_path(tmp_path):
    """Fit the head of a path, checkpoint, resume on the remaining lambdas;
    compare against an uninterrupted run."""
    x, y = random_data(n=120, p=5, seed=2)
    full = st.fit(x, y, nlambda=10, thresh=1e-6, dtype=np.float64)

    head = st.fit(x, y, lambda_path=full.lambda_[:5], thresh=1e-6, dtype=np.float64)
    path = str(tmp_path / "ck.npz")
    save_state(path, head.final_state)
    state, _ = load_state(path)
    tail = st.fit(
        x, y, lambda_path=full.lambda_[5:], thresh=1e-6, warm_state=state, dtype=np.float64
    )
    scale = max(1.0, np.abs(full.beta).max())
    np.testing.assert_allclose(tail.beta, full.beta[5:], atol=2e-3 * scale)
