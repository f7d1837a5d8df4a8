"""Convergence-protocol module tests (reference data-raw/benchmarks.R)."""

import numpy as np

from sgdnet_tpu.benchmarks import convergence_curve
from tests.helpers import random_data


def test_convergence_curve_tightens():
    x, y = random_data(n=200, p=5, seed=1)
    c = convergence_curve(x, y, tolerances=[0.5, 1e-2, 1e-4], dtype=np.float64)
    assert c["losses"].shape == (3,)
    # tighter tolerance -> no worse loss, more epochs
    assert c["losses"][-1] <= c["losses"][0] + 1e-12
    assert c["epochs"][-1] >= c["epochs"][0]


def test_convergence_curve_binomial():
    x, y = random_data(n=200, p=4, family="binomial", seed=2)
    c = convergence_curve(x, y, family="binomial", alpha=0.0, tolerances=[0.1, 1e-3], dtype=np.float64)
    assert np.isfinite(c["losses"]).all()
    assert c["losses"][1] <= c["losses"][0] + 1e-12


def test_convergence_curve_trace_matches_protocol():
    """The one-dispatch trace curve (round 4) is monotone-tightening and its
    tail loss agrees with the refit-sweep protocol's tightest point on the
    same problem (both report the original-scale mean family loss)."""
    from sgdnet_tpu.benchmarks.convergence import convergence_curve_trace

    x, y = random_data(n=200, p=5, seed=1)
    tr = convergence_curve_trace(x, y, maxit=400, dtype=np.float64)
    assert np.isfinite(tr["losses"]).all()
    assert (np.diff(tr["times"]) > 0).all()
    assert tr["losses"][-1] <= tr["losses"][0] + 1e-12
    sweep = convergence_curve(x, y, tolerances=[1e-5], maxit=400, dtype=np.float64)
    assert abs(tr["losses"][-1] - sweep["losses"][-1]) <= 1e-3 * max(
        sweep["losses"][-1], 1e-9
    )
