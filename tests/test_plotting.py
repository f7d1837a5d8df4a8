"""Plot smoke tests (reference tests/testthat/test-plotting.R): every family
produces a figure, as does the CV plot."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import sgdnet_tpu as st
from tests.helpers import random_data


@pytest.mark.parametrize("family", ["gaussian", "binomial", "multinomial", "mgaussian"])
def test_plot_path_all_families(family):
    x, y = random_data(n=100, p=4, family=family, seed=1)
    fit = st.fit(x, y, family=family, nlambda=6, dtype=np.float64)
    for xvar in ["norm", "lambda", "dev"]:
        fig = fit.plot(xvar=xvar)
        assert fig is not None
        assert len(fig.axes) >= fit.beta.shape[1]
        import matplotlib.pyplot as plt

        plt.close(fig)


def test_plot_bad_xvar():
    x, y = random_data(n=60, p=3, seed=2)
    fit = st.fit(x, y, nlambda=4, dtype=np.float64)
    with pytest.raises(ValueError, match="xvar"):
        fit.plot(xvar="bogus")


def test_plot_cv():
    import matplotlib.pyplot as plt

    x, y = random_data(n=120, p=4, seed=3)
    cv = st.cv_fit(x, y, alpha=[0.2, 1.0], nfolds=4, nlambda=5, dtype=np.float64)
    fig = cv.plot()
    assert len(fig.axes) == 2
    plt.close(fig)
