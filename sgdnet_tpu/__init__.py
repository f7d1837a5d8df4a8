"""sgdnet_tpu — TPU-native elastic-net GLMs via batched SAGA.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference R package `sgdnet` (elastic-net regularized gaussian, binomial,
multinomial and multivariate-gaussian GLMs fitted with the SAGA
incremental-gradient algorithm over a warm-started lambda path), built
TPU-first: minibatch MXU-shaped updates, padded-CSR sparse support, and
mesh-sharded multi-chip execution.
"""

from sgdnet_tpu.api.fit import SgdnetFit, fit
from sgdnet_tpu.api.predict import predict
from sgdnet_tpu.api.score import score
from sgdnet_tpu.core.layout import LayoutPlan, plan_layout
from sgdnet_tpu.core.sparse import PaddedCSR

__version__ = "0.1.0"

__all__ = [
    "fit", "predict", "score", "SgdnetFit", "PaddedCSR", "cv_fit",
    "plan_layout", "LayoutPlan",
]


def cv_fit(*args, **kwargs):
    from sgdnet_tpu.api.cv import cv_fit as _cv_fit

    return _cv_fit(*args, **kwargs)
