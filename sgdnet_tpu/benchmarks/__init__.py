from sgdnet_tpu.benchmarks.convergence import convergence_curve, run_reference_protocol
from sgdnet_tpu.benchmarks.relative import normalize_curves, run_relative, sklearn_curve

__all__ = [
    "convergence_curve",
    "run_reference_protocol",
    "run_relative",
    "sklearn_curve",
    "normalize_curves",
]
