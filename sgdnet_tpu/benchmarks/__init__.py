from sgdnet_tpu.benchmarks.convergence import convergence_curve, run_reference_protocol

__all__ = ["convergence_curve", "run_reference_protocol"]
