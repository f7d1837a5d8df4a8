"""Generate the loss-vs-time convergence figures (the reference's
vignettes/benchmarks.Rmd analog) into docs/.  Runs on CPU.

    python tools/make_bench_figures.py
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from sgdnet_tpu.benchmarks import run_reference_protocol


def main():
    res = run_reference_protocol(dtype=np.float64)
    fig, axes = plt.subplots(1, len(res) // 2, figsize=(5 * len(res) // 2, 3.6), squeeze=False)
    by_dataset = {}
    for key, v in res.items():
        name, pen = key.split("/")
        by_dataset.setdefault(name, {})[pen] = v
    for ax, (name, pens) in zip(axes.ravel(), by_dataset.items()):
        for pen, v in pens.items():
            order = np.argsort(v["times"])
            ax.plot(v["times"][order], v["losses"][order], marker="o", ms=3, label=pen)
        ax.set_xlabel("wall time (s)")
        ax.set_ylabel("objective loss")
        ax.set_title(f"{name} (lambda = 1/n)")
        ax.set_xscale("log")
        ax.legend()
    fig.suptitle("Convergence: loss vs time (reference benchmark protocol)")
    fig.tight_layout()
    fig.savefig("docs/convergence.png", dpi=120)
    print("wrote docs/convergence.png")
    for k, v in res.items():
        print(k, "final loss", v["losses"][-1], "epochs", v["epochs"][-1], "time", v["times"][-1])


if __name__ == "__main__":
    main()
