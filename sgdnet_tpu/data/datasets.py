"""Example datasets, exported from the reference package's data/
(reference R/data.R:40-191; see tools/export_datasets.py).

  abalone  (4177, 9)  gaussian    -- abalone rings
  heart    (270, 18)  binomial    -- heart disease (originally sparse)
  wine     (178, 13)  multinomial -- wine cultivars (3 classes)
  student  (382, 21)  mgaussian   -- student performance (2 responses)
"""

from __future__ import annotations

import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))


def load_dataset(name: str):
    """Load a bundled dataset; returns a dict with x, y and metadata."""
    path = os.path.join(_DIR, f"{name}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no bundled dataset '{name}'")
    with np.load(path, allow_pickle=False) as z:
        out = {k: z[k] for k in z.files}
    return out


def load_abalone():
    d = load_dataset("abalone")
    return d["x"], d["y"]


def load_heart(sparse: bool = False):
    d = load_dataset("heart")
    x = d["x"]
    if sparse:
        import scipy.sparse as sp

        x = sp.csr_matrix(x)
    return x, d["y"]


def load_wine():
    d = load_dataset("wine")
    return d["x"], d["y"]


def load_student():
    d = load_dataset("student")
    return d["x"], d["y"]
