"""Checkpoint / resume for SAGA solver state.

The reference's only "checkpointing" is warm-starting along the lambda path
in memory (reference src/sgdnet.cpp:187-198; SURVEY.md §5).  For long
sparse runs this module serializes the full warm-start state — coefficients,
intercept, per-sample gradient memory and gradient average — so a path fit
can be resumed across processes: save after `fit(...)` via the returned
state, reload and pass as `warm_state=`.

Format: a single .npz (portable, no orbax dependency); arrays are converted
host-side.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from sgdnet_tpu.solver.saga import SagaState

_FIELDS = ("w", "intercept", "g_mem", "g_sum", "g_sum_intercept")


def save_state(path: str, state: SagaState, meta: dict | None = None) -> None:
    """Serialize a SagaState (+ JSON-able metadata) to `path` (.npz)."""
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str, dtype=None):
    """Load (SagaState, meta) from `path`."""
    with np.load(path) as z:
        arrays = {f: z[f] for f in _FIELDS}
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode("utf-8"))
    if dtype is not None:
        arrays = {k: v.astype(dtype) for k, v in arrays.items()}
    return SagaState(**{k: jnp.asarray(v) for k, v in arrays.items()}), meta
