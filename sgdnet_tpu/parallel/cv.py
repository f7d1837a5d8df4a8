"""Fold-parallel cross-validation.

The reference runs its nfolds x nalpha refits in a serial R loop
(reference R/cv_sgdnet.R:178-200).  Here every fold is expressed as a 0/1
sample-weight mask over the SAME padded design matrix, so all fold fits
share one compiled program; folds are mapped over a 'folds' mesh axis with
shard_map (each device runs its local folds; there are no collectives —
fold fits are independent), with per-fold weighted standardization and
scoring inside the traced computation.

Dense design matrices only (a fold-masked sparse fit would need per-fold
re-scaled values); auc falls back to the serial path in api/cv.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from sgdnet_tpu.families import get_family
from sgdnet_tpu.penalties import select_penalty
from sgdnet_tpu.solver.saga import SolverConfig, fit_path, init_state
from sgdnet_tpu.solver.stepsize import saga_step_sizes

FOLD_AXIS = "folds"


def _traced_score(family, type_measure: str, lp, y, mask):
    """Per-lambda score on the masked (test) rows; lp (n, k), y (n, ky)."""
    m = jnp.maximum(jnp.sum(mask), 1e-12)
    name = family.name
    if name in ("gaussian", "mgaussian"):
        r = lp - y
        if type_measure in ("deviance", "mse"):
            per = jnp.sum(r * r, axis=1)
        elif type_measure == "mae":
            per = jnp.sum(jnp.abs(r), axis=1)
        else:
            raise ValueError(type_measure)
        return jnp.sum(per * mask) / m
    if name == "binomial":
        prob = 1.0 / (1.0 + jnp.exp(-lp[:, 0]))
        yb = y[:, 0]
        if type_measure == "deviance":
            p_ = jnp.clip(prob, 1e-5, 1 - 1e-5)
            per = -2.0 * ((1 - yb) * jnp.log(1 - p_) + yb * jnp.log(p_))
        elif type_measure == "mse":
            per = (prob + (1 - yb) - 1) ** 2 + (prob - yb) ** 2
        elif type_measure == "mae":
            per = jnp.abs(prob + (1 - yb) - 1) + jnp.abs(prob - yb)
        elif type_measure == "class":
            per = (1 - yb) * (prob > 0.5) + yb * (prob <= 0.5)
        else:
            raise ValueError(type_measure)
        return jnp.sum(per * mask) / m
    if name == "multinomial":
        prob = jax.nn.softmax(lp, axis=1)
        if type_measure == "deviance":
            p_ = jnp.clip(prob, 1e-5, 1 - 1e-5)
            per = -2.0 * jnp.sum(y * jnp.log(p_), axis=1)
        elif type_measure == "mse":
            per = jnp.sum((y - prob) ** 2, axis=1)
        elif type_measure == "mae":
            per = jnp.sum(jnp.abs(y - prob), axis=1)
        elif type_measure == "class":
            per = (jnp.argmax(prob, axis=1) != jnp.argmax(y, axis=1)).astype(prob.dtype)
        else:
            raise ValueError(type_measure)
        return jnp.sum(per * mask) / m
    raise ValueError(name)


def _fold_fit_and_score(
    x, y_enc, train_w, valid, lambdas, mix, top_sq_hint,
    family, penalty, config: SolverConfig, type_measure: str, tol, key,
    standardize: bool = True,
):
    """One fold, fully traced: weighted standardize -> fit path -> score."""
    dtype = x.dtype
    n_pad, p = x.shape
    k = family.n_classes

    w64 = train_w.astype(dtype)
    W = jnp.maximum(jnp.sum(w64), 1e-12)
    if standardize:
        wm = jnp.sum(x * w64[:, None], axis=0) / W
        wvar = jnp.sum(w64[:, None] * (x - wm) ** 2, axis=0) / W
        ws = jnp.where(wvar == 0.0, 1.0, jnp.sqrt(wvar))
        x_std = (x - wm) / ws
    else:
        x_std = x

    y_proc, y_center, y_scale = family.preprocess(y_enc, train_w)
    max_scale = jnp.max(y_scale)
    l2s = ((1.0 - mix) * lambdas / max_scale).astype(dtype)
    l1s = (mix * lambdas / max_scale).astype(dtype)

    per_row = jnp.sum(x_std.astype(dtype) ** 2, axis=1)
    max_sq = jnp.max(per_row * (train_w > 0))
    gammas = saga_step_sizes(
        max_sq, top_sq_hint, l2s, W, config.batch_size, config.fit_intercept, family.L_scaling
    ).astype(dtype)

    state0 = init_state(n_pad, p, k, dtype)
    null_int = family.null_intercept(y_proc, config.fit_intercept, train_w)
    state0 = state0._replace(intercept=null_int.astype(dtype))

    state, n_iter, results = fit_path(
        x_std.astype(dtype), y_proc.astype(dtype), train_w.astype(dtype), None,
        gammas, l1s, l2s, tol, key, state0, family, penalty, config,
    )

    # score every path point on the held-out rows (test = valid & not train)
    test_mask = valid * (train_w == 0)

    def score_one(carry, i):
        w_l = results.w[i]  # (k, p) standardized scale
        b_l = results.intercept[i]
        lp = jnp.dot(x_std.astype(dtype), w_l.T, preferred_element_type=dtype) + b_l
        # undo the response standardization for gaussian scoring
        lp_orig = lp * y_scale.astype(dtype) + y_center.astype(dtype)
        return carry, _traced_score(family, type_measure, lp_orig, y_enc.astype(dtype), test_mask)

    _, scores = jax.lax.scan(score_one, 0, jnp.arange(lambdas.shape[0]))
    return scores


@partial(
    jax.jit,
    static_argnames=("family", "penalty", "config", "type_measure", "mesh", "standardize"),
)
def _run_folds(
    x, y_enc, fold_train_w, valid, lambdas, mix, top_sq_hint, tol, key,
    family, penalty, config, type_measure, mesh, standardize=True,
):
    def local(x_l, y_l, fw_l, valid_l, lambdas, mix, top_sq, tol, key):
        def one(fw):
            return _fold_fit_and_score(
                x_l, y_l, fw, valid_l, lambdas, mix, top_sq,
                family, penalty, config, type_measure, tol, key,
                standardize=standardize,
            )

        return jax.lax.map(one, fw_l)  # (local_folds, nl)

    if mesh is None:
        return local(x, y_enc, fold_train_w, valid, lambdas, mix, top_sq_hint, tol, key)
    spec = (
        P(None, None),  # x replicated
        P(None, None),  # y
        P(FOLD_AXIS, None),  # fold weights sharded over folds
        P(None),  # valid mask
        P(None), P(), P(), P(), P(None),
    )
    try:
        fn = shard_map(local, mesh=mesh, in_specs=spec, out_specs=P(FOLD_AXIS, None), check_vma=False)
    except TypeError:
        fn = shard_map(local, mesh=mesh, in_specs=spec, out_specs=P(FOLD_AXIS, None), check_rep=False)
    return fn(x, y_enc, fold_train_w, valid, lambdas, mix, top_sq_hint, tol, key)


def parallel_fold_scores(
    x, y, foldid, nfolds, alpha, lambda_path, type_measure="deviance",
    mesh=None, batch_size: int = 32, dtype=jnp.float32, maxit: int = 1000,
    thresh: float = 1e-3, intercept: bool = True, standardize: bool = True,
    seed: int = 0, family: str = "gaussian", **_ignored,
):
    """Scores (nfolds, n_lambda) with all folds fitted in parallel.

    `mesh` is a 1-D Mesh over a 'folds' axis (or None for a single-device
    vectorized run).  Requires dense x and a traced-computable
    `type_measure` (not 'auc').
    """
    if type_measure == "auc":
        raise ValueError("auc is not supported by the parallel CV path")

    x = np.asarray(x, dtype=np.float64)
    n, p = x.shape
    fam = get_family(family)
    y_enc, _ = fam.encode(np.asarray(y))
    penalty = select_penalty(float(alpha), family)

    n_shards = 1 if mesh is None else int(mesh.devices.size)
    folds_pad = ((nfolds + n_shards - 1) // n_shards) * n_shards
    n_pad = ((n + batch_size - 1) // batch_size) * batch_size

    x_pad = np.zeros((n_pad, p))
    x_pad[:n] = x
    y_pad = np.zeros((n_pad, y_enc.shape[1]))
    y_pad[:n] = y_enc
    valid = np.zeros(n_pad)
    valid[:n] = 1.0

    fold_w = np.zeros((folds_pad, n_pad))
    for j in range(nfolds):
        fold_w[j, :n] = (foldid != j).astype(np.float64)  # train on k-1 folds

    from sgdnet_tpu.solver.stepsize import power_iteration_sq_norm

    x_dev = jnp.asarray(x_pad, dtype)
    # safety margin: a fold's top singular value can mildly exceed full-data
    x_hint = (
        (x_dev - x_dev.mean(0)) / jnp.maximum(x_dev.std(0), 1e-12) if standardize else x_dev
    )
    top_sq = power_iteration_sq_norm(x_hint) / max(n, 1) * 1.2

    config = SolverConfig(batch_size=batch_size, max_iter=maxit, fit_intercept=intercept)

    fold_w_dev = jnp.asarray(fold_w, dtype)
    if mesh is not None:
        fold_w_dev = jax.device_put(fold_w_dev, NamedSharding(mesh, P(FOLD_AXIS, None)))

    scores = _run_folds(
        x_dev,
        jnp.asarray(y_pad, dtype),
        fold_w_dev,
        jnp.asarray(valid, dtype),
        jnp.asarray(np.asarray(lambda_path), dtype),
        jnp.asarray(float(alpha), dtype),
        jnp.asarray(top_sq, dtype),
        jnp.asarray(thresh, dtype),
        jax.random.PRNGKey(seed),
        fam,
        penalty,
        config,
        type_measure,
        mesh,
        standardize=standardize,
    )
    return np.asarray(scores)[:nfolds]
