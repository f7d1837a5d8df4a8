"""Fold-parallel cross-validation.

The reference runs its nfolds x nalpha refits in a serial R loop
(reference R/cv_sgdnet.R:178-200).  Here every fold is expressed as a 0/1
sample-weight mask over the SAME padded design matrix, so all fold fits
share one compiled program; folds are mapped over a 'folds' mesh axis with
shard_map (each device runs its local folds; there are no collectives —
fold fits are independent), with per-fold weighted standardization and
scoring inside the traced computation.

Generality (round 2): every design-matrix layout (dense, PaddedCSR,
HybridCSR — per-fold scale-only standardization with the rank-1 centering
correction, exactly like the main solver), user `sample_weight` (fold mask
x user weights), `penalty_factor` / `lower_limits` / `upper_limits` /
`exclude` (pf passes through scale-free; box limits are mapped onto each
fold's standardized scale inside the trace), and the poisson family (the
data-dependent smoothness bound is computed once on the full response —
a fold's max count never exceeds the full data's, so the bound stays
valid).  `auc` and offsets fall back to the serial path in api/cv.py.
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

from sgdnet_tpu.core.sparse import HybridCSR, PaddedCSR
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
    if name == "poisson":
        # exact unit deviance (matches api/score.py and the honest
        # reporting loss, families.Poisson.loss_report)
        lpv = lp[:, 0]
        yv = y[:, 0]
        mu = jnp.exp(lpv)
        if type_measure == "deviance":
            ylogy = jnp.where(yv > 0, yv * jnp.log(jnp.maximum(yv, 1e-300)), 0.0)
            per = 2.0 * (mu - yv * lpv + ylogy - yv)
        elif type_measure == "mse":
            per = (mu - yv) ** 2
        elif type_measure == "mae":
            per = jnp.abs(mu - yv)
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


def _standardize_traced(x, train_w, standardize: bool, dtype):
    """Per-fold weighted standardization for any layout (traced).

    Returns (x_std, xc, x_scale): dense layouts get full center+scale with
    xc None; sparse layouts get scale-only values with the centering carried
    as the rank-1 `xc = center/scale` correction — the same algebra the main
    solver uses (api/fit.py standardization block)."""
    if not standardize:
        p = x.shape[1]
        return x, None, jnp.ones((p,), dtype)
    if isinstance(x, HybridCSR):
        mean, sd = x.column_stats(train_w)
        x_std, xc = x.standardize(mean, sd)
        return x_std, xc.astype(dtype), sd.astype(dtype)
    if isinstance(x, PaddedCSR):
        mean, sd = x.column_stats(train_w)
        x_std = x.scale_columns(sd)
        return x_std, (mean / sd).astype(dtype), sd.astype(dtype)
    w = train_w.astype(x.dtype)
    W = jnp.maximum(jnp.sum(w), 1e-12)
    wm = jnp.sum(x * w[:, None], axis=0) / W
    wvar = jnp.sum(w[:, None] * (x - wm) ** 2, axis=0) / W
    ws = jnp.where(wvar == 0.0, 1.0, jnp.sqrt(wvar))
    return (x - wm) / ws, None, ws.astype(dtype)


def _max_sq_row_norm(x, xc, active):
    """max_i ||x_i - c||^2 over rows with positive weight, any layout."""
    if isinstance(x, HybridCSR):
        per_row = x.row_squared_norms(xc)
    elif isinstance(x, PaddedCSR):
        vals = x.values
        per_row = jnp.sum(vals * vals, axis=1)
        if xc is not None:
            c = xc.astype(vals.dtype)
            cross = jnp.sum(vals * c[x.indices], axis=1)
            per_row = per_row - 2.0 * cross + jnp.sum(c * c)
    else:
        per_row = jnp.sum(x * x, axis=1)
    return jnp.max(per_row.astype(active.dtype) * active)


def _matmul_lp(x, xc, w_l, dtype):
    """Full-data linear predictors x_std @ w_l.T for any layout; (n, k)."""
    if isinstance(x, (PaddedCSR, HybridCSR)):
        lp = x.matmul_dense(w_l.T.astype(dtype)).astype(dtype)
    else:
        lp = jnp.dot(x.astype(dtype), w_l.T.astype(dtype), preferred_element_type=dtype)
    if xc is not None:
        lp = lp - jnp.dot(w_l.astype(dtype), xc.astype(dtype))
    return lp


def _fold_fit_and_score(
    x, y_enc, train_w, valid, lambdas, mix, top_sq_hint,
    family, penalty, config: SolverConfig, type_measure: str, tol, key,
    standardize: bool = True, pf=None, box_lo=None, box_hi=None,
):
    """One fold, fully traced: weighted standardize -> fit path -> score."""
    dtype = y_enc.dtype
    n_pad = y_enc.shape[0]
    p = x.shape[1]
    k = family.n_classes

    x_std, xc, x_scale = _standardize_traced(x, train_w, standardize, dtype)

    y_proc, y_center, y_scale = family.preprocess(y_enc, train_w)
    max_scale = jnp.max(y_scale)
    l2s = ((1.0 - mix) * lambdas / max_scale).astype(dtype)
    l1s = (mix * lambdas / max_scale).astype(dtype)

    W = jnp.maximum(jnp.sum(train_w), 1e-12)
    max_sq = _max_sq_row_norm(x_std, xc, (train_w > 0).astype(dtype))
    gammas = saga_step_sizes(
        max_sq, top_sq_hint, l2s, W, config.batch_size, config.fit_intercept, family.L_scaling
    ).astype(dtype)

    # box limits on this fold's standardized scale (api/fit.py box algebra)
    box = None
    if box_lo is not None:
        sc = x_scale[None, :] / y_scale.astype(dtype)[:, None]  # (k, p)
        box = (box_lo.astype(dtype)[None, :] * sc, box_hi.astype(dtype)[None, :] * sc)

    state0 = init_state(n_pad, p, k, dtype)
    null_int = family.null_intercept(y_proc, config.fit_intercept, train_w)
    state0 = state0._replace(intercept=null_int.astype(dtype))

    state, n_iter, results = fit_path(
        x_std, y_proc.astype(dtype), train_w.astype(dtype), xc,
        gammas, l1s, l2s, tol, key, state0, family, penalty, config,
        pf=pf, box=box,
    )

    # score every path point on the held-out rows (test = valid & not train)
    test_mask = valid * (train_w == 0)

    def score_one(carry, i):
        w_l = results.w[i]  # (k, p) standardized scale
        b_l = results.intercept[i]
        lp = _matmul_lp(x_std, xc, w_l, dtype) + b_l
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
    pf=None, box_lo=None, box_hi=None,
):
    def local(x_l, y_l, fw_l, valid_l, lambdas, mix, top_sq, tol, key, pf_l, lo_l, hi_l):
        def one(fw):
            return _fold_fit_and_score(
                x_l, y_l, fw, valid_l, lambdas, mix, top_sq,
                family, penalty, config, type_measure, tol, key,
                standardize=standardize, pf=pf_l, box_lo=lo_l, box_hi=hi_l,
            )

        return jax.lax.map(one, fw_l)  # (local_folds, nl)

    if mesh is None:
        return local(
            x, y_enc, fold_train_w, valid, lambdas, mix, top_sq_hint, tol, key,
            pf, box_lo, box_hi,
        )
    rep = lambda a: None if a is None else jax.tree_util.tree_map(lambda _: P(*(None,) * _.ndim), a)  # noqa: E731
    spec = (
        rep(x),  # x replicated (dense array or sparse pytree)
        P(None, None),  # y
        P(FOLD_AXIS, None),  # fold weights sharded over folds
        P(None),  # valid mask
        P(None), P(), P(), P(), P(None),
        rep(pf), rep(box_lo), rep(box_hi),
    )
    try:
        fn = shard_map(local, mesh=mesh, in_specs=spec, out_specs=P(FOLD_AXIS, None), check_vma=False)
    except TypeError:
        fn = shard_map(local, mesh=mesh, in_specs=spec, out_specs=P(FOLD_AXIS, None), check_rep=False)
    return fn(
        x, y_enc, fold_train_w, valid, lambdas, mix, top_sq_hint, tol, key,
        pf, box_lo, box_hi,
    )


def parallel_fold_scores(
    x, y, foldid, nfolds, alpha, lambda_path, type_measure="deviance",
    mesh=None, batch_size: int = 32, dtype=jnp.float32, maxit: int = 1000,
    thresh: float = 1e-3, intercept: bool = True, standardize: bool = True,
    seed: int = 0, family: str = "gaussian", sample_weight=None,
    penalty_factor=None, lower_limits=None, upper_limits=None, exclude=None,
    type_multinomial: str = "ungrouped", standardize_response: bool = False,
    poisson_smoothness=None, intercept_decay=None, sparse_mode=None,
    **_ignored,
):
    """Scores (nfolds, n_lambda) with all folds fitted in parallel.

    `mesh` is a 1-D Mesh over a 'folds' axis (or None for a single-device
    vectorized run).  Supports dense / scipy-sparse / PaddedCSR / HybridCSR
    designs, sample weights, penalty factors, box limits, exclusions, and
    every family except `type_measure='auc'` and offset fits (those use the
    serial path, api/cv.py).
    """
    if type_measure == "auc":
        raise ValueError("auc is not supported by the parallel CV path")

    # accept every layout fit() accepts (scipy converts to hybrid/padded)
    from sgdnet_tpu.api.fit import _as_design_matrix

    x, is_sparse, col_perm = _as_design_matrix(x, dtype)
    n, p = x.shape

    fam = get_family(
        family, standardize_response=standardize_response
    )
    y_enc, _ = fam.encode(np.asarray(y))
    if family == "poisson":
        # data-dependent curvature bound from the FULL response: every fold's
        # counts are a subset, so the full-data bound is valid per fold
        if poisson_smoothness is None:
            ym = y_enc[:, 0]
            bound = max(float(ym.max()) * 2.0, float(ym.mean()) * 4.0, 2.0)
        else:
            bound = float(poisson_smoothness)
        fam = get_family("poisson", smoothness=float(2.0 ** np.ceil(np.log2(bound))))
    penalty = select_penalty(float(alpha), family, type_multinomial)

    # ---- penalty factors / exclusions / box limits (host-side, same
    # normalization as api/fit.py; lambda paths come from the full fits so
    # no lambda_max bookkeeping is needed here) ----
    excl_mask = None
    if exclude is not None:
        ex = np.atleast_1d(np.asarray(exclude, dtype=np.int64)).ravel()
        excl_mask = np.zeros(p, dtype=bool)
        excl_mask[ex] = True
    pf_np = None
    if penalty_factor is not None:
        pf_np = np.asarray(penalty_factor, dtype=np.float64).ravel()
        inf_pf = np.isinf(pf_np)
        if inf_pf.any():
            excl_mask = inf_pf if excl_mask is None else (excl_mask | inf_pf)
            pf_np = np.where(inf_pf, 1.0, pf_np)
    lo_np = hi_np = None
    if lower_limits is not None:
        lo_np = np.broadcast_to(np.asarray(lower_limits, np.float64), (p,)).copy()
    if upper_limits is not None:
        hi_np = np.broadcast_to(np.asarray(upper_limits, np.float64), (p,)).copy()
    if col_perm is not None:  # hybrid layout permutes columns
        if pf_np is not None:
            pf_np = pf_np[col_perm]
        if excl_mask is not None:
            excl_mask = excl_mask[col_perm]
        if lo_np is not None:
            lo_np = lo_np[col_perm]
        if hi_np is not None:
            hi_np = hi_np[col_perm]
    if pf_np is not None:
        sel = ~excl_mask if excl_mask is not None else np.ones(p, bool)
        if sel.any():
            m = float(pf_np[sel].mean())
            if m > 0:
                pf_np = pf_np / m
    box_lo = box_hi = None
    if lo_np is not None or hi_np is not None or excl_mask is not None:
        lo = lo_np if lo_np is not None else np.full(p, -np.inf)
        hi = hi_np if hi_np is not None else np.full(p, np.inf)
        if excl_mask is not None:
            lo, hi = lo.copy(), hi.copy()
            lo[excl_mask] = 0.0
            hi[excl_mask] = 0.0
        box_lo, box_hi = jnp.asarray(lo, dtype), jnp.asarray(hi, dtype)
    pf_dev = None if pf_np is None else jnp.asarray(pf_np, dtype)

    sw = None
    if sample_weight is not None:
        sw = np.asarray(sample_weight, dtype=np.float64)
        if sw.shape != (n,):
            raise ValueError("sample_weight must have one entry per sample")

    n_shards = 1 if mesh is None else int(mesh.devices.size)
    folds_pad = ((nfolds + n_shards - 1) // n_shards) * n_shards
    n_pad = ((n + batch_size - 1) // batch_size) * batch_size

    if is_sparse:
        x_dev = x.pad_rows(n_pad)
    else:
        x_np = np.asarray(x, dtype=np.float64)
        x_pad = np.zeros((n_pad, p))
        x_pad[:n] = x_np
        x_dev = jnp.asarray(x_pad, dtype)
    y_pad = np.zeros((n_pad, y_enc.shape[1]))
    y_pad[:n] = y_enc
    valid = np.zeros(n_pad)
    valid[:n] = 1.0

    # fold training weights: mask x user weights (scores stay unweighted,
    # like the reference's score())
    fold_w = np.zeros((folds_pad, n_pad))
    for j in range(nfolds):
        m = (foldid != j).astype(np.float64)  # train on k-1 folds
        fold_w[j, :n] = m if sw is None else m * sw

    from sgdnet_tpu.solver.stepsize import power_iteration_sq_norm

    # top-eigenvalue hint from the full data on each layout's standardized
    # form; 1.2 safety margin (a fold's top singular value can mildly exceed)
    uniform_w = jnp.ones((n_pad,), dtype) * jnp.asarray(valid, dtype)
    x_hint, xc_hint, _ = _standardize_traced(x_dev, uniform_w, standardize, dtype)
    top_sq = power_iteration_sq_norm(x_hint, xc_hint) / max(n, 1) * 1.2

    if intercept_decay is None:
        intercept_decay = 0.01 if (is_sparse and family != "poisson") else 1.0
    if sparse_mode is None:
        sparse_mode = "densify" if p <= 8192 else "gather"
    config = SolverConfig(
        batch_size=batch_size, max_iter=maxit, fit_intercept=intercept,
        intercept_decay=float(intercept_decay), sparse_mode=sparse_mode,
    )

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
        pf=pf_dev,
        box_lo=box_lo,
        box_hi=box_hi,
    )
    return np.asarray(scores)[:nfolds]
