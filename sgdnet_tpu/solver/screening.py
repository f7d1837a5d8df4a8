"""Sequential strong-rule screening for the lambda path.

The reference has no screening (its path loop always touches all p
features); the rebuild's north star lists screening as a subsystem.  This
implements the sequential strong rule (Tibshirani et al. 2012): when moving
from lambda_{k-1} to lambda_k, feature j can be discarded if

    score_j  =  || (1/W) X_eff^T g ||  <  2*l1_k - l1_{k-1}

where g are the per-sample gradients at the lambda_{k-1} solution and the
norm is over classes (plain |.| for single-response, the group L2 norm for
group-lasso penalties).  The rule is safe-checked: after fitting on the
screened set, the full KKT conditions are verified and any violating
feature is added back and the lambda re-fit (so the result is exact, not
heuristic).

TPU adaptation: active sets are padded into power-of-two **buckets** ending
at a dedicated all-zero dummy column, so every distinct bucket size
compiles once and the solver always sees static shapes.  The per-sample
gradient memory is column-independent and carries across active sets
unchanged; the full-width gradient average is recomputed by one matvec per
lambda (which is also what the screening scores need).

Dense design matrices only (the hybrid/sparse layouts already avoid
touching inactive features' memory traffic by construction).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sgdnet_tpu.solver.saga import SagaState, SolverConfig, fit_path, init_state


def _bucket(size: int, minimum: int = 128) -> int:
    b = minimum
    while b < size:
        b *= 2
    return b


def screened_path(
    x,  # (n_pad, p) dense, standardized, padded rows
    y,
    weights,
    gammas,
    l1s,
    l2s,
    tol,
    key,
    family,
    penalty,
    config: SolverConfig,
    kkt_slack: float = 1e-5,
    max_kkt_rounds: int = 3,
):
    """Strong-rule screened warm-started path.  Returns (w_path (nl, k, p),
    intercept_path (nl, k), deviance (nl,), n_epochs (nl,), return_codes,
    total_epochs)."""
    n_pad, p = x.shape
    k = family.n_classes
    dtype = x.dtype
    nl = len(np.asarray(l1s))
    w_total = jnp.maximum(jnp.sum(weights), 1e-12)

    # dummy all-zero column at index p: active sets pad with it
    x_ext = jnp.concatenate([x, jnp.zeros((n_pad, 1), dtype)], axis=1)

    w_full = np.zeros((k, p), dtype=np.float64)
    intercept = np.asarray(
        family.null_intercept(y.astype(jnp.float64), config.fit_intercept, weights.astype(jnp.float64))
    )
    g_mem = jnp.zeros((n_pad, k), dtype)

    @jax.jit
    def gradient_scores(w_dev, b_dev, g_mem_unused):
        lp = jnp.dot(x, w_dev.T, preferred_element_type=dtype) + b_dev
        g = family.gradient(lp, y) * weights[:, None]  # (n_pad, k)
        xtg = jnp.dot(g.T, x, preferred_element_type=dtype) / w_total  # (k, p)
        scores = jnp.sqrt(jnp.sum(xtg.astype(jnp.float64) ** 2, axis=0))
        return scores, g

    @jax.jit
    def dataset_deviance(w_dev, b_dev):
        lp = jnp.dot(x, w_dev.T, preferred_element_type=dtype) + b_dev
        losses = family.loss(lp, y) * weights
        return 2.0 * jnp.sum(losses)

    w_out = np.zeros((nl, k, p))
    b_out = np.zeros((nl, k))
    dev_out = np.zeros(nl)
    iters_out = np.zeros(nl, dtype=np.int32)
    codes_out = np.zeros(nl, dtype=np.int32)
    total_epochs = 0

    l1s_np = np.asarray(l1s, dtype=np.float64)
    gammas_np = np.asarray(gammas, dtype=np.float64)
    l2s_np = np.asarray(l2s, dtype=np.float64)

    for li in range(nl):
        w_dev = jnp.asarray(w_full, dtype)
        b_dev = jnp.asarray(intercept, dtype)
        scores, g = gradient_scores(w_dev, b_dev, g_mem)
        scores = np.asarray(scores)

        l1_prev = l1s_np[li - 1] if li > 0 else np.max(scores)
        threshold = 2.0 * l1s_np[li] - l1_prev
        active = (scores >= threshold) | (np.abs(w_full).sum(axis=0) > 0)

        for kkt_round in range(max_kkt_rounds):
            idx = np.flatnonzero(active)
            K = _bucket(max(len(idx), 1))
            K = min(K, p)
            padded = np.full(K, p, dtype=np.int32)  # dummy column
            padded[: len(idx)] = idx[:K]
            if len(idx) > K:  # bucket cap hit: fall back to everything
                padded = np.arange(p, dtype=np.int32)
                K = p

            cols = jnp.asarray(padded)
            x_sub = x_ext[:, cols]
            w_sub = jnp.asarray(w_full[:, np.minimum(padded, p - 1)] * (padded < p), dtype)
            # gradient average on the active set: one matvec
            g_sum_sub = jnp.dot(g_mem.T, x_sub, preferred_element_type=dtype) / w_total
            state = SagaState(
                w=w_sub,
                intercept=b_dev,
                g_mem=g_mem,
                g_sum=g_sum_sub,
                g_sum_intercept=jnp.sum(g_mem, axis=0) / w_total,
            )
            lam_key = jax.random.fold_in(key, li * 7 + kkt_round)
            state, n_it, results = fit_path(
                x_sub,
                y,
                weights,
                None,
                jnp.asarray([gammas_np[li]], dtype),
                jnp.asarray([l1s_np[li]], dtype),
                jnp.asarray([l2s_np[li]], dtype),
                jnp.asarray(tol, dtype),
                lam_key,
                state,
                family,
                penalty,
                config,
            )
            total_epochs += int(n_it)
            w_sub_new = np.asarray(results.w[0], dtype=np.float64)  # (k, K)
            w_full = np.zeros_like(w_full)
            real = padded < p
            w_full[:, padded[real]] = w_sub_new[:, real]
            intercept = np.asarray(results.intercept[0], dtype=np.float64)
            g_mem = state.g_mem

            # KKT check on the full problem
            w_dev = jnp.asarray(w_full, dtype)
            b_dev = jnp.asarray(intercept, dtype)
            scores, g = gradient_scores(w_dev, b_dev, g_mem)
            scores = np.asarray(scores)
            violations = (scores > l1s_np[li] * (1 + kkt_slack)) & ~active
            if not violations.any():
                break
            active |= violations

        w_out[li] = w_full
        b_out[li] = intercept
        dev_out[li] = float(dataset_deviance(w_dev, b_dev))
        iters_out[li] = int(n_it)
        codes_out[li] = int(results.return_codes[0])

    return w_out, b_out, dev_out, iters_out, codes_out, total_epochs
