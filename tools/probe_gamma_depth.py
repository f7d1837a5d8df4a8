"""Does the computed step size oscillate at path depth? Fit lambda indices
[20..35] (4-lambda chunks, maxit capped at 150 to bound dispatches) at the
harness gamma vs a damped gamma; report epochs + return codes + |w|."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _to_scipy, log, make_sparse_binomial


def main():
    import jax
    import jax.numpy as jnp

    from sgdnet_tpu.core.sparse import (
        BlockCOO, HybridCSR, PaddedCSR, scipy_column_stats, scipy_row_sq_norms,
    )
    from sgdnet_tpu.families import get_family
    from sgdnet_tpu.penalties import select_penalty
    from sgdnet_tpu.solver.saga import SolverConfig, fit_path, init_state

    t0 = time.perf_counter()
    _ = float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
    log(f"warmup {time.perf_counter()-t0:.0f}s")

    data, y = make_sparse_binomial(n=100_000, p=47_000, nnz_per_row=76, seed=3)
    xs = _to_scipy(data)
    yv = np.asarray(y).ravel()
    m, s = scipy_column_stats(xs)
    D = 16384
    xh, perm = HybridCSR.split_columns(
        xs, coverage=0.995, max_head=D, memory_budget=4e9, head_dtype=jnp.int8,
        dtype=jnp.float32, as_host=True, std_stats=(m, s))
    log("host split done")

    rp = np.random.default_rng(0 + 0x5EED).permutation(xh.n_rows)
    n_pad = ((xh.n_rows + 8191) // 8192) * 8192
    ex = n_pad - xh.n_rows
    head = np.concatenate([xh.head[rp], np.zeros((ex, D), np.int8)])
    ht = PaddedCSR(
        np.concatenate([xh.tail.indices[rp], np.zeros((ex, xh.tail.row_width), np.int32)]),
        np.concatenate([xh.tail.values[rp], np.zeros((ex, xh.tail.row_width), xh.tail.values.dtype)]),
        np.concatenate([xh.tail.nnz[rp], np.zeros((ex,), np.int32)]),
        n_pad, xh.n_cols)
    blk = BlockCOO.from_padded(ht, 8192)
    x = HybridCSR(
        jnp.asarray(head),
        PaddedCSR(jnp.asarray(ht.indices), jnp.asarray(ht.values), jnp.asarray(ht.nnz),
                  n_pad, xh.n_cols),
        n_pad, xh.n_cols, blk_tail=blk, head_scale=jnp.asarray(xh.head_scale))
    xc = jnp.asarray(m[perm] / s[perm], jnp.float32).at[:D].set(0.0)
    fam = get_family("binomial")
    y_enc, _ = fam.encode(yv)
    y3 = jnp.asarray(np.concatenate([y_enc[rp], np.zeros((ex, 1))]), jnp.float32)
    w3 = jnp.asarray(np.concatenate([np.ones(xh.n_rows), np.zeros(ex)]), jnp.float32)
    log("device layout ready")

    lam_max = 0.1314 / 1.0  # measured in the stage probe (alpha=1)
    lams = lam_max * (1e-4) ** (np.arange(50) / 49.0)
    pen = select_penalty(1.0, "binomial")
    cfg = SolverConfig(batch_size=8192, max_iter=150, fit_intercept=True,
                       intercept_decay=0.01, sampling="block",
                       g_sum_refresh_every=8, sparse_mode="gather")

    for gamma in (0.0688, 0.02, 0.0085):
        state = init_state(n_pad, x.n_cols, 1, jnp.float32)
        log(f"--- gamma {gamma} ---")
        for lo in range(0, 36, 4):
            sl = slice(lo, lo + 4)
            l1 = jnp.asarray(lams[sl], jnp.float32)
            l2 = jnp.zeros_like(l1)
            g = jnp.full((4,), gamma, jnp.float32)
            t0 = time.perf_counter()
            state, it, res = fit_path(x, y3, w3, xc, g, l1, l2,
                                      jnp.asarray(1e-3, jnp.float32),
                                      jax.random.fold_in(jax.random.PRNGKey(0), lo),
                                      state, fam, pen, cfg)
            wmax = float(jnp.max(jnp.abs(state.w)))
            log(f"  lam[{lo}:{lo+4}]: {int(it)} ep, codes {np.asarray(res.n_epochs)}, "
                f"max|w| {wmax:.3e}, {time.perf_counter()-t0:.1f}s")
            if not np.isfinite(wmax):
                log("  DIVERGED")
                break


if __name__ == "__main__":
    main()
