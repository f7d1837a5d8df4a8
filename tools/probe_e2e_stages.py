"""Stage-by-stage isolation of the n=100k D=16384 int8 fit() crash:
each stage syncs with a scalar readback and logs before/after."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _to_scipy, log, make_sparse_binomial


def main(D=16384):
    import jax
    import jax.numpy as jnp

    from sgdnet_tpu.core.sparse import (
        BlockCOO, HybridCSR, PaddedCSR, scipy_column_stats, scipy_row_sq_norms,
    )

    t0 = time.perf_counter()
    _ = float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
    log(f"warmup {time.perf_counter()-t0:.0f}s")

    data, y = make_sparse_binomial(n=100_000, p=47_000, nnz_per_row=76, seed=3)
    xs = _to_scipy(data)
    yv = np.asarray(y).ravel()
    log("host data built")

    m, s = scipy_column_stats(xs)
    prs = scipy_row_sq_norms(xs, m, s)
    log("host stats done")
    xh, perm = HybridCSR.split_columns(
        xs, coverage=0.995, max_head=D, memory_budget=4e9, head_dtype=jnp.int8,
        dtype=jnp.float32, as_host=True, std_stats=(m, s))
    log(f"host split done: head {xh.head.shape} {xh.head.nbytes/1e9:.2f} GB, "
        f"tail L={xh.tail.row_width}")

    rows = max(1, (256 << 20) // xh.head.shape[1])
    parts = []
    for i in range(0, xh.head.shape[0], rows):
        p_ = jax.device_put(np.ascontiguousarray(xh.head[i:i+rows]))
        p_.block_until_ready()
        parts.append(p_)
        log(f"  head chunk {i//rows}: rows {i}..{i+rows}")
    head_dev = jnp.concatenate(parts, axis=0)
    del parts
    _ = int(jnp.sum(head_dev[-2:, :8].astype(jnp.int32)))
    log("head upload + touch OK")

    tail_dev = PaddedCSR(jnp.asarray(xh.tail.indices), jnp.asarray(xh.tail.values),
                         jnp.asarray(xh.tail.nnz), xh.n_rows, xh.n_cols)
    _ = float(jnp.sum(tail_dev.values[:8]))
    log("tail upload OK")
    x = HybridCSR(head_dev, tail_dev, xh.n_rows, xh.n_cols,
                  head_scale=jnp.asarray(xh.head_scale))

    from sgdnet_tpu.families import get_family
    fam = get_family("binomial")
    y_enc, _cn = fam.encode(yv)
    y_dev = jnp.asarray(y_enc, jnp.float32)
    lam = float(fam.lambda_max(x, y_dev.astype(jnp.float64), jnp.ones(1), None))
    log(f"lambda_max OK: {lam:.4g}")

    from sgdnet_tpu.solver.stepsize import power_iteration_sq_norm
    xc = jnp.asarray(m[perm] / s[perm], jnp.float32).at[:x.n_head].set(0.0)
    top = float(power_iteration_sq_norm(x, xc))
    log(f"power iteration OK: {top:.4g}")

    rp = np.random.default_rng(7).permutation(x.n_rows)
    rpd = jnp.asarray(rp)
    head2 = x.head[rpd]
    _ = int(jnp.sum(head2[:2, :8].astype(jnp.int32)))
    log("device head shuffle OK")
    tail2 = PaddedCSR(tail_dev.indices[rpd], tail_dev.values[rpd], tail_dev.nnz[rpd],
                      tail_dev.n_rows, tail_dev.n_cols)
    _ = float(jnp.sum(tail2.values[:2]))
    log("device tail shuffle OK")

    n_pad = ((x.n_rows + 8191) // 8192) * 8192
    extra = n_pad - x.n_rows
    head3 = jnp.concatenate([head2, jnp.zeros((extra, x.n_head), head2.dtype)])
    _ = int(jnp.sum(head3[-2:, :8].astype(jnp.int32)))
    log(f"pad to {n_pad} OK")
    tail3 = PaddedCSR(
        jnp.concatenate([tail2.indices, jnp.zeros((extra, tail_dev.row_width), jnp.int32)]),
        jnp.concatenate([tail2.values, jnp.zeros((extra, tail_dev.row_width), tail2.values.dtype)]),
        jnp.concatenate([tail2.nnz, jnp.zeros((extra,), tail2.nnz.dtype)]),
        n_pad, x.n_cols)

    ht = PaddedCSR(xh.tail.indices[rp], xh.tail.values[rp], xh.tail.nnz[rp],
                   xh.tail.n_rows, xh.tail.n_cols)
    ht = PaddedCSR(
        np.concatenate([ht.indices, np.zeros((extra, ht.row_width), np.int32)]),
        np.concatenate([ht.values, np.zeros((extra, ht.row_width), ht.values.dtype)]),
        np.concatenate([ht.nnz, np.zeros((extra,), np.int32)]), n_pad, x.n_cols)
    blk = BlockCOO.from_padded(ht, 8192)
    _ = float(jnp.sum(blk.vals[0, :8]))
    log(f"BlockCOO OK: E={blk.vals.shape[1]}")

    x3 = HybridCSR(head3, tail3, n_pad, x.n_cols, blk_tail=blk, head_scale=x.head_scale)
    y3 = jnp.concatenate([y_dev[rpd], jnp.zeros((extra, 1), jnp.float32)])
    w3 = jnp.concatenate([jnp.ones((x.n_rows,), jnp.float32), jnp.zeros((extra,), jnp.float32)])

    from sgdnet_tpu.penalties import select_penalty
    from sgdnet_tpu.solver.saga import SolverConfig, fit_path, init_state
    pen = select_penalty(1.0, "binomial")
    config = SolverConfig(batch_size=8192, max_iter=5, fit_intercept=True,
                          intercept_decay=0.01, sampling="block",
                          g_sum_refresh_every=8, sparse_mode="gather",
                          step_backoff=False)  # stage-timing probe: no retries
    state = init_state(n_pad, x.n_cols, 1, jnp.float32)
    l1s = jnp.asarray([lam * 0.5], jnp.float32)
    l2s = jnp.zeros_like(l1s)
    gam = jnp.asarray([3e-3], jnp.float32)
    t0 = time.perf_counter()
    st_, it_, res_ = fit_path(x3, y3, w3, xc, gam, l1s, l2s,
                              jnp.asarray(1e-3, jnp.float32),
                              jax.random.PRNGKey(0), state, fam, pen, config)
    _ = float(jnp.sum(st_.w))
    log(f"fit_path 1-lambda maxit=5 OK in {time.perf_counter()-t0:.1f}s, epochs {int(it_)}")

    # exact chunk-1 shape of the e2e harness: 10 lambdas, maxit=1000
    import dataclasses
    config2 = dataclasses.replace(config, max_iter=1000)
    nl = 10
    lams = np.exp(np.linspace(np.log(lam), np.log(lam) + np.log(1e-4) * (nl - 1) / 49, nl))
    l1s = jnp.asarray(lams, jnp.float32)
    l2s = jnp.zeros_like(l1s)
    gam = jnp.full((nl,), 3e-3, jnp.float32)
    state = init_state(n_pad, x.n_cols, 1, jnp.float32)
    t0 = time.perf_counter()
    st_, it_, res_ = fit_path(x3, y3, w3, xc, gam, l1s, l2s,
                              jnp.asarray(1e-3, jnp.float32),
                              jax.random.PRNGKey(0), state, fam, pen, config2)
    _ = float(jnp.sum(st_.w))
    log(f"fit_path 10-lambda maxit=1000 OK in {time.perf_counter()-t0:.1f}s, "
        f"epochs {int(it_)}")
    log("ALL STAGES OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
