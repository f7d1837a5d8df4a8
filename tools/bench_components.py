"""Decompose the sparse SAGA epoch cost on the real TPU.

Round-1 measured 1.7e8 nnz/s at the winning config (hybrid D=16384 bf16
head, B=8192, block sampling, refresh/4) — ~20% of v5e HBM peak if the
epoch were head-stream-bound.  Hypothesis (VERDICT round 1, item 1): the
padded tail gather/scatter (~8 ns *per element*, serialized on the scalar
core) dominates, not the head stream.  This script measures each component
in isolation to direct the optimization:

  1. full epoch at the winning config           (baseline)
  2. epoch with an EMPTY tail (width 8, 0 nnz)  (head + fixed overheads)
  3. epoch with a tiny head (D=128) + full tail (tail + fixed overheads)
  4. raw-op microbenches: head matmul pair, tail gather-predict, tail
     scatter-outer, scatter with sorted/unique hints, packed-COO variants,
     segment-sum (sort + cumsum + boundary-diff) scatter replacement

Usage: python tools/bench_components.py  (run from /root/repo, real TPU)
All timings end in a scalar host readback (the relay's block_until_ready
returns early) and vary PRNG keys per repetition (the relay caches
identical dispatches).  Best-of-3.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import log, make_sparse_binomial, to_hybrid  # noqa: E402


def timeit(fn, *args, reps=3, **kw):
    """best-of-`reps` wall time of fn(key, *args); forces a scalar readback."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    out = fn(key, *args, **kw)
    s = float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))  # compile+first
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(jax.random.fold_in(key, r), *args, **kw)
        s = float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
        best = min(best, time.perf_counter() - t0)
    del s
    return best


def epoch_bench(x, y01, n, label, batch_size=8192, epochs=5, g_sum_refresh_every=4):
    from bench import bench_sparse_epoch

    v = bench_sparse_epoch(
        n=n,
        p=x.n_cols,
        nnz_per_row=76,
        batch_size=batch_size,
        epochs=epochs,
        hybrid=True,
        sampling="block",
        g_sum_refresh_every=g_sum_refresh_every,
        x_prebuilt=x,
        data=({"n": n, "p": x.n_cols}, y01),
    )
    # bench_sparse_epoch reports nnz/s vs the nominal 76/row; recompute time
    t_epoch = n * 76 * epochs / v / epochs
    log(f"[{label}] epoch time ~ {t_epoch * 1e3:.1f} ms")
    return t_epoch


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    n, p, nnz_row = 100_000, 47_000, 76
    data, y = make_sparse_binomial(n, p, nnz_row)

    B = 8192
    n_pad = ((n + B - 1) // B) * B

    # ---- 1. full epoch, winning config ----
    xh, _ = to_hybrid(data, max_head=16384, coverage=0.98, head_dtype=jnp.bfloat16)
    t_full = epoch_bench(xh.pad_rows(n_pad), y, n, "full hybrid D=16384 bf16")

    # ---- 2. head-only: replace the tail with an empty one ----
    from sgdnet_tpu.core.sparse import HybridCSR, PaddedCSR

    empty_tail = PaddedCSR(
        jnp.zeros((n_pad, 8), jnp.int32),
        jnp.zeros((n_pad, 8), jnp.float32),
        jnp.zeros((n_pad,), jnp.int32),
        n_pad,
        p,
    )
    x_head = HybridCSR(xh.pad_rows(n_pad).head, empty_tail, n_pad, p)
    t_head = epoch_bench(x_head, y, n, "head-only (empty tail w=8)")

    # ---- 3. tail-heavy: tiny head, full-width tail ----
    xt, _ = to_hybrid(data, max_head=128, coverage=0.01, head_dtype=jnp.bfloat16)
    t_tail = epoch_bench(xt.pad_rows(n_pad), y, n, "tiny head D=128 + full tail")

    log(
        f"== decomposition: full={t_full*1e3:.1f}ms head_only={t_head*1e3:.1f}ms "
        f"tailheavy={t_tail*1e3:.1f}ms =="
    )

    # ---- 4. raw-op microbenches at the real tail shape ----
    # tail after D=16384 split: measure its true width/nnz
    tail = xh.pad_rows(n_pad).tail
    L = tail.row_width
    tail_nnz = int(np.asarray(tail.nnz).sum())
    log(f"tail: width L={L}, true nnz={tail_nnz} ({tail_nnz/(n*nnz_row):.1%} of all)")

    k = 1
    steps = n_pad // B  # per-epoch steps
    rng = np.random.default_rng(0)

    # representative batch tail block (first block's real data)
    ib = jnp.asarray(np.asarray(tail.indices[:B]))  # (B, L)
    vb = jnp.asarray(np.asarray(tail.values[:B]))  # (B, L)
    w_t = jnp.asarray(rng.normal(size=(p, k)).astype(np.float32))
    T = 50  # scan reps inside one dispatch

    def loop(op):
        @jax.jit
        def run(key, *args):
            def body(carry, i):
                out = op(carry, i, *args)
                return out, None

            init = jnp.zeros((), jnp.float32)
            c, _ = jax.lax.scan(body, init, jax.random.split(key, T))
            return c

        return run

    # (a) tail forward: gather w rows + einsum reduce
    def tail_fwd(carry, key, ib, vb, w_t):
        wv = w_t + carry * 1e-9  # depend on carry to serialize iterations
        lp = jnp.einsum("bl,blk->bk", vb, wv[ib], preferred_element_type=jnp.float32)
        return carry + jnp.sum(lp)

    t = timeit(loop(tail_fwd), ib, vb, w_t)
    log(f"tail fwd gather+einsum (B*L={B*L}): {t/T*1e3:.3f} ms/step -> {t/T*steps*1e3:.1f} ms/epoch")

    # (b) tail outer: scatter-add B*L contributions into (p, k)
    gc = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32))

    def tail_outer(carry, key, ib, vb, gc):
        contrib = (vb * (gc[:, 0:1] + carry * 1e-9))[:, :, None]  # (B, L, 1)
        out = jnp.zeros((p, k), jnp.float32).at[ib.reshape(-1)].add(
            contrib.reshape(-1, k)
        )
        return carry + jnp.sum(out)

    t = timeit(loop(tail_outer), ib, vb, gc)
    log(f"tail outer scatter (B*L={B*L}): {t/T*1e3:.3f} ms/step -> {t/T*steps*1e3:.1f} ms/epoch")

    # (c) packed-COO outer: only the true nonzeros of the block
    nz = np.asarray(tail.nnz[:B])
    rows_np = np.repeat(np.arange(B), nz)
    ib_np, vb_np = np.asarray(ib), np.asarray(vb)
    mask = np.arange(L)[None, :] < nz[:, None]
    cols_np = ib_np[mask]
    vals_np = vb_np[mask]
    E = len(cols_np)
    E_pad = ((E + 127) // 128) * 128
    log(f"block tail entries: E={E} (pad {E_pad}) vs B*L={B*L}")
    rows_d = jnp.asarray(np.pad(rows_np, (0, E_pad - E)).astype(np.int32))
    cols_d = jnp.asarray(np.pad(cols_np, (0, E_pad - E)).astype(np.int32))
    vals_d = jnp.asarray(np.pad(vals_np, (0, E_pad - E)).astype(np.float32))

    def coo_outer(carry, key, rows, cols, vals, gc):
        g = vals * (gc[rows, 0] + carry * 1e-9)  # gather E
        out = jnp.zeros((p, k), jnp.float32).at[cols].add(g[:, None])  # scatter E
        return carry + jnp.sum(out)

    t = timeit(loop(coo_outer), rows_d, cols_d, vals_d, gc)
    log(f"COO outer gather+scatter (E={E_pad}): {t/T*1e3:.3f} ms/step -> {t/T*steps*1e3:.1f} ms/epoch")

    # (d) sorted-COO outer with indices_are_sorted + segment boundaries
    order = np.argsort(cols_np, kind="stable")
    cols_s = np.pad(cols_np[order], (0, E_pad - E), constant_values=p - 1)
    rows_s = np.pad(rows_np[order], (0, E_pad - E))
    vals_s = np.pad(vals_np[order], (0, E_pad - E))
    cols_sd = jnp.asarray(cols_s.astype(np.int32))
    rows_sd = jnp.asarray(rows_s.astype(np.int32))
    vals_sd = jnp.asarray(vals_s.astype(np.float32))

    def coo_outer_sorted(carry, key, rows, cols, vals, gc):
        g = vals * (gc[rows, 0] + carry * 1e-9)
        out = jnp.zeros((p, k), jnp.float32).at[cols].add(
            g[:, None], indices_are_sorted=True
        )
        return carry + jnp.sum(out)

    t = timeit(loop(coo_outer_sorted), rows_sd, cols_sd, vals_sd, gc)
    log(f"sorted-COO outer (hint): {t/T*1e3:.3f} ms/step -> {t/T*steps*1e3:.1f} ms/epoch")

    # (e) segment-sum scatter replacement: cumsum + boundary gather + unique scatter
    uniq, first_pos = np.unique(cols_s, return_index=True)
    U = len(uniq)
    U_pad = ((U + 127) // 128) * 128
    seg_end = np.r_[first_pos[1:], E_pad] - 1  # inclusive end of each segment
    uniq_d = jnp.asarray(np.pad(uniq, (0, U_pad - U), constant_values=p - 1).astype(np.int32))
    end_d = jnp.asarray(np.pad(seg_end, (0, U_pad - U)).astype(np.int32))
    start_d = jnp.asarray(
        np.pad(np.r_[0, seg_end[:-1] + 1], (0, U_pad - U)).astype(np.int32)
    )
    log(f"unique tail cols in block: U={U} (pad {U_pad})")

    def seg_outer(carry, key, rows, vals, gc):
        g = vals * (gc[rows, 0] + carry * 1e-9)  # gather E
        cs = jnp.cumsum(g)  # vector op
        seg = cs[end_d] - jnp.where(start_d > 0, cs[start_d - 1], 0.0)  # gather 2U
        out = jnp.zeros((p, k), jnp.float32).at[uniq_d].add(
            seg[:, None], indices_are_sorted=True, unique_indices=True
        )  # scatter U
        return carry + jnp.sum(out)

    t = timeit(loop(seg_outer), rows_sd, vals_sd, gc)
    log(f"segment-sum outer (U={U_pad} scatter): {t/T*1e3:.3f} ms/step -> {t/T*steps*1e3:.1f} ms/epoch")

    # (f) COO forward: gather w at cols + segment-sum into rows (row-sorted)
    def coo_fwd(carry, key, rows, cols, vals, w_t):
        g = vals * (w_t[cols, 0] + carry * 1e-9)  # gather E
        lp = jnp.zeros((B, k), jnp.float32).at[rows].add(
            g[:, None], indices_are_sorted=True
        )  # scatter E into B
        return carry + jnp.sum(lp)

    t = timeit(loop(coo_fwd), rows_d, cols_d, vals_d, w_t)
    log(f"COO fwd gather+row-scatter: {t/T*1e3:.3f} ms/step -> {t/T*steps*1e3:.1f} ms/epoch")

    # (g) head matmul pair at bf16 (forward + outer), winning shape
    D = 16384
    hb = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)).astype(jnp.bfloat16)
    wh = jnp.asarray(rng.normal(size=(k, D)).astype(np.float32))

    def head_pair(carry, key, hb, wh, gc):
        whb = (wh + carry * 1e-9).astype(jnp.bfloat16)
        lp = jnp.dot(hb, whb.T, preferred_element_type=jnp.float32)  # (B, k)
        corr = jnp.dot(
            (gc + lp * 1e-9).T.astype(jnp.bfloat16), hb, preferred_element_type=jnp.float32
        )  # (k, D)
        return carry + jnp.sum(corr)

    t = timeit(loop(head_pair), hb, wh, gc)
    bytes_step = 2 * B * D * 2  # two passes over the bf16 block
    log(
        f"head bf16 matmul pair (B={B}, D={D}): {t/T*1e3:.3f} ms/step "
        f"-> {t/T*steps*1e3:.1f} ms/epoch, {bytes_step/(t/T)/1e9:.0f} GB/s effective"
    )

    # (h) g_mem row set + convergence bits (residual per-step overheads)
    g_mem = jnp.zeros((n_pad, k), jnp.float32)

    def overhead(carry, key, g_mem, gc):
        start = (carry.astype(jnp.int32) % steps) * B
        g = jax.lax.dynamic_slice_in_dim(g_mem, start, B, axis=0)
        g_mem2 = jax.lax.dynamic_update_slice_in_dim(g_mem, g + gc, start, axis=0)
        return carry + jnp.sum(g_mem2[0]) * 1e-9 + 1.0

    t = timeit(loop(overhead), g_mem, gc)
    log(f"g_mem slice+update: {t/T*1e3:.3f} ms/step -> {t/T*steps*1e3:.1f} ms/epoch")


if __name__ == "__main__":
    main()
