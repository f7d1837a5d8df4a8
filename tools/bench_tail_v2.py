"""Tail op shootout v2: cheaper formulations of the per-step COO tail work.

Round-2 decomposition: tail = ~17 ms of the 35.5 ms epoch at the winning
config — gather/scatter element-ops at ~9.6 ns each.  Candidates measured
here (k=1, the north-star binomial shape):

  fwd  (current): g = vals * w[cols]      gather E from (p,1)
                  lp = zeros(B,1).at[rows].add(g)   scatter E
  fwd-1d:         same with w (p,) and lp (B,) 1-D  (lane-padding theory:
                  a (p,1) f32 array is physically (p,128) on TPU, so
                  element scatters/gathers into it may touch 128x the bytes)
  fwd-segsum:     g = vals * w[cols]; cs = cumsum(g);
                  lp = cs[row_end] - cs[row_start]  (row_ptr precomputed —
                  rows are sorted in the packed layout, so per-row sums are
                  contiguous segments; kills the E-sized scatter)
  outer (current): g = vals * gc[rows]; corr = zeros(p,1).at[cols].add(g)
  outer-1d:        same all-1-D
  outer-dense-blk: scatter into a (U_pad,) compressed column space with a
                   precomputed per-block col->slot table, then one
                   slot->global scatter of U entries

Usage: python tools/bench_tail_v2.py  (from /root/repo, real TPU)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import log, make_sparse_binomial, to_hybrid  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}")
    n, p, nnz_row = 100_000, 47_000, 76
    data, y = make_sparse_binomial(n, p, nnz_row)
    B = 8192
    n_pad = ((n + B - 1) // B) * B
    steps = n_pad // B
    xh, _ = to_hybrid(data, max_head=16384, coverage=0.98, head_dtype=jnp.bfloat16)
    tail = xh.pad_rows(n_pad).tail

    # pack block 0 (representative): row-sorted COO + row_ptr
    indices = np.asarray(tail.indices[:B])
    values = np.asarray(tail.values[:B])
    nnz = np.asarray(tail.nnz[:B])
    L = indices.shape[1]
    mask = np.arange(L)[None, :] < nnz[:, None]
    rows_np = np.repeat(np.arange(B), nnz)
    cols_np = indices[mask]
    vals_np = values[mask]
    E = len(cols_np)
    E_pad = ((E + 127) // 128) * 128
    log(f"block tail: E={E} (pad {E_pad}), B*L={B*L}")
    pad = E_pad - E
    rows_d = jnp.asarray(np.pad(rows_np, (0, pad)).astype(np.int32))
    cols_d = jnp.asarray(np.pad(cols_np, (0, pad)).astype(np.int32))
    vals_d = jnp.asarray(np.pad(vals_np, (0, pad)).astype(np.float32))
    # row_ptr: first entry index of each row (rows sorted); pad rows -> E
    row_ptr_np = np.zeros(B + 1, np.int64)
    np.cumsum(nnz, out=row_ptr_np[1:])
    row_start = jnp.asarray(row_ptr_np[:-1].astype(np.int32))
    row_end = jnp.asarray(row_ptr_np[1:].astype(np.int32))

    rng = np.random.default_rng(0)
    w2 = jnp.asarray(rng.normal(size=(p, 1)).astype(np.float32))
    w1 = w2[:, 0]
    gc2 = jnp.asarray(rng.normal(size=(B, 1)).astype(np.float32))
    gc1 = gc2[:, 0]
    T = 50

    def timed(name, op, *args):
        @jax.jit
        def run(key, *a):
            def body(carry, i):
                return carry + op(carry, *a), None

            c, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, T))
            return c

        key = jax.random.PRNGKey(0)
        float(run(key, *args))
        best = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            float(run(jax.random.fold_in(key, r), *args))
            best = min(best, time.perf_counter() - t0)
        log(f"{name}: {best/T*1e3:.3f} ms/step -> {best/T*steps*1e3:.1f} ms/epoch")
        return best / T

    # ---- forward variants ----
    def fwd_2d(c, rows, cols, vals, w):
        g = vals * (w[cols, 0] + c * 1e-9)
        lp = jnp.zeros((B, 1), jnp.float32).at[rows].add(g[:, None])
        return jnp.sum(lp)

    timed("fwd 2d (current)", fwd_2d, rows_d, cols_d, vals_d, w2)

    def fwd_1d(c, rows, cols, vals, w):
        g = vals * (w[cols] + c * 1e-9)
        lp = jnp.zeros((B,), jnp.float32).at[rows].add(g)
        return jnp.sum(lp)

    timed("fwd 1d", fwd_1d, rows_d, cols_d, vals_d, w1)

    def fwd_segsum(c, cols, vals, w):
        g = vals * (w[cols] + c * 1e-9)
        cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(g)])
        lp = cs[row_end] - cs[row_start]
        return jnp.sum(lp)

    timed("fwd segsum (row_ptr)", fwd_segsum, cols_d, vals_d, w1)

    # ---- outer variants ----
    def outer_2d(c, rows, cols, vals, gc):
        g = vals * (gc[rows, 0] + c * 1e-9)
        out = jnp.zeros((p, 1), jnp.float32).at[cols].add(g[:, None])
        return jnp.sum(out)

    timed("outer 2d (current)", outer_2d, rows_d, cols_d, vals_d, gc2)

    def outer_1d(c, rows, cols, vals, gc):
        g = vals * (gc[rows] + c * 1e-9)
        out = jnp.zeros((p,), jnp.float32).at[cols].add(g)
        return jnp.sum(out)

    timed("outer 1d", outer_1d, rows_d, cols_d, vals_d, gc1)

    # gather gc via repeat instead (rows sorted, counts known)
    nnz_d = jnp.asarray(np.pad(nnz, (0, 0)).astype(np.int32))

    def outer_repeat(c, cols, vals, gc):
        gr = jnp.repeat(gc + c * 1e-9, nnz_d, total_repeat_length=E_pad)
        g = vals * jnp.pad(gr, (0, 0))
        out = jnp.zeros((p,), jnp.float32).at[cols].add(g)
        return jnp.sum(out)

    if E_pad >= int(nnz.sum()):
        try:
            timed("outer 1d repeat-gather", outer_repeat, cols_d, vals_d, gc1)
        except Exception as e:  # noqa: BLE001
            log(f"outer repeat FAILED: {type(e).__name__}: {e}")

    # combined current vs combined best
    def both_2d(c, rows, cols, vals, w, gc):
        g = vals * (w[cols, 0] + c * 1e-9)
        lp = jnp.zeros((B, 1), jnp.float32).at[rows].add(g[:, None])
        go = vals * (gc[rows, 0] + c * 1e-9)
        out = jnp.zeros((p, 1), jnp.float32).at[cols].add(go[:, None])
        return jnp.sum(lp) + jnp.sum(out)

    timed("fwd+outer 2d (current)", both_2d, rows_d, cols_d, vals_d, w2, gc2)

    def both_best(c, rows, cols, vals, w, gc):
        wv = vals * (w[cols] + c * 1e-9)  # one gather reused? no — w vs gc differ
        cs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(wv)])
        lp = cs[row_end] - cs[row_start]
        go = vals * (gc[rows] + c * 1e-9)
        out = jnp.zeros((p,), jnp.float32).at[cols].add(go)
        return jnp.sum(lp) + jnp.sum(out)

    timed("fwd segsum + outer 1d", both_best, rows_d, cols_d, vals_d, w1, gc1)


if __name__ == "__main__":
    main()
