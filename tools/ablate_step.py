"""Ablate the sparse hybrid SAGA step on real TPU: time epoch variants with
individual components disabled to find where the time goes.

Run: python tools/ablate_step.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_sparse_binomial, to_hybrid
    from sgdnet_tpu.core.sparse import HybridCSR, PaddedCSR

    n, p, L, B = 100_000, 47_000, 76, 16384
    csr_np, y = make_sparse_binomial(n, p, L)
    xh, _ = to_hybrid(csr_np, max_head=4096, coverage=0.9)
    n_pad = ((n + B - 1) // B) * B
    xh = xh.pad_rows(n_pad)
    y = jnp.concatenate([jnp.asarray(y), jnp.zeros((n_pad - n, 1), jnp.float32)])
    w = jnp.concatenate([jnp.ones((n,), jnp.float32), jnp.zeros((n_pad - n,), jnp.float32)])
    g_mem = jnp.zeros((n_pad, 1), jnp.float32)
    wvec = jnp.zeros((1, p), jnp.float32)
    n_steps = n_pad // B

    def run_variant(name, step_fn):
        @partial(jax.jit, static_argnames=())
        def epoch(head, ti, tv, y, wts, wv, gm, key):
            perm = jax.random.permutation(key, n_pad).reshape(n_steps, B)

            def body(carry, idx):
                wv, gm = carry
                return step_fn(head, ti, tv, y, wts, wv, gm, idx), None

            (wv, gm), _ = jax.lax.scan(body, (wv, gm), perm)
            return wv, gm

        args = (xh.head, xh.tail.indices, xh.tail.values, y, w, wvec, g_mem)
        key = jax.random.PRNGKey(0)
        out = epoch(*args, key)
        float(jnp.sum(out[0]))  # scalar readback; block_until_ready lies on the relay
        best = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            out = epoch(*args, jax.random.fold_in(key, r))
            float(jnp.sum(out[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f} ms/epoch", flush=True)

    d = xh.n_head

    def full(head, ti, tv, y, wts, wv, gm, idx):
        hb = head[idx]
        ib, vb = ti[idx], tv[idx]
        lp = hb @ wv[0, :d] + jnp.einsum("bl,bl->b", vb, wv[0][ib])
        g = (jax.nn.sigmoid(lp) - y[idx, 0]) * wts[idx]
        gc = (g - gm[idx, 0])[:, None]
        gm = gm.at[idx].set(g[:, None])
        corr_h = gc[:, 0] @ hb
        corr_t = jnp.zeros((p,), jnp.float32).at[ib.reshape(-1)].add((vb * gc).reshape(-1))
        wv = wv - 1e-3 * (corr_t.at[:d].add(corr_h) / B)[None, :]
        return wv, gm

    def no_tail(head, ti, tv, y, wts, wv, gm, idx):
        hb = head[idx]
        lp = hb @ wv[0, :d]
        g = (jax.nn.sigmoid(lp) - y[idx, 0]) * wts[idx]
        gc = (g - gm[idx, 0])[:, None]
        gm = gm.at[idx].set(g[:, None])
        corr_h = gc[:, 0] @ hb
        wv = wv.at[0, :d].add(-1e-3 * corr_h / B)
        return wv, gm

    def no_head(head, ti, tv, y, wts, wv, gm, idx):
        ib, vb = ti[idx], tv[idx]
        lp = jnp.einsum("bl,bl->b", vb, wv[0][ib])
        g = (jax.nn.sigmoid(lp) - y[idx, 0]) * wts[idx]
        gc = (g - gm[idx, 0])[:, None]
        gm = gm.at[idx].set(g[:, None])
        corr_t = jnp.zeros((p,), jnp.float32).at[ib.reshape(-1)].add((vb * gc).reshape(-1))
        wv = wv - 1e-3 * corr_t[None, :] / B
        return wv, gm

    def tail_fwd_only(head, ti, tv, y, wts, wv, gm, idx):
        ib, vb = ti[idx], tv[idx]
        lp = jnp.einsum("bl,bl->b", vb, wv[0][ib])
        g = (jax.nn.sigmoid(lp) - y[idx, 0]) * wts[idx]
        gm = gm.at[idx].set(g[:, None])
        wv = wv - 1e-9 * jnp.sum(g)
        return wv, gm

    def tail_scatter_only(head, ti, tv, y, wts, wv, gm, idx):
        ib, vb = ti[idx], tv[idx]
        g = y[idx, 0] * wts[idx]
        gc = (g - gm[idx, 0])[:, None]
        gm = gm.at[idx].set(g[:, None])
        corr_t = jnp.zeros((p,), jnp.float32).at[ib.reshape(-1)].add((vb * gc).reshape(-1))
        wv = wv - 1e-3 * corr_t[None, :] / B
        return wv, gm

    print(f"ablation: n={n} p={p} B={B} D={d} tail_L={xh.tail.row_width} steps/epoch={n_steps}")
    run_variant("full step", full)
    run_variant("no tail (head only)", no_tail)
    run_variant("no head (tail only)", no_head)
    run_variant("tail fwd gather only", tail_fwd_only)
    run_variant("tail scatter only", tail_scatter_only)


if __name__ == "__main__":
    main()
