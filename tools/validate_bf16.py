"""On-chip validation that the bf16-head speed mode converges to the same
solution as the f32 head on the north-star benchmark workload.

Runs the bench's rcv1-scale sparse binomial problem with identical solver
settings under a float32 head and a bfloat16 head, then compares the final
regularized objective (computed host-side in float64 from the fitted
coefficients) and the coefficients themselves.  bench.py only includes
bf16-head configs in the headline sweep because this check passes
(objectives agree to ~1e-4 relative; coefficients to ~1e-2 relative —
documented in RESULTS.md).

Usage:  python tools/validate_bf16.py [n_epochs]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def objective(w, b, xs, y, lam):
    """(1/n) logistic loss + lam * ||w||_1 in float64 on the host."""
    lp = xs @ w + b
    y1 = y.ravel()
    # log(1 + exp(-|lp|)) + max(lp, 0) - y*lp  (stable logistic loss)
    loss = np.log1p(np.exp(-np.abs(lp))) + np.maximum(lp, 0.0) - y1 * lp
    return float(loss.mean() + lam * np.abs(w).sum())


def run(head_dtype, data, epochs, max_head=16384, coverage=0.98):
    import jax
    import jax.numpy as jnp

    from bench import _to_scipy, to_hybrid
    from sgdnet_tpu.families import get_family
    from sgdnet_tpu.penalties import select_penalty
    from sgdnet_tpu.solver.saga import SolverConfig, _make_epoch, init_state

    csr_np, y = data
    n, p = csr_np["n"], csr_np["p"]
    B = 8192
    n_pad = ((n + B - 1) // B) * B
    # pad HOST-side before building the device layout: device-side pad_rows
    # concatenation holds old+new head alive at once (a ~13 GB transient for
    # the f32 head) and can OOM a fragmented 16 GB chip
    pad = n_pad - n
    csr_pad = dict(
        csr_np,
        indices=np.pad(csr_np["indices"], ((0, pad), (0, 0))),
        values=np.pad(csr_np["values"], ((0, pad), (0, 0))),
        nnz=np.pad(csr_np["nnz"], (0, pad)),
        n=n_pad,
    )
    x, perm = to_hybrid(csr_pad, max_head=max_head, coverage=coverage, head_dtype=head_dtype)
    yd = jnp.concatenate([jnp.asarray(y), jnp.zeros((n_pad - n, 1), jnp.float32)])
    wts = jnp.concatenate([jnp.ones((n,), jnp.float32), jnp.zeros((n_pad - n,), jnp.float32)])

    family = get_family("binomial")
    penalty = select_penalty(1.0, "binomial")
    config = SolverConfig(
        batch_size=B, fit_intercept=True, intercept_decay=0.01,
        sampling="block", g_sum_refresh_every=4,
    )
    state = init_state(n_pad, p, 1, jnp.float32)
    lam = 1.0 / n
    gamma, l1, l2 = jnp.float32(3e-3), jnp.float32(lam), jnp.float32(0.0)

    from functools import partial

    @partial(jax.jit, static_argnames=("family", "penalty", "config", "epochs"))
    def run_epochs(x, y, weights, state, key, family, penalty, config, epochs):
        epoch = _make_epoch(x, y, weights, None, jnp.float32(n), family, penalty, config)

        def body(state, i):
            return epoch(state, jax.random.fold_in(key, i), gamma, l1, l2, it=i), None

        return jax.lax.scan(body, state, jnp.arange(epochs))[0]

    t0 = time.perf_counter()
    state = run_epochs(x, yd, wts, state, jax.random.PRNGKey(0), family, penalty, config, epochs)
    w = np.asarray(state.w, np.float64)[0]  # (p,) small readback
    b = float(np.asarray(state.intercept)[0])
    dt = time.perf_counter() - t0
    # un-permute columns to original order for comparability
    w_orig = np.empty_like(w)
    w_orig[perm] = w
    xs = _to_scipy(csr_np)
    obj = objective(w_orig, b, xs, y, lam)
    print(f"head={head_dtype}: {epochs} epochs in {dt:.1f}s (incl. compile), "
          f"objective={obj:.8f}, nnz(w)={int((w != 0).sum())}", flush=True)
    return w_orig, b, obj


def main():
    """argv: [n_epochs] [head dtypes...] — default 40 epochs, bfloat16.
    `python tools/validate_bf16.py 40 bfloat16 int8` validates both reduced
    head storage modes against the f32 head."""
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    names = sys.argv[2:] or ["bfloat16"]
    import jax.numpy as jnp

    from bench import make_sparse_binomial

    data = make_sparse_binomial(n=100_000, p=47_000, nnz_per_row=76)
    w32, b32, o32 = run(None, data, epochs)
    scale = max(np.abs(w32).max(), 1e-12)
    for name in names:
        wq, bq, oq = run(getattr(jnp, name), data, epochs)
        print(f"[{name}] objective rel diff: {abs(oq - o32) / max(abs(o32), 1e-12):.2e}")
        print(f"[{name}] coef max abs diff:  {np.abs(wq - w32).max():.3e}  "
              f"(rel to max|w|={scale:.3e}: {np.abs(wq - w32).max() / scale:.2e})")
        print(f"[{name}] intercept diff:     {abs(bq - b32):.3e}")


if __name__ == "__main__":
    main()
