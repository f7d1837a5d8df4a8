"""Layout sweep with DEVICE-SYNTHESIZED data: same shapes and tail sizes as
the north-star workload, zero host->device upload (the axon relay's upload
path is slow and variable — a 1.7 GB head can take >10 min to land, which
makes per-config rebuilds of real data unusable for iteration).

Shape statistics come from the real generator host-side (column counts of
the Zipf draw — a few MB of numpy, no matrix build): for each head width D
the tail entry count E matches the real layout exactly, so epoch times are
honest.  Values are random; SAGA throughput does not depend on them.

Usage: python tools/bench_layout_sweep.py  (from /root/repo, real TPU)
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import log  # noqa: E402


def tail_entries_for(D: int, n=100_000, p=47_000, nnz_row=76, seed=0):
    """True tail nnz for head width D under the bench generator's Zipf."""
    rng = np.random.default_rng(seed)
    weights = (np.arange(p) + 10.0) ** -1.15
    cdf = np.cumsum(weights) / weights.sum()
    cols = np.searchsorted(cdf, rng.random((n, nnz_row))).astype(np.int32).clip(0, p - 1)
    col_nnz = np.bincount(cols.reshape(-1), minlength=p)
    order = np.argsort(-col_nnz)
    cum = np.cumsum(col_nnz[order])
    return int(cum[-1] - cum[min(D, p) - 1])


def build_synth(D, B, head_dtype, n=100_000, p=47_000, nnz_row=76):
    import jax
    import jax.numpy as jnp

    from sgdnet_tpu.core.sparse import BlockCOO, HybridCSR, PaddedCSR

    n_pad = ((n + B - 1) // B) * B
    blocks = n_pad // B
    E_total = tail_entries_for(D)
    E = ((E_total // blocks + 127) // 128) * 128
    key = jax.random.PRNGKey(42)

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, 5)
        if head_dtype == jnp.int8:
            head = jax.random.randint(ks[0], (n_pad, D), -127, 128, jnp.int8)
        else:
            head = jax.random.normal(ks[0], (n_pad, D), head_dtype)
        rows = jax.random.randint(ks[1], (blocks, E), 0, B, jnp.int32)
        cols = jax.random.randint(ks[2], (blocks, E), D, p, jnp.int32)
        vals = jax.random.normal(ks[3], (blocks, E), jnp.float32)
        y = (jax.random.uniform(ks[4], (n_pad, 1)) < 0.5).astype(jnp.float32)
        return head, rows, cols, vals, y

    head, rows, cols, vals, y = mk(key)
    # tiny padded tail stand-in (the solver uses blk_tail under block mode;
    # the padded tail only feeds the g_sum refresh via matvec_T)
    L = ((max(E_total // n, 1) + 7) // 8) * 8
    ti = jnp.zeros((n_pad, L), jnp.int32)
    tv = jnp.zeros((n_pad, L), jnp.float32)
    tnnz = jnp.zeros((n_pad,), jnp.int32)
    tail = PaddedCSR(ti, tv, tnnz, n_pad, p)
    blk = BlockCOO(rows, cols, vals, B, p)
    scale = jnp.ones((D,), jnp.float32) if head_dtype == jnp.int8 else None
    x = HybridCSR(head, tail, n_pad, p, blk_tail=blk, head_scale=scale)
    weights = (jnp.arange(n_pad) < n).astype(jnp.float32)
    log(f"synth layout: D={D} B={B} dtype={head_dtype.__name__} E/block={E} "
        f"(true tail nnz {E_total})")
    return x, y, weights, n_pad


def bench_config(D, B, head_dtype, use_pallas=False, refresh=4, epochs=5,
                 n=100_000, nnz_row=76):
    import jax
    import jax.numpy as jnp

    from sgdnet_tpu.families import get_family
    from sgdnet_tpu.penalties import select_penalty
    from sgdnet_tpu.solver.saga import SolverConfig, _make_epoch, init_state

    x, y, weights, n_pad = build_synth(D, B, head_dtype)
    p = x.n_cols
    family = get_family("binomial")
    penalty = select_penalty(1.0, "binomial")
    config = SolverConfig(
        batch_size=B, fit_intercept=True, intercept_decay=0.01,
        sampling="block", g_sum_refresh_every=refresh, use_pallas=use_pallas,
    )
    state = init_state(n_pad, p, 1, jnp.float32)

    @partial(jax.jit, static_argnames=("family", "penalty", "config", "epochs"))
    def run_epochs(x, y, weights, state, key, family, penalty, config, epochs):
        epoch = _make_epoch(x, y, weights, None, jnp.float32(100_000.0), family, penalty, config)

        def body(state, i):
            return (
                epoch(state, jax.random.fold_in(key, i), jnp.float32(3e-3),
                      jnp.float32(1e-5), jnp.float32(0.0), it=i),
                None,
            )

        state, _ = jax.lax.scan(body, state, jnp.arange(epochs))
        return state

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = run_epochs(x, y, weights, state, key, family, penalty, config, epochs)
    float(jnp.sum(state.w))
    log(f"  compile+first: {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        state = run_epochs(x, y, weights, state, jax.random.fold_in(key, r),
                           family, penalty, config, epochs)
        float(jnp.sum(state.w))
        best = min(best, time.perf_counter() - t0)
    rate = n * nnz_row * epochs / best
    log(f"  {epochs} epochs best {best:.3f}s -> {rate:.3e} nnz/s "
        f"({best/epochs*1e3:.1f} ms/epoch)")
    return rate


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}")
    results = {}
    for name, kw in (
        ("bf16 D=16384 (r1 winner)", dict(D=16384, B=8192, head_dtype=jnp.bfloat16)),
        ("int8 D=16384", dict(D=16384, B=8192, head_dtype=jnp.int8)),
        ("int8 D=24576", dict(D=24576, B=8192, head_dtype=jnp.int8)),
        ("int8 D=32768", dict(D=32768, B=8192, head_dtype=jnp.int8)),
        ("int8 D=32768 r8", dict(D=32768, B=8192, head_dtype=jnp.int8, refresh=8)),
        ("int8 D=32768 B=16384", dict(D=32768, B=16384, head_dtype=jnp.int8)),
        ("bf16 D=16384 pallas", dict(D=16384, B=8192, head_dtype=jnp.bfloat16, use_pallas=True)),
        ("bf16 D=32768", dict(D=32768, B=8192, head_dtype=jnp.bfloat16)),
    ):
        log(f"[{name}]")
        try:
            results[name] = bench_config(**kw)
        except Exception as e:  # noqa: BLE001
            log(f"  FAILED: {type(e).__name__}: {e}")
    log("== sweep results ==")
    for k, v in results.items():
        log(f"{k}: {v:.3e} nnz/s")


if __name__ == "__main__":
    main()
