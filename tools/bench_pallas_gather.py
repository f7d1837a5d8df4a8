"""Can Mosaic gather/scatter inside VMEM fast enough to beat XLA's
~10 ns/element HBM scatter path on the COO tail?

The tail's per-step work at the winning config is two E-sized gathers and
two scatters (E ~ 11.5k at D=32768) against vectors that easily fit in
VMEM (w is 188 KB, gc is 32 KB).  XLA runs these as serialized ~10 ns
element-ops (measured).  This probes, inside one pallas_call:

  1. VMEM gather  out[e] = w[cols[e]]          (traced indices)
  2. VMEM gather via one-hot matmul            (MXU fallback if 1 fails)
  3. 1-D cumsum rate at E elements             (for segment-sum forms)

Usage: python tools/bench_pallas_gather.py  (from /root/repo, real TPU)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend: {jax.default_backend()}")
    p, E, B = 47_000, 11_520, 8192
    p_pad = ((p + 127) // 128) * 128
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(p_pad,)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, p, size=(E,)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    gc = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
    rows = jnp.asarray(np.sort(rng.integers(0, B, size=(E,))).astype(np.int32))
    T = 100

    def timed(name, fn, *args):
        try:
            out = fn(jax.random.PRNGKey(0), *args)
            s = float(jnp.sum(out))
            best = float("inf")
            for r in range(1, 4):
                t0 = time.perf_counter()
                out = fn(jax.random.fold_in(jax.random.PRNGKey(0), r), *args)
                s = float(jnp.sum(out))
                best = min(best, time.perf_counter() - t0)
            log(f"{name}: {best/T*1e6:.1f} us/step ({best/T/E*1e9:.2f} ns/elem)")
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")

    def loop(op):
        @jax.jit
        def run(key, *args):
            def body(c, k):
                return c + op(c, *args), None

            c, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, T))
            return c

        return run

    # ---- 0. XLA reference: gather E from (p,) ----
    def xla_gather(c, w, cols, vals):
        g = vals * (w[cols] + c * 1e-12)
        return jnp.sum(g)

    timed("xla gather E from (p,)", loop(xla_gather), w, cols, vals)

    # ---- 1. pallas VMEM gather ----
    def k_gather(w_ref, c_ref, v_ref, o_ref):
        o_ref[:] = v_ref[:] * w_ref[c_ref[:]]

    @jax.jit
    def pallas_gather(c, w, cols, vals):
        out = pl.pallas_call(
            k_gather,
            out_shape=jax.ShapeDtypeStruct((E,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, cols, vals + c * 1e-12)
        return jnp.sum(out)

    timed("pallas VMEM gather w[cols]", loop(pallas_gather), w, cols, vals)

    # ---- 1b. pallas 2-D formulation: (E/128, 128) gather ----
    E2 = E // 128

    def k_gather2(w_ref, c_ref, v_ref, o_ref):
        # gather along the flat vector via reshaped tiles
        idx = c_ref[:]
        o_ref[:] = v_ref[:] * w_ref[idx]

    @jax.jit
    def pallas_gather2(c, w, cols, vals):
        out = pl.pallas_call(
            k_gather2,
            out_shape=jax.ShapeDtypeStruct((E2, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, cols.reshape(E2, 128), (vals + c * 1e-12).reshape(E2, 128))
        return jnp.sum(out)

    timed("pallas VMEM gather 2-D (E/128,128)", loop(pallas_gather2), w, cols, vals)

    # ---- 2. cumsum rate ----
    def k_cumsum(v_ref, o_ref):
        o_ref[:] = jnp.cumsum(v_ref[:])

    @jax.jit
    def pallas_cumsum(c, vals):
        out = pl.pallas_call(
            k_cumsum,
            out_shape=jax.ShapeDtypeStruct((E,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(vals + c * 1e-12)
        return jnp.sum(out)

    timed("pallas cumsum (E,)", loop(pallas_cumsum), vals)

    # ---- 3. XLA scatter reference ----
    def xla_scatter(c, cols, vals):
        out = jnp.zeros((p,), jnp.float32).at[cols].add(vals + c * 1e-12)
        return jnp.sum(out)

    timed("xla scatter E into (p,)", loop(xla_scatter), cols, vals)

    # ---- 4. pallas scatter (expected unsupported) ----
    def k_scatter(c_ref, v_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[c_ref[:]] = v_ref[:]

    @jax.jit
    def pallas_scatter(c, cols, vals):
        out = pl.pallas_call(
            k_scatter,
            out_shape=jax.ShapeDtypeStruct((p_pad,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(cols, vals + c * 1e-12)
        return jnp.sum(out)

    timed("pallas VMEM scatter (set)", loop(pallas_scatter), cols, vals)


if __name__ == "__main__":
    main()
