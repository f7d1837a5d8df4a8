"""Feasibility micro-bench: whole-SAGA-epoch-in-one-Pallas-kernel.

Small problems (abalone: 4177x9) spend their wall on ~5 us/step XLA
sequencing of tiny ops — 84k sequential steps for a 20-lambda path.  The
whole dataset + state is ~2 MB, i.e. VMEM-resident.  This bench measures
the per-step cost of a Mosaic fori_loop running the SAGA step math
(dynamic-slice batch, predict, gradient, g_mem update, outer, prox) with
everything in VMEM, vs the XLA scan the solver uses today.

Run from /root/repo on the TPU.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N, P, B, K = 4224, 128, 32, 1  # abalone-like, p padded to lanes
T = N // B  # steps per epoch


def _epoch_kernel(starts_ref, x_ref, y_ref, wt_ref, w_ref, gm_ref, gs_ref, w_out, gm_out, gs_out):
    # state lives in the output refs (aliased from the inputs)
    w_out[:] = w_ref[:]
    gm_out[:] = gm_ref[:]
    gs_out[:] = gs_ref[:]

    gamma = jnp.float32(3e-3)
    l1 = jnp.float32(1e-3)
    l2 = jnp.float32(1e-4)

    def body(t, _):
        start = starts_ref[t]
        xb = x_ref[pl.ds(start, B), :]  # (B, P)
        yb = y_ref[pl.ds(start, B), :]  # (B, 1 lane-padded... use (B, P) col0)
        wtb = wt_ref[pl.ds(start, B), :]
        w = w_out[0:1, :]  # (1, P)
        lp = jnp.sum(xb * w, axis=1, keepdims=True)  # (B, 1)
        g = (lp - yb[:, 0:1]) * wtb[:, 0:1]
        gc = g - gm_out[pl.ds(start, B), 0:1]
        gm_out[pl.ds(start, B), 0:1] = g
        corr = jnp.sum(xb * gc, axis=0, keepdims=True)  # (1, P)
        grad_est = corr / jnp.float32(B) + gs_out[0:1, :]
        w_half = w * (1.0 - gamma * l2) - gamma * grad_est
        w_out[0:1, :] = jnp.sign(w_half) * jnp.maximum(jnp.abs(w_half) - gamma * l1, 0.0)
        gs_out[0:1, :] = gs_out[0:1, :] + corr / jnp.float32(N)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


@functools.partial(jax.jit, static_argnames=("epochs",))
def run_pallas(starts, x, y, wt, w, gm, gs, epochs: int = 1):
    f = pl.pallas_call(
        _epoch_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((N, P), lambda i, s: (0, 0)),
                pl.BlockSpec((N, 8), lambda i, s: (0, 0)),
                pl.BlockSpec((N, 8), lambda i, s: (0, 0)),
                pl.BlockSpec((8, P), lambda i, s: (0, 0)),
                pl.BlockSpec((N, 8), lambda i, s: (0, 0)),
                pl.BlockSpec((8, P), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((8, P), lambda i, s: (0, 0)),
                pl.BlockSpec((N, 8), lambda i, s: (0, 0)),
                pl.BlockSpec((8, P), lambda i, s: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((8, P), jnp.float32),
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, P), jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def one(carry, st):
        w, gm, gs = carry
        w, gm, gs = f(st, x, y, wt, w, gm, gs)
        return (w, gm, gs), None

    (w, gm, gs), _ = jax.lax.scan(one, (w, gm, gs), starts)
    return w, gm, gs


@functools.partial(jax.jit, static_argnames=("epochs",))
def run_xla(starts, x, y, wt, w, gm, gs, epochs: int = 1):
    gamma = jnp.float32(3e-3)
    l1 = jnp.float32(1e-3)
    l2 = jnp.float32(1e-4)

    def step(carry, start):
        w, gm, gs = carry
        xb = jax.lax.dynamic_slice_in_dim(x, start, B)
        yb = jax.lax.dynamic_slice_in_dim(y, start, B)
        wtb = jax.lax.dynamic_slice_in_dim(wt, start, B)
        lp = jnp.sum(xb * w[0:1, :], axis=1, keepdims=True)
        g = (lp - yb[:, 0:1]) * wtb[:, 0:1]
        gc = g - jax.lax.dynamic_slice_in_dim(gm, start, B)[:, 0:1]
        gm2 = jax.lax.dynamic_update_slice_in_dim(gm, jnp.pad(g, ((0, 0), (0, 7))), start, 0)
        corr = jnp.sum(xb * gc, axis=0, keepdims=True)
        grad_est = corr / jnp.float32(B) + gs[0:1, :]
        w_half = w[0:1, :] * (1.0 - gamma * l2) - gamma * grad_est
        w2 = jnp.sign(w_half) * jnp.maximum(jnp.abs(w_half) - gamma * l1, 0.0)
        gs2 = gs.at[0:1, :].add(corr / jnp.float32(N))
        return (jnp.pad(w2, ((0, 7), (0, 0))), gm2, gs2), None

    def one(carry, st):
        carry, _ = jax.lax.scan(step, carry, st)
        return carry, None

    (w, gm, gs), _ = jax.lax.scan(one, (w, gm, gs), starts)
    return w, gm, gs


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(N, 8)), jnp.float32)
    wt = jnp.ones((N, 8), jnp.float32)
    w0 = jnp.zeros((8, P), jnp.float32)
    gm0 = jnp.zeros((N, 8), jnp.float32)
    gs0 = jnp.zeros((8, P), jnp.float32)

    E = 200  # epochs per dispatch

    for name, fn in (("pallas", run_pallas), ("xla", run_xla)):
        for rep in range(3):
            starts = jnp.asarray(
                np.stack([rng.permutation(T) * B for _ in range(E)]).astype(np.int32)
            )
            t0 = time.perf_counter()
            w, gm, gs = fn(starts, x, y, wt, w0, gm0, gs0)
            s = float(jnp.sum(w)) + float(jnp.sum(gs))  # force readback
            dt = time.perf_counter() - t0
            log(
                f"{name} rep{rep}: {dt*1e3:8.1f} ms total, "
                f"{dt/E*1e6:7.1f} us/epoch, {dt/(E*T)*1e9:7.0f} ns/step  (chk {s:.4f})"
            )


if __name__ == "__main__":
    main()
