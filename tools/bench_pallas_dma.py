"""Diagnose the prefetch-kernel HBM stream rate on the real TPU.

The fused head kernel plateaus at ~195 GB/s while XLA's two-pass schedule
streams the same head at ~431 GB/s per pass — so the Pallas pipeline, not
compute, is the wall.  This measures, through the same
PrefetchScalarGridSpec structure as the real kernel:

  1. a pure reduce kernel (read tile, add to scalar) at bt in {256,512,1024}
  2. the fused mxu kernel at the same tile sizes
  3. with and without explicit dimension_semantics=("arbitrary",)

Usage: python tools/bench_pallas_dma.py  (from /root/repo, real TPU)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
from bench import log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend: {jax.default_backend()}")
    n_pad, D, B = 106496, 16384, 8192
    steps = n_pad // B
    kg = jax.random.PRNGKey(7)
    head = jax.jit(lambda k: jax.random.normal(k, (n_pad, D), jnp.bfloat16))(kg)
    float(jnp.sum(head[0]))
    log("data on device")
    T = 26

    def reduce_kernel(s_ref, x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    def mk_reduce(bt, dimsem):
        n_tiles = B // bt
        params = dict(vmem_limit_bytes=100 * 1024 * 1024)
        if dimsem:
            params["dimension_semantics"] = ("arbitrary",)

        @jax.jit
        def run(key, head):
            def body(carry, i):
                start_blocks = ((i % steps) * (B // bt)).astype(jnp.int32).reshape(1)
                out = pl.pallas_call(
                    reduce_kernel,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(n_tiles,),
                        in_specs=[pl.BlockSpec((bt, D), lambda i, s: (s[0] + i, 0))],
                        out_specs=pl.BlockSpec((1, D), lambda i, s: (0, 0)),
                        scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
                    ),
                    out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
                    compiler_params=pltpu.CompilerParams(**params),
                )(start_blocks, head)
                return carry + jnp.sum(out) * 1e-9, None

            idx = jax.random.randint(key, (T,), 0, steps)
            c, _ = jax.lax.scan(body, jnp.zeros(()), idx)
            return c

        return run

    for bt in (256, 512, 1024):
        for dimsem in (False, True):
            try:
                run = mk_reduce(bt, dimsem)
                key = jax.random.PRNGKey(0)
                float(run(key, head))
                best = float("inf")
                for r in range(1, 4):
                    t0 = time.perf_counter()
                    float(run(jax.random.fold_in(key, r), head))
                    best = min(best, time.perf_counter() - t0)
                per_step = best / T
                bw = B * D * 2 / per_step / 1e9
                log(f"pure-reduce bt={bt} dimsem={dimsem}: {per_step*1e3:.3f} ms/step, {bw:.0f} GB/s")
            except Exception as e:  # noqa: BLE001
                log(f"pure-reduce bt={bt} dimsem={dimsem} FAILED: {type(e).__name__}: {e}")

    # fused mxu kernel at different tile sizes
    import sgdnet_tpu.solver.pallas_kernels as pk

    k = 1
    w = jax.random.normal(jax.random.fold_in(kg, 1), (k, D), jnp.float32)
    y = jax.jit(lambda kk: (jax.random.uniform(kk, (n_pad, k)) < 0.5).astype(jnp.float32))(
        jax.random.fold_in(kg, 2)
    )
    gm0 = jnp.zeros((n_pad, k), jnp.float32)
    wall = jnp.ones((n_pad,), jnp.float32)
    float(jnp.sum(y[0]))

    def mk_fused(max_elems):
        @jax.jit
        def run(key, head, y, gm, wall, w):
            def body(carry, i):
                w_c, acc = carry
                start = (i % steps) * B
                yb = jax.lax.dynamic_slice_in_dim(y, start, B, axis=0)
                gmb = jax.lax.dynamic_slice_in_dim(gm, start, B, axis=0)
                wb = jax.lax.dynamic_slice_in_dim(wall, start, B, axis=0)
                lpe = jnp.zeros((B, k), jnp.float32)
                g, corr = pk.fused_head_step_at(
                    head, start, w_c, lpe, yb, gmb, wb, B, "binomial", variant="mxu"
                )
                w_c = w_c - 1e-9 * corr
                return (w_c, acc + jnp.sum(g)), None

            idx = jax.random.randint(key, (T,), 0, steps)
            (w_c, acc), _ = jax.lax.scan(body, (w, jnp.zeros(())), idx)
            return acc + jnp.sum(w_c)

        return run

    for max_elems in (1 << 21, 1 << 22, 1 << 23):
        pk._MAX_TILE_ELEMS = max_elems
        pk.fused_head_step_at.clear_cache()  # bt is baked in at trace time
        bt = pk._pick_bt(B, D, jnp.bfloat16)
        try:
            run = mk_fused(max_elems)
            key = jax.random.PRNGKey(1)
            t0 = time.perf_counter()
            float(run(key, head, y, gm0, wall, w))
            log(f"fused mxu bt={bt}: compile+first {time.perf_counter()-t0:.1f}s")
            best = float("inf")
            for r in range(1, 4):
                t0 = time.perf_counter()
                float(run(jax.random.fold_in(key, r), head, y, gm0, wall, w))
                best = min(best, time.perf_counter() - t0)
            per_step = best / T
            bw = B * D * 2 / per_step / 1e9
            log(f"fused mxu bt={bt}: {per_step*1e3:.3f} ms/step, {bw:.0f} GB/s one-pass")
        except Exception as e:  # noqa: BLE001
            log(f"fused mxu bt={bt} FAILED: {type(e).__name__}: {e}")
    pk._MAX_TILE_ELEMS = 1 << 22


if __name__ == "__main__":
    main()
