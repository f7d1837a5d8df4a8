"""How fast can this chip actually stream HBM, and how many in-flight DMAs
does Pallas need to match XLA?

Measured so far (tools/bench_pallas_dma.py): the automatic Pallas pipeline
reads at ~195 GB/s no matter the tile size, while XLA's fused matmul pair
streams at ~431 GB/s.  Hypothesis: the auto-pipeline keeps one DMA in
flight; HBM needs several concurrent streams to saturate.

  1. XLA pure read: jnp.sum over the 3.5 GB head            (ceiling)
  2. Pallas manual DMA, N_BUF in {2, 4, 8} in-flight copies  (fix?)

Usage: python tools/bench_dma_streams.py  (from /root/repo, real TPU)
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

    # ---- 1. XLA pure read over the full head ----
    @jax.jit
    def xla_read(c, head):
        return jnp.sum(head.astype(jnp.float32) * (1.0 + c * 1e-12))

    float(xla_read(jnp.zeros(()), head))
    best = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        float(xla_read(jnp.float32(r), head))
        best = min(best, time.perf_counter() - t0)
    log(f"XLA full-head sum: {best*1e3:.2f} ms, {n_pad*D*2/best/1e9:.0f} GB/s")

    # ---- 2. Pallas manual multi-buffer DMA reduce over one B-block ----
    def mk(n_buf, chunk_rows):
        n_chunks = B // chunk_rows

        def kernel(s_ref, hbm_ref, o_ref):
            start_row = s_ref[0]

            def body(scratch, sems):
                def get_dma(slot, idx):
                    row0 = pl.multiple_of(start_row + idx * chunk_rows, chunk_rows)
                    return pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(row0, chunk_rows), :],
                        scratch.at[slot],
                        sems.at[slot],
                    )

                for s in range(n_buf):
                    if s < n_chunks:
                        get_dma(s, s).start()

                def loop(i, acc):
                    slot = jax.lax.rem(i, n_buf)
                    get_dma(slot, i).wait()
                    acc = acc + jnp.sum(scratch[slot].astype(jnp.float32), axis=0, keepdims=True)

                    @pl.when(i + n_buf < n_chunks)
                    def _():
                        get_dma(slot, i + n_buf).start()

                    return acc

                acc = jax.lax.fori_loop(0, n_chunks, loop, jnp.zeros((1, D), jnp.float32))
                o_ref[:] = acc

            pl.run_scoped(
                body,
                pltpu.VMEM((n_buf, chunk_rows, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((n_buf,)),
            )

        @jax.jit
        def run(key, head):
            T = 26

            def sbody(carry, i):
                start = ((i % steps) * B).astype(jnp.int32).reshape(1)
                out = pl.pallas_call(
                    kernel,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(1,),
                        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    ),
                    out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=110 * 1024 * 1024
                    ),
                )(start, head)
                return carry + jnp.sum(out) * 1e-9, None

            idx = jax.random.randint(key, (26,), 0, steps)
            c, _ = jax.lax.scan(sbody, jnp.zeros(()), idx)
            return c

        return run

    for n_buf, chunk_rows in ((2, 512), (4, 256), (4, 512), (8, 256), (8, 128)):
        vmem_mb = n_buf * chunk_rows * D * 2 / 1e6
        if vmem_mb > 100:
            continue
        try:
            run = mk(n_buf, chunk_rows)
            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            float(run(key, head))
            ct = time.perf_counter() - t0
            best = float("inf")
            for r in range(1, 4):
                t0 = time.perf_counter()
                float(run(jax.random.fold_in(key, r), head))
                best = min(best, time.perf_counter() - t0)
            per_step = best / 26
            log(
                f"manual DMA n_buf={n_buf} chunk={chunk_rows} ({vmem_mb:.0f}MB vmem, "
                f"compile {ct:.0f}s): {per_step*1e3:.3f} ms/step, "
                f"{B*D*2/per_step/1e9:.0f} GB/s"
            )
        except Exception as e:  # noqa: BLE001
            log(f"manual DMA n_buf={n_buf} chunk={chunk_rows} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
