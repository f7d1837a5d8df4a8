"""Tile-size / pipelining sweep for fused_head_step_at on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import log

def main():
    import jax, jax.numpy as jnp
    import sgdnet_tpu.solver.pallas_kernels as pk

    n_pad, D, B, k = 106496, 16384, 8192, 1
    steps = n_pad // B
    kg = jax.random.PRNGKey(7)
    head = jax.jit(lambda k: jax.random.normal(k, (n_pad, D), jnp.bfloat16))(kg)
    w = jax.random.normal(jax.random.fold_in(kg, 1), (k, D), jnp.float32)
    y = (jax.random.uniform(jax.random.fold_in(kg, 2), (n_pad, k)) < 0.5).astype(jnp.float32)
    gm0 = jnp.zeros((n_pad, k), jnp.float32)
    wall = jnp.ones((n_pad,), jnp.float32)
    float(jnp.sum(w)); log("data ready")
    T = 26

    def run_with(max_elems, vmem_mb):
        pk._MAX_TILE_ELEMS = max_elems
        from jax.experimental.pallas import tpu as pltpu
        pk._COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        fhsa = pk.fused_head_step_at.__wrapped__  # bypass jit cache

        @jax.jit
        def run(key, head, y, gm, wall, w):
            def body(carry, i):
                w_c, acc = carry
                start = (i % steps) * B
                yb = jax.lax.dynamic_slice_in_dim(y, start, B, axis=0)
                gmb = jax.lax.dynamic_slice_in_dim(gm, start, B, axis=0)
                wb = jax.lax.dynamic_slice_in_dim(wall, start, B, axis=0)
                lpe = jnp.zeros((B, k), jnp.float32)
                g, corr = fhsa(head, start, w_c, lpe, yb, gmb, wb, B, "binomial", False)
                return (w_c - 1e-9 * corr, acc + jnp.sum(g)), None
            idx = jax.random.randint(key, (T,), 0, steps)
            (w_c, acc), _ = jax.lax.scan(body, (w, jnp.zeros(())), idx)
            return acc + jnp.sum(w_c)

        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter(); float(run(key, head, y, gm0, wall, w))
        log(f"  compile+first {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for r in range(1, 4):
            t0 = time.perf_counter()
            float(run(jax.random.fold_in(key, r), head, y, gm0, wall, w))
            best = min(best, time.perf_counter() - t0)
        per = best / T
        log(f"  {per*1e3:.3f} ms/step -> {per*steps*1e3:.1f} ms/epoch, {B*D*2/per/1e9:.0f} GB/s")

    for max_elems, vmem in ((1 << 22, 100), (1 << 23, 110), (1 << 21, 100), (1 << 20, 64)):
        bt = pk._pick_bt(B, D, jnp.bfloat16) if False else None
        log(f"tile budget {max_elems} elems (bf16 bt={min(1024, max_elems*2//D)}), vmem {vmem}MB:")
        try:
            run_with(max_elems, vmem)
        except Exception as e:
            log(f"  FAILED: {type(e).__name__}: {str(e)[:200]}")

if __name__ == "__main__":
    main()
