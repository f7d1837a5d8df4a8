"""Head-step shootout on the real TPU: XLA two-pass vs round-1 Pallas
(slice-fed) vs the new full-head scalar-prefetch Pallas kernel.

All three compute the same per-step head work at the winning bench config:
  lp = head[s:s+B] @ w.T (+lpe); g = sigmoid(lp) - y; corr = gc.T @ block
Per-step HBM floor: 256 MB (bf16 block) read ONCE = 0.31 ms at 819 GB/s.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sgdnet_tpu.solver.pallas_kernels import fused_head_step_at

    log(f"backend: {jax.default_backend()}")
    n_pad, D, B, k = 106496, 16384, 8192, 1
    steps = n_pad // B
    kg = jax.random.PRNGKey(7)
    # generate ON DEVICE: a multi-GB host->device transfer through the relay
    # is pathologically slow
    head = jax.jit(lambda k: jax.random.normal(k, (n_pad, D), jnp.bfloat16))(kg)
    w = jax.random.normal(jax.random.fold_in(kg, 1), (k, D), jnp.float32)
    y = (jax.random.uniform(jax.random.fold_in(kg, 2), (n_pad, k)) < 0.5).astype(jnp.float32)
    gm0 = jnp.zeros((n_pad, k), jnp.float32)
    wall = jnp.ones((n_pad,), jnp.float32)
    float(jnp.sum(w))
    log("data generated on device")
    T = 26  # 2 epochs worth of steps per dispatch

    def mk(loop_body):
        @jax.jit
        def run(key, head, y, gm, wall, w):
            def body(carry, i):
                w_c, acc = carry
                start = (i % steps) * B
                g, corr = loop_body(head, start, w_c, y, gm, wall)
                w_c = w_c - 1e-9 * corr  # serialize steps through w
                return (w_c, acc + jnp.sum(g)), None

            keys = jax.random.split(key, T)
            idx = jax.random.randint(key, (T,), 0, steps)
            (w_c, acc), _ = jax.lax.scan(body, (w, jnp.zeros(())), idx)
            return acc + jnp.sum(w_c)

        return run

    def xla_pair(head, start, w_c, y, gm, wall):
        xb = jax.lax.dynamic_slice_in_dim(head, start, B, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(y, start, B, axis=0)
        gmb = jax.lax.dynamic_slice_in_dim(gm, start, B, axis=0)
        lp = jnp.dot(xb, w_c.T.astype(xb.dtype), preferred_element_type=jnp.float32)
        g = 1.0 / (1.0 + jnp.exp(-lp)) - yb
        gc = g - gmb
        corr = jnp.dot(gc.astype(xb.dtype).T, xb, preferred_element_type=jnp.float32)
        return g, corr

    def mk_pallas(variant, kp_lanes):
        def pallas_new(head, start, w_c, y, gm, wall):
            yb = jax.lax.dynamic_slice_in_dim(y, start, B, axis=0)
            gmb = jax.lax.dynamic_slice_in_dim(gm, start, B, axis=0)
            wb = jax.lax.dynamic_slice_in_dim(wall, start, B, axis=0)
            lpe = jnp.zeros((B, k), jnp.float32)
            return fused_head_step_at(
                head, start, w_c, lpe, yb, gmb, wb, B, "binomial",
                variant=variant, kp_lanes=kp_lanes,
            )

        return pallas_new

    for name, body in (("xla pair", xla_pair),
                       ("pallas v2 prefetch vpu", mk_pallas("vpu", 8)),
                       ("pallas v3 prefetch mxu kp8", mk_pallas("mxu", 8)),
                       ("pallas v3 prefetch mxu kp128", mk_pallas("mxu", 128))):
        try:
            run = mk(body)
            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            float(run(key, head, y, gm0, wall, w))
            log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
            best = float("inf")
            for r in range(1, 4):
                t0 = time.perf_counter()
                float(run(jax.random.fold_in(key, r), head, y, gm0, wall, w))
                best = min(best, time.perf_counter() - t0)
            per_step = best / T
            bw = B * D * 2 / per_step / 1e9
            log(f"{name}: {per_step*1e3:.3f} ms/step -> {per_step*steps*1e3:.1f} ms/epoch, "
                f"{bw:.0f} GB/s one-pass-equivalent")
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
