"""Pallas TPU kernel for the SAGA hot path.

`fused_head_step_at` fuses the dense/head part of one batched SAGA step
into a single kernel over rows [start, start+B) of the full head array:

    lp   = head[start:start+B] @ w_h.T + lp_extra   (MXU)
    g    = family_gradient(lp, yb) * wb             (VPU)
    gc   = g - g_mem_b
    corr = gc.T @ block                             (MXU, VMEM accumulator)

XLA schedules the two matmuls as separate HBM passes over the block with
the gradient materialized in between; this kernel streams each (Bt, D)
tile into VMEM once and runs forward matmul, gradient, and the rank-B
backward matmul from the same resident tile.  The block offset arrives as
a scalar-prefetch argument consumed by the index maps, so no (B, D) block
is ever materialized (a round-1 slice-fed variant was removed: pallas_call
is opaque to XLA slice fusion, so feeding it a sliced block forced a
256 MB copy per step and always lost to XLA).

Measured on v5e (tools/bench_layout_sweep.py, round 2): +21% epoch
throughput over XLA's two-pass schedule at the bf16 winning config — it is
the default for bf16 hybrid heads under block sampling.  Pallas DMA on
this runtime sustains ~195 GB/s regardless of tile size or manual
multi-buffering (tools/bench_pallas_dma.py, bench_dma_streams.py) while
XLA's dense loads stream ~430 GB/s, so the kernel's one-pass advantage
only beats XLA's two passes where XLA also pays a block-copy; for int8
heads XLA's fused convert path is ~2x faster and the kernel is not used.

The kernel runs in interpret mode off-TPU so the CPU test suite exercises
identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: largest (Bt * D) f32 tile we allow in VMEM.  With the default 16 MB
#: scoped vmem this had to stay at 1 MB (2^18 elems), which capped Bt at 16
#: rows for D=16384 — too skinny to feed the MXU, so XLA's two-pass schedule
#: won.  We now raise the Mosaic vmem budget explicitly (see
#: _COMPILER_PARAMS) and allow 16 MB tiles (Bt=256 at D=16384): the tile is
#: read from HBM once and drives both the forward and the rank-B backward
#: matmul, halving traffic on the dominant term.
_MAX_TILE_ELEMS = 1 << 22

#: raise the scoped-vmem budget: one resident input tile (double-buffered)
#: + the (kp, D) weight block and corr accumulator must fit
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _gradient(family_name: str, lp, yb, k: int):
    """Family gradient on a class dimension padded to a lane multiple; only
    the first `k` columns are real (outputs in pad columns are discarded
    by the caller, but multinomial must exclude them from the softmax)."""
    if family_name in ("gaussian", "mgaussian"):
        return lp - yb
    if family_name == "binomial":
        return 1.0 / (1.0 + jnp.exp(-lp)) - yb
    if family_name == "multinomial":
        kp = lp.shape[1]
        mask = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1) < k
        lp = jnp.where(mask, lp, -1e30)
        m = jnp.max(lp, axis=1, keepdims=True)
        e = jnp.exp(lp - m)
        return e / jnp.sum(e, axis=1, keepdims=True) - yb
    raise ValueError(family_name)


def _kernel_vpu1(xb_ref, w_ref, lpe_ref, y_ref, gm_ref, wb_ref, g_out, corr_out, acc_ref, *, family_name, k):
    """k=1 variant on the VPU.

    A (Bt, D) @ (D, 1) matvec on the MXU wastes ~99% of the 128-wide
    systolic array (measured: the MXU kernel floors at ~1.37 ms/step
    regardless of tile size — compute-bound at ~6% utilization, not
    DMA-bound).  For a single class both passes are elementwise
    multiply + reduce, which the VPU does at full width:

        lp[b]  = sum_d xb[b, d] * w[d]        (lane reduction)
        corr[d] = sum_b gc[b] * xb[b, d]      (sublane reduction)

    Multiplies run in the tile dtype (bf16 at 2x rate), accumulation f32.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    xb = xb_ref[:]  # (Bt, D) — read once, used by both passes
    w_row = w_ref[0, :][None, :].astype(xb.dtype)  # (1, D)
    lp = jnp.sum((xb * w_row).astype(jnp.float32), axis=1, keepdims=True)  # (Bt, 1)
    lp = lp + lpe_ref[:, 0:1]
    g1 = _gradient(family_name, lp, y_ref[:, 0:1], 1) * wb_ref[:]
    gc = g1 - gm_ref[:, 0:1]  # (Bt, 1)

    kp = g_out.shape[1]
    g_out[:] = jnp.pad(g1, ((0, 0), (0, kp - 1)))

    tile_corr = jnp.sum((xb * gc.astype(xb.dtype)).astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.pad(tile_corr, ((0, kp - 1), (0, 0)))

    @pl.when(i > 0)
    def _():
        acc_ref[0:1, :] = acc_ref[0:1, :] + tile_corr

    @pl.when(i == n - 1)
    def _():
        corr_out[:] = acc_ref[:]


def _kernel(xb_ref, w_ref, lpe_ref, y_ref, gm_ref, wb_ref, g_out, corr_out, acc_ref, *, family_name, k):
    # corr accumulates in a VMEM scratch that persists across the
    # (sequential) grid and is flushed once at the last step — Mosaic does
    # not accept read-modify-write on a revisited output block
    i = pl.program_id(0)
    n = pl.num_programs(0)

    xb = xb_ref[:]  # (Bt, D) — read once, used by both matmuls
    # f32 inputs: HIGHEST = true-f32 MXU passes (default bf16 precision
    # loses ~1e-2 on large logits, visibly shifting sigmoids/softmaxes).
    # bf16 inputs: single-pass bf16 MXU with f32 accumulation by design.
    prec = None if xb.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    # contract via dot_general (no explicit .T — in-kernel relayouts cost)
    lp = (
        jax.lax.dot_general(
            xb,
            w_ref[:].astype(xb.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),  # (Bt, D) x (kp, D) -> (Bt, kp)
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        + lpe_ref[:]
    )
    g = _gradient(family_name, lp, y_ref[:], k) * wb_ref[:]
    gc = g - gm_ref[:]

    g_out[:] = g

    tile_corr = jax.lax.dot_general(
        gc.astype(xb.dtype),
        xb,
        dimension_numbers=(((0,), (0,)), ((), ())),  # (Bt, kp) x (Bt, D) -> (kp, D)
        preferred_element_type=jnp.float32,
        precision=prec,
    )

    @pl.when(i == 0)
    def _():
        acc_ref[:] = tile_corr

    @pl.when(i > 0)
    def _():
        acc_ref[:] = acc_ref[:] + tile_corr

    @pl.when(i == n - 1)
    def _():
        corr_out[:] = acc_ref[:]


def _kernel_prefetch(s_ref, *refs, family_name, k, variant):
    # PrefetchScalarGridSpec passes the scalar block-offset ref first; it is
    # consumed by the index maps only
    del s_ref
    if variant == "vpu" and k == 1:
        _kernel_vpu1(*refs, family_name=family_name, k=k)
    else:
        _kernel(*refs, family_name=family_name, k=k)


def supported(B: int, D: int, k: int, dtype=jnp.float32) -> bool:
    """Shapes this kernel handles (tile fits VMEM, batch divisible)."""
    bt = _pick_bt(B, D, dtype)
    return bt is not None and k <= 128


def _pick_bt(B: int, D: int, dtype=jnp.float32):
    # bf16 tiles are half the bytes — allow twice the elements
    budget = _MAX_TILE_ELEMS * (2 if dtype == jnp.bfloat16 else 1)
    for bt in (1024, 512, 256, 128, 64, 32, 16, 8):
        if B % bt == 0 and bt * max(D, 1) <= budget:
            return bt
    return None


@functools.partial(
    jax.jit, static_argnames=("B", "family_name", "interpret", "variant", "kp_lanes")
)
def fused_head_step_at(
    head,
    start,
    w_h,
    lp_extra,
    yb,
    g_mem_b,
    wb,
    B: int,
    family_name: str,
    interpret: bool = False,
    variant: str = "mxu",
    kp_lanes: int = 8,
):
    """Fused lp/gradient/corr on rows [start, start+B) of the FULL head.

    The grid maps onto the full (n_pad, D) head with a scalar-prefetch
    block offset, so each (Bt, D) tile is DMA'd from HBM exactly once.
    (A round-1 variant took the sliced block as an argument instead — but
    `pallas_call` is opaque to XLA, so the `dynamic_slice` materialized a
    (B, D) copy before the kernel even started, tripling HBM traffic; it
    always lost to XLA's two-pass schedule and was removed.)

    `start` must be a multiple of the tile size (block sampling guarantees
    start = j * B and B % Bt == 0).  Returns (g (B, k), corr (k, D)) in f32.

    `variant`: "mxu" (default) runs both passes as dot_generals on the
    systolic array and handles any k <= 128; "vpu" is a k=1 elementwise
    multiply+reduce formulation (measured within noise of mxu at k=1).
    `kp_lanes` pads the class dimension (MXU cost is identical for kp in
    [1, 128]; it only sizes the accumulator/outputs).
    """
    n_pad, D = head.shape
    k = w_h.shape[0]
    bt = _pick_bt(B, D, head.dtype)
    assert bt is not None, "unsupported shapes for fused_head_step_at"
    n_tiles = B // bt
    w_h = w_h.astype(jnp.float32)
    lp_extra = lp_extra.astype(jnp.float32)
    yb = yb.astype(jnp.float32)
    g_mem_b = g_mem_b.astype(jnp.float32)
    wb = wb.astype(jnp.float32)

    kp = max(kp_lanes, ((k + 7) // 8) * 8)
    if kp != k:
        pad = [(0, 0), (0, kp - k)]
        w_h = jnp.pad(w_h, [(0, kp - k), (0, 0)])
        lp_extra = jnp.pad(lp_extra, pad)
        yb = jnp.pad(yb, pad)
        g_mem_b = jnp.pad(g_mem_b, pad)

    start_blocks = (start // bt).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            # the ONLY full-size operand: tile i = head rows
            # [start + i*bt, start + (i+1)*bt) — one DMA per tile, no copy
            pl.BlockSpec((bt, D), lambda i, s: (s[0] + i, 0)),
            pl.BlockSpec((kp, D), lambda i, s: (0, 0)),
            pl.BlockSpec((bt, kp), lambda i, s: (i, 0)),
            pl.BlockSpec((bt, kp), lambda i, s: (i, 0)),
            pl.BlockSpec((bt, kp), lambda i, s: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, s: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, kp), lambda i, s: (i, 0)),
            pl.BlockSpec((kp, D), lambda i, s: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((kp, D), jnp.float32)],
    )
    g, corr = pl.pallas_call(
        functools.partial(_kernel_prefetch, family_name=family_name, k=k, variant=variant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, kp), jnp.float32),
            jax.ShapeDtypeStruct((kp, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(start_blocks, head, w_h, lp_extra, yb, g_mem_b, wb.reshape(B, 1))
    return g[:, :k], corr[:k]
