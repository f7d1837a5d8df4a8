"""Whole-SAGA-epoch Pallas kernel for VMEM-resident (small) dense problems.

Small-problem fits are latency-bound, not bandwidth-bound: a 20-lambda
abalone path (4177x9) runs ~84k sequential batched steps, and XLA executes
each tiny step's ~12-op chain at ~5-6 us (pipeline latency of scalar-sized
VPU ops plus scan sequencing).  The reference's C++ inner loop has the same
role on CPU (reference src/saga-dense.h:105-180); this kernel is its
TPU-native counterpart: when the WHOLE dataset plus solver state fits in
VMEM (~<48 MB), one `pallas_call` runs the entire epoch — every batch
slice, gradient, rank-B correction, prox, and intercept update — inside a
single Mosaic `fori_loop`, with no HBM traffic and no per-step dispatch.

Measured on v5e (tools/bench_epoch_kernel.py): ~2.2-2.5 us/step vs XLA's
~5.9 us/step on the abalone-shaped problem — 2.7x on the in-path time that
dominates small fits.

Semantics are EXACTLY those of the XLA step path (solver/saga.py
step_xla/_finish_step): same batch sequence (block sampling over the same
per-epoch permutation of block starts), same update order, same epoch-end
g_sum refresh.  State rides in kernel layout (classes padded to 8 lanes,
features to a 128-lane multiple) across the whole lambda path; pad lanes
are provably zero-preserved (gradients are masked to the real classes, so
pad rows/columns of every state tensor stay exactly 0 and the convergence
check over the padded tile equals the check over the real tile).

The kernel runs in interpret mode off-TPU so the CPU float-32 test suite
exercises identical code (tests/test_epoch_kernel.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: class-lane padding: k classes ride the first k of KP lanes
KP = 8

#: resident-bytes budget for x + y + weights + g_mem + state (the Mosaic
#: scoped-vmem limit is raised to 100 MB; keep headroom for the compiler)
_VMEM_BUDGET = 48 * 1024 * 1024

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _ceil_mult(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def supported(
    n_pad: int, p: int, k: int, B: int, dtype=jnp.float32, with_offs: bool = False
) -> bool:
    """Shapes/dtypes the whole-epoch kernel handles: f32, <=8 classes,
    sublane-aligned batches, and everything resident in VMEM.  `with_offs`
    accounts for the extra (n_pad, KP) offsets operand (v2)."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if k > KP or B % 8 != 0 or B < 8 or n_pad % B != 0:
        return False
    P = _ceil_mult(max(p, 1), 128)
    resident = n_pad * P * 4 + 3 * n_pad * KP * 4 + 3 * KP * P * 4
    if with_offs:
        resident += n_pad * KP * 4
    return resident <= _VMEM_BUDGET


class _PadState(NamedTuple):
    """SagaState in kernel layout (all f32, lane-padded)."""

    w: jnp.ndarray  # (KP, P)
    ivec: jnp.ndarray  # (2, KP): row 0 intercept, row 1 g_sum_intercept
    g_mem: jnp.ndarray  # (n_pad, KP)
    g_sum: jnp.ndarray  # (KP, P)


def _gradient(family, lp, yb, k: int):
    """Family gradient on (B, KP) with only the first k lanes real — the
    same algebra as families/families.py, restated with the class-pad mask
    the multinomial softmax needs (cf. pallas_kernels._gradient)."""
    name = family.name
    if name in ("gaussian", "mgaussian"):
        return lp - yb
    if name == "binomial":
        return 1.0 / (1.0 + jnp.exp(-lp)) - yb
    if name == "poisson":
        import math

        return jnp.exp(jnp.minimum(lp, math.log(family.smoothness))) - yb
    if name == "multinomial":
        mask = jax.lax.broadcasted_iota(jnp.int32, (1, lp.shape[1]), 1) < k
        lpm = jnp.where(mask, lp, -1e30)
        m = jnp.max(lpm, axis=1, keepdims=True)
        e = jnp.exp(lpm - m)
        return e / jnp.sum(e, axis=1, keepdims=True) - yb
    raise ValueError(f"epoch kernel: unsupported family {name}")


def _prox(penalty, w_half, threshold):
    """Whole-matrix prox on the padded tile (penalties/penalties.py); pad
    rows/cols are zero and stay zero under all three forms."""
    name = penalty.name
    if name == "ridge":
        return w_half
    if name == "elastic_net":
        return jnp.sign(w_half) * jnp.maximum(jnp.abs(w_half) - threshold, 0.0)
    if name == "group_lasso":
        norms = jnp.sqrt(jnp.sum(w_half * w_half, axis=0, keepdims=True))
        factor = jnp.maximum(1.0 - threshold / jnp.maximum(norms, 1e-30), 0.0)
        return w_half * factor
    raise ValueError(f"epoch kernel: unsupported penalty {name}")


def _make_kernel(T, B, k, family, penalty, config, refresh: bool,
                 have_offs: bool = False, have_pf: bool = False):
    precision = (
        jax.lax.Precision.HIGHEST
        if config.matmul_precision == "highest"
        else None
    )
    decay = float(config.intercept_decay)  # python literal: folds at trace time

    def kernel(*refs):
        # optional v2 operands (offsets / penalty factors) slot in between
        # the fixed inputs and the aliased state refs
        starts_ref, x_ref, y_ref, wt_ref, sc_ref = refs[:5]
        i = 5
        offs_ref = refs[i] if have_offs else None
        i += int(have_offs)
        pf_ref = refs[i] if have_pf else None
        i += int(have_pf)
        (w_in, iv_in, gm_in, gs_in, w_out, iv_out, gm_out, gs_out) = refs[i:]
        # state lives in the output refs (input-aliased on TPU)
        w_out[:] = w_in[:]
        iv_out[:] = iv_in[:]
        gm_out[:] = gm_in[:]
        gs_out[:] = gs_in[:]

        gamma = sc_ref[0:1, 0:1]  # (1, 1) broadcastable scalars
        l1 = sc_ref[0:1, 1:2]
        l2 = sc_ref[0:1, 2:3]
        w_total = sc_ref[0:1, 3:4]
        kmask = (jax.lax.broadcasted_iota(jnp.int32, (1, KP), 1) < k).astype(jnp.float32)

        def body(t, _):
            start = starts_ref[t]
            xb = x_ref[pl.ds(start, B), :]  # (B, P)
            yb = y_ref[pl.ds(start, B), :]  # (B, KP)
            wtb = wt_ref[pl.ds(start, B), 0:1]  # (B, 1)
            w = w_out[:]  # (KP, P)

            lp = jax.lax.dot_general(
                xb, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) + iv_out[0:1, :]
            if have_offs:  # fixed linear-predictor offsets (pad lanes 0)
                lp = lp + offs_ref[pl.ds(start, B), :]
            # class-pad lanes masked to 0 so every pad row/col of the state
            # stays exactly 0 (binomial's sigmoid(0) = 0.5 would otherwise
            # leak into g_mem pads and the corr rows)
            g = _gradient(family, lp, yb, k) * wtb * kmask
            gc = g - gm_out[pl.ds(start, B), :]
            gm_out[pl.ds(start, B), :] = g

            corr = jax.lax.dot_general(
                gc, xb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (KP, P)
            bw = jnp.maximum(jnp.sum(wtb), 1e-12)
            grad_est = corr / bw + gs_out[:]
            if have_pf:
                # per-feature penalty factors scale both the L2 decay and
                # the prox threshold (saga._finish_step semantics); pad
                # columns carry pf = 0 and their w stays exactly 0
                pfv = pf_ref[0:1, :]  # (1, P)
                w_half = w * (1.0 - gamma * l2 * pfv) - gamma * grad_est
                w_out[:] = _prox(penalty, w_half, gamma * l1 * pfv)
            else:
                w_half = w * (1.0 - gamma * l2) - gamma * grad_est
                w_out[:] = _prox(penalty, w_half, gamma * l1)
            gs_out[:] = gs_out[:] + corr / w_total
            if config.fit_intercept:
                sum_gc = jnp.sum(gc, axis=0, keepdims=True)  # (1, KP)
                iv_out[0:1, :] = iv_out[0:1, :] - gamma * decay * (sum_gc / bw + iv_out[1:2, :])
                iv_out[1:2, :] = iv_out[1:2, :] + sum_gc / w_total
            return 0

        jax.lax.fori_loop(0, T, body, 0)

        if refresh:
            # epoch-end exact g_sum recompute (solver/saga.py _refresh_g_sum,
            # dense branch): one in-VMEM matmul over the whole resident x
            gs_out[:] = jax.lax.dot_general(
                gm_out[:], x_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) / w_total
            iv_out[1:2, :] = jnp.sum(gm_out[:], axis=0, keepdims=True) / w_total

    return kernel


def pad_state(state, p: int):
    """SagaState (k-, p-sized) -> kernel layout; pads are zero."""
    k = state.w.shape[0]
    P = _ceil_mult(max(p, 1), 128)
    w = jnp.zeros((KP, P), jnp.float32).at[:k, :p].set(state.w.astype(jnp.float32))
    ivec = (
        jnp.zeros((2, KP), jnp.float32)
        .at[0, :k].set(state.intercept.astype(jnp.float32))
        .at[1, :k].set(state.g_sum_intercept.astype(jnp.float32))
    )
    g_mem = jnp.zeros((state.g_mem.shape[0], KP), jnp.float32).at[:, :k].set(
        state.g_mem.astype(jnp.float32)
    )
    g_sum = jnp.zeros((KP, P), jnp.float32).at[:k, :p].set(state.g_sum.astype(jnp.float32))
    return _PadState(w, ivec, g_mem, g_sum)


def unpad_state(ps: _PadState, k: int, p: int):
    from sgdnet_tpu.solver.saga import SagaState

    return SagaState(
        w=ps.w[:k, :p],
        intercept=ps.ivec[0, :k],
        g_mem=ps.g_mem[:, :k],
        g_sum=ps.g_sum[:k, :p],
        g_sum_intercept=ps.ivec[1, :k],
    )


def build(x, y, weights, w_total, family, penalty, config, interpret: bool,
          offs=None, pf=None):
    """Return `epoch_fn(state_pad, key, gamma, l1, l2, it) -> state_pad`
    running one whole SAGA epoch as a single pallas_call.  Inputs are padded
    once at trace time (hoisted out of the epoch loop by jit).  `offs`
    ((n_pad, k) linear-predictor offsets) and `pf` ((p,) penalty factors)
    are the v2 surface — each is one extra VMEM operand."""
    n_pad, p = x.shape
    k = family.n_classes
    B = config.batch_size
    T = n_pad // B
    P = _ceil_mult(max(p, 1), 128)

    x_pad = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, P - p)))
    y_pad = jnp.pad(y.astype(jnp.float32), ((0, 0), (0, KP - y.shape[1])))
    wt_pad = jnp.broadcast_to(weights.astype(jnp.float32)[:, None], (n_pad, 1))
    have_offs = offs is not None
    have_pf = pf is not None
    extra_inputs = []
    extra_specs = []
    if have_offs:
        offs_pad = jnp.pad(offs.astype(jnp.float32), ((0, 0), (0, KP - offs.shape[1])))
        extra_inputs.append(offs_pad)
        extra_specs.append((n_pad, KP))
    if have_pf:
        pf_pad = jnp.zeros((1, P), jnp.float32).at[0, :p].set(pf.astype(jnp.float32))
        extra_inputs.append(pf_pad)
        extra_specs.append((1, P))

    in_kernel_refresh = bool(config.g_sum_refresh and config.g_sum_refresh_every <= 1)
    kernel = _make_kernel(T, B, k, family, penalty, config, refresh=in_kernel_refresh,
                          have_offs=have_offs, have_pf=have_pf)

    full = lambda i, s: (0, 0)
    n_extra = len(extra_inputs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_pad, P), full),
            pl.BlockSpec((n_pad, KP), full),
            pl.BlockSpec((n_pad, 1), full),
            pl.BlockSpec((1, 128), full),
            *[pl.BlockSpec(s, full) for s in extra_specs],
            pl.BlockSpec((KP, P), full),
            pl.BlockSpec((2, KP), full),
            pl.BlockSpec((n_pad, KP), full),
            pl.BlockSpec((KP, P), full),
        ],
        out_specs=[
            pl.BlockSpec((KP, P), full),
            pl.BlockSpec((2, KP), full),
            pl.BlockSpec((n_pad, KP), full),
            pl.BlockSpec((KP, P), full),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((KP, P), jnp.float32),
            jax.ShapeDtypeStruct((2, KP), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, KP), jnp.float32),
            jax.ShapeDtypeStruct((KP, P), jnp.float32),
        ],
        # operand index space includes the scalar-prefetch arg (index 0);
        # the 4 state inputs start after the fixed + v2 operands
        input_output_aliases={5 + n_extra + i: i for i in range(4)},
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )

    def _xla_refresh(ps: _PadState) -> _PadState:
        # padded-layout twin of saga._refresh_g_sum (dense, xc=None): used
        # only under a >1 refresh cadence, where the recompute must stay
        # outside the kernel to ride the lax.cond
        g_sum = jnp.dot(ps.g_mem.T, x_pad, preferred_element_type=jnp.float32) / w_total
        ivec = ps.ivec.at[1, :].set(jnp.sum(ps.g_mem, axis=0) / w_total)
        return ps._replace(g_sum=g_sum, ivec=ivec)

    def epoch_fn(ps: _PadState, key, gamma, l1, l2, it=None):
        starts = (jax.random.permutation(key, T) * B).astype(jnp.int32)
        sc = jnp.zeros((1, 128), jnp.float32)
        sc = sc.at[0, 0].set(gamma).at[0, 1].set(l1).at[0, 2].set(l2).at[0, 3].set(w_total)
        w, ivec, g_mem, g_sum = call(
            starts, x_pad, y_pad, wt_pad, sc, *extra_inputs,
            ps.w, ps.ivec, ps.g_mem, ps.g_sum,
        )
        ps = _PadState(w, ivec, g_mem, g_sum)
        if config.g_sum_refresh and not in_kernel_refresh:
            every = config.g_sum_refresh_every
            if it is None:
                ps = _xla_refresh(ps)
            else:
                ps = jax.lax.cond((it + 1) % every == 0, _xla_refresh, lambda s: s, ps)
        return ps

    return epoch_fn
