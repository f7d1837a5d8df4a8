"""Hybrid-layout planner: pick the dense-head width from the measured
v5e cost model.

The dense-head/sparse-tail split (core/sparse.py HybridCSR) has one free
parameter that matters: the head width D.  Its economics were measured in
round 2 (RESULTS.md):

  * the head streams  (2 + 1/refresh) * n_pad * D * itemsize  bytes per
    epoch through HBM at the chip's sustained dense-load rate
    (~430-455 GB/s measured on v5e through this runtime), independent of
    how many of those values are real nonzeros;
  * every tail entry costs ~4 serialized gather/scatter element-ops at
    ~9.6 ns each (forward gather+scatter, outer gather+scatter).

So a column belongs in the head when its total nonzero count exceeds
    break_even = passes * n_pad * itemsize / stream / (4 * elem_ns)
(~13 nonzeros per column for an int8 head at n = 100k), and the optimal D
is where the column-popularity curve crosses that line.  `plan_layout`
computes it exactly from the column counts, subject to an HBM budget.

`fit(hybrid_max_head="auto")` calls this; the explicit function is public
for planning without fitting.

Two-level heads (planner v2) were evaluated against this cost model and
REJECTED analytically: a second bfloat16 "warm" level would admit columns
whose count clears the bf16 break-even (passes*n_pad*2/stream / (4*elem)
~= 27 nnz at the bench shape), but every such column already clears the
int8 break-even (~14 nnz) and int8 storage streams HALF the bytes at the
same sustained rate with on-chip-validated convergence (RESULTS.md,
tools/validate_bf16.py).  Storage levels are totally ordered by stream
cost here, so "int8 hot + bf16 warm" is strictly dominated by simply
widening the int8 head — predicted gain <= 0, well under the >= 10%
pursuit threshold.  Pallas-regime constants are likewise not modeled:
the fused kernel only wins for bf16 heads under block sampling (+21%),
a regime the planner never recommends (int8 dominates it by ~1.3x).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: measured sustained dense-load HBM rate on v5e through this runtime
#: (tools/bench_components.py, bench_layout_sweep.py round 2)
STREAM_BYTES_PER_S = 4.3e11
#: measured serialized gather/scatter cost per element-op (round 2)
ELEM_OP_S = 9.6e-9
#: element-ops per tail entry per step: fwd gather + fwd scatter +
#: outer gather + outer scatter
TAIL_OPS_PER_ENTRY = 4


@dataclass(frozen=True)
class LayoutPlan:
    """Planner output: the head width plus the predicted per-epoch costs."""

    max_head: int  # recommended head width D (multiple of 128)
    head_ms: float  # predicted head stream time per epoch
    tail_ms: float  # predicted tail element-op time per epoch
    coverage: float  # fraction of nonzeros landing in the head
    head_bytes: int  # resident head size at n_pad rows
    break_even_nnz: float  # column-count threshold that set D


def plan_layout(
    x,
    *,
    batch_size: int = 8192,
    head_itemsize: int = 1,
    g_sum_refresh_every: int = 8,
    hbm_budget: float = 12e9,
    stream_bytes_per_s: float = STREAM_BYTES_PER_S,
    elem_op_s: float = ELEM_OP_S,
    max_head_cap: int | None = None,
) -> LayoutPlan:
    """Choose the hybrid head width for a scipy sparse matrix.

    `head_itemsize` is the storage itemsize of the head (1 for int8, 2 for
    bfloat16, 4 for float32 — pass what you will pass as
    `hybrid_head_dtype`).  `hbm_budget` caps the resident head bytes.
    """
    x = x.tocsr()
    n, p = x.shape
    n_pad = ((n + batch_size - 1) // batch_size) * batch_size
    col_nnz = np.bincount(x.indices, minlength=p)
    order = np.argsort(-col_nnz, kind="stable")
    sorted_nnz = col_nnz[order].astype(np.int64)
    total = max(int(sorted_nnz.sum()), 1)

    passes = 2.0 + 1.0 / max(g_sum_refresh_every, 1)
    head_cost_per_col = passes * n_pad * head_itemsize / stream_bytes_per_s
    tail_cost_per_entry = TAIL_OPS_PER_ENTRY * elem_op_s
    # a column pays head_cost_per_col dense or c_nnz * tail_cost_per_entry
    # sparse — move it into the head while its count clears the break-even
    break_even = head_cost_per_col / tail_cost_per_entry
    d = int(np.searchsorted(-sorted_nnz, -break_even, side="right"))

    budget_cols = int(hbm_budget // max(n_pad * head_itemsize, 1))
    d = min(d, budget_cols)
    if max_head_cap is not None:
        d = min(d, max_head_cap)
    d = min(max(d, 1), p)
    d = min(((d + 127) // 128) * 128, p)  # lane-align (pad up, then cap)

    cum = np.cumsum(sorted_nnz)
    head_nnz = int(cum[d - 1]) if d >= 1 else 0
    tail_nnz = total - head_nnz
    head_ms = passes * n_pad * d * head_itemsize / stream_bytes_per_s * 1e3
    tail_ms = tail_nnz * tail_cost_per_entry * 1e3
    return LayoutPlan(
        max_head=d,
        head_ms=head_ms,
        tail_ms=tail_ms,
        coverage=head_nnz / total,
        head_bytes=n_pad * d * head_itemsize,
        break_even_nnz=break_even,
    )
