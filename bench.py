"""Benchmark: sparse-CSR binomial SAGA epoch throughput (nnz/s per chip).

The north-star metric from BASELINE.md: nonzeros processed per second in
SAGA epochs on an rcv1-scale synthetic sparse binomial workload.  The
reference publishes no absolute numbers (BASELINE.md — relative curves
only, single-threaded C++ on an EC2 m4.large).

Prints a JSON line of the form
  {"metric": "sparse_saga_nnz_per_s", "value": ..., "unit": "nnz/s", "vs_baseline": ...}
INCREMENTALLY — once after every completed config, each line replacing the
previous (the driver takes the LAST line).  Extra diagnostics go to stderr.

Harness discipline (round 3 — BENCH_r02 was rc=124/parsed:null because the
old script printed its single JSON line only after a ~59 s sklearn
baseline plus three configs with multi-GB uploads):

* The winning config runs FIRST and emits immediately.
* Every further stage is gated on the remaining global budget
  (BENCH_BUDGET_S, default 420 s), and a watchdog thread force-exits 0
  shortly after the budget once a line is out, so a hung relay dispatch
  degrades to fewer configs instead of rc=124.
* `vs_baseline` uses a FROZEN single-core CPU baseline (protocol pinned in
  BASELINE.md): sklearn's Cython SAGA measured 4.50e5 nnz/s on this
  workload (3-epoch full-data run, this host, 2026-08-19 — BENCH_r01;
  round-over-round in-run remeasurement swung +-30 % with relay-day CPU
  noise, so the constant is pinned and a cheap subsampled sanity check is
  only LOGGED).
* Device layouts are built host-side (numpy), padded host-side, and
  uploaded in timed chunks; if the relay's host->device path is having a
  bad day (observed 1.7 GB int8 > 10 min) the upload aborts and the head
  values are synthesized on device with identical shapes/statistics —
  throughput here is shape-determined, and the fallback is logged loudly.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# FROZEN baseline (see module docstring + BASELINE.md): sklearn Cython SAGA,
# single core, 3 epochs on the full n=100k/p=47k/7.6M-nnz workload.
CPU_BASELINE_NNZ_PER_S = 4.50e5

T0 = time.monotonic()
TOTAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))
UPLOAD_BUDGET_S = float(os.environ.get("BENCH_UPLOAD_BUDGET_S", "90"))

_best = {"value": 0.0, "emitted": False}


def elapsed() -> float:
    return time.monotonic() - T0


def remaining() -> float:
    return TOTAL_BUDGET_S - elapsed()


def log(*a):
    print(f"[{elapsed():6.1f}s]", *a, file=sys.stderr, flush=True)


def emit(value: float):
    """Print the (possibly updated) official JSON line; last line wins."""
    _best["value"] = max(_best["value"], float(value))
    _best["emitted"] = True
    print(
        json.dumps(
            {
                "metric": "sparse_saga_nnz_per_s",
                "value": _best["value"],
                "unit": "nnz/s",
                "vs_baseline": _best["value"] / CPU_BASELINE_NNZ_PER_S,
            }
        ),
        flush=True,
    )


def _watchdog():
    """Force a clean exit if a relay dispatch hangs past the budget.

    A stuck device call is not interruptible from Python; os._exit is the
    only reliable guard.  Exits 0 — by that point either the official line
    is already printed (normal) or nothing could be measured at all (the
    driver then records parsed:null with rc=0 instead of rc=124)."""
    while True:
        time.sleep(5)
        over = elapsed() - TOTAL_BUDGET_S
        if over > 60 and _best["emitted"]:
            log("watchdog: budget exceeded with a result emitted -> exit 0")
            os._exit(0)
        if over > 150:
            log("watchdog: budget exceeded with NO result -> exit 0 (empty)")
            os._exit(0)


def _to_scipy(csr_np):
    """numpy padded-CSR dict -> scipy csr (host-side only — device->host
    readback through the relay is pathologically slow, so the synthetic
    data stays in numpy until a device layout is actually built)."""
    import scipy.sparse as sp

    n, p = csr_np["n"], csr_np["p"]
    ind = csr_np["indices"].reshape(-1)
    val = csr_np["values"].reshape(-1)
    rows = np.repeat(np.arange(n), csr_np["indices"].shape[1])
    keep = val != 0
    return sp.csr_matrix((val[keep], (rows[keep], ind[keep])), shape=(n, p))


def cpu_baseline_sanity(csr_np, y, rows=20_000):
    """Cheap LOGGED-ONLY sanity check of the frozen CPU baseline: sklearn
    SAGA, 1 epoch on a row subsample.  Never feeds `vs_baseline` (the
    constant is pinned — see module docstring)."""
    from sklearn.linear_model import LogisticRegression

    xs = _to_scipy(csr_np)[:rows]
    yv = np.asarray(y).ravel()[:rows]
    clf = LogisticRegression(
        solver="saga", penalty="l1", C=1.0, max_iter=1, tol=0.0, fit_intercept=True
    )
    import warnings

    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        clf.fit(xs, yv)
    dt = time.perf_counter() - t0
    rate = xs.nnz / dt
    drift = rate / CPU_BASELINE_NNZ_PER_S
    log(
        f"cpu baseline sanity (sklearn saga, {rows} rows, 1 epoch): "
        f"{rate:.3e} nnz/s = {drift:.2f}x the frozen {CPU_BASELINE_NNZ_PER_S:.2e}"
    )
    return rate


def make_sparse_binomial(n=100_000, p=47_000, nnz_per_row=76, seed=0, dtype=np.float32):
    """rcv1-scale synthetic: fixed nnz per row, Zipf-like column usage
    (bag-of-words statistics: a small head of frequent features carries most
    nonzeros, like the real rcv1).  Returns a numpy padded-CSR dict — build
    device layouts via `as_padded` / `build_hybrid_device`."""
    rng = np.random.default_rng(seed)
    # Zipf column popularity ~ (rank + 10)^-1.15 — bag-of-words-like skew
    # (real rcv1: a few thousand hot features carry most term occurrences)
    weights = (np.arange(p) + 10.0) ** -1.15
    cdf = np.cumsum(weights) / weights.sum()
    cols = np.searchsorted(cdf, rng.random((n, nnz_per_row))).astype(np.int32).clip(0, p - 1)
    vals = rng.normal(size=(n, nnz_per_row)).astype(dtype)
    w_true = rng.normal(size=p) * (rng.random(p) < 0.05) * 3.0
    lp = (vals * w_true[cols]).sum(axis=1)
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-lp))).astype(dtype)

    L = ((nnz_per_row + 7) // 8) * 8
    indices = np.zeros((n, L), np.int32)
    values = np.zeros((n, L), dtype)
    indices[:, :nnz_per_row] = cols
    values[:, :nnz_per_row] = vals
    x = dict(indices=indices, values=values, nnz=np.full((n,), nnz_per_row, np.int32), n=n, p=p)
    return x, y.reshape(-1, 1)


def as_padded(csr_np):
    """numpy padded-CSR dict -> device PaddedCSR."""
    import jax.numpy as jnp

    from sgdnet_tpu.core.sparse import PaddedCSR

    return PaddedCSR(
        jnp.asarray(csr_np["indices"]),
        jnp.asarray(csr_np["values"]),
        jnp.asarray(csr_np["nnz"]),
        csr_np["n"],
        csr_np["p"],
    )


def _chunked_upload(arr_np, label, budget_s, chunk_bytes=128 << 20):
    """Upload a large host array in timed row chunks; raises TimeoutError if
    the relay's host->device rate would blow `budget_s`.  Returns the device
    array (assembled with one on-device concatenate: peak 2x resident)."""
    import jax
    import jax.numpy as jnp

    total = arr_np.nbytes
    rows_per = max(int(chunk_bytes // max(arr_np[:1].nbytes, 1)), 1)
    parts = []
    t0 = time.monotonic()
    for lo in range(0, arr_np.shape[0], rows_per):
        part = jax.device_put(np.ascontiguousarray(arr_np[lo : lo + rows_per]))
        part.block_until_ready()
        parts.append(part)
        dt = time.monotonic() - t0
        done = min(lo + rows_per, arr_np.shape[0]) / arr_np.shape[0]
        if dt > budget_s and done < 1.0:
            eta = dt / max(done, 1e-9)
            raise TimeoutError(
                f"{label}: upload at {done:.0%} after {dt:.0f}s (eta {eta:.0f}s) "
                f"exceeds the {budget_s:.0f}s budget"
            )
    out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    out.block_until_ready()
    log(f"{label}: uploaded {total / 1e9:.2f} GB in {time.monotonic() - t0:.1f}s")
    return out


def build_hybrid_device(csr_np, n_pad, max_head=4096, coverage=0.9, head_dtype=None,
                        batch_size=None):
    """Build the device HybridCSR for the bench configs, robustly:

    * split host-side (numpy, `split_columns(as_host=True)`),
    * pad rows host-side (device-side pad of a multi-GB head would hold
      old+new resident at once),
    * pack the BlockCOO tail host-side (from device arrays it would trigger
      a ~13 MB device->host readback at ~0.2 MB/s),
    * int8 heads: upload only the ~nnz quantized entries and scatter-build
      the dense block ON DEVICE (materialize_int8_head) — no multi-GB
      upload at all; f32/bf16 heads still upload dense in timed chunks,
      falling back to a device-synthesized head with identical shape/dtype
      on a slow-relay day (logged; epoch throughput is shape-determined).
    """
    import jax
    import jax.numpy as jnp

    from sgdnet_tpu.core.sparse import BlockCOO, HybridCSR, PaddedCSR

    t0 = time.monotonic()
    xs = _to_scipy(csr_np)
    quant_int8 = head_dtype is not None and jnp.dtype(head_dtype) == jnp.int8
    xh, perm = HybridCSR.split_columns(
        xs, coverage=coverage, max_head=max_head, head_dtype=head_dtype, as_host=True,
        head_form="nnz" if quant_int8 else "dense",
    )
    log(f"host-side split built in {time.monotonic() - t0:.1f}s "
        f"(int8 quantizes sparse-side — the old densify-then-quantize path "
        f"took ~7 min on this 2-core host and was BENCH_r02's rc=124)")
    col_nnz = np.bincount(xs.indices, minlength=csr_np["p"])
    head_nnz = int(col_nnz[perm[: xh.n_head]].sum())
    log(
        f"hybrid split: head D={xh.n_head} covers {head_nnz / max(xs.nnz, 1):.1%} of nnz, "
        f"tail width L={xh.tail.row_width}"
    )

    n = xh.n_rows
    extra = n_pad - n
    ti = np.concatenate([xh.tail.indices, np.zeros((extra, xh.tail.row_width), np.int32)]) if extra else xh.tail.indices
    tv = np.concatenate([xh.tail.values, np.zeros((extra, xh.tail.row_width), xh.tail.values.dtype)]) if extra else xh.tail.values
    tz = np.concatenate([xh.tail.nnz, np.zeros((extra,), np.int32)]) if extra else xh.tail.nnz

    blk = None
    if batch_size is not None:
        # from_padded consumes numpy arrays here (a device-array tail would
        # trigger a slow device->host readback) and returns device arrays
        host_tail = PaddedCSR(ti, tv, tz, n_pad, csr_np["p"])
        blk = BlockCOO.from_padded(host_tail, batch_size)

    if quant_int8:
        # nonzero-form upload + on-device scatter build (round 5): ~9
        # bytes/nnz cross the relay instead of the multi-GB dense block
        # (which took 80-100 s on a good relay day and needed the synth
        # fallback on a bad one); the dense int8 head materializes on
        # device, bitwise-identical to the old upload.
        from sgdnet_tpu.core.sparse import materialize_int8_head

        t1 = time.monotonic()
        head_dev = materialize_int8_head(xh.head, n_pad=n_pad)
        _touch = int(jnp.sum(head_dev[-2:, :8].astype(jnp.int32)))  # forced sync
        log(
            f"head D={xh.n_head} int8: built ON DEVICE from "
            f"{xh.head.nbytes / 1e6:.0f} MB of nonzeros in "
            f"{time.monotonic() - t1:.1f}s (replaces a "
            f"{n_pad * xh.n_head / 1e9:.2f} GB dense upload)"
        )
    else:
        head_np = (
            np.concatenate([xh.head, np.zeros((extra, xh.n_head), xh.head.dtype)])
            if extra
            else xh.head
        )
        try:
            head_dev = _chunked_upload(head_np, f"head D={xh.n_head} {head_np.dtype}", UPLOAD_BUDGET_S)
        except TimeoutError as e:
            log(f"FALLBACK: {e}; synthesizing head values ON DEVICE (same shape/dtype)")
            key = jax.random.PRNGKey(7)
            if head_np.dtype == np.int8:
                head_dev = jax.random.randint(key, head_np.shape, -127, 128, jnp.int8)
            else:
                head_dev = jax.random.normal(key, head_np.shape, jnp.float32).astype(
                    jnp.dtype(head_np.dtype.name)
                )
            head_dev.block_until_ready()

    tail_dev = PaddedCSR(jnp.asarray(ti), jnp.asarray(tv), jnp.asarray(tz), n_pad, csr_np["p"])
    scale_dev = None if xh.head_scale is None else jnp.asarray(xh.head_scale)
    return HybridCSR(head_dev, tail_dev, n_pad, csr_np["p"], blk_tail=blk, head_scale=scale_dev)


def to_hybrid(csr_np, max_head=4096, coverage=0.9, head_dtype=None):
    """numpy padded-CSR dict -> dense-head/sparse-tail HybridCSR layout
    (un-padded, single-shot upload).  Kept for the tools/ harnesses; the
    official configs use `build_hybrid_device` (host-side pad + chunked
    upload + host-side BlockCOO packing)."""
    from sgdnet_tpu.core.sparse import HybridCSR

    xs = _to_scipy(csr_np)
    # int8 is quantized host-side inside split_columns (only int8 bytes
    # cross the slow relay); valid here because the bench never standardizes
    xh, perm = HybridCSR.split_columns(xs, coverage=coverage, max_head=max_head, head_dtype=head_dtype)
    col_nnz = np.bincount(xs.indices, minlength=csr_np["p"])
    head_nnz = int(col_nnz[perm[: xh.n_head]].sum())  # host-side (no readback)
    log(
        f"hybrid split: head D={xh.n_head} covers {head_nnz / max(xs.nnz, 1):.1%} of nnz, "
        f"tail width L={xh.tail.row_width}"
    )
    return xh, perm


def bench_sparse_epoch(
    n=100_000,
    p=47_000,
    nnz_per_row=76,
    batch_size=1024,
    epochs=5,
    sparse_mode="gather",
    hybrid=False,
    use_pallas=False,
    scan_unroll=1,
    max_head=4096,
    coverage=0.9,
    sampling="permutation",
    g_sum_refresh_every=1,
    head_dtype=None,
    data=None,
    x_prebuilt=None,
):
    import jax
    import jax.numpy as jnp

    from sgdnet_tpu.families import get_family
    from sgdnet_tpu.penalties import select_penalty
    from sgdnet_tpu.solver.saga import SolverConfig, _make_epoch, init_state

    csr_np, y = data if data is not None else make_sparse_binomial(n, p, nnz_per_row)
    n_pad = ((n + batch_size - 1) // batch_size) * batch_size
    if x_prebuilt is not None:
        from sgdnet_tpu.core.sparse import HybridCSR

        x = x_prebuilt.pad_rows(n_pad) if x_prebuilt.shape[0] < n_pad else x_prebuilt
        if sampling == "block" and isinstance(x, HybridCSR) and x.blk_tail is None:
            log("note: prebuilt hybrid has no blk_tail; block sampling runs on the padded tail")
    elif hybrid:
        x = build_hybrid_device(
            csr_np, n_pad, max_head=max_head, coverage=coverage, head_dtype=head_dtype,
            batch_size=batch_size if sampling == "block" else None,
        )
    else:
        x = as_padded(csr_np).pad_rows(n_pad)
    y = jnp.concatenate([jnp.asarray(y), jnp.zeros((n_pad - n, 1), jnp.float32)])
    weights = jnp.concatenate([jnp.ones((n,), jnp.float32), jnp.zeros((n_pad - n,), jnp.float32)])

    family = get_family("binomial")
    penalty = select_penalty(1.0, "binomial")
    config = SolverConfig(
        batch_size=batch_size,
        fit_intercept=True,
        sparse_mode=sparse_mode,
        intercept_decay=0.01,
        use_pallas=use_pallas,
        scan_unroll=scan_unroll,
        sampling=sampling,
        g_sum_refresh_every=g_sum_refresh_every,
    )
    state = init_state(n_pad, p, 1, jnp.float32)

    lam = 1.0 / n  # the reference benchmark protocol's lambda (BASELINE.md)
    gamma, l1, l2 = jnp.float32(3e-3), jnp.float32(lam), jnp.float32(0.0)

    from functools import partial

    # x/y/weights must be jit ARGUMENTS (not closure captures), else they are
    # embedded as program constants and blow up compilation
    @partial(jax.jit, static_argnames=("family", "penalty", "config", "epochs"))
    def run_epochs(x, y, weights, state, key, family, penalty, config, epochs):
        epoch = _make_epoch(x, y, weights, None, jnp.float32(n), family, penalty, config)

        def body(state, i):
            return epoch(state, jax.random.fold_in(key, i), gamma, l1, l2, it=i), None

        state, _ = jax.lax.scan(body, state, jnp.arange(epochs))
        return state

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = run_epochs(x, y, weights, state, key, family, penalty, config, epochs)
    float(jnp.sum(state.w))
    compile_and_first = time.perf_counter() - t0
    log(f"compile+first run: {compile_and_first:.2f}s")

    # Timing MUST end with a host readback of a scalar derived from the
    # result: on the relay, block_until_ready returns before execution
    # finishes (measured: a 48 ms epoch "completes" in 0.4 ms without the
    # fetch).  Best-of-3 with distinct keys (the relay caches identical
    # dispatches and has high run-to-run variance).
    elapsed_run = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        state = run_epochs(
            x, y, weights, state, jax.random.fold_in(key, r), family, penalty, config, epochs
        )
        float(jnp.sum(state.w))
        elapsed_run = min(elapsed_run, time.perf_counter() - t0)

    total_nnz = n * nnz_per_row * epochs
    nnz_per_s = total_nnz / elapsed_run
    log(
        f"sparse epoch bench: n={n} p={p} nnz/row={nnz_per_row} B={batch_size} "
        f"mode={'hybrid' if hybrid else sparse_mode}{'+pallas' if use_pallas else ''}"
        f"{'+block' if sampling == 'block' else ''}"
        f"{f'+refresh/{g_sum_refresh_every}' if g_sum_refresh_every > 1 else ''}"
        f"{f'+head:{head_dtype}' if head_dtype is not None else ''}: "
        f"{epochs} epochs in {elapsed_run:.3f}s -> {nnz_per_s:.3e} nnz/s"
    )
    return nnz_per_s


def bench_dense_multinomial(
    n=65536, p=784, k=10, batch_size=4096, epochs=3, matmul_precision="highest",
    label="dense multinomial",
):
    """Secondary: dense multinomial epoch throughput (MXU-bound path).

    The default shape is the reference-scale workload; `main()` also runs an
    MXU-meaningful shape (n=131072, p=8192, k=64) at BOTH matmul precisions:
    "default" (single-pass bf16 MXU) for FLOP health vs the v5e roofline,
    and "highest" (the solver's actual default, 6-pass f32 emulation) so the
    dense path is reported at the precision fits actually use."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from sgdnet_tpu.families import get_family
    from sgdnet_tpu.penalties import select_penalty
    from sgdnet_tpu.solver.saga import SolverConfig, _make_epoch, init_state

    # generate on device: multi-GB host->device pushes through the relay are
    # slow, and the values don't matter for throughput
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda kk: jax.random.normal(kk, (n, p), jnp.float32))(key)
    yi = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, k)
    y = jax.nn.one_hot(yi, k, dtype=jnp.float32)
    weights = jnp.ones((n,), jnp.float32)

    family = get_family("multinomial", n_classes=k)
    penalty = select_penalty(1.0, "multinomial")
    config = SolverConfig(
        batch_size=batch_size, fit_intercept=True, matmul_precision=matmul_precision,
        sampling="block",
    )
    state = init_state(n, p, k, jnp.float32)

    @partial(jax.jit, static_argnames=("family", "penalty", "config", "epochs"))
    def run(x, y, weights, state, key, family, penalty, config, epochs):
        with jax.default_matmul_precision(config.matmul_precision):
            epoch = _make_epoch(x, y, weights, None, jnp.float32(n), family, penalty, config)

            def body(state, i):
                return epoch(state, jax.random.fold_in(key, i), jnp.float32(1e-3), jnp.float32(1e-4), jnp.float32(0.0)), None

            return jax.lax.scan(body, state, jnp.arange(epochs))[0]

    state = run(x, y, weights, state, key, family, penalty, config, epochs)
    float(jnp.sum(state.w))
    # best-of-3 with distinct keys; each timing ends in a scalar host
    # readback — block_until_ready returns early on the relay (see above)
    dt = float("inf")
    for r in range(1, 4):
        t0 = time.perf_counter()
        out = run(x, y, weights, state, jax.random.fold_in(key, r), family, penalty, config, epochs)
        float(jnp.sum(out.w))
        dt = min(dt, time.perf_counter() - t0)
    flops = 4 * n * p * k * epochs  # fwd + bwd matmuls, 2 flops/MAC
    log(
        f"{label} bench: n={n} p={p} k={k} B={batch_size} prec={matmul_precision}: "
        f"{epochs} epochs in {dt:.3f}s -> {n * epochs / dt:.3e} samples/s, "
        f"{flops / dt / 1e12:.2f} TFLOP/s"
    )
    return n * epochs / dt


def main():
    import jax

    threading.Thread(target=_watchdog, daemon=True).start()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}, "
        f"budget {TOTAL_BUDGET_S:.0f}s")

    import jax.numpy as jnp

    data = make_sparse_binomial()

    # sparse configs in priority order: the winning config FIRST, so the
    # official JSON line lands even if everything after it times out.
    # Winners of the measured D x dtype x refresh cross
    # (tools/bench_layout_sweep.py); each config builds its device layout
    # inside the call and frees it on return — layouts must NOT be cached
    # across configs (two resident heads OOM the 16 GB chip).
    # Reduced-precision head configs are included only because their
    # convergence was validated on-chip against f32 (tools/validate_bf16.py;
    # RESULTS.md).  `epochs` is set to the refresh period so the g_sum
    # refresh cost is sampled at its true amortized rate.
    sparse_configs = [
        # (min remaining seconds to attempt, kwargs)
        (0, dict(batch_size=8192, hybrid=True, max_head=32768, coverage=0.995,
                 sampling="block", g_sum_refresh_every=8, head_dtype="int8", epochs=8)),
        (200, dict(batch_size=8192, hybrid=True, max_head=24576, coverage=0.99,
                   sampling="block", g_sum_refresh_every=8, head_dtype="int8", epochs=8)),
        (240, dict(batch_size=8192, hybrid=True, max_head=16384, coverage=0.98,
                   sampling="block", g_sum_refresh_every=4, head_dtype="bfloat16",
                   use_pallas=True, epochs=8)),
    ]
    for min_remaining, kwargs in sparse_configs:
        if remaining() < min_remaining:
            log(f"skipping config {kwargs} ({remaining():.0f}s left < {min_remaining}s)")
            continue
        try:
            kw = dict(kwargs)
            hd = kw.pop("head_dtype", None)
            v = bench_sparse_epoch(
                **kw, head_dtype=None if hd is None else getattr(jnp, hd), data=data
            )
            emit(v)
        except Exception as e:  # noqa: BLE001
            log(f"config {kwargs} failed: {e}")

    # secondary diagnostics, budget-gated (they never touch the JSON line)
    for min_remaining, fn in [
        (90, lambda: bench_dense_multinomial(
            n=131072, p=8192, k=64, batch_size=8192, epochs=3,
            matmul_precision="default", label="dense multinomial MXU")),
        (90, lambda: bench_dense_multinomial(
            n=131072, p=8192, k=64, batch_size=8192, epochs=3,
            matmul_precision="highest", label="dense multinomial MXU(f32)")),
        (45, bench_dense_multinomial),
        (30, lambda: cpu_baseline_sanity(data[0], data[1])),
    ]:
        if remaining() < min_remaining:
            log(f"skipping secondary stage ({remaining():.0f}s left < {min_remaining}s)")
            continue
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            log(f"secondary stage failed: {e}")

    if not _best["emitted"]:
        log("no sparse config completed; emitting value 0 so the failure is recorded")
        emit(0.0)
    log(f"done in {elapsed():.1f}s; official value {_best['value']:.3e} nnz/s")


if __name__ == "__main__":
    main()
