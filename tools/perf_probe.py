"""TPU perf probes: scoring-kernel roofline sweep + walk-batch scaling sweep.

Round-2 verdict items 4-5: find the scoring kernel's real limiter
(dispatch-latency vs HBM bandwidth) and the walk engine's batch-size plateau.
Run ONE probe per invocation on the single tunneled chip:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe.py scoring
  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe.py walks

Timing methodology (BASELINE.md): block_until_ready is unreliable over the
axon tunnel, so each measurement launches a burst of B calls and bounds it
with 4-byte scalar fetches; reported time is burst/B (amortized device time).
Results land in BASELINE.md by hand.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    return jax


def probe_scoring():
    """Sweep rows x block_m x output-count for the Pallas scoring kernel.

    Speed-of-light: 8 int32 in + {4,2} f32 out = {64,56} B/row; v5e HBM
    ~819 GB/s -> {12.8, 14.6} G rows/s. If ms/call scales linearly with rows,
    the kernel is bandwidth-bound at its measured GB/s; if it flattens at small
    rows, dispatch latency dominates there."""
    jax = _setup()
    import functools

    import jax.numpy as jnp

    from telomeri_tpu.kernels.scoring import score_overlaps_pallas_tiled

    rng = np.random.default_rng(0)

    _ = functools  # (scan-in-one-dispatch variant removed: scan's per-step xs
    #   dynamic-slice copies every operand, polluting the bandwidth measurement;
    #   the size-slope method below isolates device throughput instead)

    # --- single-call (dispatch-inclusive) at increasing sizes, best block ---
    # (the slope between sizes is the kernel's marginal rate with dispatch
    # subtracted — the honest device throughput)
    for rows_m in (8, 32, 64):
        n_rows = rows_m * 1024 * 1024 // 128
        n = n_rows * 128
        args = tuple(
            jax.device_put(rng.integers(1, 10_000, (n_rows, 128), np.int32))
            for _ in range(8))
        for outputs in (4, 2):
            run = lambda: score_overlaps_pallas_tiled(
                *args, block_m=1024, outputs=outputs)
            fetch = lambda o: float(np.asarray(jnp.sum(o[1][0])))
            _ = fetch(run())
            # keep only two live outputs: a deep async queue of multi-hundred-MB
            # results otherwise exhausts HBM at the 64M size
            burst = 8
            t0 = time.perf_counter()
            first = run()
            last = None
            for _i in range(burst - 1):
                last = run()
            _ = fetch(last) + fetch(first)
            dt = (time.perf_counter() - t0) / burst
            del first, last
            bytes_row = 32 + 4 * outputs
            log(f"[e2e]    rows={n/1e6:5.1f}M out={outputs} block_m= 1024: "
                f"{dt*1e3:7.3f} ms/call    {n/dt/1e9:5.2f} G rows/s  "
                f"{n*bytes_row/dt/1e9:6.1f} GB/s")
        del args


def probe_walks():
    """Walk-batch width sweep on a fixed synthetic graph (random access, the
    worst-case locality): walks/s vs W, to find the batch-size plateau."""
    jax = _setup()
    import jax.numpy as jnp

    from telomeri_tpu.graph.tensorize import GraphTensors
    from telomeri_tpu.walk.engine import (
        _run_walks_kind,
        graph_to_device,
        plan_to_device,
    )
    from telomeri_tpu.walk.plan import MODE_MC, WalkPlan

    n, k, s = 1_048_576, 64, 32
    n_anchors = 2000
    rng = np.random.default_rng(0)
    deg = rng.integers(4, k + 1, n).astype(np.int32)
    mask = np.arange(k, dtype=np.int32)[None, :] < deg[:, None]
    g = GraphTensors(
        nbr=np.where(mask, rng.integers(2 * n_anchors, n, (n, k)).astype(np.int32), -1),
        es=(es := np.where(mask, rng.uniform(100, 5000, (n, k)), 0).astype(np.float32)),
        os_=es.copy(),
        adv=np.where(mask, rng.integers(100, 3000, (n, k)).astype(np.int32), 0),
        eid=np.where(mask, np.arange(n * k, dtype=np.int64).reshape(n, k) % (2**31 - 1),
                     -1).astype(np.int32),
        deg=deg, seq_len=np.full(n // 2, 20000, np.int32), n_anchors=n_anchors)
    gd = graph_to_device(g)
    jax.block_until_ready(gd.wide)
    log(f"graph on device: N={n}, K={k}")

    for w in (49_152, 98_304, 196_608, 393_216, 786_432):
        pd = plan_to_device(WalkPlan(
            start=rng.integers(0, 2 * n_anchors, w).astype(np.int32),
            first_edge=np.full(w, -1, np.int32), mode=np.full(w, MODE_MC, np.int32),
            uid=np.arange(w, dtype=np.int32), active=np.ones(w, bool)))
        run = lambda seed: _run_walks_kind(
            gd, pd, seed, n_anchors=n_anchors, max_steps=s, kind="mc")
        _ = int(np.asarray(jnp.sum(run(0).steps)))
        burst = 10
        t0 = time.perf_counter()
        rs = [run(1 + i) for i in range(burst)]
        total_steps = int(np.asarray(jnp.sum(rs[-1].steps)))
        dt = (time.perf_counter() - t0) / burst
        log(f"W={w:7d}: {dt*1e3:8.2f} ms/call  {w/dt/1e6:6.2f} M walks/s  "
            f"{total_steps/dt/1e6:7.1f} M walk-steps/s")


def probe_walkrows():
    """Isolate the walk scan's row-gather cost vs ROW WIDTH.

    A serial scan of S steps, each gathering (W, width) int32 rows from a
    (N, width) table with a data-dependent next-row index (same dependence
    structure as the walk engine). If ms/step scales with width, narrowing the
    engine's wide row (6H -> 4H by deriving eid on the host) buys bandwidth;
    if it is flat, the gather is row-count/latency bound and width is free."""
    jax = _setup()
    import functools

    import jax.numpy as jnp

    n, w, s = 1_048_576, 98_304, 32
    rng = np.random.default_rng(0)
    for width in (128, 256, 384, 512):
        tab = jax.device_put(
            rng.integers(0, n, (n, width)).astype(np.int32))

        @functools.partial(jax.jit, static_argnames=("steps",))
        def scan_gather(tab, start, *, steps):
            def body(cur, _):
                rows = tab[cur]                     # (W, width) row gather
                nxt = rows[:, 0] % n                # data-dependent next row
                return nxt, rows[:, 1]
            last, outs = jax.lax.scan(body, start, None, length=steps, unroll=4)
            return last, outs.sum()

        start = jax.device_put(rng.integers(0, n, w).astype(np.int32))
        fetch = lambda: int(np.asarray(scan_gather(tab, start, steps=s)[1]))
        _ = fetch()
        burst = 10
        t0 = time.perf_counter()
        for _i in range(burst):
            _ = fetch()
        dt = (time.perf_counter() - t0) / burst
        rows_s = w * s / dt
        log(f"width={width:4d} ({width*4:5d} B/row): {dt*1e3:8.2f} ms/scan  "
            f"{dt/s*1e3:6.3f} ms/step  {rows_s/1e6:6.1f} M rows/s  "
            f"{rows_s*width*4/1e9:6.1f} GB/s")
        del tab


if __name__ == "__main__":
    {"scoring": probe_scoring, "walks": probe_walks,
     "walkrows": probe_walkrows}[sys.argv[1]]()
