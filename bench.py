"""Benchmark harness: Monte-Carlo walks/s/chip (primary) + overlaps scored/s.

Prints JSON lines: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
the speedup of the TPU walk engine over the single-core scalar oracle (BASELINE.md
target: >= 100x; the C++ reference was unreadable, SURVEY.md §0, so the oracle is the
measured stand-in — walk/oracle.py performs the same per-step work).

DRIVER-PROOF STRUCTURE (round 3; BENCH_r02 was rc=124 with no metric recorded):
the axon tunnel's compile+first-run cost is VOLATILE (3 s..205 s measured for the
identical program; one observed backend-init hang >560 s), so this file is an
ORCHESTRATOR that never touches the device itself:

  1. build the problem host-only + measure the single-core oracle FIRST;
  2. run the small 49k-walk measurement in a CHILD process under a hard timeout
     (exact-PID kill, chip released on kill) and print the official JSON line
     the moment it lands;
  3. only if wall-clock budget remains (BENCH_BUDGET_S, default 420 s), re-measure
     at the tuned peak batch (1.57M walks) in a second child and print an updated
     line — the driver reads the tail, last line wins;
  4. always exit 0.

A line from step 2 therefore exists even on a bad-tunnel day; the peak number is
only ever *recorded*, never *claimed without recording* (VERDICT r2 items 1+8).

Timed region (SURVEY.md §4.3): run_walks on device-resident graph+plan, after one
warmup compile; amortized burst. Host ingest excluded. Secondary metrics on stderr.

Env knobs: BENCH_SCALE, BENCH_REPEATS, BENCH_MC_WALKS (small-batch MC/end, default
4096 -> ~49.6k walks), BENCH_PEAK_MC_WALKS (peak MC/end, default 131072 -> 1.57M
walks; 0 disables the peak stage), BENCH_BUDGET_S.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))

# PINNED baseline denominator (VERDICT r4 weak 1 / next-4): the official
# vs_baseline ratio previously divided by the SAME-DAY host oracle, whose
# burst-throttled rate swung +-40% round to round (2,195..2,997 walks/s at
# flat ~3.12M device walks/s -> official ratios 1042x..1426x, a coin flip).
# The ratio is now steps/s vs steps/s against a pinned constant: the BEST
# single-core oracle-steps/s ever measured on this host (45,006, 2026-08-21,
# BENCH_r04 stderr tail) — conservative by construction, since a throttled
# host can only be SLOWER than its best, so host throttling can never
# inflate the official ratio. The volatile same-day oracle is still measured
# and reported as vs_baseline_today / oracle_today_walks_per_s.
ORACLE_PINNED_STEPS_PER_S = 45_006.0


def budget_left() -> float:
    return BUDGET_S - (time.monotonic() - T_START)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(walks_per_s: float, steps_per_s: float, oracle_per_s: float,
         n_walks: int):
    """The official driver-parsed line (stdout, flushed immediately).

    value: device-absolute walks/s (the headline — reproduces to ~0.2%
    across healthy-tunnel runs). vs_baseline: device steps/s over the PINNED
    oracle steps/s (stable denominator; see ORACLE_PINNED_STEPS_PER_S).
    vs_baseline_today: the old volatile ratio against the oracle as measured
    this run, kept for continuity and labeled for what it is."""
    print(json.dumps({
        "metric": "mc_walks_per_s_per_chip",
        "value": round(walks_per_s, 1),
        "unit": "walks/s",
        "vs_baseline": round(steps_per_s / ORACLE_PINNED_STEPS_PER_S, 2),
        "vs_baseline_today": round(walks_per_s / oracle_per_s, 2),
        "oracle_today_walks_per_s": round(oracle_per_s, 1),
        "device_steps_per_s": round(steps_per_s, 1),
        "batch_walks": n_walks,
    }), flush=True)


def build_problem(mc_walks_per_end: int, device_scoring: str = "auto"):
    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.pipeline import build_graph, load_inputs
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset
    from telomeri_tpu.walk.plan import plan_walks

    cfg = ScaffoldConfig(mc_walks_per_end=mc_walks_per_end, max_steps=32,
                         device_scoring=device_scoring)
    t0 = time.perf_counter()
    sim = simulate(SimConfig(
        genome_len=400_000, repeat_len=5_000, n_repeat_copies=6,
        read_len_mean=3_000, read_len_sd=500, coverage=20.0,
        error_rate=0.02, seed=12))
    with tempfile.TemporaryDirectory() as d:
        write_dataset(sim, d)
        contigs, reads, paf = load_inputs(
            os.path.join(d, "contigs.fa"), os.path.join(d, "reads.fa"),
            os.path.join(d, "read2contig.paf"), os.path.join(d, "read2read.paf"))
    edges, graph = build_graph(contigs, reads, paf, cfg)
    plan = plan_walks(graph, cfg)
    log(f"problem built in {time.perf_counter()-t0:.1f}s: {graph.stats}, "
        f"{plan.n_active} walks")
    return cfg, edges, graph, plan


def bench_walks(cfg, graph, plan, repeats: int):
    import jax

    from telomeri_tpu.walk.engine import (
        graph_to_device, prepare_plan_sections, run_walks_prepared)

    gd = graph_to_device(graph)
    sections = prepare_plan_sections(plan)   # plan upload once, not per call
    run = lambda seed: run_walks_prepared(
        gd, sections, seed, n_anchors=graph.n_anchors, max_steps=cfg.max_steps)
    t0 = time.perf_counter()
    res = run(cfg.mc_seed)
    n_succ = int(np.asarray(res.success).sum())   # forces full materialization
    log(f"walk compile+first run: {time.perf_counter()-t0:.1f}s; "
        f"{n_succ}/{plan.n_active} successful")

    # NOTE: block_until_ready does not reliably block under the axon tunnel; time a
    # burst of launches bounded by tiny scalar fetches instead (amortized device
    # time). Keep <= 2 results alive: at the 1.57M-walk peak batch each record
    # set is ~0.4 GB of HBM, so a deep async queue would exhaust the chip.
    import jax.numpy as jnp

    burst = max(repeats, 20)
    t0 = time.perf_counter()
    first = run(cfg.mc_seed + 1)
    last = None
    for i in range(1, burst):
        last = run(cfg.mc_seed + 1 + i)
    _ = int(np.asarray(jnp.sum(last.steps))) + int(np.asarray(jnp.sum(first.steps)))
    dt = (time.perf_counter() - t0) / burst
    total_steps = int(np.asarray(jnp.sum(last.steps)))
    walks_per_s = plan.n_active / dt
    steps_per_s = total_steps / dt
    log(f"walk amortized over {burst}: {dt*1e3:.2f} ms/call "
        f"-> {walks_per_s:,.0f} walks/s, {steps_per_s:,.0f} walk-steps/s")
    return walks_per_s, steps_per_s


def bench_oracle(cfg, graph, plan, budget_s: float = 18.0, max_walks: int = 600):
    """Single-core scalar baseline on the SAME graph and walk plan.

    Methodology (pinned, BASELINE.md): MONTE-CARLO rows only — the TPU metric is
    dominated by the MC section (~97% of a production plan) and greedy oracle
    walks do different per-step work, so mixing modes made vs_baseline depend on
    the sampling pattern. Evenly-spaced MC rows, median over 3 passes (the 2-core
    host's scheduling noise otherwise swings the rate ~1.5x), >= 6 s per pass."""
    from telomeri_tpu.walk.oracle import fast_choice_fn, walk_oracle
    from telomeri_tpu.walk.plan import MODE_MC

    idx = np.flatnonzero(plan.active & (plan.mode == MODE_MC))
    sel = idx[np.linspace(0, len(idx) - 1, min(max_walks, len(idx))).astype(int)]
    rates, step_rates = [], []
    for _ in range(3):
        choice = fast_choice_fn(cfg.mc_seed)  # fresh RNG: identical workload per pass
        t0 = time.perf_counter()
        n = n_steps = 0
        for i in sel:
            ow = walk_oracle(graph, int(plan.start[i]), int(plan.first_edge[i]),
                             int(plan.mode[i]), int(plan.uid[i]), cfg.max_steps,
                             choice)
            n += 1
            n_steps += ow.steps
            if time.perf_counter() - t0 > budget_s / 3:
                break
        dt = time.perf_counter() - t0
        rates.append(n / dt)
        step_rates.append(n_steps / dt)
    walks_per_s = float(np.median(rates))
    log(f"oracle baseline: median {walks_per_s:,.1f} MC walks/s over 3 passes "
        f"(single core; passes {[f'{r:,.0f}' for r in rates]})")
    # cross-round invariant (VERDICT r3 weak #5): steps/s on this PINNED row mix
    # is a per-step rate, independent of how many walks each pass finished, so
    # round-to-round oracle swings are attributable to the burst-throttled host,
    # not the workload. Compare THIS line across BENCH_r*.json stderr tails.
    log(f"oracle invariant: median {float(np.median(step_rates)):,.0f} "
        f"oracle-steps/s (pinned row mix, {len(sel)} rows, max_steps="
        f"{cfg.max_steps})")
    return walks_per_s


def bench_scoring(edges, repeats: int):
    """Production rescore path (2-output Pallas kernel) at 64M rows.

    Methodology (pinned round 2; tools/perf_probe.py): the per-call dispatch
    overhead through the axon tunnel is 3-9 ms and VARIABLE, so small batches
    measure the tunnel, not the kernel. At 64M rows the kernel's device time
    (~6 ms at its measured ~650-725 GB/s marginal bandwidth = 80-88% of v5e
    HBM peak) dominates. Geometry is stored TILED (rows, 128) on device — a
    one-time ingest transform like device_put, outside the timed region."""
    import jax
    import jax.numpy as jnp

    from telomeri_tpu.kernels.scoring import (
        score_overlaps_jnp,
        score_overlaps_pallas_tiled,
        scoring_tile_shape,
    )

    backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    reps = max(1, 64_000_000 // max(len(edges.nm), 1))
    host = [np.tile(np.asarray(a, np.int32), reps) for a in edges.geom_args()]
    n = host[0].shape[0]
    rows_pad, cols = scoring_tile_shape(n)
    args = tuple(jax.device_put(
        np.pad(a, (0, rows_pad * cols - n)).reshape(rows_pad, cols)) for a in host)
    del host
    run = (lambda: score_overlaps_pallas_tiled(*args, block_m=1024, outputs=2)) \
        if backend == "pallas" else (lambda: score_overlaps_jnp(*args))

    fetch = lambda o: float(np.asarray(jnp.sum(o[1][0])))   # 4-byte scalar fetch
    _ = fetch(run())
    burst = max(repeats, 10)
    t0 = time.perf_counter()
    first = run()
    last = None
    for _i in range(burst - 1):
        last = run()   # keep <= 2 outputs alive: a deep async queue of
        #                multi-hundred-MB results would exhaust HBM
    _ = fetch(last) + fetch(first)
    dt = (time.perf_counter() - t0) / burst
    ops = n / dt
    log(f"scoring ({backend}, tiled, 2-out): {n:,} overlaps in {dt*1e3:.3f} ms "
        f"-> {ops/1e9:.2f} G overlaps/s ({ops*40/1e9:.0f} GB/s incl dispatch)")
    return ops


def bench_scaling(cfg, graph, plan_builder, repeats: int):
    """Optional multi-device scaling sweep (BENCH_SCALING=1): only meaningful when
    more than one real device exists (this container has one chip; the virtual CPU
    mesh oversubscribes 2 cores and measures nothing — BASELINE.md)."""
    import jax

    from telomeri_tpu.dist.mesh import make_walk_mesh, run_walks_distributed
    from telomeri_tpu.walk.plan import plan_walks

    n_dev = len(jax.devices())
    if n_dev < 2:
        log(f"scaling: only {n_dev} device, skipping")
        return
    import jax.numpy as jnp

    for n in [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]:
        mesh = make_walk_mesh(n)
        plan = plan_walks(graph, cfg, n_shards=n)
        res, _ = run_walks_distributed(graph, plan, cfg, mesh)
        _ = int(np.asarray(jnp.sum(res.steps)))
        t0 = time.perf_counter()
        rs = [run_walks_distributed(graph, plan, cfg, mesh)[0] for _ in range(repeats)]
        _ = int(np.asarray(jnp.sum(rs[-1].steps)))
        dt = (time.perf_counter() - t0) / repeats
        log(f"scaling {n} devices: {plan.n_active/dt:,.0f} walks/s")


def bench_hg002_graph():
    """BENCH_SCALE=hg002-graph: whole-human-scale HBM fit + walk throughput.

    Synthesizes a graph at the ARCHITECTURE.md HG002 budget (N=6.3M oriented
    nodes, K=64 -> ~10.5 GiB of device tables), device_puts it, and times a 49k
    MC walk batch. Validates that the replicated-graph design holds at config #5
    scale on one chip (measured 2026-08-18: fits; 1.81M walks/s/chip with fully
    random access — no anchor locality, a worst case vs real graphs)."""
    import jax
    import jax.numpy as jnp

    from telomeri_tpu.graph.tensorize import GraphTensors
    from telomeri_tpu.walk.engine import (
        _run_walks_kind,
        graph_to_device,
        plan_to_device,
    )
    from telomeri_tpu.walk.plan import MODE_MC, WalkPlan

    n, k = int(os.environ.get("BENCH_HG002_N", 6_291_456)), 64
    n_anchors = 2000
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    deg = rng.integers(4, k + 1, n).astype(np.int32)
    mask = np.arange(k, dtype=np.int32)[None, :] < deg[:, None]
    g = GraphTensors(
        nbr=np.where(mask, rng.integers(2 * n_anchors, n, (n, k)).astype(np.int32), -1),
        es=(es := np.where(mask, rng.uniform(100, 5000, (n, k)), 0).astype(np.float32)),
        os_=es.copy(),
        adv=np.where(mask, rng.integers(100, 3000, (n, k)).astype(np.int32), 0),
        eid=np.where(mask, np.arange(n * k, dtype=np.int32).reshape(n, k), -1),
        deg=deg, seq_len=np.full(n // 2, 20000, np.int32), n_anchors=n_anchors)
    log(f"hg002 graph built on host in {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    gd = graph_to_device(g)
    jax.block_until_ready(gd)
    gib = sum(a.size * a.dtype.itemsize for a in gd) / 2**30
    log(f"device_put {gib:.1f} GiB in {time.perf_counter()-t0:.0f}s")
    w, s = 49152, 32
    pd = plan_to_device(WalkPlan(
        start=rng.integers(0, 2 * n_anchors, w).astype(np.int32),
        first_edge=np.full(w, -1, np.int32), mode=np.full(w, MODE_MC, np.int32),
        uid=np.arange(w, dtype=np.int32), active=np.ones(w, bool)))
    # kind="mc": the sectioned fast path production plans actually take
    run = lambda seed: _run_walks_kind(
        gd, pd, seed, n_anchors=n_anchors, max_steps=s, kind="mc")
    _ = int(np.asarray(jnp.sum(run(0).steps)))
    t0 = time.perf_counter()
    rs = [run(1 + i) for i in range(10)]
    _ = int(np.asarray(jnp.sum(rs[-1].steps)))
    dt = (time.perf_counter() - t0) / 10
    log(f"hg002-scale walks: {dt*1e3:.1f} ms/call -> {w/dt:,.0f} walks/s/chip")
    print(json.dumps({
        "metric": "hg002_scale_walks_per_s_per_chip", "value": round(w / dt, 1),
        "unit": "walks/s", "vs_baseline": round(gib, 2)}))


# ---------------------------------------------------------------------------
# Orchestrator (parent, device-free) + child stage
# ---------------------------------------------------------------------------

CHILD_MARK = "BENCH_CHILD_RESULT "


def _child_walks():
    """Child stage (BENCH_STAGE=walks): owns the device. Builds the problem,
    measures walks/s at BENCH_MC_WALKS, prints one marked JSON line on stdout.
    Optionally runs the secondary scoring bench (BENCH_DO_SCORING=1, stderr)."""
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    mc = int(os.environ["BENCH_MC_WALKS"])
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    cfg, edges, graph, plan = build_problem(mc)
    walks_per_s, steps_per_s = bench_walks(cfg, graph, plan, repeats)
    if os.environ.get("BENCH_SCALING"):
        bench_scaling(cfg, graph, None, repeats)
    print(CHILD_MARK + json.dumps(
        {"walks_per_s": walks_per_s, "steps_per_s": steps_per_s,
         "n_walks": plan.n_active}), flush=True)
    if os.environ.get("BENCH_DO_SCORING"):
        try:
            bench_scoring(edges, repeats)
        except Exception as e:   # secondary metric; never fail the stage
            log(f"scoring bench failed: {e}")


def _run_child(mc_walks: int, timeout_s: float, do_scoring: bool = False):
    """Run the walks stage in a child under a hard timeout. The child is killed
    by exact PID on overrun (subprocess.run terminates its own child only),
    releasing the chip. Returns the parsed result dict or None."""
    env = dict(os.environ, BENCH_STAGE="walks", BENCH_MC_WALKS=str(mc_walks))
    if do_scoring:
        env["BENCH_DO_SCORING"] = "1"
    log(f"[bench] child: {mc_walks} MC/end, timeout {timeout_s:.0f}s "
        f"(budget left {budget_left():.0f}s)")
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=None,   # stderr inherits -> driver tail
            timeout=max(timeout_s, 10), text=True)
    except subprocess.TimeoutExpired:
        log(f"[bench] child TIMED OUT after {timeout_s:.0f}s (killed; chip released)")
        return None
    for line in reversed(p.stdout.splitlines()):
        if line.startswith(CHILD_MARK):
            return json.loads(line[len(CHILD_MARK):])
    log(f"[bench] child exited rc={p.returncode} without a result line")
    return None


def main():
    if os.environ.get("BENCH_STAGE") == "walks":
        _child_walks()
        return
    if os.environ.get("BENCH_SCALE") == "hg002-graph":
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
        bench_hg002_graph()
        return

    # --- Orchestrator: device-free; children own the chip. ---
    # 4096 MC/end -> ~49.6k walks: the production operating point (hg002-sub runs
    # 95k-walk plans) and the batch whose compile+burst reliably fits the driver
    # window. The 1.57M peak batch (BASELINE.md batch-width table: 2.97M walks/s)
    # runs second, only on remaining budget.
    mc_small = int(os.environ.get("BENCH_MC_WALKS", "4096"))
    mc_peak = int(os.environ.get("BENCH_PEAK_MC_WALKS", "131072"))

    # Oracle first (host-only, no backend init: device_scoring="off" skips the
    # jax.default_backend() probe in build_graph — scores are bit-identical numpy).
    cfg, _edges, graph, plan = build_problem(mc_small, device_scoring="off")
    oracle_per_s = bench_oracle(cfg, graph, plan)

    # Small batch: the guaranteed line. The first child gets nearly the whole
    # budget — the compile+first-run cost through the tunnel is volatile
    # (3s..330s measured for the identical CACHED program; remote-side, not
    # local-cache-fixable), so capping it below the budget only loses lines.
    res = _run_child(mc_small, timeout_s=budget_left() - 40)
    if res is None and budget_left() > 100:
        res = _run_child(mc_small, timeout_s=budget_left() - 30)
    if res is None:
        log("[bench] no device measurement obtained within budget; exiting rc=0 "
            "(oracle baseline was %.0f walks/s)" % oracle_per_s)
        return
    emit(res["walks_per_s"], res["steps_per_s"], oracle_per_s, res["n_walks"])

    # Peak batch: optional, budget-gated; last line wins in the driver tail.
    if mc_peak > mc_small and budget_left() > 150:
        res2 = _run_child(mc_peak, timeout_s=budget_left() - 30, do_scoring=True)
        if res2 is not None:
            emit(res2["walks_per_s"], res2["steps_per_s"], oracle_per_s,
                 res2["n_walks"])
    else:
        log(f"[bench] skipping peak batch (budget left {budget_left():.0f}s)")


if __name__ == "__main__":
    main()
