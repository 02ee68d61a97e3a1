"""TPU probe: VMEM-resident Pallas walk scan vs the production HBM-gather
engine (VERDICT r3 next-#3; BASELINE.md walk roofline experiment).

Builds the bench graph (5.6k nodes — table ~8.6 MB, fits VMEM), then times
the production engine and each walk_vmem strategy at several batch widths.
A Mosaic lowering failure for a strategy is CAUGHT and reported (that is a
legitimate experimental outcome — Pallas has no documented vectorized
gather). Results go to BASELINE.md either way.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/vmem_probe.py
Env: VMEM_WALKS (comma list of MC walks/end, default "4096,131072"),
     VMEM_TILES (comma list, default "256,512,1024"), VMEM_REPS (default 10).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    from bench import build_problem
    from telomeri_tpu.kernels.walk_vmem import run_walks_mc_vmem, vmem_feasible
    from telomeri_tpu.walk.engine import (
        _run_walks_mc_fast,
        _slice_plan,
        graph_to_device,
        plan_to_device,
    )

    log(f"backend: {jax.default_backend()}")
    reps = int(os.environ.get("VMEM_REPS", "10"))
    tiles = [int(t) for t in os.environ.get("VMEM_TILES", "256,512,1024").split(",")]
    for mc in [int(x) for x in os.environ.get("VMEM_WALKS", "4096,131072").split(",")]:
        cfg, _e, graph, plan = build_problem(mc, device_scoring="off")
        gd = graph_to_device(graph)
        log(f"table: {gd.wide.size * 4 / 2**20:.1f} MiB, "
            f"vmem_feasible={vmem_feasible(gd)}")
        lo, hi = plan.sections["mc"]
        pd = plan_to_device(_slice_plan(plan, lo, hi))
        w = hi - lo

        def timed(fn, label):
            t0 = time.perf_counter()
            ref = fn(0)
            jax.block_until_ready(ref)
            log(f"  {label}: compile+first {time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            first = fn(1)
            last = None
            for i in range(1, reps):
                last = fn(1 + i)
            _ = int(np.asarray(jnp.sum((last if last is not None else first).steps)))
            _ = int(np.asarray(jnp.sum(first.steps)))
            dt = (time.perf_counter() - t0) / reps
            log(f"  {label}: {dt*1e3:.2f} ms/call -> {w/dt:,.0f} walks/s")
            return ref, dt

        ref, dt0 = timed(
            lambda s: _run_walks_mc_fast(gd, pd, s, n_anchors=graph.n_anchors,
                                         max_steps=cfg.max_steps),
            f"engine W={w}")
        ref = ref.to_numpy()

        for strategy in ("dyng", "take", "loop"):
            for tile in (tiles[:1] if strategy == "dyng" else tiles):
                label = f"vmem[{strategy},tile={tile}] W={w}"
                try:
                    got, dt = timed(
                        lambda s, t=tile, st=strategy: run_walks_mc_vmem(
                            gd, pd, s, n_anchors=graph.n_anchors,
                            max_steps=cfg.max_steps, tile=t, strategy=st),
                        label)
                except Exception as e:
                    log(f"  {label}: FAILED TO LOWER/RUN: {type(e).__name__}: "
                        f"{str(e)[:300]}")
                    break   # same strategy will fail at other tiles too
                got = got.to_numpy()
                ok = all(np.array_equal(np.asarray(a), np.asarray(b))
                         for a, b in zip(ref, got))
                log(f"  {label}: parity={'OK' if ok else 'MISMATCH'}, "
                    f"speedup vs engine {dt0/dt:.2f}x")


if __name__ == "__main__":
    main()
