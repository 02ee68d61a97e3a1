"""Phased-vs-onephase walk sweep on the bench problem (TPU; run ALONE on the box).

Builds the bench.py simulated problem once, then times run_walks_prepared at
several batch widths W (by tiling the plan's MC section) with mc_phase_steps in
{0, s1}. This quantifies the two-phase scan's recovery of post-termination slot
waste on a REALISTIC graph (the synthetic probe_walks graph almost never
resolves, so phasing cannot help there by construction).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/phased_sweep.py
Env: SWEEP_WALKS (comma list of mc_walks_per_end, default "4096,16384,65536"),
     SWEEP_PHASES (default "0,8"), SWEEP_REPEATS (default 8).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    log(f"backend: {jax.default_backend()}")
    import jax.numpy as jnp

    from bench import build_problem
    from telomeri_tpu.walk.engine import (
        graph_to_device, prepare_plan_sections, run_walks_prepared)

    repeats = int(os.environ.get("SWEEP_REPEATS", "8"))
    walks_list = [int(x) for x in
                  os.environ.get("SWEEP_WALKS", "4096,16384,65536").split(",")]
    phases = [int(x) for x in os.environ.get("SWEEP_PHASES", "0,8").split(",")]

    for mc in walks_list:
        cfg, edges, graph, plan = build_problem(mc)
        gd = graph_to_device(graph)
        sections = prepare_plan_sections(plan)
        for phase in phases:
            run = lambda seed: run_walks_prepared(
                gd, sections, seed, n_anchors=graph.n_anchors,
                max_steps=cfg.max_steps, mc_phase_steps=phase)
            r = run(0)
            n_succ = int(np.asarray(r.success).sum())  # warmup + materialize
            t0 = time.perf_counter()
            for i in range(repeats):
                r = run(1 + i)
                # phased already syncs internally; bound the tail with a scalar
                _ = int(np.asarray(jnp.sum(r.steps)))
            dt = (time.perf_counter() - t0) / repeats
            log(f"W={plan.n_active:7d} phase={phase:2d}: {dt*1e3:8.2f} ms/call "
                f"{plan.n_active/dt/1e6:6.2f} M walks/s  ({n_succ} successful)")


if __name__ == "__main__":
    main()
