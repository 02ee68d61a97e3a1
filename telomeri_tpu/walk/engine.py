"""Vectorized walk engine: batched greedy + Monte-Carlo path walks (TPU hot loop).

Reference parity: the C++ reference's per-anchor sequential walk loop (PathManager,
SURVEY.md §3 rows 7-10; §4.1 "HOT LOOP"; mount empty, SURVEY.md §0). TPU-native design
(SURVEY.md §1 north star): thousands of walks advance in lockstep through a
`lax.scan` of cfg.max_steps fixed steps; each step is one dense (W, K) gather from the
padded CSR plus VPU masking/argmax/sampling. No data-dependent control flow.

Semantics (deterministic, documented — SURVEY.md §7 "bit-identical" hard part):
  - A walk starts at an oriented anchor node and repeatedly selects an out-edge.
  - Candidate mask: CSR slot non-pad AND destination not already on this walk's path
    (cycle kill, SURVEY.md §3 row 10; the start anchor is on the path, so walks cannot
    re-enter their own start).
  - mode 0 / 1 (greedy by OS / ES): pick the max-score candidate; ties resolve to the
    lowest CSR slot, and CSR rows are pre-sorted by (ES desc, dst asc), which fixes the
    tie-break globally.
  - mode 2 (Monte-Carlo): pick candidate j with probability ES_j / sum(ES), restricted
    to candidates with ES > 0; a walk with no positive-ES candidate dies. The draw uses
    the walk's OWN stream: fold_in(fold_in(key(seed), uid), step) — invariant to batch
    size, padding, sharding, and host count (SURVEY.md §5 item 3).
  - Step 0 honours plan.first_edge (deterministic first-edge enumeration); an invalid
    forced slot kills the walk.
  - A walk succeeds when it steps onto another anchor node (id < 2 * n_anchors); it
    dies on candidate exhaustion; it is truncated (failure) at max_steps.

Throughput note: the per-step cost is ~6 gathered (W, K) arrays -> HBM-bandwidth bound,
which is what the walks/s/chip metric measures (BASELINE.md).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.graph.tensorize import GraphTensors
from telomeri_tpu.walk.plan import MODE_MC, WalkPlan


class GraphDev(NamedTuple):
    """Device-resident CSR tables (see graph/tensorize.py for layout)."""

    nbr: jax.Array   # (N, K) int32
    es: jax.Array    # (N, K) f32
    os_: jax.Array   # (N, K) f32
    adv: jax.Array   # (N, K) int32
    eid: jax.Array   # (N, K) int32


class PlanDev(NamedTuple):
    start: jax.Array       # (W,) int32
    first_edge: jax.Array  # (W,) int32
    mode: jax.Array        # (W,) int32
    uid: jax.Array         # (W,) int32
    active: jax.Array      # (W,) bool


class WalkResult(NamedTuple):
    """Fixed-shape walk records (SURVEY.md §3 row 10)."""

    nodes: jax.Array      # (W, S+1) int32, -1 pad; [:, 0] is the start anchor
    eids: jax.Array       # (W, S) int32 edge ids taken, -1 pad
    steps: jax.Array      # (W,) int32 edges taken
    success: jax.Array    # (W,) bool reached another anchor
    terminal: jax.Array   # (W,) int32 terminal anchor node or -1
    path_len: jax.Array   # (W,) int32 sum of edge advances (bp)
    score_sum: jax.Array  # (W,) f32 sum of edge ES

    def to_numpy(self) -> "WalkResult":
        return WalkResult(*[np.asarray(a) for a in self])


def graph_to_device(g: GraphTensors, sharding=None) -> GraphDev:
    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
    return GraphDev(nbr=put(g.nbr), es=put(g.es), os_=put(g.os_), adv=put(g.adv),
                    eid=put(g.eid))


def plan_to_device(p: WalkPlan, sharding=None) -> PlanDev:
    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
    return PlanDev(start=put(p.start), first_edge=put(p.first_edge), mode=put(p.mode),
                   uid=put(p.uid), active=put(p.active))


@functools.partial(jax.jit, static_argnames=("n_anchors", "max_steps"))
def run_walks(
    g: GraphDev, p: PlanDev, seed, *, n_anchors: int, max_steps: int
) -> WalkResult:
    """Run every planned walk for max_steps lockstep steps. Pure function of its inputs."""
    w = p.start.shape[0]
    anchor_lim = jnp.int32(2 * n_anchors)
    base = jax.random.key(seed)
    walk_keys = jax.vmap(lambda u: jax.random.fold_in(base, u))(p.uid)

    visited0 = jnp.full((w, max_steps + 1), -1, jnp.int32).at[:, 0].set(p.start)
    carry0 = dict(
        cur=p.start,
        done=~p.active,
        success=jnp.zeros(w, bool),
        terminal=jnp.full(w, -1, jnp.int32),
        plen=jnp.zeros(w, jnp.int32),
        score=jnp.zeros(w, jnp.float32),
        nsteps=jnp.zeros(w, jnp.int32),
        visited=visited0,
    )

    def step(carry, s):
        cur = carry["cur"]
        nbr = g.nbr[cur]          # (W, K)
        es = g.es[cur]
        osb = g.os_[cur]
        adv = g.adv[cur]
        eid = g.eid[cur]

        valid = nbr >= 0
        # cycle kill: destination may not already be on the path
        revisit = (nbr[:, :, None] == carry["visited"][:, None, :]).any(-1)
        valid &= ~revisit

        # greedy choice: argmax of the mode's score; CSR pre-sort fixes tie-breaks
        gscore = jnp.where(p.mode[:, None] == 0, osb, es)
        masked = jnp.where(valid, gscore, -jnp.inf)
        greedy_choice = jnp.argmax(masked, axis=1).astype(jnp.int32)
        greedy_dead = ~jnp.isfinite(jnp.max(masked, axis=1))

        # Monte-Carlo choice: prob ∝ ES over candidates with ES > 0, sampled as
        # categorical(log ES) (Gumbel argmax — exactly proportional, no cumsum
        # boundary cases). The oracle calls the identical function per walk.
        eligible = valid & (es > 0)
        logits = jnp.where(eligible, jnp.log(jnp.where(eligible, es, 1.0)), -jnp.inf)
        step_keys = jax.vmap(lambda k: jax.random.fold_in(k, s))(walk_keys)
        mc_choice = jax.vmap(jax.random.categorical)(step_keys, logits).astype(jnp.int32)
        mc_dead = ~eligible.any(axis=1)

        is_mc = p.mode == MODE_MC
        choice = jnp.where(is_mc, mc_choice, greedy_choice)
        dead = jnp.where(is_mc, mc_dead, greedy_dead)

        # deterministic first-edge enumeration
        forced = (s == 0) & (p.first_edge >= 0)
        choice = jnp.where(forced, p.first_edge, choice)
        chosen_valid = jnp.take_along_axis(valid, choice[:, None], 1)[:, 0]
        dead = jnp.where(forced, ~chosen_valid, dead)

        take = lambda a: jnp.take_along_axis(a, choice[:, None], 1)[:, 0]
        nxt = take(nbr)
        stepping = ~carry["done"] & ~dead
        hit_anchor = stepping & (nxt < anchor_lim)

        new = dict(
            cur=jnp.where(stepping, nxt, cur),
            done=carry["done"] | dead | hit_anchor,
            success=carry["success"] | hit_anchor,
            terminal=jnp.where(hit_anchor, nxt, carry["terminal"]),
            plen=carry["plen"] + jnp.where(stepping, take(adv), 0),
            score=carry["score"] + jnp.where(stepping, take(es), 0.0),
            nsteps=carry["nsteps"] + stepping.astype(jnp.int32),
            visited=carry["visited"].at[:, s + 1].set(jnp.where(stepping, nxt, -1)),
        )
        out = (jnp.where(stepping, nxt, -1), jnp.where(stepping, take(eid), -1))
        return new, out

    carry, (nodes_t, eids_t) = jax.lax.scan(
        step, carry0, jnp.arange(max_steps, dtype=jnp.int32)
    )
    return WalkResult(
        nodes=carry["visited"],
        eids=jnp.transpose(eids_t),
        steps=carry["nsteps"],
        success=carry["success"],
        terminal=carry["terminal"],
        path_len=carry["plen"],
        score_sum=carry["score"],
    )


def run_walks_host(
    g: GraphTensors, plan: WalkPlan, cfg: ScaffoldConfig
) -> WalkResult:
    """Single-device convenience wrapper (numpy in, numpy out)."""
    res = run_walks(
        graph_to_device(g), plan_to_device(plan), cfg.mc_seed,
        n_anchors=g.n_anchors, max_steps=cfg.max_steps,
    )
    return res.to_numpy()
