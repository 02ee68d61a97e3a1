"""Vectorized walk engine: batched greedy + Monte-Carlo path walks (TPU hot loop).

Reference parity: the C++ reference's per-anchor sequential walk loop (PathManager,
SURVEY.md §3 rows 7-10; §4.1 "HOT LOOP"; mount empty, SURVEY.md §0). TPU-native design
(SURVEY.md §1 north star): thousands of walks advance in lockstep through a
`lax.scan` of cfg.max_steps fixed steps; each step is a dense (W, K) gather from the
padded CSR plus VPU masking/argmax/sampling. No data-dependent control flow.

Performance structure (profiled on TPU v5e — see BASELINE.md):
  - The scan body touches ONLY the tables its decisions need: the packed
    [nbr | cum] rows always (greedy reads just the nbr half of the one fetch —
    the spare cum bytes are cheaper than a second table for the 2%-of-batch
    greedy sections), plus OS rows for greedy-OS walks. Greedy-ES needs NO score
    gather at all: CSR rows are pre-sorted by (ES desc, dst asc), so greedy-ES
    = first valid slot.
  - ALL RNG is hoisted out of the scan: the (S, W) table of per-step uniform bits is
    generated in one batched op before the scan (same fold_in tree, same bits), so
    the scan's serial critical path carries no threefry hashing (~1.4x).
  - Each scan step issues ONE contiguous (W, 2K) row gather from the packed
    [nbr | cum] table (GraphDev.nbrcum); the MC draw resolves in-register with a
    compare-count over the cumsum half (first slot with cum > r). This replaces the
    earlier ceil(log2 K) serially-dependent single-element gathers (~2.6x; gather op
    count, not bytes, dominates — dependent scattered gathers are the worst access
    pattern on TPU).
  - The scan emits just the chosen CSR slot per step. Edge ids, advances (path_len)
    and ES sums (score_sum) are reconstructed AFTER the scan with ONE packed (W, S)
    gather from the (N*K, 4) [eid, adv, es] recon table (GraphDev.rec) — removing
    three (W, K) gathers and four take_along_axis reductions per step, then
    collapsing the remaining three scattered recon gathers into one (~4x + ~1.25x).

Semantics (deterministic, documented — SURVEY.md §7 "bit-identical" hard part):
  - A walk starts at an oriented anchor node and repeatedly selects an out-edge.
  - mode 0 / 1 (greedy by OS / ES): candidates are non-pad slots whose destination is
    not already on this walk's path (greedy REROUTES around its history); pick the
    max-score candidate; ties resolve to the lowest CSR slot, and CSR rows are
    pre-sorted by (ES desc, dst asc), which fixes the tie-break globally.
  - mode 2 (Monte-Carlo): pick slot j with probability w_j / sum(w) over the FULL row,
    where w = mc_weights(ES) (integer ceil(ES) weights, 0 for ES <= 0 and pads),
    sampled by integer inverse-CDF against the PRECOMPUTED row cumsum (one contiguous
    row gather + compare-count: choice = #{j : cum_j <= r}). A
    draw landing on an already-visited destination KILLS the walk (HERA cycle kill,
    SURVEY.md §3 row 10); a walk with no positive-weight candidate dies. The draw
    uses the walk's OWN stream: fold_in(fold_in(key(seed), uid), step) — invariant to
    batch size, padding, sharding, and host count (SURVEY.md §5 item 3), and
    bit-reproducible across backends (integer arithmetic has no rounding).
  - Step 0 honours plan.first_edge (deterministic first-edge enumeration); an invalid
    forced slot kills the walk.
  - A walk succeeds when it steps onto another anchor node (id < 2 * n_anchors); it
    dies on candidate exhaustion; it is truncated (failure) at max_steps.

score_sum is accumulated by jnp.sum over the step axis post-scan; its float32
rounding therefore depends on the backend's reduce order (deterministic per backend).
path_len is an int32 sum — exact everywhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.graph.tensorize import GraphTensors
from telomeri_tpu.walk.plan import MODE_GREEDY_OS, MODE_MC, WalkPlan


class GraphDev(NamedTuple):
    """Device-resident CSR tables (see graph/tensorize.py for the host layout).

    The device layout is packed for the walk loop's two access patterns:
      - nbrcum: (N, 2K) int32 — [:, :K] neighbour ids, [:, K:] the static MC weight
        cumsum. ONE contiguous row gather per scan step feeds both the transition
        and the sampler (halving per-step gather ops — gathers, not bytes, dominate).
      - rec: (N*K, 4) int32 — per-slot [eid, adv, es_bits(f32), 0] for the post-scan
        reconstruction: one packed (W, S) gather instead of three.
    os_ stays separate: only greedy-OS walks (a tiny batch section) read it."""

    nbrcum: jax.Array    # (N, 2K) int32
    os_: jax.Array       # (N, K) f32
    rec: jax.Array       # (N*K, 4) int32


def mc_weights(es: np.ndarray) -> np.ndarray:
    """Integer Monte-Carlo sampling weights from ES scores.

    weight = ceil(ES) for ES > 0 (so any positive score keeps >= 1), else 0.
    ES is in bp units (typically 100s-1000s), so the <= 1-unit quantisation error is
    < 0.1% relative — and integer weights make the sampling cumsum EXACT and
    order-independent, so MC decisions are bit-reproducible across backends and
    reduce orders (SURVEY.md §7 determinism hard part)."""
    es = np.asarray(es, np.float32)
    return np.where(es > 0, np.maximum(np.ceil(es), 1), 0).astype(np.int32)


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


def _cum_arrays(g: GraphTensors) -> np.ndarray:
    if g.cumw is not None:
        return g.cumw
    return np.cumsum(mc_weights(g.es), axis=1, dtype=np.int64).astype(np.int32)


def pack_rec(eid: np.ndarray, adv: np.ndarray, es: np.ndarray) -> np.ndarray:
    """Pack the (N, K) per-slot attribute tables into the (N*K, 4) recon table."""
    flat = lambda a: np.ascontiguousarray(a).reshape(-1)
    return np.stack([
        flat(eid).astype(np.int32),
        flat(adv).astype(np.int32),
        flat(es).astype(np.float32).view(np.int32),
        np.zeros(eid.size, np.int32),
    ], axis=1)


def graph_to_device(g: GraphTensors, sharding=None) -> GraphDev:
    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
    cumw = _cum_arrays(g)
    return GraphDev(
        nbrcum=put(np.concatenate([g.nbr, cumw], axis=1)),
        os_=put(g.os_),
        rec=put(pack_rec(g.eid, g.adv, g.es)),
    )


def plan_to_device(p: WalkPlan, sharding=None) -> PlanDev:
    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
    return PlanDev(start=put(p.start), first_edge=put(p.first_edge), mode=put(p.mode),
                   uid=put(p.uid), active=put(p.active))


@functools.partial(jax.jit, static_argnames=("max_steps", "kind"))
def _run_walks_kind(
    g: GraphDev, p: PlanDev, seed, *, n_anchors, max_steps: int, kind: str
) -> WalkResult:
    """One lockstep scan, specialized by batch kind.

    kind="mixed": any modes (generic; used by tests and ad-hoc plans).
    kind="mc": all walks are Monte-Carlo with first_edge == -1 — skips the OS gather,
      greedy argmax, and forced-edge take (the 97%-of-batch fast path).
    kind="greedy": no RNG at all — skips key folding and categorical.

    n_anchors is a TRACED scalar (not static): with bucketed batch/table shapes
    (utils/shapes.py) one compiled program serves every same-bucket dataset.
    """
    w = p.start.shape[0]
    k = g.os_.shape[1]
    anchor_lim = 2 * jnp.asarray(n_anchors, jnp.int32)
    use_mc = kind in ("mixed", "mc")
    use_greedy = kind in ("mixed", "greedy")
    if use_mc:
        # hoist ALL RNG out of the scan: one batched (S, W) bits table, same
        # fold_in(fold_in(key(seed), uid), step) tree as the per-step form — the
        # scan's serial critical path then carries no threefry hashing
        base = jax.random.key(seed)
        walk_keys = jax.vmap(lambda u: jax.random.fold_in(base, u))(p.uid)
        all_bits = jax.vmap(lambda s: jax.vmap(
            lambda kk: jax.random.bits(jax.random.fold_in(kk, s),
                                       dtype=jnp.uint32))(walk_keys)
        )(jnp.arange(max_steps, dtype=jnp.int32))          # (S, W)
    else:
        all_bits = jnp.zeros((max_steps, w), jnp.uint32)
    is_mc = p.mode == MODE_MC
    is_os = p.mode == MODE_GREEDY_OS

    visited0 = jnp.full((w, max_steps + 1), -1, jnp.int32).at[:, 0].set(p.start)
    carry0 = dict(
        cur=p.start,
        done=~p.active,
        success=jnp.zeros(w, bool),
        terminal=jnp.full(w, -1, jnp.int32),
        nsteps=jnp.zeros(w, jnp.int32),
        visited=visited0,
    )

    def step(carry, inp):
        s, bits = inp
        cur = carry["cur"]
        rows = g.nbrcum[cur]                            # (W, 2K) ONE contiguous row gather
        nbr_rows = rows[:, :k]

        if use_greedy:
            # greedy candidates exclude pads and already-visited destinations
            # (greedy REROUTES around its path; MC below kills instead)
            valid = nbr_rows >= 0
            revisit = (nbr_rows[:, :, None] == carry["visited"][:, None, :]).any(-1)
            valid &= ~revisit
            # greedy-ES: rows are ES-sorted, so the best candidate is the FIRST valid
            # slot; greedy-OS needs a masked argmax over OS. Merge: argmax over a
            # (W, K) key that is OS for mode-0 walks and a descending ramp otherwise.
            osb = g.os_[cur]
            ramp = -jax.lax.broadcasted_iota(jnp.float32, (w, k), 1)
            gkey = jnp.where(is_os[:, None], osb, ramp)
            masked = jnp.where(valid, gkey, -jnp.inf)
            greedy_choice = jnp.argmax(masked, axis=1).astype(jnp.int32)
            greedy_dead = ~valid.any(axis=1)

        if use_mc:
            # Monte-Carlo: prob ∝ weight (mc_weights) over the STATIC row
            # distribution, sampled by integer inverse-CDF against the precomputed
            # row cumsum: gather the CONTIGUOUS (K,) cumsum row and count slots with
            # cum <= r (in-register compare-count = lower_bound for the first
            # cum > r). A draw landing on an already-visited destination KILLS the
            # walk (cycle kill, SURVEY.md §3 row 10) rather than rerouting.
            # r = bits % total has modulo bias <= total / 2^31 (< 0.01% on real
            # rows) — deterministic, replicated bit-for-bit by the oracle.
            cum_rows = rows[:, k:]                      # cumsum half of the same gather
            total = cum_rows[:, -1]
            r = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32) % jnp.maximum(total, 1)
            mc_choice = jnp.minimum(
                jnp.sum((cum_rows <= r[:, None]).astype(jnp.int32), axis=1), k - 1
            ).astype(jnp.int32)
            mc_dead = total <= 0

        if kind == "mc":
            choice, dead = mc_choice, mc_dead
        elif kind == "greedy":
            choice, dead = greedy_choice, greedy_dead
        else:
            choice = jnp.where(is_mc, mc_choice, greedy_choice)
            dead = jnp.where(is_mc, mc_dead, greedy_dead)
        nxt = jnp.take_along_axis(nbr_rows, choice[:, None], 1)[:, 0]

        if use_greedy:
            # deterministic first-edge enumeration (MC plans always have -1)
            forced = (s == 0) & (p.first_edge >= 0)
            choice = jnp.where(forced, p.first_edge, choice)
            chosen_valid = jnp.take_along_axis(valid, choice[:, None], 1)[:, 0]
            dead = jnp.where(forced, ~chosen_valid, dead)
            nxt = jnp.where(forced,
                            jnp.take_along_axis(nbr_rows, choice[:, None], 1)[:, 0],
                            nxt)

        if use_mc:
            # MC cycle kill: chosen destination already on the path
            mc_revisit = (nxt[:, None] == carry["visited"]).any(-1)
            if kind == "mixed":
                dead = dead | (mc_revisit & is_mc)
            else:
                dead = dead | mc_revisit

        stepping = ~carry["done"] & ~dead
        hit_anchor = stepping & (nxt < anchor_lim)

        new = dict(
            cur=jnp.where(stepping, nxt, cur),
            done=carry["done"] | dead | hit_anchor,
            success=carry["success"] | hit_anchor,
            terminal=jnp.where(hit_anchor, nxt, carry["terminal"]),
            nsteps=carry["nsteps"] + stepping.astype(jnp.int32),
            visited=carry["visited"].at[:, s + 1].set(jnp.where(stepping, nxt, -1)),
        )
        return new, jnp.where(stepping, choice, -1)

    # unroll: XLA overlaps the per-step row gathers across unrolled iterations,
    # hiding gather latency behind compute (~2x on v5e; 8 regresses — fusion bloat)
    carry, slots_t = jax.lax.scan(
        step, carry0, (jnp.arange(max_steps, dtype=jnp.int32), all_bits),
        unroll=4,
    )
    slots = jnp.transpose(slots_t)                 # (W, S)

    # post-scan reconstruction: ONE packed (W, S) gather from the per-slot recon
    # table yields edge ids, advances, and ES at once
    src_nodes = carry["visited"][:, :max_steps]    # node the step left FROM
    took = slots >= 0
    flat = jnp.clip(src_nodes, 0) * k + jnp.clip(slots, 0)
    rec = g.rec[flat]                              # (W, S, 4)
    eids = jnp.where(took, rec[..., 0], -1)
    path_len = jnp.sum(jnp.where(took, rec[..., 1], 0), axis=1, dtype=jnp.int32)
    score_sum = jnp.sum(jnp.where(
        took, jax.lax.bitcast_convert_type(rec[..., 2], jnp.float32), 0.0), axis=1)

    return WalkResult(
        nodes=carry["visited"],
        eids=eids,
        steps=carry["nsteps"],
        success=carry["success"],
        terminal=carry["terminal"],
        path_len=path_len,
        score_sum=score_sum,
    )


def run_walks(
    g: GraphDev, p: PlanDev, seed, *, n_anchors: int, max_steps: int
) -> WalkResult:
    """Generic mixed-mode engine (any plan). Pure function of its inputs."""
    return _run_walks_kind(
        g, p, seed, n_anchors=n_anchors, max_steps=max_steps, kind="mixed")


def _slice_plan(p: WalkPlan, lo: int, hi: int) -> WalkPlan:
    return WalkPlan(start=p.start[lo:hi], first_edge=p.first_edge[lo:hi],
                    mode=p.mode[lo:hi], uid=p.uid[lo:hi], active=p.active[lo:hi])


def run_walks_sectioned(
    g: GraphDev, plan: WalkPlan, seed, *, n_anchors: int, max_steps: int,
    sharding=None,
) -> WalkResult:
    """Fast path for sectioned plans (plan_walks layout): one specialized scan per
    section, results concatenated back into plan row order. Falls back to the mixed
    engine when the plan has no section info. Bit-identical to run_walks on the same
    rows (same per-walk op order; uid-keyed RNG)."""
    if plan.sections is None:
        res = run_walks(g, plan_to_device(plan, sharding), seed,
                        n_anchors=n_anchors, max_steps=max_steps)
        return res
    parts = []
    for kind in ("greedy", "mc"):
        lo, hi = plan.sections[kind]
        if hi == lo:
            continue
        pd = plan_to_device(_slice_plan(plan, lo, hi), sharding)
        parts.append(_run_walks_kind(
            g, pd, seed, n_anchors=n_anchors, max_steps=max_steps, kind=kind))
    if not parts:  # graph with no walkable anchor ends
        z = lambda *shape: jnp.zeros(shape, jnp.int32)
        return WalkResult(nodes=z(0, max_steps + 1), eids=z(0, max_steps),
                          steps=z(0), success=jnp.zeros(0, bool), terminal=z(0),
                          path_len=z(0), score_sum=jnp.zeros(0, jnp.float32))
    if len(parts) == 1:
        return parts[0]
    return WalkResult(*[jnp.concatenate(a, axis=0) for a in zip(*parts)])


def run_walks_host(
    g: GraphTensors, plan: WalkPlan, cfg: ScaffoldConfig
) -> WalkResult:
    """Single-device convenience wrapper (numpy in, numpy out)."""
    res = run_walks_sectioned(
        graph_to_device(g), plan, cfg.mc_seed,
        n_anchors=g.n_anchors, max_steps=cfg.max_steps,
    )
    return res.to_numpy()
