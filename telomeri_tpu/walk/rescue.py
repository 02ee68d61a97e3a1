"""Rescue rounds: dense MC re-walks of unbridged contig ends.

Root-caused on the hg002-sub run (BASELINE.md gap table, tools/gap_report.py):
sampling-limited gaps (real depth-3-4 paths whose per-walk probability in the
cross-copy repeat web is ~0.2%) need more draws, and walk-COUNT support is
meaningless at boosted density — so round 3 introduced READ-DIVERSE evidence
(distinct paths + empty cut-read intersection) for rescue acceptance.

Round 4 made that evidence rule NORMATIVE for the base consensus
(consensus/grouping.py support_mode="read_diverse" + consensus/evidence.py
cut-read gate) and raised base density 10x, so rescue is now a THIN RETRY: it
re-walks still-free walkable ends at rescue_walks_per_end density through the
SAME device grouping + gate the base round uses (one normative implementation —
VERDICT r3 next-#2; the round-3 scalar host re-implementation of rules 3-5 is
gone). Rescue candidates remain subordinate to the base consensus: they are
conflict-resolved INTO the already-accepted bridge set
(bridge.py resolve_conflicts(pre_accepted=...)), so a rescue round can only ADD
bridges on free ends, never flip a base decision.

Batch safety (ADVICE r3): the total rescue batch is HARD-capped at
MAX_RESCUE_WALKS — when free ends outnumber the budget the end list itself is
truncated (deterministically, lowest node ids first) and a warning names the
deferral; per-round uids stay within their (1 << 24) block by construction and
an assert enforces it.
"""

from __future__ import annotations

import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.consensus.evidence import read_diversity_gate
from telomeri_tpu.consensus.grouping import compress, group_and_select, summarize
from telomeri_tpu.graph.tensorize import GraphTensors
from telomeri_tpu.scaffold.bridge import Bridge, resolve_with_blockers
from telomeri_tpu.utils.logging import log
from telomeri_tpu.walk.plan import MODE_MC, WalkPlan

RESCUE_UID_BASE = 1 << 30   # rescue uids never collide with base plan uids
MAX_RESCUE_WALKS = 1 << 20  # hard batch cap: many free ends -> fewer walks/end,
#                             then a truncated end list (never an unbounded w)


def free_walkable_ends(graph: GraphTensors, accepted: list[Bridge],
                       blocked_ends=frozenset()) -> list[int]:
    """Oriented start nodes of contig ends that are (a) not used by an accepted
    bridge, (b) not claimed by a cut-read blocker (bridge.py
    resolve_with_blockers), and (c) walkable (out-degree > 0; genome-boundary
    ends have 0)."""
    used = {(b.end_a.contig, b.end_a.right) for b in accepted}
    used |= {(b.end_b.contig, b.end_b.right) for b in accepted}
    used |= {(e.contig, e.right) for e in blocked_ends}
    deg = np.asarray(graph.deg)
    out = []
    for c in range(graph.n_anchors):
        for right, u in ((True, 2 * c), (False, 2 * c + 1)):
            if (c, right) not in used and deg[u] > 0:
                out.append(u)
    return out


def build_rescue_plan(
    ends: list[int], cfg: ScaffoldConfig, round_ix: int = 0,
    mesh_size: int = 1,
) -> tuple[WalkPlan, int]:
    """All-MC WalkPlan for one rescue round over the given free ends, with the
    batch HARD-capped at MAX_RESCUE_WALKS (truncating the end list when even
    1 walk/end would blow the budget — ADVICE r3: the old 64-walk floor made w
    unbounded in the end count). Returns (plan, uid0); rescue uids are
    row-aligned (uid = uid0 + row) and provably inside the round's (1 << 24)
    block: w <= MAX_RESCUE_WALKS + pad << 1 << 24."""
    if len(ends) > MAX_RESCUE_WALKS:
        log.warning(
            "rescue round %d: %d free ends exceed the %d-walk budget; walking "
            "the first %d ends this round (rest deferred to later rounds)",
            round_ix, len(ends), MAX_RESCUE_WALKS, MAX_RESCUE_WALKS)
        ends = ends[:MAX_RESCUE_WALKS]
    per_end = max(1, min(cfg.rescue_walks_per_end,
                         MAX_RESCUE_WALKS // len(ends)))
    starts = np.repeat(np.array(ends, np.int32), per_end)
    # pad the batch so the mc section divides any mesh (inactive rows are
    # inert; padding does not change per-row results — uid-keyed RNG)
    mult = cfg.walk_batch_multiple * max(mesh_size, 1)
    n_pad = -len(starts) % mult
    active = np.concatenate([np.ones(len(starts), bool), np.zeros(n_pad, bool)])
    starts = np.concatenate([starts, np.zeros(n_pad, np.int32)])
    w = len(starts)
    assert w < 1 << 24, w  # per-round uid block (RESCUE_UID_BASE + round<<24)
    uid0 = RESCUE_UID_BASE + round_ix * (1 << 24)
    plan = WalkPlan(
        start=starts, first_edge=np.full(w, -1, np.int32),
        mode=np.full(w, MODE_MC, np.int32),
        uid=(uid0 + np.arange(w)).astype(np.int32),
        active=active, sections={"greedy": (0, 0), "mc": (0, w)})
    return plan, uid0


def run_rescue_round(
    graph: GraphTensors, cfg: ScaffoldConfig, accepted: list[Bridge],
    round_ix: int = 0, gd=None, mesh=None, placement: str = "replicated",
    blocked_ends=frozenset(),
):
    """One rescue round. Returns (new_bridges, paths, blocked_ends') where
    paths maps each new bridge's rep_uid to its (nodes, eids) for the
    stitcher and blocked_ends' extends the caller's cut-read-blocked end set
    with this round's blockers; ([], {}, blocked_ends) when nothing
    qualified. placement="rowshard" routes the walks through the row-sharded
    engine (>HBM graphs; byte-identical records), keeping pipeline output
    placement-invariant."""
    import jax

    from telomeri_tpu.scaffold.stitch import extract_path
    from telomeri_tpu.walk.engine import graph_to_device, run_walks_sectioned

    ends = free_walkable_ends(graph, accepted, blocked_ends)
    if not ends or cfg.rescue_walks_per_end == 0:
        # an explicit 0 means NO rescue sampling (review r4: the budget
        # floor of 1 walk/end must not override it)
        return [], {}, blocked_ends
    plan, uid0 = build_rescue_plan(
        ends, cfg, round_ix, mesh_size=mesh.size if mesh is not None else 1)
    if placement == "rowshard":
        from telomeri_tpu.dist.rowshard import run_walks_rowsharded

        res = run_walks_rowsharded(
            graph, plan, cfg.mc_seed, n_anchors=graph.n_anchors,
            max_steps=cfg.max_steps, mesh=mesh)
    else:
        sharding = None
        if mesh is not None:
            from telomeri_tpu.dist.mesh import replicated, walk_sharded

            sharding = walk_sharded(mesh)
            if gd is None:
                gd = graph_to_device(graph, replicated(mesh))
        elif gd is None:
            gd = graph_to_device(graph)
        res = run_walks_sectioned(
            gd, plan, cfg.mc_seed, n_anchors=graph.n_anchors,
            max_steps=cfg.max_steps, sharding=sharding)

    # the SAME normative grouping + evidence rules as the base round, always in
    # read_diverse mode (walk counts at rescue density are meaningless)
    if mesh is not None:
        from telomeri_tpu.dist.mesh import replicated, walk_sharded

        uid_dev = jax.device_put(plan.uid, walk_sharded(mesh))
        summary = summarize(res, uid_dev, virtual_base=graph.virtual_base)
        summary = jax.device_put(summary, replicated(mesh))
    else:
        summary = summarize(res, plan.uid, virtual_base=graph.virtual_base)
    cons = group_and_select(
        summary, n_anchors=graph.n_anchors, group_window=cfg.group_window,
        min_support=cfg.min_group_support, grouping=cfg.grouping,
        support="read_diverse")
    rows = compress(cons)
    rows, blocked_rows = read_diversity_gate(
        rows, cons, res, graph.virtual_base, mesh=mesh,
        split_read=graph.split_read)
    new, blocked_ends = resolve_with_blockers(
        rows, blocked_rows, pre_accepted=accepted, pre_blocked=blocked_ends)
    if not new:
        return [], {}, blocked_ends

    # fetch ONLY the representative rows for the stitcher (rescue uids are
    # row-aligned: uid = uid0 + row). Under a multi-process mesh the sharded
    # records are not host-addressable — use the stitch-stage collective
    # (ADVICE r3 item 1: np.asarray on the full batch crashed there).
    rowids = np.array([b.rep_uid - uid0 for b in new], np.int64)
    if mesh is not None and not isinstance(res.nodes, np.ndarray):
        from telomeri_tpu.dist.mesh import fetch_walk_rows

        mini = fetch_walk_rows(res, rowids, mesh)
        nodes, eids, steps = mini.nodes, mini.eids, mini.steps
    else:
        nodes = np.asarray(res.nodes)[rowids]
        eids = np.asarray(res.eids)[rowids]
        steps = np.asarray(res.steps)[rowids]
    paths = {
        b.rep_uid: extract_path(nodes[i], eids[i], int(steps[i]),
                                virtual_base=graph.virtual_base)
        for i, b in enumerate(new)
    }
    return new, paths, blocked_ends
