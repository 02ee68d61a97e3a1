"""Rescue rounds: dense MC re-walks of unbridged contig ends (round 3).

Root-caused on the hg002-sub run (BASELINE.md gap table, tools/gap_report.py):
of 4/400 unbridged gaps, one had NO graph path at all (coverage hole — correct
non-bridge), and three had real depth-3-4 paths whose per-walk sampling
probability in the cross-copy repeat web was so low that ~200 base-density
walks never drew them (0 connecting walks at 100 walks/end; 7-19 at 2000/end).
More walks is the semantically clean fix — same sampler, more draws — but
walk-COUNT support is meaningless at boosted density: a chimeric read's bridge
would gain count with density just as fast as a real one. Rescue support is
therefore READ DIVERSITY, not walk count:

  a rescue bridge is accepted iff its winning length-group contains
  >= min_group_support DISTINCT paths AND no single read appears in every
  path (empty cut-read intersection). A chimera junction always fails the
  second test — every path through it contains the chimeric read — which is
  exactly why single-cut-read true junctions (one spanning read) are also
  refused: on PAF evidence alone they are indistinguishable from chimeras
  (measured: 2 of the 3 samplable hg002 gaps hang on one cut read each and
  stay unbridged; the read-diverse third is rescued).

Rescue candidates are subordinate to the base consensus: they are
conflict-resolved INTO the already-accepted bridge set (bridge.py
resolve_conflicts(pre_accepted=...)), so a rescue round can only ADD bridges
on free ends, never flip a base decision.
"""

from __future__ import annotations

import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.graph.tensorize import GraphTensors
from telomeri_tpu.scaffold.bridge import Bridge, End, resolve_conflicts
from telomeri_tpu.utils.logging import log
from telomeri_tpu.walk.plan import MODE_MC, WalkPlan

RESCUE_UID_BASE = 1 << 30   # rescue uids never collide with base plan uids
MAX_RESCUE_WALKS = 1 << 20  # batch cap: many free ends -> fewer walks per end


def free_walkable_ends(graph: GraphTensors, accepted: list[Bridge]) -> list[int]:
    """Oriented start nodes of contig ends that are (a) not used by an accepted
    bridge and (b) walkable (out-degree > 0; genome-boundary ends have 0)."""
    used = {(b.end_a.contig, b.end_a.right) for b in accepted}
    used |= {(b.end_b.contig, b.end_b.right) for b in accepted}
    deg = np.asarray(graph.deg)
    out = []
    for c in range(graph.n_anchors):
        for right, u in ((True, 2 * c), (False, 2 * c + 1)):
            if (c, right) not in used and deg[u] > 0:
                out.append(u)
    return out


def _canon_pair(a: int, b: int) -> tuple[int, int]:
    ra, rb = b ^ 1, a ^ 1
    return (ra, rb) if (ra, rb) < (a, b) else (a, b)


def run_rescue_round(
    graph: GraphTensors, cfg: ScaffoldConfig, accepted: list[Bridge],
    round_ix: int = 0, gd=None, mesh=None, placement: str = "replicated",
):
    """One rescue round. Returns (new_bridges, paths) where paths maps each new
    bridge's rep_uid to its (nodes, eids) for the stitcher, or ([], {}) when
    nothing qualified. placement="rowshard" routes the walks through the
    row-sharded engine (>HBM graphs; byte-identical records), keeping pipeline
    output placement-invariant."""
    from telomeri_tpu.scaffold.stitch import extract_path
    from telomeri_tpu.walk.engine import graph_to_device, run_walks_sectioned

    ends = free_walkable_ends(graph, accepted)
    if not ends:
        return [], {}
    per_end = min(cfg.rescue_walks_per_end,
                  max(MAX_RESCUE_WALKS // len(ends), 64))
    starts = np.repeat(np.array(ends, np.int32), per_end)
    # pad the batch so the mc section divides any mesh (inactive rows are
    # inert; padding does not change per-row results — uid-keyed RNG)
    mult = cfg.walk_batch_multiple * (mesh.size if mesh is not None else 1)
    n_pad = -len(starts) % mult
    active = np.concatenate([np.ones(len(starts), bool), np.zeros(n_pad, bool)])
    starts = np.concatenate([starts, np.zeros(n_pad, np.int32)])
    w = len(starts)
    uid0 = RESCUE_UID_BASE + round_ix * (1 << 24)
    plan = WalkPlan(
        start=starts, first_edge=np.full(w, -1, np.int32),
        mode=np.full(w, MODE_MC, np.int32),
        uid=(uid0 + np.arange(w)).astype(np.int32),
        active=active, sections={"greedy": (0, 0), "mc": (0, w)})
    if placement == "rowshard":
        from telomeri_tpu.dist.rowshard import run_walks_rowsharded

        res = run_walks_rowsharded(
            graph, plan, cfg.mc_seed, n_anchors=graph.n_anchors,
            max_steps=cfg.max_steps, mesh=mesh)
    else:
        if gd is None:
            gd = graph_to_device(graph)
        res = run_walks_sectioned(
            gd, plan, cfg.mc_seed, n_anchors=graph.n_anchors,
            max_steps=cfg.max_steps)
    nodes = np.asarray(res.nodes)
    steps = np.asarray(res.steps)
    succ = np.asarray(res.success)
    term = np.asarray(res.terminal)
    plen = np.asarray(res.path_len)
    score = np.asarray(res.score_sum)

    # bucket successful walks per canonical pair; canonicalize the path so the
    # two walk directions of the same physical path dedup to one entry
    by_pair: dict[tuple[int, int], dict] = {}
    vb = graph.virtual_base
    for r in np.flatnonzero(succ):
        a, b = int(nodes[r, 0]), int(term[r])
        pair = _canon_pair(a, b)
        interior = tuple(int(x) for x in nodes[r, 1:steps[r]]
                         if 0 <= x < vb)       # hop nodes excluded from identity
        mirror = tuple(x ^ 1 for x in reversed(interior))
        key = min(interior, mirror)
        d = by_pair.setdefault(pair, {})
        prev = d.get(key)
        # keep one record per distinct path (best score, then lowest row)
        if prev is None or score[r] > prev[1]:
            d[key] = (int(r), float(score[r]), int(plen[r]),
                      frozenset(x // 2 for x in interior))

    rows = []
    for pair, dpaths in by_pair.items():
        entries = sorted(dpaths.values(), key=lambda e: e[2])  # by path length
        # windowed length grouping (consensus rule 3): split sorted lengths at
        # gaps > group_window; winner = most DISTINCT PATHS, tie -> shorter
        groups, cur = [], [entries[0]]
        for e in entries[1:]:
            if e[2] - cur[-1][2] > cfg.group_window:
                groups.append(cur)
                cur = []
            cur.append(e)
        groups.append(cur)
        win = max(groups, key=lambda g: (len(g), -g[0][2]))
        if len(win) < cfg.min_group_support:
            continue
        cut = frozenset.intersection(*(e[3] for e in win))
        if cut:
            log.info("rescue: pair %s has %d paths but a cut read %s — "
                     "single-point evidence, refused (chimera-indistinguishable)",
                     pair, len(win), sorted(cut))
            continue
        rep = max(win, key=lambda e: (e[1], -e[0]))
        rows.append(dict(pair=pair, count=len(win), rep_score=rep[1],
                         rep_uid=uid0 + rep[0], _row=rep[0]))

    if not rows:
        return [], {}
    new = resolve_conflicts(rows, pre_accepted=accepted)
    eids = np.asarray(res.eids)
    paths = {}
    for b in new:
        r = b.rep_uid - uid0
        paths[b.rep_uid] = extract_path(
            nodes[r], eids[r], int(steps[r]), virtual_base=graph.virtual_base)
    return new, paths
