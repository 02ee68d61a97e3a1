"""Walk batch planning (host): enumerate the deterministic + Monte-Carlo walks.

Reference parity: the C++ reference's PathManager path generation (SURVEY.md §3 rows 7-9;
mount empty, SURVEY.md §0). Following the HERA scheme, for every anchor END (oriented
anchor node with out-degree > 0) we plan:

  - one greedy-by-OS walk per first edge   (deg walks, mode 0)
  - one greedy-by-ES walk per first edge   (deg walks, mode 1)
  - cfg.mc_walks_per_end Monte-Carlo walks (mode 2, first edge sampled like any step)

Each walk gets a stable global uid (its position in this enumeration). The uid — not the
batch position or the device — seeds the walk's RNG stream and breaks representative-path
ties, so results are invariant to batch size, padding, and host count (SURVEY.md §5
item 3). Planned walks are padded with inactive entries to a multiple of
cfg.walk_batch_multiple * n_shards for even sharding.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.graph.tensorize import GraphTensors

MODE_GREEDY_OS = 0
MODE_GREEDY_ES = 1
MODE_MC = 2


@dataclass
class WalkPlan:
    """SoA walk parameters, device-ready. All arrays share length W (padded)."""

    start: np.ndarray       # int32 start node (oriented anchor); 0 for inactive pads
    first_edge: np.ndarray  # int32 CSR slot for step 0, or -1 = choose by mode
    mode: np.ndarray        # int32 MODE_*
    uid: np.ndarray         # int32 stable global walk id
    active: np.ndarray      # bool

    def __len__(self) -> int:
        return len(self.start)

    @property
    def n_active(self) -> int:
        return int(self.active.sum())


def plan_walks(g: GraphTensors, cfg: ScaffoldConfig, n_shards: int = 1) -> WalkPlan:
    ends = np.flatnonzero(g.anchor_mask() & (g.deg > 0)).astype(np.int64)
    starts, firsts, modes = [], [], []
    for a in ends:
        d = int(g.deg[a])
        for mode in (MODE_GREEDY_OS, MODE_GREEDY_ES):
            starts.append(np.full(d, a))
            firsts.append(np.arange(d))
            modes.append(np.full(d, mode))
        starts.append(np.full(cfg.mc_walks_per_end, a))
        firsts.append(np.full(cfg.mc_walks_per_end, -1))
        modes.append(np.full(cfg.mc_walks_per_end, MODE_MC))
    if starts:
        start = np.concatenate(starts)
        first = np.concatenate(firsts)
        mode = np.concatenate(modes)
    else:
        start = first = mode = np.empty(0, dtype=np.int64)

    n = len(start)
    m = cfg.walk_batch_multiple * max(n_shards, 1)
    w = max(((n + m - 1) // m) * m, m)
    pad = w - n
    return WalkPlan(
        start=np.concatenate([start, np.zeros(pad)]).astype(np.int32),
        first_edge=np.concatenate([first, np.full(pad, -1)]).astype(np.int32),
        mode=np.concatenate([mode, np.zeros(pad)]).astype(np.int32),
        uid=np.arange(w, dtype=np.int32),
        active=np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]),
    )
