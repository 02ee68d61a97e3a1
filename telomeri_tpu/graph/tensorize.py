"""Fixed-shape overlap-graph tensorization: EdgeSoA -> padded CSR in HBM.

Reference parity: the C++ reference's OverlapGraph build (SURVEY.md §3 row 6; mount empty,
SURVEY.md §0). The reference uses pointer-based adjacency; the TPU-native encoding is a
dense (N, K) padded CSR so each walk step is one dense gather (SURVEY.md §2.2 `graph/`).

Layout:
  - N = 2 * n_seqs oriented nodes (see io/geometry.py for the node encoding), padded
    up to a bucketed row count (utils/shapes.py) with unreachable empty rows so the
    compiled walk program is reused across datasets.
  - Row r of each (N, K) table lists node r's out-edges, sorted by (ES desc, dst asc,
    edge-index asc) — the sort IS the greedy tie-break rule (documented, deterministic).
  - The row width K is DATA-DEPENDENT: the observed max out-degree rounded up to a
    multiple of 8, capped at cfg.max_degree (per-step walk gather traffic is O(K), so
    narrower tables are faster). Rows longer than K keep the top-K by the sort order;
    the truncation count is reported so configs can size the cap.
  - Pad entries have nbr == -1, scores 0, adv 0.
  - Anchor test is id-arithmetic: node v is an anchor iff v < 2 * n_anchors (contigs are
    sequence ids [0, n_anchors)).

Degree bucketing (SURVEY.md §7 "ragged -> fixed shapes") remains a possible refinement
for extremely skewed graphs; the auto-sized uniform-K layout costs n_nodes * K * 20
bytes of HBM with K as defined above.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.geometry import EdgeSoA


@dataclass
class GraphTensors:
    """Padded-CSR overlap graph (host numpy; device_put by callers).

    nbr/es/os_/adv/eid: (N, K) per-node out-edge tables (see module docstring).
    deg: (N,) int32 true out-degree (pre-truncation degrees clipped to K).
    seq_len: (n_seqs,) int32 sequence lengths (for diagnostics; stitching re-reads host seqs).
    n_anchors: number of anchor sequences (contigs).
    """

    nbr: np.ndarray
    es: np.ndarray
    os_: np.ndarray
    adv: np.ndarray
    eid: np.ndarray
    deg: np.ndarray
    seq_len: np.ndarray
    n_anchors: int
    n_truncated_edges: int = 0
    stats: dict = field(default_factory=dict)
    # flat per-edge attribute arrays (length n_edges), used by the walk engine to
    # reconstruct path scores/advances post-scan from chosen edge ids (one (W, S)
    # gather instead of per-step (W, K) gathers — see walk/engine.py)
    edge_es: np.ndarray = None
    edge_adv: np.ndarray = None
    # static per-row Monte-Carlo sampling structure (see walk/engine.py mc_weights):
    # cumw[v, j] = sum of integer weights of row v's slots 0..j (row total is the
    # last column). Static because MC samples the FULL row and kills on revisit
    # (cycle kill), so the per-step distribution never changes.
    cumw: np.ndarray = None      # (N, K) int32

    @property
    def n_nodes(self) -> int:
        return self.nbr.shape[0]

    @property
    def max_degree(self) -> int:
        return self.nbr.shape[1]

    def anchor_mask(self) -> np.ndarray:
        return np.arange(self.n_nodes, dtype=np.int32) < 2 * self.n_anchors


def tensorize(
    edges: EdgeSoA, seq_len: np.ndarray, n_anchors: int, cfg: ScaffoldConfig
) -> GraphTensors:
    n_seqs = len(seq_len)
    n_nodes = 2 * n_seqs

    # Deterministic row order: (src asc, es desc, dst asc, edge idx asc).
    # np.lexsort is stable; keys listed minor->major.
    e_idx = np.arange(len(edges), dtype=np.int64)
    order = np.lexsort((e_idx, edges.dst, -edges.es.astype(np.float64), edges.src))
    src = edges.src[order].astype(np.int64)

    deg_full = np.bincount(src, minlength=n_nodes)
    # auto-size the row width to the observed degree (multiple of 8 for sublane
    # alignment), capped at cfg.max_degree: per-step walk gather traffic is O(K)
    max_deg = int(deg_full.max()) if n_nodes else 0
    k = min(cfg.max_degree, max(8, -(-max_deg // 8) * 8))
    # rank of each edge within its row
    row_start = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(deg_full, out=row_start[1:])
    rank = np.arange(len(src), dtype=np.int64) - row_start[src]
    keep = rank < k
    n_trunc = int((~keep).sum())

    nbr = np.full((n_nodes, k), -1, dtype=np.int32)
    es = np.zeros((n_nodes, k), dtype=np.float32)
    os_ = np.zeros((n_nodes, k), dtype=np.float32)
    adv = np.zeros((n_nodes, k), dtype=np.int32)
    eid = np.full((n_nodes, k), -1, dtype=np.int32)

    r, c = src[keep], rank[keep]
    sel = order[keep]
    nbr[r, c] = edges.dst[sel]
    es[r, c] = edges.es[sel]
    os_[r, c] = edges.os_[sel]
    adv[r, c] = edges.adv[sel]
    eid[r, c] = sel.astype(np.int32)

    from telomeri_tpu.walk.engine import mc_weights

    cumw = np.cumsum(mc_weights(es), axis=1, dtype=np.int64)
    if cumw.size and cumw.max() >= np.iinfo(np.int32).max:
        raise ValueError("MC weight cumsum overflows int32; lower max_degree or scores")
    cumw = cumw.astype(np.int32)

    # bucketed node padding (utils/shapes.py): table row counts come from a small
    # geometric family so the compiled walk program is reused across datasets.
    # Padded rows are unreachable (no edge points at them: nbr pads are -1,
    # degrees 0) and sit ABOVE every real node id, so anchor id-arithmetic and
    # walk-plan enumeration are unaffected.
    from telomeri_tpu.utils.shapes import bucket_len

    n_rows = max(bucket_len(n_nodes, 8), 8)
    if n_rows > n_nodes:
        rpad = n_rows - n_nodes
        pad2 = lambda a, v: np.pad(a, ((0, rpad), (0, 0)), constant_values=v)
        nbr, eid = pad2(nbr, -1), pad2(eid, -1)
        es, os_, adv, cumw = (pad2(a, 0) for a in (es, os_, adv, cumw))
        deg_full = np.pad(deg_full, (0, rpad))
    real_deg = deg_full[:n_nodes]
    pos_deg = real_deg[real_deg > 0]
    return GraphTensors(
        nbr=nbr, es=es, os_=os_, adv=adv, eid=eid,
        deg=np.minimum(deg_full, k).astype(np.int32),
        seq_len=seq_len.astype(np.int32),
        n_anchors=n_anchors,
        n_truncated_edges=n_trunc,
        edge_es=np.asarray(edges.es, np.float32),
        edge_adv=np.asarray(edges.adv, np.int32),
        cumw=cumw,
        stats={
            "n_nodes": n_nodes,
            "n_nodes_padded": n_rows,
            "n_edges": len(edges),
            "max_degree_observed": int(deg_full.max()) if n_nodes else 0,
            # out-degree percentiles over CONNECTED real nodes — the signal for
            # sizing cfg.max_degree (truncation hits rows above K)
            "degree_p50_p90_p99": (
                [int(v) for v in np.percentile(pos_deg, [50, 90, 99])]
                if pos_deg.size else [0, 0, 0]),
            "k": k,
            "n_truncated_edges": n_trunc,
        },
    )
