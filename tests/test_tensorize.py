"""CSR padding round-trip tests (SURVEY.md §5 item 1)."""

import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.geometry import EdgeSoA
from telomeri_tpu.graph.tensorize import tensorize


def mk_edges(srcs, dsts, ess):
    n = len(srcs)
    return EdgeSoA(
        src=np.array(srcs, dtype=np.int32), dst=np.array(dsts, dtype=np.int32),
        os_=np.arange(n, dtype=np.float32), es=np.array(ess, dtype=np.float32),
        adv=np.full(n, 7, dtype=np.int32), ue=np.zeros(n, dtype=np.int32),
        ve=np.zeros(n, dtype=np.int32), row=np.arange(n, dtype=np.int32),
    )


def test_csr_sorted_by_es_desc():
    e = mk_edges([0, 0, 0, 2], [4, 6, 8, 4], [1.0, 5.0, 3.0, 2.0])
    g = tensorize(e, seq_len=np.array([10] * 5), n_anchors=1, cfg=ScaffoldConfig(max_degree=4))
    # 10 real oriented nodes, bucket-padded rows (utils/shapes.py) above them
    assert g.stats["n_nodes"] == 10
    assert g.n_nodes == g.stats["n_nodes_padded"] == 16
    assert (g.nbr[10:] == -1).all() and (g.deg[10:] == 0).all()
    assert list(g.nbr[0][:3]) == [6, 8, 4]          # ES desc
    assert list(g.es[0][:3]) == [5.0, 3.0, 1.0]
    assert g.nbr[0][3] == -1                        # padding
    assert g.deg[0] == 3 and g.deg[2] == 1
    assert list(g.eid[0][:3]) == [1, 2, 0]          # round-trip to EdgeSoA indices


def test_csr_tie_break_dst_asc():
    e = mk_edges([1, 1, 1], [9, 3, 5], [2.0, 2.0, 2.0])
    g = tensorize(e, seq_len=np.array([10] * 5), n_anchors=1, cfg=ScaffoldConfig(max_degree=8))
    assert list(g.nbr[1][:3]) == [3, 5, 9]          # equal ES -> dst asc


def test_hub_row_builds_hierarchy():
    """Degree > K: NO truncation — overflow edges chain through a virtual child
    whose MC weight is the subtree sum (round-1 verdict item 3)."""
    e = mk_edges([0] * 6, [2, 4, 6, 8, 3, 5], [6, 5, 4, 3, 2, 1])
    g = tensorize(e, seq_len=np.array([10] * 5), n_anchors=1,
                  cfg=ScaffoldConfig(max_degree=4))
    assert g.n_truncated_edges == 0
    assert g.stats["n_virtual_nodes"] == 1 and g.stats["n_hub_nodes"] == 1
    assert g.virtual_base == 10
    # base row: top K-1 real edges + 1 child slot pointing at virtual node 10
    assert list(g.nbr[0]) == [2, 4, 6, 10]
    assert list(g.eid[0][:3]) == [0, 1, 2] and g.eid[0][3] == -2
    assert g.adv[0][3] == 0 and g.es[0][3] == 0.0
    assert g.deg[0] == 4
    # child row holds the ES tail in order, with real eids
    assert list(g.nbr[10][:3]) == [8, 3, 5] and g.nbr[10][3] == -1
    assert list(g.eid[10][:3]) == [3, 4, 5]
    # hop OS = subtree max (greedy-OS descends toward the global max)
    assert g.os_[0][3] == max(float(g.os_[10][j]) for j in range(3))
    # MC weights: child slot weighs its whole subtree; row total == flat total
    from telomeri_tpu.walk.engine import mc_weights

    flat_total = int(mc_weights(e.es).sum())
    assert int(g.cumw[0][-1]) == flat_total
    child_w = int(g.cumw[0][3]) - int(g.cumw[0][2])
    assert child_w == int(g.cumw[10][-1])


def test_hub_recursion_two_levels():
    """Degree far beyond K*K chains through multiple hierarchy levels, still
    covering every edge exactly once."""
    d = 80  # k=8 -> capacity 8 + children... needs 2+ levels
    e = mk_edges([0] * d, list(range(2, 2 + 2 * d, 2))[:d],
                 list(np.linspace(100, 1, d)))
    g = tensorize(e, seq_len=np.array([10] * (d + 2)), n_anchors=1,
                  cfg=ScaffoldConfig(max_degree=8))
    assert g.n_truncated_edges == 0
    # every original eid appears exactly once across all rows
    eids = g.eid[g.eid >= 0]
    assert sorted(eids.tolist()) == list(range(d))
    # hierarchical row total equals the flat weight total
    from telomeri_tpu.walk.engine import mc_weights

    assert int(g.cumw[0][-1]) == int(mc_weights(e.es).sum())
    assert g.stats["n_virtual_nodes"] > 0


def test_anchor_mask():
    e = mk_edges([0], [4], [1.0])
    g = tensorize(e, seq_len=np.array([10] * 5), n_anchors=2, cfg=ScaffoldConfig())
    m = g.anchor_mask()
    assert m[:4].all() and not m[4:].any()
