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


def test_csr_truncation_keeps_top_k():
    e = mk_edges([0] * 6, [2, 4, 6, 8, 3, 5], [6, 5, 4, 3, 2, 1])
    g = tensorize(e, seq_len=np.array([10] * 5), n_anchors=1, cfg=ScaffoldConfig(max_degree=4))
    assert list(g.nbr[0]) == [2, 4, 6, 8]
    assert g.n_truncated_edges == 2
    assert g.deg[0] == 4


def test_anchor_mask():
    e = mk_edges([0], [4], [1.0])
    g = tensorize(e, seq_len=np.array([10] * 5), n_anchors=2, cfg=ScaffoldConfig())
    m = g.anchor_mask()
    assert m[:4].all() and not m[4:].any()
