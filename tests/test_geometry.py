"""Unit tests for overlap geometry, filter rules, and edge construction
(SURVEY.md §5 item 1: "PAF geometry/filter rules on hand-written rows; score formula
golden values")."""

import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.geometry import build_edges, overlap_geometry
from telomeri_tpu.io.paf import PafRecords


def mk_paf(rows):
    """rows: (qid, ql, qs, qe, strand, tid, tl, ts, te, nm, bl)"""
    a = np.array(rows, dtype=np.int64).reshape(-1, 11)
    return PafRecords(
        qid=a[:, 0].astype(np.int32), qlen=a[:, 1].astype(np.int32),
        qstart=a[:, 2].astype(np.int32), qend=a[:, 3].astype(np.int32),
        strand=a[:, 4].astype(np.int8), tid=a[:, 5].astype(np.int32),
        tlen=a[:, 6].astype(np.int32), tstart=a[:, 7].astype(np.int32),
        tend=a[:, 8].astype(np.int32), nmatch=a[:, 9].astype(np.int32),
        blocklen=a[:, 10].astype(np.int32),
    )


CFG = ScaffoldConfig(min_identity=0.7, min_overlap=100, max_overhang=1000,
                     max_overhang_ratio=0.8)


def test_geometry_strand_flip():
    # '-' strand: target coords flip into target-forward-of-the-RC frame
    paf = mk_paf([(0, 100, 10, 90, 1, 1, 200, 20, 100, 70, 80)])
    g = overlap_geometry(paf)
    assert g["ts"][0] == 200 - 100 and g["te"][0] == 200 - 20
    assert g["ol2"][0] == 80


def test_simple_dovetail_edges_and_scores():
    # q: len 1000, aligned [800,1000) ; t: len 1000, aligned [0,200). q is left.
    # SI=0.9 (180/200), OL1=OL2=200 -> OS = 0.9*200 = 180
    # OH1 = 0 (q tail), OH2 = 0 (t head), EL2 = 800, EL1 = 800
    # ES2 = 180 + 400 - 0 = 580 ; ES1 = 580
    paf = mk_paf([(0, 1000, 800, 1000, 0, 1, 1000, 0, 200, 180, 200)])
    edges, st = build_edges(paf, CFG, n_seqs=2)
    assert st.n_kept == 1 and len(edges) == 2
    # forward edge: q+ (node 0) -> t+ (node 2)
    assert edges.src[0] == 0 and edges.dst[0] == 2
    assert edges.os_[0] == pytest.approx(180.0)
    assert edges.es[0] == pytest.approx(580.0)
    assert edges.adv[0] == 800
    assert edges.ue[0] == 1000 and edges.ve[0] == 200
    # mirror edge: t- (node 3) -> q- (node 1)
    assert edges.src[1] == 3 and edges.dst[1] == 1
    assert edges.es[1] == pytest.approx(580.0)
    assert edges.adv[1] == 800
    assert edges.ue[1] == 1000 and edges.ve[1] == 200


def test_overhang_penalty_in_scores():
    # q aligned [700, 950) of 1000 -> tail OH1 = 50; t aligned [30, 280) of 1000 -> head OH2=30
    # SI = 0.8 (200/250); OL=250 -> OS = 200
    # EL2 = (1000-280) - 50 = 670 ; ES2 = 200 + 335 - 40 = 495
    # EL1 = 700 - 30 = 670     ; ES1 = 495
    paf = mk_paf([(0, 1000, 700, 950, 0, 1, 1000, 30, 280, 200, 250)])
    edges, st = build_edges(paf, CFG, n_seqs=2)
    assert st.n_kept == 1
    assert edges.os_[0] == pytest.approx(200.0)
    assert edges.es[0] == pytest.approx(495.0)
    assert edges.adv[0] == 670


def test_reverse_strand_edge_nodes():
    # q left, t reverse-strand right: forward edge q+ -> t-, mirror t+ -> q-
    # t aligned (oriented) [0,200): original t coords [800,1000) with strand '-'
    paf = mk_paf([(0, 1000, 800, 1000, 1, 1, 1000, 800, 1000, 180, 200)])
    edges, st = build_edges(paf, CFG, n_seqs=2)
    assert st.n_kept == 1
    assert edges.src[0] == 0 and edges.dst[0] == 2 * 1 + 1
    assert edges.src[1] == 2 * 1 + 0 and edges.dst[1] == 1


def test_t_left_direction():
    # t is left (lo_t > lo_q): edge t+ -> q+
    paf = mk_paf([(0, 1000, 0, 200, 0, 1, 1000, 800, 1000, 180, 200)])
    edges, st = build_edges(paf, CFG, n_seqs=2)
    assert st.n_kept == 1
    assert edges.src[0] == 2 and edges.dst[0] == 0
    assert edges.src[1] == 1 and edges.dst[1] == 3


def test_filters():
    rows = [
        (0, 1000, 800, 1000, 0, 0, 1000, 0, 200, 180, 200),    # self -> drop
        (0, 1000, 800, 1000, 0, 1, 1000, 0, 200, 100, 200),    # SI=0.5 -> drop
        (0, 1000, 950, 1000, 0, 1, 1000, 0, 50, 50, 50),       # short (50<100) -> drop
        (0, 4000, 1500, 1700, 0, 1, 4000, 1500, 1700, 190, 200),  # internal -> drop
        (0, 1000, 400, 600, 0, 1, 5000, 2400, 2600, 190, 200),  # q contained -> drop
        (2, 5000, 2400, 2600, 0, 1, 1000, 400, 600, 190, 200),  # t contained -> drop
        (0, 1000, 500, 700, 0, 1, 1000, 300, 500, 190, 200),    # OH 300+300 > 0.8*200 -> drop
        (0, 1000, 800, 1000, 0, 1, 1000, 0, 200, 180, 200),     # kept
    ]
    edges, st = build_edges(mk_paf(rows), CFG, n_seqs=3)
    assert st.n_self == 1
    assert st.n_low_identity == 1
    assert st.n_short == 1
    assert st.n_internal == 1
    assert st.n_contained == 2
    assert st.n_high_overhang == 1
    assert st.n_kept == 1
    assert len(edges) == 2


def test_mirror_stitch_coords_reverse():
    # verify mirror ue/ve are flipped into rc coords
    paf = mk_paf([(0, 1000, 700, 950, 0, 1, 2000, 30, 280, 200, 250)])
    edges, _ = build_edges(paf, CFG, n_seqs=2)
    # mirror edge rc(t) -> rc(q): ue = tl - ts' = 2000-30, ve = ql - qs = 1000-700
    assert edges.ue[1] == 1970 and edges.ve[1] == 300
    # adv must equal EL1 = 700-30
    assert edges.adv[1] == 670


def test_geom_args_rescore_matches_stored_es():
    # device re-scoring from raw geometry must reproduce the stored scores bitwise
    from telomeri_tpu.kernels.scoring import score_arrays_np

    paf = mk_paf([
        (0, 1000, 800, 1000, 0, 1, 1000, 0, 200, 180, 200),
        (0, 1000, 700, 950, 1, 1, 2000, 1720, 1970, 200, 250),
    ])
    edges, _ = build_edges(paf, CFG, n_seqs=2)
    _, os_, _, es2 = score_arrays_np(*edges.geom_args())
    np.testing.assert_array_equal(es2, edges.es)
    np.testing.assert_array_equal(os_, edges.os_)
