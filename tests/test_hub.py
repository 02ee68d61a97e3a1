"""Degree-skew (hub) handling: hierarchical CSR rows (graph/tensorize.py).

Round-1 verdict item 3: uniform-K top-K truncation silently dropped edges on
degree-skewed graphs, biasing MC sampling and potentially deleting the correct
bridge path. These tests build graphs whose correct bridge edge ranks BELOW K by
ES and prove (a) the engine still matches the scalar oracle bit-for-bit through
virtual nodes, (b) the bridge is recovered, (c) bridges equal the flat
(big-K, no-hub) layout's bridges.
"""

import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.consensus.grouping import compress, group_and_select, summarize
from telomeri_tpu.graph.tensorize import tensorize
from telomeri_tpu.io.geometry import EdgeSoA
from telomeri_tpu.walk.engine import run_walks_host
from telomeri_tpu.walk.oracle import jax_choice_fn, walk_oracle
from telomeri_tpu.walk.plan import MODE_MC, plan_walks


def mk_edges(rows):
    """rows: list of (src, dst, es, os, adv)."""
    n = len(rows)
    a = np.array(rows, dtype=np.float64)
    return EdgeSoA(
        src=a[:, 0].astype(np.int32), dst=a[:, 1].astype(np.int32),
        os_=a[:, 3].astype(np.float32), es=a[:, 2].astype(np.float32),
        adv=a[:, 4].astype(np.int32), ue=np.zeros(n, np.int32),
        ve=np.zeros(n, np.int32), row=np.arange(n, dtype=np.int32),
    )


def hub_bridge_problem(n_decoys=30):
    """Anchors 0,1; the path 0 -> hub read -> good read -> anchor 1 exists, but
    the hub's edge to the good read ranks LAST by ES among n_decoys+1 edges.
    Decoy reads are dead ends. With K=8, round-1 truncation dropped the good
    edge entirely; the hierarchy must keep it reachable."""
    # sequence ids: 0,1 contigs; 2 = hub read; 3 = good read; 4.. = decoys
    hub = 2 * 2          # oriented node of read 2 (forward)
    good = 2 * 3
    anchor_b = 2 * 1     # forward node of contig 1
    rows = [(0, hub, 500.0, 500.0, 100)]
    for i in range(n_decoys):
        d = 2 * (4 + i)
        # decoys outrank the good edge but keep P(good) ~ 5/(12*n+5) samplable
        rows.append((hub, d, 12.0 - 0.01 * i, 12.0 - 0.01 * i, 100))
    rows.append((hub, good, 5.0, 5.0, 100))                 # good edge: LOWEST ES
    rows.append((good, anchor_b, 800.0, 800.0, 100))
    n_seqs = 4 + n_decoys
    return mk_edges(rows), np.full(n_seqs, 1000, np.int64), 2


def bridges_for(max_degree, mc_walks=400, seed=0):
    edges, seq_len, n_anchors = hub_bridge_problem()
    cfg = ScaffoldConfig(max_degree=max_degree, mc_walks_per_end=mc_walks,
                         max_steps=8, mc_seed=seed, min_group_support=2)
    g = tensorize(edges, seq_len, n_anchors, cfg)
    plan = plan_walks(g, cfg)
    walks = run_walks_host(g, plan, cfg)
    cons = group_and_select(
        summarize(walks, plan.uid), n_anchors=n_anchors,
        group_window=cfg.group_window, min_support=cfg.min_group_support)
    return g, compress(cons)


def test_hub_bridge_recovered_despite_low_rank():
    g, bridges = bridges_for(max_degree=8)
    assert g.stats["n_hub_nodes"] >= 1 and g.stats["n_virtual_nodes"] >= 1
    pairs = {b["pair"] for b in bridges}
    assert (0, 2) in pairs or (3, 1) in pairs, bridges  # canonical (0,2)


def test_hub_bridges_equal_flat_layout():
    """Zero truncation-induced bridge changes (verdict item 3 'done' criterion):
    the hierarchical small-K layout finds the same bridges as a flat layout
    whose K covers the full degree."""
    g_h, b_h = bridges_for(max_degree=8)
    g_f, b_f = bridges_for(max_degree=64)
    assert g_h.stats["n_virtual_nodes"] > 0 and g_f.stats["n_virtual_nodes"] == 0
    assert {b["pair"] for b in b_h} == {b["pair"] for b in b_f}


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_hub_engine_matches_oracle(mode):
    edges, seq_len, n_anchors = hub_bridge_problem()
    cfg = ScaffoldConfig(max_degree=8, mc_walks_per_end=30, max_steps=8, mc_seed=3)
    g = tensorize(edges, seq_len, n_anchors, cfg)
    plan = plan_walks(g, cfg)
    res = run_walks_host(g, plan, cfg)
    choice = jax_choice_fn(cfg.mc_seed, cfg.max_steps)
    sel = np.flatnonzero(plan.active & (plan.mode == mode))
    assert len(sel)
    for i in sel:
        o = walk_oracle(g, int(plan.start[i]), int(plan.first_edge[i]), mode,
                        int(plan.uid[i]), cfg.max_steps, choice)
        n_real = o.steps + 1
        assert list(res.nodes[i][:n_real]) == o.nodes, f"walk {i}"
        assert res.steps[i] == o.steps
        assert bool(res.success[i]) == o.success
        assert res.terminal[i] == o.terminal
        assert res.path_len[i] == o.path_len


def test_hub_mc_distribution_matches_flat_weights():
    """P(leaf edge) must equal w_leaf / total exactly; empirically the hub's
    first-step leaf frequencies match the flat row's within sampling noise."""
    edges, seq_len, n_anchors = hub_bridge_problem(n_decoys=20)
    freqs = {}
    for max_degree, tag in ((8, "hier"), (64, "flat")):
        cfg = ScaffoldConfig(max_degree=max_degree, mc_walks_per_end=4000,
                             max_steps=8, mc_seed=7)
        g = tensorize(edges, seq_len, n_anchors, cfg)
        plan = plan_walks(g, cfg)
        res = run_walks_host(g, plan, cfg)
        mc = plan.active & (plan.mode == MODE_MC) & (plan.start == 0)
        # first-step leaf of each MC walk = second real node on the path;
        # walks reach the hub deterministically (single edge from anchor 0)
        vb = g.virtual_base
        leaves = []
        for i in np.flatnonzero(mc):
            nodes = [n for n in res.nodes[i][1:] if n >= 0 and n < vb]
            if len(nodes) >= 2:
                leaves.append(int(nodes[1]))
        vals, counts = np.unique(leaves, return_counts=True)
        freqs[tag] = dict(zip(vals.tolist(), (counts / counts.sum()).tolist()))
    for node, f_flat in freqs["flat"].items():
        f_h = freqs["hier"].get(node, 0.0)
        assert abs(f_h - f_flat) < 0.02, (node, f_h, f_flat)


def test_hub_path_extraction_strips_virtual_nodes():
    from telomeri_tpu.scaffold.stitch import extract_path

    edges, seq_len, n_anchors = hub_bridge_problem()
    cfg = ScaffoldConfig(max_degree=8, mc_walks_per_end=400, max_steps=8)
    g = tensorize(edges, seq_len, n_anchors, cfg)
    plan = plan_walks(g, cfg)
    res = run_walks_host(g, plan, cfg)
    ok = np.flatnonzero(res.success)
    assert len(ok)
    hit_virtual = 0
    for i in ok:
        raw = [int(n) for n in res.nodes[i][: int(res.steps[i]) + 1]]
        if any(n >= g.virtual_base for n in raw):
            hit_virtual += 1
        wp = extract_path(res.nodes[i], res.eids[i], int(res.steps[i]),
                          virtual_base=g.virtual_base)
        assert all(n < g.virtual_base for n in wp.nodes)
        assert all(e >= 0 for e in wp.eids)
        # stripped path is edge-consistent: src/dst of every eid match the walk
        for a, e, b in zip(wp.nodes, wp.eids, wp.nodes[1:]):
            assert int(edges.src[e]) == a and int(edges.dst[e]) == b
    assert hit_virtual > 0  # the hierarchy was actually exercised
