"""Copy-coherence demotion (consensus/coherence.py, round 5): the wrong-copy
hijack defense measured in BASELINE.md's case study."""

import numpy as np

from telomeri_tpu.consensus.coherence import (
    annotate_pair_coherence,
    edge_coherence_rel,
)
from telomeri_tpu.scaffold.bridge import End, resolve_with_blockers


class _Edges:
    def __init__(self, src, dst, nm, bl):
        self.src = np.asarray(src, np.int32)
        self.dst = np.asarray(dst, np.int32)
        self.nm = np.asarray(nm, np.int32)
        self.bl = np.asarray(bl, np.int32)

    def __len__(self):
        return len(self.src)


def test_edge_coherence_rel_matches_numpy_percentile():
    rng = np.random.default_rng(0)
    n = 400
    src = rng.integers(0, 40, n) * 2
    # distinct sequences on the two sides (self rows are rule-1-filtered
    # upstream, so an edge never joins a sequence to itself)
    dst = ((src // 2 + 1 + rng.integers(0, 39, n)) % 40) * 2 + 1
    bl = rng.integers(500, 5000, n)
    nm = (bl * rng.uniform(0.8, 0.99, n)).astype(np.int64)
    e = _Edges(src, dst, nm, bl)
    rel = edge_coherence_rel(e)
    si = e.nm.astype(np.float64) / e.bl
    for i in rng.choice(n, 25, replace=False):
        p90 = []
        for node in (int(src[i]), int(dst[i])):
            s = node // 2
            inc = si[(src // 2 == s) | (dst // 2 == s)]
            p90.append(np.percentile(inc, 90))
        assert abs(rel[i] - (si[i] - min(p90))) < 1e-12


def test_incoherent_pair_loses_count_tie():
    """The measured failure: a wrong pair TIES a true pair's count and wins on
    rep_score; with the demotion the coherent pair wins the tie, and the
    wrong pair then dies on the used end. Untagged rows default coherent
    (legacy order unchanged)."""
    wrong = dict(pair=(131, 709), count=9, rep_score=9.9, rep_uid=1,
                 coherent=False)
    true_ = dict(pair=(708, 710), count=9, rep_score=5.0, rep_uid=2,
                 coherent=True)
    acc, _ = resolve_with_blockers([wrong, true_], [])
    pairs = [b.pair for b in acc]
    assert pairs[0] == (708, 710)
    assert (131, 709) not in pairs       # 354R already claimed by the truth
    # legacy rows without the flag keep the round-4 order (score tie-break)
    acc2, _ = resolve_with_blockers(
        [dict(wrong, coherent=True), true_], [])
    assert acc2[0].pair == (131, 709)


def test_annotate_pair_coherence_separates_cross_copy_paths(monkeypatch):
    """Pair logic on hand-built records with injected per-edge rel values
    (edge_coherence_rel's numerics are covered above; the end-to-end effect
    is measured in BASELINE.md's hg002-sub case study): the pair whose every
    path carries a below-margin edge is demoted; the pair with one clean
    path stays coherent; margin=0 disables."""
    import jax.numpy as jnp

    import telomeri_tpu.consensus.coherence as C
    from telomeri_tpu.consensus.grouping import (
        compress,
        group_and_select,
        summarize,
    )
    from telomeri_tpu.walk.engine import WalkResult

    src = [0, 8, 0, 12]
    dst = [8, 2, 12, 6]
    bl = [1000] * len(src)
    nm = [960] * len(src)
    edges = _Edges(src, dst, nm, bl)
    # edges 0,1 (the (0,2) path): above margin; edge 3 (on the (0,6) path):
    # at the cross-copy level
    monkeypatch.setattr(C, "edge_coherence_rel",
                        lambda e: np.array([0.02, 0.013, 0.02, 0.0004]))

    S = 4
    VB = 40

    def rec(a, interior, b, eids_):
        nodes = np.full(S + 1, -1, np.int32)
        eids = np.full(S, -1, np.int32)
        nodes[0] = a
        for j, x in enumerate(interior):
            nodes[1 + j] = x
        nodes[len(interior) + 1] = b
        for j, e in enumerate(eids_):
            eids[j] = e
        return nodes, eids, len(interior) + 1, b

    rows = [rec(0, (8,), 2, (0, 1)),           # pair (0,2) via read 4: clean
            rec(0, (8,), 2, (0, 1)),
            rec(0, (12,), 6, (2, 3)),          # pair (0,6) via read 6: cross
            rec(0, (12,), 6, (2, 3))]
    nodes = jnp.asarray(np.stack([r[0] for r in rows]))
    eids = jnp.asarray(np.stack([r[1] for r in rows]))
    steps = jnp.asarray(np.array([r[2] for r in rows], np.int32))
    term = jnp.asarray(np.array([r[3] for r in rows], np.int32))
    walks = WalkResult(
        nodes=nodes, eids=eids, steps=steps,
        success=jnp.ones(4, bool), terminal=term,
        path_len=jnp.full(4, 500, jnp.int32),
        score_sum=jnp.ones(4, jnp.float32))
    uid = jnp.arange(4, dtype=jnp.int32)
    cons = group_and_select(summarize(walks, uid, virtual_base=VB),
                            n_anchors=4, group_window=100, min_support=1,
                            support="read_diverse")
    out = compress(cons)
    n_inc = annotate_pair_coherence(out, cons, walks, edges, VB,
                                    margin=0.005)
    flags = {tuple(r["pair"]): r["coherent"] for r in out}
    assert flags[(0, 2)] is True
    assert flags[(0, 6)] is False and n_inc == 1
    # margin 0 disables
    n0 = annotate_pair_coherence(out, cons, walks, edges, VB, margin=0)
    assert n0 == 0 and all(r["coherent"] for r in out)
