"""Round-4 read-diverse consensus: path signatures, distinct-path support,
the cut-read gate (consensus/evidence.py), and rescue batch caps."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.consensus.evidence import interior_reads, read_diversity_gate
from telomeri_tpu.consensus.grouping import (
    compress,
    consensus_oracle,
    group_and_select,
    oracle_interior_key,
    path_signature,
    summarize,
)
from telomeri_tpu.walk.engine import WalkResult

VB = 40          # virtual_base: 4 anchors (nodes 0..7), reads 8..39, hops >= 40
S = 6            # max_steps of the hand-built records


def mk_walks(rows):
    """rows: (start, interior_tuple, terminal, success, path_len, score).
    Builds a WalkResult with nodes[0]=start, nodes[1:steps]=interior,
    nodes[steps]=terminal (the walk-record layout, walk/engine.py)."""
    w = len(rows)
    nodes = np.full((w, S + 1), -1, np.int32)
    eids = np.full((w, S), -1, np.int32)
    steps = np.zeros(w, np.int32)
    succ = np.zeros(w, bool)
    term = np.full(w, -1, np.int32)
    plen = np.zeros(w, np.int32)
    score = np.zeros(w, np.float32)
    for i, (a, interior, b, ok, pl, sc) in enumerate(rows):
        nodes[i, 0] = a
        for j, x in enumerate(interior):
            nodes[i, 1 + j] = x
        st = len(interior) + 1
        nodes[i, st] = b
        steps[i] = st
        succ[i] = ok
        term[i] = b if ok else -1
        plen[i] = pl
        score[i] = sc
    return WalkResult(
        nodes=jnp.asarray(nodes), eids=jnp.asarray(eids),
        steps=jnp.asarray(steps), success=jnp.asarray(succ),
        terminal=jnp.asarray(term), path_len=jnp.asarray(plen),
        score_sum=jnp.asarray(score))


def run_rd(walks, window=100, min_support=2, grouping="windowed"):
    uid = jnp.arange(walks.steps.shape[0], dtype=jnp.int32)
    cons = group_and_select(
        summarize(walks, uid, virtual_base=VB), n_anchors=4,
        group_window=window, min_support=min_support, grouping=grouping,
        support="read_diverse")
    return cons, compress(cons)


def test_signature_mirror_invariance():
    """The rc-direction walk of one physical path (reversed interior, all
    orientations flipped) must share its signature; a different path must not."""
    w = mk_walks([
        (0, (10, 12, 14), 2, True, 500, 1.0),
        (3, (15, 13, 11), 1, True, 500, 2.0),   # rc walk of row 0
        (0, (10, 12, 16), 2, True, 500, 3.0),   # different third read
    ])
    sig = np.asarray(path_signature(w.nodes, w.steps, jnp.int32(VB)))
    assert sig[0] == sig[1]
    assert sig[0] != sig[2]


def test_signature_ignores_virtual_hops():
    w = mk_walks([
        (0, (10, 12), 2, True, 500, 1.0),
        (0, (10, 41, 12), 2, True, 500, 1.0),   # same path via a hop node
    ])
    sig = np.asarray(path_signature(w.nodes, w.steps, jnp.int32(VB)))
    assert sig[0] == sig[1]
    assert oracle_interior_key(
        np.asarray(w.nodes)[1], int(w.steps[1]), VB) == (10, 12)


def test_distinct_path_support_collapses_duplicates():
    """50 re-samples of one path are ONE gate unit; density cannot inflate the
    rule-6 evidence gate (the round-4 invariant). The reported count stays the
    RAW walk count — the rule-1/4 ordering signal (see grouping.py rule 6:
    ordering by distinct count let diversity-rich wrong-copy webs win on
    hg002-sub)."""
    rows = [(0, (10, 12), 2, True, 500, 1.0)] * 50
    cons, out = run_rd(mk_walks(rows), min_support=2)
    assert out == []                       # 1 distinct path < min_support 2
    rows.append((0, (14, 16), 2, True, 520, 2.0))
    cons, out = run_rd(mk_walks(rows), min_support=2)
    assert len(out) == 1
    assert out[0]["count"] == 51           # raw walks (ordering signal)
    assert out[0]["distinct"] == 2         # distinct paths (gate unit)
    # win_distinct flags exactly one row per distinct path, in walk order
    wd = np.asarray(cons.win_distinct)
    assert wd.sum() == 2
    assert wd[0] and wd[50]                # first duplicate + the new path


def test_mirror_walks_are_one_unit():
    cons, out = run_rd(mk_walks([
        (0, (10, 12), 2, True, 500, 1.0),
        (3, (13, 11), 1, True, 500, 1.5),  # same path walked rc
    ]), min_support=2)
    assert out == []                       # still one distinct path


def test_cut_read_gate_refuses_shared_read():
    """Two distinct paths that both contain read 10 (oriented 20/21) are
    single-point evidence: refused. Disjoint-read paths pass."""
    walks = mk_walks([
        (0, (10, 20), 2, True, 500, 1.0),
        (0, (12, 20), 2, True, 510, 2.0),   # distinct, but read 10 in both
        (4, (14, 16), 6, True, 800, 3.0),
        (4, (18, 22), 6, True, 810, 4.0),   # disjoint reads
    ])
    cons, rows = run_rd(walks, min_support=2)
    assert len(rows) == 2
    kept, dropped = read_diversity_gate(rows, cons, walks, VB)
    assert [r["pair"] for r in kept] == [(4, 6)]
    assert len(dropped) == 1 and dropped[0]["cut_reads"] == [10]


def test_gate_direct_overlap_path_passes():
    """An empty-interior (direct contig-contig) path carries no reads, so the
    intersection is empty: direct overlap + one read path is accepted."""
    walks = mk_walks([
        (0, (), 2, True, 50, 1.0),
        (0, (10,), 2, True, 60, 2.0),
    ])
    cons, rows = run_rd(walks, min_support=2, window=100)
    assert len(rows) == 1 and rows[0]["count"] == 2
    kept, dropped = read_diversity_gate(rows, cons, walks, VB)
    assert len(kept) == 1 and not dropped
    assert interior_reads(np.asarray(walks.nodes)[0], 1, VB) == frozenset()


def test_read_diverse_matches_oracle_random(rng):
    """Device distinct counting (hashed sigs) ≡ exact-key scalar oracle on
    random records with deliberate duplicates, mirrors, and hop nodes."""
    rows = []
    for _ in range(300):
        a = int(rng.integers(0, 8))
        b = int(rng.integers(0, 8))
        ln = int(rng.integers(0, 5))
        interior = tuple(int(x) for x in rng.integers(8, VB, ln))
        if rng.random() < 0.15:  # sprinkle a hop node
            interior = interior + (int(rng.integers(VB, VB + 6)),)
        ok = bool(rng.random() < 0.8)
        pl = int(rng.integers(0, 12)) * 50
        sc = float(rng.integers(1, 30))
        rows.append((a, interior, b, ok, pl, sc))
        r = rng.random()
        if r < 0.3:   # exact duplicate, different score
            rows.append((a, interior, b, ok, pl, float(rng.integers(1, 30))))
        elif r < 0.5:  # rc-direction duplicate
            mirror = tuple(x ^ 1 for x in reversed(interior))
            rows.append((b ^ 1, mirror, a ^ 1, ok, pl,
                         float(rng.integers(1, 30))))
    walks = mk_walks(rows)
    uid = jnp.arange(len(rows), dtype=jnp.int32)
    s = summarize(walks, uid, virtual_base=VB)
    for grouping in ("windowed", "fixed"):
        got = compress(group_and_select(
            s, n_anchors=4, group_window=120, min_support=2, grouping=grouping,
            support="read_diverse"))
        want = consensus_oracle(
            s, n_anchors=4, group_window=120, min_support=2, grouping=grouping,
            support="read_diverse", nodes=np.asarray(walks.nodes),
            steps=np.asarray(walks.steps), virtual_base=VB)
        assert got == want, grouping


def test_rescue_plan_caps():
    """ADVICE r3: the rescue batch must stay bounded in the free-end count and
    inside the per-round uid block."""
    from telomeri_tpu.walk.rescue import (
        MAX_RESCUE_WALKS,
        RESCUE_UID_BASE,
        build_rescue_plan,
    )

    cfg = ScaffoldConfig(rescue_walks_per_end=2000)
    # few ends: full density
    plan, uid0 = build_rescue_plan([0, 1, 2, 3], cfg, round_ix=0)
    assert plan.n_active == 4 * 2000
    assert uid0 == RESCUE_UID_BASE
    # ~20k ends: per-end density shrinks, total stays capped
    ends = list(range(20_000))
    plan, _ = build_rescue_plan(ends, cfg, round_ix=1)
    assert plan.n_active == 20_000 * (MAX_RESCUE_WALKS // 20_000)
    assert len(plan) <= MAX_RESCUE_WALKS + cfg.walk_batch_multiple
    # 300k ends (> budget): end list truncated, 1 walk each, uids in block
    plan, uid0 = build_rescue_plan(list(range(300_000)), cfg, round_ix=2,
                                   mesh_size=8)
    assert len(plan) <= MAX_RESCUE_WALKS + 8 * cfg.walk_batch_multiple
    assert len(plan) < 1 << 24
    uids = np.asarray(plan.uid)
    assert uids.min() == uid0 == RESCUE_UID_BASE + 2 * (1 << 24)
    assert uids.max() < RESCUE_UID_BASE + 3 * (1 << 24)
    assert uids.max() <= np.iinfo(np.int32).max


def test_walk_count_mode_still_counts_raw():
    """Legacy support_mode="walk_count": duplicates DO inflate support."""
    rows = [(0, (10, 12), 2, True, 500, 1.0)] * 3
    walks = mk_walks(rows)
    uid = jnp.arange(3, dtype=jnp.int32)
    out = compress(group_and_select(
        summarize(walks, uid, virtual_base=VB), n_anchors=4, group_window=100,
        min_support=2, support="walk_count"))
    assert len(out) == 1 and out[0]["count"] == 3


def test_config_support_mode_validation():
    import pytest

    with pytest.raises(ValueError, match="support_mode"):
        ScaffoldConfig(support_mode="bogus")
    assert dataclasses.replace(
        ScaffoldConfig(), support_mode="walk_count").support_mode == "walk_count"


def test_split_mapped_breakpoint_detection():
    """io/geometry.py split_mapped: a read whose alignment intervals meet at
    an unspanned interior breakpoint is flagged; clean tiling is not."""
    from telomeri_tpu.io.geometry import split_mapped
    from telomeri_tpu.io.paf import PafRecords

    def mk(rows):
        a = np.array(rows, np.int64)
        return PafRecords(
            qid=a[:, 0].astype(np.int32), qlen=a[:, 1].astype(np.int32),
            qstart=a[:, 2].astype(np.int32), qend=a[:, 3].astype(np.int32),
            strand=a[:, 4].astype(np.int8), tid=a[:, 5].astype(np.int32),
            tlen=a[:, 6].astype(np.int32), tstart=a[:, 7].astype(np.int32),
            tend=a[:, 8].astype(np.int32), nmatch=a[:, 9].astype(np.int32),
            blocklen=a[:, 10].astype(np.int32))

    # read 0 (len 3000): chimera — left cluster ends ~1500, right starts ~1500,
    # nothing crosses. read 3: clean — intervals overlap deeply through it.
    rows = [
        (0, 3000, 0, 1480, 0, 1, 5000, 0, 1480, 1400, 1480),
        (0, 3000, 1520, 3000, 0, 2, 5000, 0, 1480, 1400, 1480),
        (3, 3000, 0, 2000, 0, 4, 5000, 0, 2000, 1900, 2000),
        (3, 3000, 1200, 3000, 0, 5, 5000, 0, 1800, 1700, 1800),
    ]
    flags = split_mapped(mk(rows), 6, min_overlap=100)
    assert flags[0] and not flags[3]
    # intervals touching exactly (overlap 0 < margin) also flag
    rows2 = [
        (0, 3000, 0, 1500, 0, 1, 5000, 0, 1500, 1400, 1500),
        (0, 3000, 1500, 3000, 0, 2, 5000, 0, 1500, 1400, 1500),
    ]
    assert split_mapped(mk(rows2), 3, min_overlap=100)[0]
    # malformed rows never flag a read
    rows3 = [(0, 3000, 0, 9000, 0, 1, 5000, 0, 1500, 1400, 1500)]
    assert not split_mapped(mk(rows3), 3, min_overlap=100).any()


def test_cut_read_gate_clean_spanning_read_accepted():
    """A cut read that is NOT split-mapped is a clean spanning read: the
    bridge is accepted (round 3 refused it as chimera-indistinguishable; the
    mapping geometry distinguishes them)."""
    walks = mk_walks([
        (0, (10, 20), 2, True, 500, 1.0),
        (0, (12, 20), 2, True, 510, 2.0),   # cut read 10 (node 20//2)
    ])
    cons, rows = run_rd(walks, min_support=2)
    split = np.zeros(30, bool)
    kept, blocked = read_diversity_gate(rows, cons, walks, VB, split_read=split)
    assert len(kept) == 1 and not blocked
    assert kept[0]["cut_reads"] == [10]
    # same pair with the cut read split-mapped: blocked
    split[10] = True
    kept, blocked = read_diversity_gate(rows, cons, walks, VB, split_read=split)
    assert not kept and len(blocked) == 1
    # no split info at all: conservative block
    kept, blocked = read_diversity_gate(rows, cons, walks, VB, split_read=None)
    assert not kept and len(blocked) == 1


def test_cut_read_gate_fails_closed_on_anomaly():
    """VERDICT r4 weak 3: a bridge row whose pair has NO flagged distinct
    paths signals win_distinct/compress drift upstream. The unsafe direction
    is accepting it — the gate must refuse AND block its ends (the round-4
    code kept it with a warning)."""
    walks = mk_walks([
        (0, (10, 20), 2, True, 500, 1.0),
        (0, (12, 22), 2, True, 510, 2.0),
    ])
    cons, rows = run_rd(walks, min_support=2)
    assert rows                                 # the real pair is present
    phantom = dict(rows[0], pair=(5, 7))        # pair with no flagged paths
    kept, blocked = read_diversity_gate(
        rows + [phantom], cons, walks, VB, split_read=np.zeros(30, bool))
    assert all(tuple(r["pair"]) != (5, 7) for r in kept)
    anom = [b for b in blocked if tuple(b["pair"]) == (5, 7)]
    assert len(anom) == 1 and anom[0].get("gate_anomaly") is True
    # the genuine row is unaffected
    assert any(tuple(r["pair"]) == tuple(rows[0]["pair"]) for r in kept)


def test_blockers_claim_ends_in_order():
    """bridge.resolve_with_blockers: a refused (blocked) pair claims its ends
    at its support rank, so a weaker bridge cannot take them; blocked ends
    seed later rounds via pre_blocked."""
    from telomeri_tpu.scaffold.bridge import End, resolve_with_blockers

    strong_blocked = dict(pair=(0, 2), count=100, rep_score=9.0, rep_uid=1)
    weak_wrong = dict(pair=(0, 6), count=3, rep_score=5.0, rep_uid=2)
    other = dict(pair=(4, 6), count=10, rep_score=5.0, rep_uid=3)
    acc, blocked_ends = resolve_with_blockers(
        [weak_wrong, other], [strong_blocked])
    pairs = {b.pair for b in acc}
    assert (0, 6) not in pairs          # end 0R blocked by the refused pair
    assert (4, 6) in pairs
    assert End(0, True) in blocked_ends and End(1, False) in blocked_ends
    # pre_blocked seeds the next round's used set
    acc2, be2 = resolve_with_blockers(
        [weak_wrong], [], pre_blocked=blocked_ends)
    assert not acc2 and be2 == blocked_ends


def test_split_detection_ignores_self_and_junk_rows():
    """Review r4: a self-hit row (read vs itself — filter rule 1's own case)
    or a junk sub-min_identity row spanning the breakpoint must NOT un-flag a
    chimera: only real, non-self alignments count as spanning evidence."""
    from telomeri_tpu.io.geometry import split_evidence_mask, split_mapped
    from telomeri_tpu.io.paf import PafRecords

    def mk(rows):
        a = np.array(rows, np.int64)
        return PafRecords(
            qid=a[:, 0].astype(np.int32), qlen=a[:, 1].astype(np.int32),
            qstart=a[:, 2].astype(np.int32), qend=a[:, 3].astype(np.int32),
            strand=a[:, 4].astype(np.int8), tid=a[:, 5].astype(np.int32),
            tlen=a[:, 6].astype(np.int32), tstart=a[:, 7].astype(np.int32),
            tend=a[:, 8].astype(np.int32), nmatch=a[:, 9].astype(np.int32),
            blocklen=a[:, 10].astype(np.int32))

    chimera = [
        (0, 3000, 0, 1480, 0, 1, 5000, 0, 1480, 1400, 1480),
        (0, 3000, 1520, 3000, 0, 2, 5000, 0, 1480, 1400, 1480),
    ]
    self_row = [(0, 3000, 0, 3000, 0, 0, 3000, 0, 3000, 3000, 3000)]
    junk_row = [(0, 3000, 100, 2900, 0, 3, 5000, 0, 2800, 500, 2800)]  # SI 0.18
    for extra in (self_row, junk_row, self_row + junk_row):
        paf = mk(chimera + extra)
        mask = split_evidence_mask(paf, min_identity=0.70)
        flags = split_mapped(paf, 6, min_overlap=100, row_mask=mask)
        assert flags[0], f"chimera un-flagged by {extra}"
    # the DEFAULT mask already drops self rows; sub-identity junk is what
    # needs the full evidence mask (split_evidence_mask) to be excluded
    assert split_mapped(mk(chimera + self_row), 6, min_overlap=100)[0]
    assert not split_mapped(mk(chimera + junk_row), 6, min_overlap=100)[0]


def test_split_detection_ignores_contained_intervals():
    """Advisor r4 (medium): an interval fully CONTAINED in the running reach
    (ends <= prev_run) that happens to start within min_overlap of the reach
    tip must NOT mark a breakpoint — earlier alignments already span past it.
    Before the fix such a read was false-flagged, its true junction refused
    AND its ends blocked (excluded from rescue): silently unbridged."""
    from telomeri_tpu.io.geometry import split_mapped
    from telomeri_tpu.io.paf import PafRecords

    def mk(rows):
        a = np.array(rows, np.int64)
        return PafRecords(
            qid=a[:, 0].astype(np.int32), qlen=a[:, 1].astype(np.int32),
            qstart=a[:, 2].astype(np.int32), qend=a[:, 3].astype(np.int32),
            strand=a[:, 4].astype(np.int8), tid=a[:, 5].astype(np.int32),
            tlen=a[:, 6].astype(np.int32), tstart=a[:, 7].astype(np.int32),
            tend=a[:, 8].astype(np.int32), nmatch=a[:, 9].astype(np.int32),
            blocklen=a[:, 10].astype(np.int32))

    clean = [
        (0, 3000, 0, 2000, 0, 1, 5000, 0, 2000, 1900, 2000),
        (0, 3000, 1200, 3000, 0, 2, 5000, 0, 1800, 1700, 1800),
    ]
    # short interval contained in the reach (2000) starting near its tip
    tip_contained = [(0, 3000, 1950, 1990, 0, 3, 5000, 0, 40, 38, 40)]
    assert not split_mapped(mk(clean + tip_contained), 6, min_overlap=100)[0]
    # sort-order robustness: same rows with the contained interval first
    assert not split_mapped(mk(tip_contained + clean), 6, min_overlap=100)[0]
    # a real chimera stays flagged with a contained interval in its left cluster
    chimera = [
        (4, 3000, 0, 1480, 0, 1, 5000, 0, 1480, 1400, 1480),
        (4, 3000, 1400, 1450, 0, 3, 5000, 0, 50, 48, 50),   # contained, near tip
        (4, 3000, 1520, 3000, 0, 2, 5000, 0, 1480, 1400, 1480),
    ]
    assert split_mapped(mk(chimera), 6, min_overlap=100)[4]


def test_index_cache_overwrite_crash_leaves_miss(tmp_path, monkeypatch):
    """Review r4: overwriting a cache for a DIFFERENT reference must never
    leave the old fingerprint paired with new arrays — a crash after the
    array writes but before the new fp lands must read back as a MISS."""
    import os as _os

    import numpy as _np

    from telomeri_tpu.utils.validate import _cached_index

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ga = bases[rng.integers(0, 4, 30_000)]
    gb = bases[rng.integers(0, 4, 30_000)]
    stem = str(tmp_path / "x.idx")
    _cached_index(ga, 24, stem)                  # cache holds A + fp_A

    real_replace = _os.replace

    def crashing_replace(src, dst):
        if dst.endswith(".fp.npy"):
            raise OSError("simulated crash before the new fp lands")
        return real_replace(src, dst)
    monkeypatch.setattr(_os, "replace", crashing_replace)
    _cached_index(gb, 24, stem)                  # overwrites arrays, fp write dies
    monkeypatch.undo()

    assert not _os.path.exists(stem + ".fp.npy")  # old fp was removed FIRST
    idx = _cached_index(ga, 24, stem)            # must rebuild, not stale-hit
    fresh = _cached_index(ga, 24, None)
    _np.testing.assert_array_equal(np.asarray(idx.sorted_km),
                                   np.asarray(fresh.sorted_km))


def test_rescue_walks_per_end_zero_means_no_rescue(tmp_path):
    """Review r4: an explicit rescue_walks_per_end=0 must run NO rescue walks
    (the budget division's 1-walk floor must not override it)."""
    from telomeri_tpu.pipeline import run_pipeline
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    sim = simulate(SimConfig(genome_len=60_000, repeat_len=2_000,
                             n_repeat_copies=2, read_len_mean=2_000,
                             coverage=10.0, error_rate=0.02, seed=2))
    d = str(tmp_path / "data")
    write_dataset(sim, d)
    args = (f"{d}/contigs.fa", f"{d}/reads.fa", f"{d}/read2contig.paf",
            f"{d}/read2read.paf")
    # starve the base round so free ends EXIST for rescue to be tempted by
    base = ScaffoldConfig(mc_walks_per_end=1, min_group_support=5)
    off = dataclasses.replace(base, rescue_rounds=0)
    zero = dataclasses.replace(base, rescue_rounds=3, rescue_walks_per_end=0)
    r_off = run_pipeline(*args, str(tmp_path / "off.fa"), off)
    r_zero = run_pipeline(*args, str(tmp_path / "zero.fa"), zero)
    assert r_zero.metrics.values.get("n_bridges_rescued", 0) == 0
    assert open(tmp_path / "off.fa", "rb").read() == \
        open(tmp_path / "zero.fa", "rb").read()
