"""Simulator self-consistency: PAF coordinates and match counts must agree with
the actual sequence content — positionally for substitution-only data, and up to
alignment (scalar Levenshtein bound) for indel-bearing data."""

import numpy as np
import pytest

from telomeri_tpu.io.fasta import reverse_complement
from telomeri_tpu.sim import SimConfig, simulate


def test_sim_shapes(toy_sim):
    d = toy_sim
    assert len(d.contigs) == 3          # n_repeat_copies=2 -> 3 unique regions
    assert len(d.reads) > 100
    assert len(d.paf_read_contig) > 0 and len(d.paf_read_read) > 0


def _check_row_positional(cols, seqs_by_name, read_names):
    qn, ql, qs, qe, strand, tn, tl, ts, te, nm, bl = cols[:11]
    ql, qs, qe, tl, ts, te, nm, bl = map(int, (ql, qs, qe, tl, ts, te, nm, bl))
    q = seqs_by_name[qn]
    t = seqs_by_name[tn]
    assert len(q) == ql and len(t) == tl
    assert qe - qs == te - ts == bl
    qseq = q[qs:qe]
    # strand '-': query forward aligns to the RC of the target block (ts/te stay forward)
    tseq = t[ts:te] if strand == "+" else reverse_complement(t[ts:te])
    matches = int(np.sum(qseq == tseq))
    if tn not in read_names:
        # contigs are error-free: event-counted nmatch is exact
        assert matches == nm, (qn, tn, matches, nm)
    else:
        # read-read rows: both reads substituting a position to the SAME base is a
        # positional match the conservative event count calls a mismatch
        assert nm <= matches <= nm + max(3, (te - ts) // 100), (qn, tn, matches, nm)


def test_paf_rows_exact(toy_sim):
    d = toy_sim
    seqs = {n: s for n, s in zip(d.contig_names, d.contigs)}
    seqs.update({n: s for n, s in zip(d.read_names, d.reads)})
    rnames = set(d.read_names)
    for row in d.paf_read_contig[:200] + d.paf_read_read[:200]:
        _check_row_positional(row.split("\t"), seqs, rnames)


def test_error_free_rows_full_identity():
    d = simulate(SimConfig(genome_len=20000, repeat_len=1500, error_rate=0.0, seed=3))
    for row in d.paf_read_contig[:50]:
        cols = row.split("\t")
        assert int(cols[9]) == int(cols[10])  # nmatch == blocklen when no errors


# ---------------- indel-bearing simulation (round 2) ----------------

def _lev(a: np.ndarray, b: np.ndarray) -> int:
    """Levenshtein distance, numpy row DP (test oracle; O(len(a)) vectorized rows).

    The serial insertion chain cur[j] = min(cur[j], cur[j-1]+1) is resolved with
    the prefix-min identity: min over i<=j of (cur[i] + (j-i)) =
    (running min of cur[i]-i) + j."""
    idx = np.arange(len(b) + 1, dtype=np.int32)
    prev = idx.copy()
    for i in range(1, len(a) + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        cur[1:] = np.minimum(prev[:-1] + (b != a[i - 1]), prev[1:] + 1)
        cur = np.minimum(cur, np.minimum.accumulate(cur - idx) + idx)
        prev = cur
    return int(prev[-1])


INDEL_CFG = SimConfig(genome_len=12_000, repeat_len=800, n_repeat_copies=2,
                      read_len_mean=700, read_len_sd=100, read_min_len=250,
                      coverage=8.0, error_rate=0.02, ins_rate=0.03, del_rate=0.03,
                      min_sim_overlap=150, seed=9)


def _check_row_alignment(cols, seqs_by_name):
    """Indel rows: coordinates must be alignment-consistent — the oriented query
    block aligns to the target block with at most (blocklen - nmatch) edits."""
    qn, ql, qs, qe, strand, tn, tl, ts, te, nm, bl = cols[:11]
    ql, qs, qe, tl, ts, te, nm, bl = map(int, (ql, qs, qe, tl, ts, te, nm, bl))
    q, t = seqs_by_name[qn], seqs_by_name[tn]
    assert len(q) == ql and len(t) == tl
    assert 0 <= qs < qe <= ql and 0 <= ts < te <= tl
    qseq = q[qs:qe]
    tseq = t[ts:te] if strand == "+" else reverse_complement(t[ts:te])
    budget = bl - nm
    d = _lev(qseq, tseq)
    assert d <= budget, (qn, tn, d, budget)
    # and the blocks genuinely differ in length when indel counts are asymmetric
    assert abs(len(qseq) - len(tseq)) <= budget


@pytest.fixture(scope="module")
def indel_sim():
    return simulate(INDEL_CFG)


def test_indel_rows_alignment_consistent(indel_sim):
    d = indel_sim
    seqs = {n: s for n, s in zip(d.contig_names, d.contigs)}
    seqs.update({n: s for n, s in zip(d.read_names, d.reads)})
    rows = d.paf_read_contig[:80] + d.paf_read_read[:80]
    assert rows
    n_len_diff = 0
    for row in rows:
        cols = row.split("\t")
        _check_row_alignment(cols, seqs)
        if (int(cols[3]) - int(cols[2])) != (int(cols[8]) - int(cols[7])):
            n_len_diff += 1
    # indels must actually show up as differing aligned-span lengths
    assert n_len_diff > len(rows) // 4


def test_jittered_rows_alignment_consistent():
    d = simulate(SimConfig(genome_len=12_000, repeat_len=800, n_repeat_copies=2,
                           read_len_mean=700, read_len_sd=100, read_min_len=250,
                           coverage=6.0, error_rate=0.02, ins_rate=0.02,
                           del_rate=0.02, end_jitter=20, min_sim_overlap=150,
                           seed=11))
    seqs = {n: s for n, s in zip(d.contig_names, d.contigs)}
    seqs.update({n: s for n, s in zip(d.read_names, d.reads)})
    for row in d.paf_read_contig[:60] + d.paf_read_read[:60]:
        _check_row_alignment(row.split("\t"), seqs)


def test_readmap_coordinates(indel_sim):
    d = indel_sim
    for ri in range(0, len(d.reads), 37):
        m = d.read_maps[ri]
        assert m.r(m.a) == 0
        assert m.r(m.b) == m.length == len(d.reads[ri])
        xs = np.linspace(m.a, m.b, 9).astype(int)
        rs = [m.r(int(x)) for x in xs]
        assert all(r2 >= r1 for r1, r2 in zip(rs, rs[1:]))  # monotone


def test_substitution_only_matches_round1_stream():
    """With ins/del/jitter off, the RNG draw order is unchanged from round 1, so
    substitution-only datasets (incl. the checked-in lambda toy) are reproducible."""
    cfg = SimConfig(genome_len=20_000, repeat_len=1_500, seed=5)
    d1, d2 = simulate(cfg), simulate(cfg)
    assert all(np.array_equal(a, b) for a, b in zip(d1.reads, d2.reads))
    assert d1.paf_read_read == d2.paf_read_read


CHIM_CFG = SimConfig(
    genome_len=200_000, repeat_len=4_000, n_repeat_copies=4,
    read_len_mean=3_000, read_len_sd=500, coverage=12.0,
    error_rate=0.02, ins_rate=0.01, del_rate=0.01, end_jitter=20,
    chimera_rate=0.1, seed=9)


def test_chimeric_reads_split_paf_rows():
    """A chimeric read maps as TWO disjoint query intervals (same name, same
    full length) to unrelated loci — and every row, including the offset /
    reverse-strand second segment, stays alignment-consistent (sim.py AlignUnit
    coordinate math vs the actual concatenated sequence)."""
    d = simulate(CHIM_CFG)
    assert d.chimeric
    seqs = {n: s for n, s in zip(d.contig_names, d.contigs)}
    seqs.update({n: s for n, s in zip(d.read_names, d.reads)})
    n_checked = 0
    for ri in d.chimeric[:20]:
        name = d.read_names[ri]
        rows = [r.split("\t") for r in d.paf_read_contig
                if r.split("\t", 1)[0] == name]
        if len(rows) < 2:
            continue   # a segment may fall entirely inside a repeat (no contig row)
        # disjoint query intervals
        ivs = sorted((int(c[2]), int(c[3])) for c in rows)
        for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
            assert b1 <= a2 or (a1, b1) == (a2, b2), (name, ivs)
        # both segments' coordinates are real alignments of the concatenated read
        for cols in rows:
            _check_row_alignment(cols, seqs)
            n_checked += 1
    assert n_checked >= 4
    # read-read rows involving a chimera are alignment-consistent too
    chim_names = {d.read_names[i] for i in d.chimeric}
    rr = [r.split("\t") for r in d.paf_read_read
          if r.split("\t", 1)[0] in chim_names][:30]
    assert rr
    for cols in rr:
        _check_row_alignment(cols, seqs)


def test_chimera_off_stream_identical():
    """chimera_rate=0 / dropouts off: the simulator stays deterministic with
    indel+jitter knobs on. (The actual round-2 stream-compat guarantee is
    pinned by tests/test_golden.py's CHECKED-IN lambda dataset + FASTA
    byte-equality, which predates the AlignUnit refactor.)"""
    base = SimConfig(genome_len=30_000, repeat_len=1_500, end_jitter=10,
                     ins_rate=0.01, del_rate=0.01, seed=6)
    d1 = simulate(base)
    d2 = simulate(SimConfig(**{**base.__dict__}))
    assert d1.paf_read_contig == d2.paf_read_contig
    assert d1.paf_read_read == d2.paf_read_read


def test_coverage_dropout():
    d = simulate(SimConfig(
        genome_len=120_000, repeat_len=3_000, n_repeat_copies=2,
        read_len_mean=2_500, coverage=15.0, error_rate=0.02,
        n_dropouts=1, dropout_len=9_000, seed=4))
    assert len(d.dropouts) == 1
    s, e = d.dropouts[0]
    cov = np.zeros(120_000, np.int32)
    for (a, b, _st) in d.read_pos:
        cov[a:b] += 1
    assert cov[s:e].max() == 0, "reads survived inside the dropout"
    assert cov[: max(s - 5_000, 1)].mean() > 5, "coverage elsewhere collapsed"


def test_dropout_explicit_placement():
    d = simulate(SimConfig(
        genome_len=120_000, repeat_len=3_000, n_repeat_copies=2,
        read_len_mean=2_500, coverage=10.0, error_rate=0.02,
        dropout_len=5_000, dropout_starts=(40_000,), seed=4))
    assert d.dropouts == [(40_000, 45_000)]


# ---------------- inverted / tandem repeats + het bubbles (round 4) ----------------

def test_inverted_copy_planted_as_rc():
    """The inverted copy's genome segment is the RC of a normal copy's (exact
    copies, no divergence)."""
    cfg = SimConfig(genome_len=60_000, repeat_len=2_000, n_repeat_copies=2,
                    inverted_copies=(1,), seed=3)
    d = simulate(cfg)
    # copies sit between contigs: contig0.end..contig1.start etc.
    (a0, b0), (a1, b1), (a2, b2) = d.contig_pos
    copy0 = d.genome[b0:a1]
    copy1 = d.genome[b1:a2]
    assert len(copy0) == len(copy1) == 2_000
    assert np.array_equal(copy1, reverse_complement(copy0))
    assert not np.array_equal(copy1, copy0)


def test_inverted_cross_rows_sequence_consistent():
    """Cross-copy rows between a NORMAL and an INVERTED copy must be real
    alignments of the actual read sequences — the strand flip and coordinate
    mirror are verified against content, not trusted. (A wrong orientation
    would collapse positional matches to ~25%, far below nmatch.)"""
    cfg = SimConfig(genome_len=120_000, repeat_len=4_000, n_repeat_copies=2,
                    read_len_mean=2_500, read_len_sd=300, coverage=10.0,
                    error_rate=0.01, cross_copy_overlaps=True,
                    copy_divergence=0.02, inverted_copies=(1,), seed=17)
    d = simulate(cfg)
    # cross rows = suffix beyond the plain read-read sweep; recompute the
    # baseline length by simulating with cross rows off (identical streams:
    # no jitter, both runs draw the same numbers before cross emission)
    import dataclasses
    d0 = simulate(dataclasses.replace(cfg, cross_copy_overlaps=False))
    cross = d.paf_read_read[len(d0.paf_read_read):]
    assert len(cross) > 20, "no cross rows between the two copies"
    seqs = {n: s for n, s in zip(d.contig_names, d.contigs)}
    seqs.update({n: s for n, s in zip(d.read_names, d.reads)})
    rnames = set(d.read_names)
    for row in cross[:80]:
        # slack covers coincident same-base mutations (divergence + errors)
        _check_row_positional(row.split("\t"), seqs, rnames)


def test_tandem_block_layout():
    """tandem_pairs=1 with 3 copies: one 2L block + one L block -> 3 contigs,
    and the tandem block's interior junction has NO contig."""
    cfg = SimConfig(genome_len=120_000, repeat_len=3_000, n_repeat_copies=3,
                    tandem_pairs=1, read_len_mean=2_000, seed=5)
    d = simulate(cfg)
    assert len(d.contigs) == 3                       # blocks+1
    (a0, b0), (a1, b1), (a2, b2) = d.contig_pos
    assert a1 - b0 == 6_000                          # tandem block = 2L
    assert a2 - b1 == 3_000                          # single block = L
    block = d.genome[b0:a1]
    assert np.array_equal(block[:3_000], block[3_000:])   # back-to-back copies


def test_tandem_stream_compat():
    """tandem_pairs=0 keeps the round-3 layout and RNG stream byte-identical."""
    cfg = SimConfig(genome_len=30_000, repeat_len=1_500, seed=5)
    d = simulate(cfg)
    # same numbers as test_substitution_only_matches_round1_stream's dataset
    d2 = simulate(SimConfig(genome_len=30_000, repeat_len=1_500, seed=5,
                            tandem_pairs=0, inverted_copies=(), het_rate=0.0))
    assert d.paf_read_read == d2.paf_read_read
    assert d.paf_read_contig == d2.paf_read_contig


def test_het_bubble_rows_sequence_consistent():
    """Het sites appear only in unique regions; rows between opposite-haplotype
    reads (and hap-1 reads vs contigs) carry the het mismatches in nmatch —
    verified against actual sequence content."""
    cfg = SimConfig(genome_len=60_000, repeat_len=2_000, n_repeat_copies=2,
                    read_len_mean=2_000, read_len_sd=200, coverage=10.0,
                    error_rate=0.01, het_rate=0.002, seed=23)
    d = simulate(cfg)
    assert d.het_pos.size > 20
    # het sites avoid repeat blocks
    for (a, b) in zip([p[1] for p in d.contig_pos[:-1]],
                      [p[0] for p in d.contig_pos[1:]]):
        assert not ((d.het_pos >= a) & (d.het_pos < b)).any()
    haps = {u.read: u.hap for u in d.units}
    assert 0 < sum(haps.values()) < len(haps)        # both haplotypes present
    seqs = {n: s for n, s in zip(d.contig_names, d.contigs)}
    seqs.update({n: s for n, s in zip(d.read_names, d.reads)})
    rnames = set(d.read_names)
    for row in d.paf_read_contig[:100] + d.paf_read_read[:100]:
        _check_row_positional(row.split("\t"), seqs, rnames)
