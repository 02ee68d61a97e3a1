"""utils/align.py: packing, LIS chaining, Myers edit distance vs a DP oracle,
and chained alignment identity (the indel-tolerant validator core)."""

import numpy as np
import pytest

from telomeri_tpu.utils.align import (
    BASES,
    ChainAlignment,
    KmerIndex,
    _myers_batch,
    chain_align,
    lis_chain,
    myers_pair,
    pack_kmers,
)


def _lev(a, b):
    """Levenshtein DP oracle (vectorized rows; see tests/test_sim.py)."""
    idx = np.arange(len(b) + 1, dtype=np.int32)
    prev = idx.copy()
    for i in range(1, len(a) + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        cur[1:] = np.minimum(prev[:-1] + (b != a[i - 1]), prev[1:] + 1)
        cur = np.minimum(cur, np.minimum.accumulate(cur - idx) + idx)
        prev = cur
    return int(prev[-1])


def rand_seq(rng, n):
    return BASES[rng.integers(0, 4, n)]


def mutate(rng, seq, n_sub=0, n_ins=0, n_del=0):
    s = list(seq)
    for _ in range(n_del):
        s.pop(int(rng.integers(0, len(s))))
    for _ in range(n_ins):
        s.insert(int(rng.integers(0, len(s) + 1)), int(BASES[rng.integers(0, 4)]))
    for _ in range(n_sub):
        i = int(rng.integers(0, len(s)))
        s[i] = int(BASES[(np.searchsorted(BASES, s[i]) + 1 + rng.integers(0, 3)) % 4])
    return np.array(s, np.uint8)


def test_pack_kmers_naive(rng):
    seq = rand_seq(rng, 50)
    k = 5
    km = pack_kmers(seq, k)
    code = {65: 0, 67: 1, 71: 2, 84: 3}
    for i in range(len(seq) - k + 1):
        want = 0
        for b in seq[i:i + k]:
            want = want * 4 + code[int(b)]
        assert km[i] == want


def test_kmer_index_unique():
    seq = np.frombuffer(b"ACGTACGTTTTT", dtype=np.uint8)
    idx = KmerIndex.build(seq, 4)
    q = pack_kmers(np.frombuffer(b"CGTA", dtype=np.uint8), 4)
    assert idx.lookup_unique(q)[0] == 1          # CGTA occurs once, at 1
    q2 = pack_kmers(np.frombuffer(b"ACGT", dtype=np.uint8), 4)
    assert idx.lookup_unique(q2)[0] == -1        # ACGT occurs twice -> not unique


def test_lis_chain_brute(rng):
    for _ in range(20):
        vals = rng.integers(0, 30, rng.integers(1, 15))
        got = lis_chain(vals)
        # strictly increasing + maximal length vs brute force
        sub = vals[got]
        assert all(b > a for a, b in zip(sub, sub[1:]))
        best = 0
        n = len(vals)
        for m in range(1 << n):
            pick = [i for i in range(n) if m >> i & 1]
            s = vals[pick]
            if all(b > a for a, b in zip(s, s[1:])):
                best = max(best, len(pick))
        assert len(got) == best


def test_myers_batch_vs_oracle(rng):
    qs, ts = [], []
    for _ in range(60):
        q = rand_seq(rng, int(rng.integers(0, 64)))
        t = rand_seq(rng, int(rng.integers(0, 120)))
        qs.append(q)
        ts.append(t)
    # mutated pairs too (small distances matter most)
    for _ in range(40):
        q = rand_seq(rng, int(rng.integers(10, 64)))
        t = mutate(rng, q, n_sub=2, n_ins=1, n_del=1)
        qs.append(q)
        ts.append(t)
    n = len(qs)
    qmat = np.full((n, 64), 0xFF, np.uint8)
    tmax = max(len(t) for t in ts)
    tmat = np.full((n, tmax), 0xFF, np.uint8)
    qlens = np.array([len(q) for q in qs])
    tlens = np.array([len(t) for t in ts])
    for i in range(n):
        qmat[i, :len(qs[i])] = qs[i]
        tmat[i, :len(ts[i])] = ts[i]
    got = _myers_batch(qmat, qlens, tmat, tlens)
    want = np.array([_lev(q, t) for q, t in zip(qs, ts)])
    assert np.array_equal(got, want)


def test_myers_pair_multiword_vs_oracle(rng):
    for qlen in (1, 63, 64, 65, 200, 500):
        q = rand_seq(rng, qlen)
        t = mutate(rng, q, n_sub=qlen // 20, n_ins=qlen // 30, n_del=qlen // 30)
        assert myers_pair(q, t) == _lev(q, t)
        t2 = rand_seq(rng, qlen + 10)
        assert myers_pair(q, t2) == _lev(q, t2)


def test_myers_pair_free_modes(rng):
    q = rand_seq(rng, 40)
    t = np.concatenate([rand_seq(rng, 25), q, rand_seq(rng, 25)])
    # free start: query aligned to a target SUFFIX; exact copy ends 25 before end
    assert myers_pair(q, t[:65], "free_t_start") == 0
    want = min(_lev(q, t[i:]) for i in range(len(t) + 1))
    assert myers_pair(q, t, "free_t_start") == want
    # free end: query aligned to a target PREFIX
    assert myers_pair(q, t[25:], "free_t_end") == 0
    want = min(_lev(q, t[:j]) for j in range(len(t) + 1))
    assert myers_pair(q, t, "free_t_end") == want


def test_chain_align_perfect(rng):
    genome = rand_seq(rng, 20_000)
    gidx = KmerIndex.build(genome, 24)
    al = chain_align(genome[3000:15000], genome, gidx)
    assert al is not None
    assert al.identity == 1.0
    assert al.edits == 0


def test_chain_align_known_edits(rng):
    genome = rand_seq(rng, 30_000)
    gidx = KmerIndex.build(genome, 24)
    q = mutate(rng, genome[2000:22000], n_sub=120, n_ins=60, n_del=60)
    al = chain_align(q, genome, gidx)
    assert al is not None
    # identity must sit near 1 - 240/20000 = 0.988, NOT collapse positionally
    assert 0.983 <= al.identity <= 0.995
    assert abs(al.edits - 240) < 60


def test_chain_align_detects_misjoin(rng):
    genome = rand_seq(rng, 40_000)
    gidx = KmerIndex.build(genome, 24)
    # misjoin: two distant genome chunks spliced together
    q = np.concatenate([genome[1000:6000], genome[30000:35000]])
    al = chain_align(q, genome, gidx)
    assert al is not None
    # the skipped 24 kb shows up as a giant gap -> identity craters
    assert al.identity < 0.5
    # per-window check: identity is fine away from the junction, bad at it
    assert al.identity_in(0, 4000) > 0.95
    assert al.identity_in(3000, 7000) < 0.9


def test_chain_align_with_repeats(rng):
    # repeats longer than k: interiors have no globally-unique k-mers; the
    # recursive local re-anchoring must still align them at full identity
    rep = rand_seq(rng, 3000)
    genome = np.concatenate([
        rand_seq(rng, 5000), rep, rand_seq(rng, 5000), rep, rand_seq(rng, 5000)])
    gidx = KmerIndex.build(genome, 24)
    q = mutate(rng, genome[4000:17000], n_sub=60, n_ins=30, n_del=30)
    al = chain_align(q, genome, gidx)
    assert al is not None
    assert al.identity > 0.985


def test_chain_align_unplaceable(rng):
    genome = rand_seq(rng, 10_000)
    gidx = KmerIndex.build(genome, 24)
    alien = rand_seq(rng, 5_000)
    al = chain_align(alien, genome, gidx)
    assert al is None or al.identity < 0.5
