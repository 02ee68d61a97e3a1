"""Simulator self-consistency: emitted PAF coordinates must be exact."""

import numpy as np

from telomeri_tpu.io.fasta import reverse_complement
from telomeri_tpu.sim import SimConfig, simulate


def test_sim_shapes(toy_sim):
    d = toy_sim
    assert len(d.contigs) == 3          # n_repeat_copies=2 -> 3 unique regions
    assert len(d.reads) > 100
    assert len(d.paf_read_contig) > 0 and len(d.paf_read_read) > 0


def _check_row(cols, seqs_by_name):
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
    assert matches == nm, (qn, tn, matches, nm)


def test_paf_rows_exact(toy_sim):
    d = toy_sim
    seqs = {n: s for n, s in zip(d.contig_names, d.contigs)}
    seqs.update({n: s for n, s in zip(d.read_names, d.reads)})
    for row in d.paf_read_contig[:200] + d.paf_read_read[:200]:
        _check_row(row.split("\t"), seqs)


def test_error_free_rows_full_identity():
    d = simulate(SimConfig(genome_len=20000, repeat_len=1500, error_rate=0.0, seed=3))
    for row in d.paf_read_contig[:50]:
        cols = row.split("\t")
        assert int(cols[9]) == int(cols[10])  # nmatch == blocklen when no errors
