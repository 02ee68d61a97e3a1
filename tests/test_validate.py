"""Tests for the alignment-free scaffold validator (utils/validate.py)."""

import numpy as np

from telomeri_tpu.io.fasta import SequenceSet, reverse_complement
from telomeri_tpu.utils.validate import place_scaffold, validate_assembly


def _rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return np.frombuffer(rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
                         .tobytes(), dtype=np.uint8)


def test_forward_placement_exact():
    g = _rand_seq(5000, 0)
    p = place_scaffold("s", g[1000:3000].copy(), {"g": g})
    assert (p.genome, p.strand, p.offset, p.span) == ("g", 1, 1000, 2000)
    assert p.identity == 1.0


def test_reverse_placement():
    g = _rand_seq(5000, 1)
    rc = reverse_complement(g[1000:3000])
    p = place_scaffold("s", rc, {"g": g})
    assert p.genome == "g" and p.strand == -1
    assert p.identity == 1.0 and p.span == 2000


def test_placement_with_errors():
    g = _rand_seq(8000, 2)
    s = g[500:7500].copy()
    rng = np.random.default_rng(3)
    bad = rng.choice(len(s), size=len(s) // 50, replace=False)   # 2% errors
    s[bad] = np.where(s[bad] == ord("A"), ord("C"), ord("A")).astype(np.uint8)
    p = place_scaffold("s", s, {"g": g})
    assert p.genome == "g" and 0.97 < p.identity < 1.0


def test_misjoin_collapses_identity():
    # scaffold = first half of g glued to a segment from the WRONG place
    g = _rand_seq(10000, 4)
    s = np.concatenate([g[0:4000], g[7000:10000]])
    p = place_scaffold("s", s, {"g": g})
    assert p.genome == "g" and p.offset == 0
    assert p.identity < 0.75   # tail mismatches expose the misjoin


def test_unplaced_scaffold():
    g = _rand_seq(5000, 5)
    alien = _rand_seq(2000, 6)
    p = place_scaffold("s", alien, {"g": g})
    assert p.genome is None and p.identity == 0.0


def test_validate_assembly_report():
    g = _rand_seq(6000, 7)
    scaffolds = SequenceSet(["a", "b"], [g[0:3000].copy(), g[3000:6000].copy()])
    genomes = SequenceSet(["g"], [g])
    rep = validate_assembly(scaffolds, genomes)
    assert rep["n_placed"] == 2 and rep["placed_fraction"] == 1.0
    assert rep["mean_identity"] == 1.0 and rep["worst_identity"] == 1.0


def test_repeat_seed_does_not_misplace():
    """A seed landing inside a repeat matches the WRONG copy; best-of-candidates
    placement must pick the unique-sequence placement, not false-alarm."""
    rng = np.random.default_rng(8)
    R = _rand_seq(200, 9)
    A = _rand_seq(3000, 10)
    B = _rand_seq(3000, 11)
    g = np.concatenate([R, A, R, B])          # repeat at 0 and 3200
    s = g[3200:].copy()                       # scaffold starts INSIDE repeat copy 2
    p = place_scaffold("s", s, {"g": g}, k=32, tries=16)
    assert p.identity == 1.0 and p.offset == 3200 and p.strand == 1
