"""Scaffold-vs-reference validation (alignment-free, for simulated/benchmark data).

The simulator (telomeri_tpu/sim.py) injects substitution errors only, so a
correctly-scaffolded sequence aligns POSITIONALLY to the ground-truth genome at a
single offset per strand. Validation therefore reduces to: locate each scaffold
on the reference by an exact seed k-mer (trying several positions so a seed
landing on simulated errors doesn't fail), then measure positional identity over
the overlapping span. A misjoin (wrong repeat-copy pairing) shifts everything
after the bad junction and collapses identity toward the ~25% random baseline —
making this a cheap but sharp correctness check.

Not a general-purpose aligner: indel-bearing real data needs minimap2/quast-style
tools, which this zero-dependency validator does not replace.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from telomeri_tpu.io.fasta import reverse_complement


@dataclass
class Placement:
    scaffold: str
    genome: str | None      # reference sequence name, None if unplaced
    strand: int             # +1 / -1 (0 if unplaced)
    offset: int             # forward-genome start of the PLACED (oriented)
    #                         scaffold sequence (may be negative); for strand -1
    #                         this is where rc(scaffold) begins on the genome
    span: int               # overlapping bases compared
    identity: float         # matching fraction over the span (0.0 if unplaced)

    def as_dict(self) -> dict:
        return {"scaffold": self.scaffold, "genome": self.genome,
                "strand": self.strand, "offset": self.offset,
                "span": self.span, "identity": round(self.identity, 6)}


def _seed_offsets(n: int, k: int, tries: int) -> list[int]:
    if n <= k:
        return [0]
    return sorted({int(p) for p in np.linspace(0, n - k, tries)})


_ACCEPT = 0.95  # a candidate this good is certainly the true placement


def _identity_at(seq: np.ndarray, genome: np.ndarray, off: int) -> tuple[int, float]:
    lo = max(0, off)
    hi = min(len(genome), off + len(seq))
    if hi <= lo:
        return 0, 0.0
    g = genome[lo:hi]
    s = seq[lo - off:hi - off]
    return int(hi - lo), float(np.mean(g == s))


def place_scaffold(name: str, scaffold: np.ndarray, genomes: dict, k: int = 32,
                   tries: int = 16) -> Placement:
    """Best placement of `scaffold` across reference sequences.

    Every exact seed hit is EVALUATED by positional identity and the best kept —
    a seed landing inside a repeat matches the wrong copy and scores ~25%, while
    some other seed in unique flanking sequence scores high, so first-hit
    placement would false-alarm exactly where misjoin detection matters.
    genomes: {name: array} or {name: (array, bytes)} (bytes precomputed once by
    validate_assembly; arrays alone also accepted for direct use)."""
    best = Placement(name, None, 0, 0, 0, 0.0)
    oriented = {1: scaffold, -1: reverse_complement(scaffold)}
    for gname, genome in genomes.items():
        garr, gb = genome if isinstance(genome, tuple) else (genome, genome.tobytes())
        for strand, seq in oriented.items():
            sb = seq.tobytes()
            tried: set[int] = set()
            for p in _seed_offsets(len(sb), k, tries):
                q = gb.find(sb[p:p + k])
                if q < 0 or (q - p) in tried:
                    continue
                tried.add(q - p)
                span, ident = _identity_at(seq, garr, q - p)
                if ident > best.identity:
                    best = Placement(name, gname, strand, q - p, span, ident)
                    if ident >= _ACCEPT:
                        return best
    return best


def validate_assembly(scaffolds, genomes, k: int = 32, tries: int = 16) -> dict:
    """Validate a scaffold set against reference sequences.

    scaffolds/genomes: SequenceSet-shaped (names + seqs). Returns a JSON-ready
    report: per-scaffold placements plus summary (placed fraction, identity
    weighted by span, worst identity — the misjoin flag)."""
    gmap = {}
    for i, n in enumerate(genomes.names):
        arr = np.asarray(genomes.seqs[i])
        gmap[n] = (arr, arr.tobytes())   # bytes built ONCE, reused per scaffold
    placements = [
        place_scaffold(n, np.asarray(scaffolds.seqs[i]), gmap, k, tries)
        for i, n in enumerate(scaffolds.names)]
    total = int(np.sum(scaffolds.lengths))
    placed_span = sum(p.span for p in placements)
    wsum = sum(p.identity * p.span for p in placements)
    placed = [p for p in placements if p.genome is not None]
    return {
        "n_scaffolds": len(placements),
        "n_placed": len(placed),
        "total_bases": total,
        "placed_bases": int(placed_span),
        "placed_fraction": round(placed_span / total, 6) if total else 0.0,
        "mean_identity": round(wsum / placed_span, 6) if placed_span else 0.0,
        "worst_identity": round(min((p.identity for p in placed), default=0.0), 6),
        "placements": [p.as_dict() for p in placements],
    }
