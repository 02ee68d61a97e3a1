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
    offset: int             # genome position of scaffold base 0 (may be negative)
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


def locate(scaffold: np.ndarray, genome: np.ndarray, k: int = 32,
           tries: int = 16) -> tuple[int, int] | None:
    """Find (strand, offset) placing `scaffold` on `genome` via an exact seed.

    Tries `tries` k-mers spread along the scaffold on both strands; returns the
    first hit. None when no error-free seed matches (unplaced)."""
    gb = genome.tobytes()
    for strand, seq in ((1, scaffold), (-1, reverse_complement(scaffold))):
        sb = seq.tobytes()
        for p in _seed_offsets(len(sb), k, tries):
            q = gb.find(sb[p:p + k])
            if q >= 0:
                off = q - p
                if strand == 1:
                    return 1, off
                # offset of the ORIGINAL scaffold's base 0 on the forward genome:
                # rc(scaffold) starts at genome position off, so scaffold base 0
                # (= rc end) sits at off + len - 1 reading backwards; report the
                # rc placement's forward-frame start
                return -1, off
    return None


def place_scaffold(name: str, scaffold: np.ndarray, genomes: dict[str, np.ndarray],
                   k: int = 32, tries: int = 16) -> Placement:
    for gname, genome in genomes.items():
        hit = locate(scaffold, genome, k, tries)
        if hit is None:
            continue
        strand, off = hit
        seq = scaffold if strand == 1 else reverse_complement(scaffold)
        lo = max(0, off)
        hi = min(len(genome), off + len(seq))
        if hi <= lo:
            continue
        g = genome[lo:hi]
        s = seq[lo - off:hi - off]
        ident = float(np.mean(g == s)) if len(g) else 0.0
        return Placement(name, gname, strand, off, int(hi - lo), ident)
    return Placement(name, None, 0, 0, 0, 0.0)


def validate_assembly(scaffolds, genomes, k: int = 32, tries: int = 16) -> dict:
    """Validate a scaffold set against reference sequences.

    scaffolds/genomes: SequenceSet-shaped (names + seqs). Returns a JSON-ready
    report: per-scaffold placements plus summary (placed fraction, identity
    weighted by span, worst identity — the misjoin flag)."""
    gmap = {n: np.asarray(genomes.seqs[i]) for i, n in enumerate(genomes.names)}
    placements = [
        place_scaffold(n, np.asarray(scaffolds.seqs[i]), gmap, k, tries)
        for i, n in enumerate(scaffolds.names)]
    total = int(sum(len(scaffolds.seqs[i]) for i in range(len(scaffolds.names))))
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
