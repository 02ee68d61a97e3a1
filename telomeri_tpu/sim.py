"""Synthetic scaffolding data simulator (SURVEY.md §3 row 17 "test data").

Generates, from a known ground-truth genome with exact-copy repeats:
  - draft contigs  = the unique regions between repeat copies (assembly breaks at repeats),
  - long reads     = error-injected substrings with random strand,
  - PAF overlaps   = computed EXACTLY from the known layout (coordinates are truth;
    nmatch counts real base matches between the two error-injected sequences),
so the pipeline can be validated end-to-end without minimap2 (the container has no network
egress and no aligner — SURVEY.md §0). This plays the role of the reference's E. coli test
data (BASELINE.md config #1/#2) at configurable scale.

Coordinate conventions match minimap2 PAF: qstart/qend are in the query's own forward
frame, tstart/tend in the target's forward frame, strand '-' means query maps to the
target's reverse complement. Only substitution errors are injected, so alignments are
strictly positional (no indels) and every emitted coordinate is exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from telomeri_tpu.io.fasta import reverse_complement

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@dataclass
class SimConfig:
    genome_len: int = 60_000
    repeat_len: int = 3_000
    n_repeat_copies: int = 2       # tandem-free exact copies, evenly spaced
    read_len_mean: int = 2_500
    read_len_sd: int = 400
    read_min_len: int = 500
    coverage: float = 20.0
    error_rate: float = 0.02       # substitution-only
    min_sim_overlap: int = 150     # emit PAF rows only for true overlaps >= this many bp
    seed: int = 0


# Simulated stand-ins for the reference's evaluation configs (BASELINE.md; real data
# is unreachable in this zero-egress container — SURVEY.md §0). Scale knobs follow the
# real datasets' genome size / read profile, not their biology.
PRESETS: dict[str, SimConfig] = {
    # BASELINE config #1: lambda-phage toy (checked in as testdata/lambda)
    "lambda": SimConfig(genome_len=48_500, repeat_len=2_500, n_repeat_copies=2,
                        read_len_mean=2_000, read_len_sd=300, coverage=14.0,
                        error_rate=0.02, seed=77),
    # BASELINE config #2: E. coli K-12 scale, PacBio-ish reads
    "ecoli": SimConfig(genome_len=4_600_000, repeat_len=5_000, n_repeat_copies=24,
                       read_len_mean=8_000, read_len_sd=2_000, read_min_len=1_000,
                       coverage=20.0, error_rate=0.05, min_sim_overlap=500, seed=101),
    # BASELINE config #3: C. elegans chromosome scale (one ~15 Mb chromosome),
    # ONT-ish reads, repeat-dense
    "celegans-chr": SimConfig(genome_len=15_000_000, repeat_len=8_000,
                              n_repeat_copies=60, read_len_mean=15_000,
                              read_len_sd=6_000, read_min_len=2_000, coverage=15.0,
                              error_rate=0.06, min_sim_overlap=1_000, seed=202),
    # BASELINE config #4: human chr21 scale, ultra-long ONT reads
    "chr21": SimConfig(genome_len=46_000_000, repeat_len=12_000, n_repeat_copies=120,
                       read_len_mean=40_000, read_len_sd=20_000, read_min_len=5_000,
                       coverage=12.0, error_rate=0.06, min_sim_overlap=2_000,
                       seed=303),
}


@dataclass
class SimData:
    genome: np.ndarray                    # uint8 ground truth
    contig_names: list[str]
    contigs: list[np.ndarray]
    contig_pos: list[tuple[int, int]]     # genome interval of each contig
    read_names: list[str]
    reads: list[np.ndarray]
    read_pos: list[tuple[int, int, int]]  # (start, end, strand) on genome
    paf_read_contig: list[str] = field(default_factory=list)  # PAF text lines
    paf_read_read: list[str] = field(default_factory=list)


def simulate(cfg: SimConfig) -> SimData:
    rng = np.random.default_rng(cfg.seed)
    genome = BASES[rng.integers(0, 4, cfg.genome_len)]

    # Plant exact repeat copies, evenly spaced, away from the genome ends.
    repeat = BASES[rng.integers(0, 4, cfg.repeat_len)]
    n_cop = cfg.n_repeat_copies
    gap = (cfg.genome_len - n_cop * cfg.repeat_len) // (n_cop + 1)
    if gap <= cfg.read_len_mean:
        raise ValueError(
            f"genome too small: unique gap {gap} <= mean read length "
            f"{cfg.read_len_mean}; increase genome_len or reduce copies")
    starts = [gap * (i + 1) + cfg.repeat_len * i for i in range(n_cop)]
    for s in starts:
        genome[s : s + cfg.repeat_len] = repeat

    # Contigs: unique regions between repeat copies (assembly breaks at each repeat).
    cut = [0]
    for s in starts:
        cut += [s, s + cfg.repeat_len]
    cut.append(cfg.genome_len)
    contig_pos = [(cut[2 * i], cut[2 * i + 1]) for i in range(n_cop + 1)]
    contigs = [genome[a:b].copy() for a, b in contig_pos]
    contig_names = [f"ctg{i:03d}" for i in range(len(contigs))]

    # Reads: uniform starts, normal lengths, random strand, substitution errors.
    n_reads = int(cfg.coverage * cfg.genome_len / cfg.read_len_mean)
    lens = np.clip(
        rng.normal(cfg.read_len_mean, cfg.read_len_sd, n_reads).astype(np.int64),
        cfg.read_min_len, cfg.genome_len,
    )
    starts_r = rng.integers(0, np.maximum(cfg.genome_len - lens, 1))
    strands = rng.integers(0, 2, n_reads)
    reads, read_pos, read_names = [], [], []
    for i in range(n_reads):
        a = int(starts_r[i])
        b = min(a + int(lens[i]), cfg.genome_len)
        seq = genome[a:b].copy()
        errs = rng.random(b - a) < cfg.error_rate
        if errs.any():
            # substitute with a DIFFERENT base: add 1..3 mod 4 in base space
            pos = np.flatnonzero(errs)
            cur = np.searchsorted(BASES, seq[pos])  # BASES is sorted (A<C<G<T)
            seq[pos] = BASES[(cur + rng.integers(1, 4, len(pos))) % 4]
        if strands[i] == 1:
            seq = reverse_complement(seq)
        reads.append(seq)
        read_pos.append((a, b, int(strands[i])))
        read_names.append(f"read{i:05d}")

    data = SimData(
        genome=genome, contig_names=contig_names, contigs=contigs,
        contig_pos=contig_pos, read_names=read_names, reads=reads, read_pos=read_pos,
    )
    data.paf_read_contig = _paf_read_vs_contigs(data, cfg)
    data.paf_read_read = _paf_read_vs_read(data, cfg)
    return data


def _genome_frame(seq: np.ndarray, strand: int) -> np.ndarray:
    """A read's bases laid out in genome-forward order."""
    return reverse_complement(seq) if strand == 1 else seq


def _to_local(iv: tuple[int, int], a: int, b: int, strand: int) -> tuple[int, int]:
    """Map genome interval iv=[x,y) into the local forward frame of a sequence spanning
    [a,b) with the given strand."""
    x, y = iv
    if strand == 0:
        return x - a, y - a
    return b - y, b - x


def _paf_row(qn, ql, qs, qe, strand, tn, tl, ts, te, nm, bl) -> str:
    return "\t".join(map(str, (qn, ql, qs, qe, "+-"[strand], tn, tl, ts, te, nm, bl, 255)))


def _paf_read_vs_contigs(d: SimData, cfg: SimConfig) -> list[str]:
    rows = []
    for ri, (ra, rb, rs) in enumerate(d.read_pos):
        gread = _genome_frame(d.reads[ri], rs)
        for ci, (ca, cb) in enumerate(d.contig_pos):
            x, y = max(ra, ca), min(rb, cb)
            if y - x < cfg.min_sim_overlap:
                continue
            nm = int(np.sum(gread[x - ra : y - ra] == d.genome[x:y]))
            qs, qe = _to_local((x, y), ra, rb, rs)
            rows.append(_paf_row(
                d.read_names[ri], rb - ra, qs, qe, rs,
                d.contig_names[ci], cb - ca, x - ca, y - ca, nm, y - x,
            ))
    return rows


def _paf_read_vs_read(d: SimData, cfg: SimConfig) -> list[str]:
    """All true read pairs overlapping by >= min_sim_overlap, via a sorted sweep."""
    n = len(d.reads)
    order = sorted(range(n), key=lambda i: d.read_pos[i][0])
    rows = []
    active: list[int] = []
    for i in order:
        ra, rb, rs = d.read_pos[i]
        active = [j for j in active if d.read_pos[j][1] >= ra + cfg.min_sim_overlap]
        gi = _genome_frame(d.reads[i], rs)
        for j in active:
            ja, jb, js = d.read_pos[j]
            x, y = max(ra, ja), min(rb, jb)
            if y - x < cfg.min_sim_overlap:
                continue
            gj = _genome_frame(d.reads[j], js)
            nm = int(np.sum(gi[x - ra : y - ra] == gj[x - ja : y - ja]))
            qs, qe = _to_local((x, y), ra, rb, rs)
            ts, te = _to_local((x, y), ja, jb, js)
            rows.append(_paf_row(
                d.read_names[i], rb - ra, qs, qe, rs ^ js,
                d.read_names[j], jb - ja, ts, te, nm, y - x,
            ))
        active.append(i)
    return rows


def write_dataset(d: SimData, outdir: str) -> None:
    """Write contigs.fa, reads.fa, read2contig.paf, read2read.paf, genome.fa."""
    import os

    from telomeri_tpu.io.fasta import write_fasta

    os.makedirs(outdir, exist_ok=True)
    write_fasta(os.path.join(outdir, "contigs.fa"), d.contig_names, d.contigs)
    write_fasta(os.path.join(outdir, "reads.fa"), d.read_names, d.reads)
    write_fasta(os.path.join(outdir, "genome.fa"), ["genome"], [d.genome])
    for fn, rows in (("read2contig.paf", d.paf_read_contig),
                     ("read2read.paf", d.paf_read_read)):
        with open(os.path.join(outdir, fn), "w") as f:
            f.write("\n".join(rows) + ("\n" if rows else ""))
