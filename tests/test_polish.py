"""Junction polish (scaffold/polish.py, round 5): consensus re-call of fill
bases must raise junction identity above the raw-splicing ceiling without
ever introducing a misjoin, stay deterministic, and leave contig bases and
unpolished runs byte-identical."""

import dataclasses

import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.fasta import SequenceSet, read_fasta
from telomeri_tpu.pipeline import run_pipeline
from telomeri_tpu.scaffold.polish import polish_region
from telomeri_tpu.sim import SimConfig, simulate, write_dataset
from telomeri_tpu.utils.validate import junctions_from_segments, validate_assembly


def _rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return np.frombuffer(rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
                         .tobytes(), dtype=np.uint8)


def _mutate(seq, seed, sub=0.0, ins=0.0, dele=0.0):
    rng = np.random.default_rng(seed)
    out = []
    for b in seq:
        if rng.random() < dele:
            continue
        if rng.random() < sub:
            out.append(ord("ACGT"[(b"ACGT".index(bytes([b])) + 1) % 4]))
        else:
            out.append(int(b))
        if rng.random() < ins:
            out.append(ord("ACGT"[rng.integers(0, 4)]))
    return np.array(out, np.uint8)


# ---------------------------------------------------------------------------
# unit: polish_region
# ---------------------------------------------------------------------------

def test_polish_region_fixes_planted_errors():
    """>= 2 clean reads outvote the target's substitutions AND indels; the
    polished core converges to the truth."""
    truth = _rand_seq(3000, 0)
    target = _mutate(truth, 1, sub=0.02, ins=0.01, dele=0.01)  # noisy rep
    cands = [_mutate(truth, 10 + i, sub=0.01, ins=0.005, dele=0.005)
             for i in range(8)]
    out, st = polish_region(target, 0, len(target), cands)
    from telomeri_tpu.utils.align import myers_pair

    before = myers_pair(target, truth)
    after = myers_pair(out, truth)
    assert st["reads_used"] == 8
    assert after < before * 0.25, (before, after)
    assert st["subs"] + st["dels"] + st["ins"] > 0


def test_polish_region_single_read_never_flips():
    """One disagreeing read (votes < 2) must change NOTHING."""
    truth = _rand_seq(1500, 2)
    target = truth.copy()
    noisy = _mutate(truth, 3, sub=0.05, ins=0.02, dele=0.02)
    out, st = polish_region(target, 0, len(target), [noisy])
    np.testing.assert_array_equal(out, target)
    assert st["subs"] == st["dels"] == st["ins"] == 0


def test_polish_region_het_split_keeps_target_allele():
    """A 50/50 split (2*votes == coverage) keeps the rep read's base."""
    truth = _rand_seq(1200, 4)
    alt = truth.copy()
    alt[600] = ord("A") if truth[600] != ord("A") else ord("C")
    target = truth.copy()
    cands = [truth.copy(), truth.copy(), alt.copy(), alt.copy()]
    out, _ = polish_region(target, 0, len(target), cands)
    assert out[600] == truth[600]
    # 3-vs-1 majority for the alt allele DOES flip it
    out2, st2 = polish_region(target, 0, len(target),
                              [alt.copy(), alt.copy(), alt.copy(),
                               truth.copy()])
    assert out2[600] == alt[600] and st2["subs"] == 1


def test_polish_region_edits_confined_to_core():
    """Bases outside [lo, hi) are returned verbatim even when voters disagree
    there."""
    truth = _rand_seq(2000, 5)
    target = truth.copy()
    target[100] = target[1900] = ord("A") if truth[100] != ord("A") else ord("C")
    cands = [truth.copy() for _ in range(4)]
    out, _ = polish_region(target, 500, 1500, cands)
    # core returned only; flank errors outside core survive in the caller's
    # copy — polish_region returns [lo, hi)
    assert len(out) == 1000
    np.testing.assert_array_equal(out, truth[500:1500])


def test_polish_region_rc_candidates():
    """Reverse-complement spanning reads anchor via strand probing."""
    from telomeri_tpu.io.fasta import reverse_complement

    truth = _rand_seq(2500, 6)
    target = _mutate(truth, 7, sub=0.03)
    cands = [reverse_complement(_mutate(truth, 20 + i, sub=0.01))
             for i in range(6)]
    out, st = polish_region(target, 0, len(target), cands)
    from telomeri_tpu.utils.align import myers_pair

    assert st["reads_used"] == 6
    assert myers_pair(out, truth) < myers_pair(target, truth) * 0.3


# ---------------------------------------------------------------------------
# e2e: pipeline
# ---------------------------------------------------------------------------

def _pipeline_pair(tmp_path, sim_kw, cfg):
    d = simulate(SimConfig(**sim_kw))
    ddir = str(tmp_path / "data")
    write_dataset(d, ddir)
    args = (f"{ddir}/contigs.fa", f"{ddir}/reads.fa",
            f"{ddir}/read2contig.paf", f"{ddir}/read2read.paf")
    off = run_pipeline(*args, str(tmp_path / "off.fa"), cfg)
    on = run_pipeline(*args, str(tmp_path / "on.fa"),
                      dataclasses.replace(cfg, polish=True))
    genome = read_fasta(f"{ddir}/genome.fa")
    reports = {}
    for name, r in (("off", off), ("on", on)):
        scaff = SequenceSet([s.name for s in r.scaffolds],
                            [s.seq for s in r.scaffolds])
        junc = {s.name: junctions_from_segments(s.segments)
                for s in r.scaffolds}
        reports[name] = validate_assembly(scaff, genome, junctions=junc)
    return off, on, reports, args


def test_polish_improves_identity_no_misjoin(tmp_path):
    """Indel-dominated preset-style sim: polish must raise mean AND
    worst-junction identity, with zero misjoin signal (no junction craters)."""
    cfg = ScaffoldConfig()
    off, on, reports, _ = _pipeline_pair(tmp_path, dict(
        genome_len=120_000, repeat_len=3_000, n_repeat_copies=3,
        read_len_mean=3_000, coverage=18.0, error_rate=0.03,
        ins_rate=0.02, del_rate=0.03, end_jitter=25, seed=7), cfg)
    assert len(on.scaffolds) == len(off.scaffolds)
    assert reports["on"]["mean_identity"] > reports["off"]["mean_identity"]
    assert (reports["on"]["worst_junction_identity"]
            > reports["off"]["worst_junction_identity"])
    assert reports["on"]["worst_junction_identity"] > 0.9   # no misjoin crater
    st = on.metrics.values["polish"]
    assert st["segments"] > 0 and st["subs"] + st["dels"] + st["ins"] > 0


def test_polish_deterministic_and_off_by_default(tmp_path):
    """Two polished runs write byte-identical FASTA; polish=False output is
    byte-identical to a run of the pre-polish pipeline (the stage is inert
    when off)."""
    d = simulate(SimConfig(genome_len=60_000, repeat_len=2_000,
                           n_repeat_copies=2, read_len_mean=2_000,
                           coverage=14.0, error_rate=0.04, seed=3))
    ddir = str(tmp_path / "data")
    write_dataset(d, ddir)
    args = (f"{ddir}/contigs.fa", f"{ddir}/reads.fa",
            f"{ddir}/read2contig.paf", f"{ddir}/read2read.paf")
    cfg_on = ScaffoldConfig(polish=True)
    run_pipeline(*args, str(tmp_path / "a.fa"), cfg_on)
    run_pipeline(*args, str(tmp_path / "b.fa"), cfg_on)
    assert open(tmp_path / "a.fa", "rb").read() == \
        open(tmp_path / "b.fa", "rb").read()
    run_pipeline(*args, str(tmp_path / "c.fa"), ScaffoldConfig())
    assert open(tmp_path / "a.fa", "rb").read() != \
        open(tmp_path / "c.fa", "rb").read()   # polish did edit something


def test_polish_resume_equals_direct(tmp_path):
    """Artifact resume with polish on writes the same bytes as the direct
    run (determinism across the stage boundary)."""
    d = simulate(SimConfig(genome_len=60_000, repeat_len=2_000,
                           n_repeat_copies=2, read_len_mean=2_000,
                           coverage=14.0, error_rate=0.04, seed=5))
    ddir = str(tmp_path / "data")
    write_dataset(d, ddir)
    args = (f"{ddir}/contigs.fa", f"{ddir}/reads.fa",
            f"{ddir}/read2contig.paf", f"{ddir}/read2read.paf")
    cfg = ScaffoldConfig(polish=True)
    run_pipeline(*args, str(tmp_path / "direct.fa"), cfg,
                 save_graph_path=str(tmp_path / "g.npz"),
                 save_walks_path=str(tmp_path / "w.npz"))
    run_pipeline(args[0], args[1], None, None, str(tmp_path / "resumed.fa"),
                 cfg, graph_artifact=str(tmp_path / "g.npz"),
                 walks_artifact=str(tmp_path / "w.npz"))
    assert open(tmp_path / "direct.fa", "rb").read() == \
        open(tmp_path / "resumed.fa", "rb").read()


def test_polish_agp_internally_consistent(tmp_path):
    """With polish on, AGP scaffold coordinates must tile each scaffold
    exactly (contiguous, full length) even though source-component
    coordinates describe the pre-polish splice."""
    d = simulate(SimConfig(genome_len=60_000, repeat_len=2_000,
                           n_repeat_copies=2, read_len_mean=2_000,
                           coverage=14.0, error_rate=0.04, ins_rate=0.01,
                           del_rate=0.01, seed=9))
    ddir = str(tmp_path / "data")
    write_dataset(d, ddir)
    args = (f"{ddir}/contigs.fa", f"{ddir}/reads.fa",
            f"{ddir}/read2contig.paf", f"{ddir}/read2read.paf")
    res = run_pipeline(*args, str(tmp_path / "out.fa"),
                       ScaffoldConfig(polish=True),
                       agp_path=str(tmp_path / "out.agp"))
    lens = {s.name: len(s.seq) for s in res.scaffolds}
    spans: dict[str, list[tuple[int, int]]] = {}
    for line in open(tmp_path / "out.agp"):
        if line.startswith("#"):
            continue
        c = line.split("\t")
        spans.setdefault(c[0], []).append((int(c[1]), int(c[2])))
    for name, sp in spans.items():
        sp.sort()
        assert sp[0][0] == 1
        for (a1, b1), (a2, b2) in zip(sp, sp[1:]):
            assert a2 == b1 + 1, (name, b1, a2)
        assert sp[-1][1] == lens[name], (name, sp[-1], lens[name])
    # contig segments still match their source bytes exactly (never polished)
    contigs = read_fasta(f"{ddir}/contigs.fa")
    from telomeri_tpu.io.fasta import reverse_complement

    for sc in res.scaffolds:
        for (kind, sid, orient, src_start, sc_start, ln) in sc.segments:
            if kind != "contig":
                continue
            s = np.asarray(contigs.seqs[sid])
            s = reverse_complement(s) if orient else s
            np.testing.assert_array_equal(
                sc.seq[sc_start:sc_start + ln], s[src_start:src_start + ln])
