"""Scale tests.

test_many_junction_genome — mid-scale end-to-end regression (BASELINE.md config #2
analog, quarter scale): many repeat junctions, PacBio-like error rate,
single-scaffold reconstruction. Runs in the default suite.

test_ecoli_preset_end_to_end — the full E. coli-scale preset (4.6 Mb). Minutes-long,
so it only runs when TELOMERI_SCALE_TEST=1; the driver-facing scale validation
normally happens on the TPU via the CLI (BASELINE.md "Scale validation").
"""

import os

import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.pipeline import run_pipeline
from telomeri_tpu.sim import PRESETS, SimConfig, simulate, write_dataset


def test_many_junction_genome(tmp_path):
    sim = simulate(SimConfig(
        genome_len=1_200_000, repeat_len=4_000, n_repeat_copies=8,
        read_len_mean=7_000, read_len_sd=1_500, read_min_len=1_000,
        coverage=16.0, error_rate=0.05, min_sim_overlap=500, seed=11))
    d = str(tmp_path / "data")
    write_dataset(sim, d)
    out = str(tmp_path / "s.fa")
    res = run_pipeline(
        f"{d}/contigs.fa", f"{d}/reads.fa", f"{d}/read2contig.paf",
        f"{d}/read2read.paf", out,
        ScaffoldConfig(mc_walks_per_end=200, max_steps=32))
    assert len(res.accepted) == 8, [b.pair for b in res.accepted]
    assert len(res.scaffolds) == 1
    sc = res.scaffolds[0].seq
    assert len(sc) == len(sim.genome)
    assert float(np.mean(sc == sim.genome)) > 0.99
    m = res.metrics.as_dict()["metrics"]
    assert m["assembly"]["scaffolds"]["n50"] == len(sim.genome)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("TELOMERI_SCALE_TEST"),
    reason="set TELOMERI_SCALE_TEST=1 (minutes-long)")
def test_ecoli_preset_end_to_end(tmp_path):
    from telomeri_tpu.io.fasta import read_fasta

    d = str(tmp_path)
    write_dataset(simulate(PRESETS["ecoli"]), d)
    cfg = ScaffoldConfig(mc_walks_per_end=64)  # scaled down for the CPU backend
    out = os.path.join(d, "scaffolds.fa")
    res = run_pipeline(
        os.path.join(d, "contigs.fa"), os.path.join(d, "reads.fa"),
        os.path.join(d, "read2contig.paf"), os.path.join(d, "read2read.paf"),
        out, cfg)
    genome = np.asarray(read_fasta(os.path.join(d, "genome.fa")).seqs[0])
    scaf = read_fasta(out)
    # every gap bridged -> one scaffold reconstructing the genome
    assert len(scaf) == 1
    s = np.asarray(scaf.seqs[0])
    n = min(len(genome), len(s))
    assert abs(len(s) - len(genome)) < 0.01 * len(genome)
    assert (genome[:n] == s[:n]).mean() > 0.98


def test_repeats_longer_than_reads(tmp_path):
    """HERA's core claim: repeats much LONGER than any single read are resolved
    by multi-read path walks + length-histogram consensus. Repeat copies are
    exact, so a misjoin between copies would corrupt flank order — full-genome
    byte reconstruction proves every junction was paired correctly."""
    sim = simulate(SimConfig(
        genome_len=150_000, repeat_len=12_000, n_repeat_copies=3,
        read_len_mean=1_500, read_len_sd=200, coverage=18.0,
        error_rate=0.02, seed=42))
    d = str(tmp_path / "data")
    write_dataset(sim, d)
    res = run_pipeline(
        f"{d}/contigs.fa", f"{d}/reads.fa", f"{d}/read2contig.paf",
        f"{d}/read2read.paf", str(tmp_path / "s.fa"),
        ScaffoldConfig(mc_walks_per_end=200, max_steps=32))
    assert len(res.scaffolds) == 1
    sc = res.scaffolds[0].seq
    assert len(sc) == len(sim.genome)
    assert float(np.mean(sc == sim.genome)) > 0.99
