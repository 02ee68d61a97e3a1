"""Opt-in scale test: the E. coli-scale preset end-to-end (BASELINE.md config #2).

Minutes-long (simulates a 4.6 Mb genome and runs the full pipeline on the test
backend), so it only runs when TELOMERI_SCALE_TEST=1 — the driver-facing scale
validation normally happens on the TPU via the CLI (BASELINE.md "Measured").
"""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("TELOMERI_SCALE_TEST"),
        reason="set TELOMERI_SCALE_TEST=1 (minutes-long)"),
]


def test_ecoli_preset_end_to_end(tmp_path):
    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.io.fasta import read_fasta
    from telomeri_tpu.pipeline import run_pipeline
    from telomeri_tpu.sim import PRESETS, simulate, write_dataset

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
