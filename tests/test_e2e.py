"""End-to-end pipeline tests on simulated data (SURVEY.md §5 item 4).

The simulator plants exact repeats that break the draft assembly into 3 contigs; a
correct pipeline bridges them back into a single scaffold whose sequence is positionally
identical to the truth genome (substitution-only errors -> length matches EXACTLY, and
identity is bounded below by the read error rate)."""

import os

import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.fasta import read_fasta
from telomeri_tpu.pipeline import run_pipeline

CFG = ScaffoldConfig(mc_walks_per_end=50, max_steps=32, min_group_support=2)


@pytest.fixture(scope="module")
def result(toy_dataset_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "scaffolds.fa")
    res = run_pipeline(
        os.path.join(toy_dataset_dir, "contigs.fa"),
        os.path.join(toy_dataset_dir, "reads.fa"),
        os.path.join(toy_dataset_dir, "read2contig.paf"),
        os.path.join(toy_dataset_dir, "read2read.paf"),
        out, CFG,
    )
    return res, out, toy_dataset_dir


def test_bridges_found_and_accepted(result):
    res, _, _ = result
    assert len(res.bridges) >= 2
    assert len(res.accepted) == 2  # 3 contigs -> 2 junctions


def test_single_scaffold_reconstructs_genome(result):
    res, _, d = result
    genome = read_fasta(os.path.join(d, "genome.fa")).seqs[0]
    assert len(res.scaffolds) == 1
    sc = res.scaffolds[0]
    assert len(sc.seq) == len(genome), "positional splicing must preserve exact length"
    identity = float(np.mean(sc.seq == genome))
    assert identity > 0.95, f"identity {identity:.4f}"
    # contig composition in order, all three contigs present
    contig_ids = [p[1] for p in sc.parts if p[0] == "contig"]
    assert contig_ids == [0, 1, 2] or contig_ids == [2, 1, 0]


def test_output_fasta_written_deterministically(result, toy_dataset_dir, tmp_path):
    res, out, d = result
    b1 = open(out, "rb").read()
    out2 = str(tmp_path / "again.fa")
    run_pipeline(
        os.path.join(d, "contigs.fa"), os.path.join(d, "reads.fa"),
        os.path.join(d, "read2contig.paf"), os.path.join(d, "read2read.paf"),
        out2, CFG,
    )
    assert open(out2, "rb").read() == b1, "same seed + inputs must be byte-identical"


def test_metrics_populated(result):
    res, _, _ = result
    m = res.metrics.as_dict()
    assert m["metrics"]["n_walks"] > 0
    assert m["metrics"]["n_walks_successful"] > 0
    assert "run_walks" in m["timings_s"]


def test_empty_paf_flows_through(tmp_path):
    """Empty PAFs (no overlaps at all) must produce singleton scaffolds, not
    crash (0-walk consensus early-out in grouping.py)."""
    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.io.fasta import write_fasta
    from telomeri_tpu.pipeline import run_pipeline

    d = tmp_path
    write_fasta(str(d / "c.fa"), ["c0", "c1"],
                [np.frombuffer(b"ACGTACGTAC", np.uint8),
                 np.frombuffer(b"TTTTGGGG", np.uint8)])
    write_fasta(str(d / "r.fa"), ["r0"], [np.frombuffer(b"ACGTACGT", np.uint8)])
    (d / "rc.paf").write_text("")
    (d / "rr.paf").write_text("")
    res = run_pipeline(str(d / "c.fa"), str(d / "r.fa"), str(d / "rc.paf"),
                       str(d / "rr.paf"), str(d / "out.fa"), ScaffoldConfig())
    assert [s.name for s in res.scaffolds] == ["scaffold_00000", "scaffold_00001"]
    assert res.scaffolds[0].seq.tobytes() == b"ACGTACGTAC"


def test_multiple_paf_files_equal_single(tmp_path):
    """Chunked PAF inputs (lists of files) must produce byte-identical output to
    the single concatenated file (load_inputs docstring)."""
    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.pipeline import run_pipeline
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    d = str(tmp_path / "data")
    write_dataset(simulate(SimConfig(genome_len=40_000, repeat_len=2_000,
                                     n_repeat_copies=2, read_len_mean=1_500,
                                     read_len_sd=200, coverage=12.0,
                                     error_rate=0.02, seed=5)), d)
    # split read2read.paf into two chunks
    lines = open(f"{d}/read2read.paf").readlines()
    mid = len(lines) // 2
    open(f"{d}/rr_a.paf", "w").writelines(lines[:mid])
    open(f"{d}/rr_b.paf", "w").writelines(lines[mid:])

    cfg = ScaffoldConfig(mc_walks_per_end=50)
    r1 = run_pipeline(f"{d}/contigs.fa", f"{d}/reads.fa", f"{d}/read2contig.paf",
                      f"{d}/read2read.paf", str(tmp_path / "one.fa"), cfg)
    r2 = run_pipeline(f"{d}/contigs.fa", f"{d}/reads.fa", [f"{d}/read2contig.paf"],
                      [f"{d}/rr_a.paf", f"{d}/rr_b.paf"], str(tmp_path / "two.fa"),
                      cfg)
    assert (tmp_path / "one.fa").read_bytes() == (tmp_path / "two.fa").read_bytes()
