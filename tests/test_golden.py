"""Golden end-to-end test on the checked-in lambda toy dataset (SURVEY.md §5 item 4;
BASELINE.md config #1). The golden FASTA was produced by this pipeline on the CPU
backend; any semantic change to filters, scores, walks, consensus, conflict
resolution, or stitching shows up as a byte diff here (regenerate deliberately with
the script in the module docstring below when the change is intended).

Regenerate: python - <<'EOF'  (forces CPU; see testdata/lambda/config.json)
import jax; jax.config.update("jax_platforms", "cpu")
from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.pipeline import run_pipeline
cfg = ScaffoldConfig.from_json(open("testdata/lambda/config.json").read())
run_pipeline("testdata/lambda/contigs.fa", "testdata/lambda/reads.fa",
             "testdata/lambda/read2contig.paf", "testdata/lambda/read2read.paf",
             "testdata/lambda/golden_scaffolds.fa", cfg)
EOF
"""

import os

import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.fasta import read_fasta
from telomeri_tpu.pipeline import run_pipeline

DATA = os.path.join(os.path.dirname(__file__), "..", "testdata", "lambda")


@pytest.fixture(scope="module")
def golden_run(tmp_path_factory):
    cfg = ScaffoldConfig.from_json(open(os.path.join(DATA, "config.json")).read())
    out = str(tmp_path_factory.mktemp("golden") / "scaffolds.fa")
    res = run_pipeline(
        os.path.join(DATA, "contigs.fa"), os.path.join(DATA, "reads.fa"),
        os.path.join(DATA, "read2contig.paf"), os.path.join(DATA, "read2read.paf"),
        out, cfg)
    return res, out


def test_byte_identical_to_golden(golden_run):
    _, out = golden_run
    got = open(out, "rb").read()
    want = open(os.path.join(DATA, "golden_scaffolds.fa"), "rb").read()
    assert got == want


def test_golden_reconstructs_genome(golden_run):
    res, _ = golden_run
    genome = read_fasta(os.path.join(DATA, "genome.fa")).seqs[0]
    assert len(res.scaffolds) == 1
    sc = res.scaffolds[0].seq
    assert len(sc) == len(genome)
    assert float(np.mean(sc == genome)) > 0.99
