"""Mid-scale end-to-end regression (BASELINE.md config #2 analog, quarter scale):
many repeat junctions, PacBio-like error rate, single-scaffold reconstruction."""

import numpy as np

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.pipeline import build_graph, load_inputs, run_pipeline
from telomeri_tpu.sim import SimConfig, simulate, write_dataset


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
