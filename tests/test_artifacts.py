"""Checkpoint/resume artifact round-trips (SURVEY.md §6) and resumed-pipeline parity."""

import os

import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.artifacts import load_graph, load_walks, save_graph, save_walks
from telomeri_tpu.pipeline import run_pipeline

CFG = ScaffoldConfig(mc_walks_per_end=30, max_steps=16)


def _paths(d):
    return [os.path.join(d, f) for f in
            ("contigs.fa", "reads.fa", "read2contig.paf", "read2read.paf")]


def test_graph_artifact_roundtrip(toy_dataset_dir, tmp_path):
    from telomeri_tpu.pipeline import build_graph, load_inputs

    contigs, reads, paf = load_inputs(*_paths(toy_dataset_dir))
    edges, graph = build_graph(contigs, reads, paf, CFG)
    p = str(tmp_path / "g.npz")
    save_graph(p, edges, graph, CFG)
    e2, g2 = load_graph(p, CFG)
    np.testing.assert_array_equal(edges.src, e2.src)
    np.testing.assert_array_equal(edges.es, e2.es)
    np.testing.assert_array_equal(edges.el, e2.el)
    np.testing.assert_array_equal(graph.nbr, g2.nbr)
    np.testing.assert_array_equal(graph.edge_adv, g2.edge_adv)
    assert g2.n_anchors == graph.n_anchors
    assert g2.stats == graph.stats


def test_wrong_kind_rejected(toy_dataset_dir, tmp_path):
    from telomeri_tpu.pipeline import build_graph, load_inputs

    contigs, reads, paf = load_inputs(*_paths(toy_dataset_dir))
    edges, graph = build_graph(contigs, reads, paf, CFG)
    p = str(tmp_path / "g.npz")
    save_graph(p, edges, graph, CFG)
    with pytest.raises(ValueError, match="expected 'walks'"):
        load_walks(p, CFG)


def test_resume_from_artifacts_identical_output(toy_dataset_dir, tmp_path):
    args = _paths(toy_dataset_dir)
    out0 = str(tmp_path / "direct.fa")
    gp = str(tmp_path / "graph.npz")
    wp = str(tmp_path / "walks.npz")
    run_pipeline(*args, out0, CFG, save_graph_path=gp, save_walks_path=wp)

    out1 = str(tmp_path / "from_graph.fa")
    run_pipeline(args[0], args[1], None, None, out1, CFG, graph_artifact=gp)
    assert open(out1, "rb").read() == open(out0, "rb").read()

    out2 = str(tmp_path / "from_walks.fa")
    run_pipeline(args[0], args[1], None, None, out2, CFG,
                 graph_artifact=gp, walks_artifact=wp)
    assert open(out2, "rb").read() == open(out0, "rb").read()


def test_graph_artifact_preserves_cumw(tmp_path):
    """Resumed graphs must carry the tensorize-time MC cumsum byte-for-byte
    (its int32 overflow guard runs only at tensorize time)."""
    import numpy as np

    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.io.artifacts import load_graph, save_graph
    from telomeri_tpu.pipeline import build_graph, load_inputs
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    d = str(tmp_path)
    write_dataset(simulate(SimConfig(genome_len=16000, repeat_len=1000,
                                     n_repeat_copies=2, read_len_mean=900,
                                     read_len_sd=120, coverage=10.0,
                                     error_rate=0.02, seed=0)), d)
    cfg = ScaffoldConfig()
    contigs, reads, paf = load_inputs(
        f"{d}/contigs.fa", f"{d}/reads.fa",
        f"{d}/read2contig.paf", f"{d}/read2read.paf")
    edges, graph = build_graph(contigs, reads, paf, cfg)
    assert graph.cumw is not None
    p = f"{d}/g.npz"
    save_graph(p, edges, graph, cfg)
    _, g2 = load_graph(p, cfg)
    assert g2.cumw is not None
    assert np.array_equal(g2.cumw, graph.cumw)


def test_graph_artifact_roundtrips_split_read_flags(tmp_path, toy_sim):
    """Round 4: the split-mapped (chimera-suspect) flags must survive the graph
    artifact (the cut-read gate keys on them), and a pre-round-4 artifact
    without the field must load with split_read=None (gate falls back to
    conservative refusal)."""
    import numpy as np

    from telomeri_tpu.io.artifacts import load_graph, save_graph
    from telomeri_tpu.pipeline import build_graph, load_inputs
    from telomeri_tpu.sim import write_dataset

    d = tmp_path / "data"
    write_dataset(toy_sim, str(d))
    contigs, reads, paf = load_inputs(
        str(d / "contigs.fa"), str(d / "reads.fa"),
        str(d / "read2contig.paf"), str(d / "read2read.paf"))
    edges, graph = build_graph(contigs, reads, paf, CFG)
    assert graph.split_read is not None
    p = str(tmp_path / "g.npz")
    save_graph(p, edges, graph, CFG)
    _, g2 = load_graph(p, CFG)
    np.testing.assert_array_equal(g2.split_read, graph.split_read)

    # simulate a pre-round-4 artifact: drop the field and re-save
    graph.split_read = None
    p_old = str(tmp_path / "g_old.npz")
    save_graph(p_old, edges, graph, CFG)
    _, g3 = load_graph(p_old, CFG)
    assert g3.split_read is None
