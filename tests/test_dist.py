"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §5 items 5-6):
sharded walks + gathered consensus must equal the single-device results exactly."""

import os

import jax
import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.consensus.grouping import compress, group_and_select, summarize
from telomeri_tpu.dist.mesh import make_walk_mesh, run_walks_distributed, shard_plan
from telomeri_tpu.pipeline import run_pipeline
from telomeri_tpu.walk.engine import run_walks_host
from telomeri_tpu.walk.plan import plan_walks

CFG = ScaffoldConfig(mc_walks_per_end=40, max_steps=16)


@pytest.fixture(scope="module")
def toy_graph(toy_sim, tmp_path_factory):
    from telomeri_tpu.pipeline import build_graph, load_inputs
    from telomeri_tpu.sim import write_dataset

    d = tmp_path_factory.mktemp("dist_toy")
    write_dataset(toy_sim, str(d))
    contigs, reads, paf = load_inputs(
        str(d / "contigs.fa"), str(d / "reads.fa"),
        str(d / "read2contig.paf"), str(d / "read2read.paf"))
    edges, graph = build_graph(contigs, reads, paf, CFG)
    return graph


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_walks_equal_single_device(toy_graph, n_dev):
    g = toy_graph
    plan = plan_walks(g, CFG, n_shards=n_dev)
    ref = run_walks_host(g, plan, CFG)

    mesh = make_walk_mesh(n_dev)
    res, cons = run_walks_distributed(g, plan, CFG, mesh)
    res = res.to_numpy()

    np.testing.assert_array_equal(ref.nodes, res.nodes)
    np.testing.assert_array_equal(ref.terminal, res.terminal)
    np.testing.assert_array_equal(ref.path_len, res.path_len)
    np.testing.assert_array_equal(ref.success, res.success)
    np.testing.assert_array_equal(np.asarray(ref.score_sum), np.asarray(res.score_sum))


def test_sharded_consensus_equals_single_device(toy_graph):
    g = toy_graph
    plan = plan_walks(g, CFG, n_shards=8)
    ref_walks = run_walks_host(g, plan, CFG)
    ref_cons = compress(group_and_select(
        summarize(ref_walks, plan.uid, virtual_base=g.virtual_base),
        n_anchors=g.n_anchors, group_window=CFG.group_window,
        min_support=CFG.min_group_support, support=CFG.support_mode))

    mesh = make_walk_mesh(8)
    _, cons = run_walks_distributed(g, plan, CFG, mesh)
    assert compress(cons) == ref_cons


def test_plan_shard_divisibility(toy_graph):
    mesh = make_walk_mesh(8)
    plan = plan_walks(toy_graph, CFG, n_shards=3)  # padded for 3, not for 8
    if len(plan) % 8 != 0:
        with pytest.raises(ValueError):
            shard_plan(plan, mesh)


def test_pipeline_output_identical_with_mesh(toy_dataset_dir, tmp_path):
    args = [os.path.join(toy_dataset_dir, f) for f in
            ("contigs.fa", "reads.fa", "read2contig.paf", "read2read.paf")]
    out1 = str(tmp_path / "single.fa")
    out8 = str(tmp_path / "mesh8.fa")
    run_pipeline(*args, out1, CFG)
    run_pipeline(*args, out8, CFG, mesh=make_walk_mesh(8))
    assert open(out1, "rb").read() == open(out8, "rb").read(), \
        "N-device output must be byte-identical to single-device output"


def test_mesh_pipeline_with_cut_read_blockers(tmp_path):
    """The cut-read gate's MESH branch (flagged rows fetched via the
    stitch-stage collective) and blocker semantics must reproduce the
    single-device output byte-for-byte on a chimera-bearing dataset where the
    gate actually fires."""
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    sim = simulate(SimConfig(
        genome_len=200_000, repeat_len=4_000, n_repeat_copies=4,
        read_len_mean=3_000, read_len_sd=500, coverage=15.0,
        error_rate=0.02, chimera_rate=0.2,
        dropout_len=10_000, dropout_starts=(33_800,), seed=3))
    d = str(tmp_path / "data")
    write_dataset(sim, d)
    args = [f"{d}/{f}" for f in
            ("contigs.fa", "reads.fa", "read2contig.paf", "read2read.paf")]
    cfg = ScaffoldConfig(mc_walks_per_end=64, max_steps=16)
    r1 = run_pipeline(*args, str(tmp_path / "one.fa"), cfg)
    # the gate must really fire on this dataset for the test to mean anything
    assert r1.metrics.values["n_bridges_cut_refused"] > 0
    assert r1.metrics.values["n_ends_blocked"] > 0
    run_pipeline(*args, str(tmp_path / "mesh.fa"), cfg, mesh=make_walk_mesh(8))
    assert open(tmp_path / "one.fa", "rb").read() == \
        open(tmp_path / "mesh.fa", "rb").read()
