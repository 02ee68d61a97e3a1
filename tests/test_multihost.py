"""True multi-process multi-host test (SURVEY.md §5 item 6, §6 comm backend):
two jax.distributed processes (4 virtual CPU devices each, Gloo collectives) must
produce identical consensus on every rank, equal to the single-process result."""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]; lam = sys.argv[4]
placement = sys.argv[5] if len(sys.argv) > 5 else "replicated"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.pipeline import build_graph, load_inputs
from telomeri_tpu.dist.mesh import make_walk_mesh, run_walks_distributed
from telomeri_tpu.consensus.grouping import compress
from telomeri_tpu.walk.plan import plan_walks

cfg = ScaffoldConfig(mc_walks_per_end=64, max_steps=24, graph_placement=placement)
contigs, reads, paf = load_inputs(f"{lam}/contigs.fa", f"{lam}/reads.fa",
                                  f"{lam}/read2contig.paf", f"{lam}/read2read.paf")
edges, graph = build_graph(contigs, reads, paf, cfg)
mesh = make_walk_mesh()
plan = plan_walks(graph, cfg, n_shards=mesh.size)
res, cons = run_walks_distributed(graph, plan, cfg, mesh)
print("BRIDGES=" + repr(compress(cons)), flush=True)
"""

LAMBDA = os.path.join(os.path.dirname(__file__), "..", "testdata", "lambda")


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("placement", ["replicated", "rowshard"])
def test_two_process_multihost(tmp_path, placement):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(LAMBDA) and
               os.path.abspath(os.path.join(LAMBDA, "..", "..")))
    port = str(_free_port())
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), "2", port, LAMBDA,
                          placement],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-2000:]
        outs.append(next(l for l in out.splitlines() if l.startswith("BRIDGES=")))
    assert outs[0] == outs[1], "ranks disagree"

    # equal to the single-process result
    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.consensus.grouping import compress, group_and_select, summarize
    from telomeri_tpu.pipeline import build_graph, load_inputs
    from telomeri_tpu.walk.engine import run_walks_host
    from telomeri_tpu.walk.plan import plan_walks

    cfg = ScaffoldConfig(mc_walks_per_end=64, max_steps=24)
    contigs, reads, paf = load_inputs(
        f"{LAMBDA}/contigs.fa", f"{LAMBDA}/reads.fa",
        f"{LAMBDA}/read2contig.paf", f"{LAMBDA}/read2read.paf")
    edges, graph = build_graph(contigs, reads, paf, cfg)
    plan = plan_walks(graph, cfg, n_shards=8)
    walks = run_walks_host(graph, plan, cfg)
    rows = compress(group_and_select(
        summarize(walks, plan.uid, virtual_base=graph.virtual_base),
        n_anchors=graph.n_anchors, group_window=cfg.group_window,
        min_support=cfg.min_group_support, support=cfg.support_mode))
    assert outs[0] == "BRIDGES=" + repr(rows)


PIPELINE_WORKER = r"""
import os, sys, hashlib
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]; d = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.dist.mesh import make_walk_mesh
from telomeri_tpu.pipeline import run_pipeline

cfg = ScaffoldConfig(mc_walks_per_end=48, max_steps=16)
out = f"{d}/out_rank{pid}.fa"
res = run_pipeline(f"{d}/contigs.fa", f"{d}/reads.fa", f"{d}/read2contig.paf",
                   f"{d}/read2read.paf", out, cfg, mesh=make_walk_mesh())
m = res.metrics.values
print("GATEFIRE=" + repr((m.get("n_bridges_cut_refused", 0),
                          m.get("n_ends_blocked", 0))), flush=True)
print("FASTA=" + hashlib.sha256(open(out, "rb").read()).hexdigest(), flush=True)
"""


@pytest.mark.slow
def test_two_process_full_pipeline_with_gate(tmp_path):
    """Full pipeline (walks + read-diverse consensus + cut-read gate +
    blockers + stitch) across TWO jax.distributed processes on a dataset where
    the gate fires: the gate's flagged rows and the stitcher's representative
    rows live walk-sharded across processes and must be fetched via
    collectives (the round-3 rescue crash class, ADVICE r3 item 1). Both
    ranks' FASTAs must equal the single-process run's bytes."""
    import hashlib

    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.pipeline import run_pipeline
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    d = str(tmp_path / "data")
    sim = simulate(SimConfig(
        genome_len=150_000, repeat_len=3_000, n_repeat_copies=3,
        read_len_mean=2_500, read_len_sd=400, coverage=14.0,
        error_rate=0.02, chimera_rate=0.25, seed=3))
    assert sim.chimeric
    write_dataset(sim, d)

    script = tmp_path / "worker.py"
    script.write_text(PIPELINE_WORKER)
    env = dict(os.environ,
               PYTHONPATH=os.path.abspath(os.path.join(LAMBDA, "..", "..")))
    port = str(_free_port())
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), "2", port, d],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        outs.append({l.split("=", 1)[0]: l.split("=", 1)[1]
                     for l in out.splitlines()
                     if l.startswith(("GATEFIRE=", "FASTA="))})
    assert outs[0] == outs[1], "ranks disagree"
    refused, blocked = eval(outs[0]["GATEFIRE"])
    assert refused > 0 and blocked > 0, "the gate never fired: weak test"

    # equal to the single-process run
    cfg = ScaffoldConfig(mc_walks_per_end=48, max_steps=16)
    res = run_pipeline(f"{d}/contigs.fa", f"{d}/reads.fa",
                      f"{d}/read2contig.paf", f"{d}/read2read.paf",
                      str(tmp_path / "single.fa"), cfg)
    assert res.metrics.values["n_bridges_cut_refused"] == refused
    h = hashlib.sha256(open(tmp_path / "single.fa", "rb").read()).hexdigest()
    assert outs[0]["FASTA"] == h
