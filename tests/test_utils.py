"""Stats + gzip IO tests."""

import gzip

import numpy as np

from telomeri_tpu.io.fasta import read_fasta
from telomeri_tpu.io.paf import parse_paf
from telomeri_tpu.utils.stats import assembly_stats


def test_n50():
    s = assembly_stats([10, 20, 30, 40])  # total 100, cum desc: 40,70,90,100
    assert s["n50"] == 30 and s["l50"] == 2
    assert s["n90"] == 20
    assert s["max_len"] == 40 and s["total_bp"] == 100


def test_n50_single():
    s = assembly_stats([42])
    assert s["n50"] == 42 and s["l50"] == 1


def test_empty_stats():
    assert assembly_stats([])["n50"] == 0


def test_gzip_fasta(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">a\nACGT\n>b\nGG\n")
    got = read_fasta(str(p))
    assert got.names == ["a", "b"]
    assert got.seqs[0].tobytes() == b"ACGT"


def test_gzip_paf(tmp_path):
    p = tmp_path / "o.paf.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"r1\t100\t5\t95\t+\tc1\t500\t400\t490\t85\t90\t255\n")
    rec = parse_paf(str(p), {"r1": 1, "c1": 0})
    assert len(rec) == 1 and rec.tend[0] == 490


def test_config_rejects_zero_structurals():
    import pytest

    from telomeri_tpu.config import ScaffoldConfig

    for f in ("max_degree", "max_steps", "group_window", "walk_batch_multiple"):
        with pytest.raises(ValueError, match=f):
            ScaffoldConfig(**{f: 0})
    ScaffoldConfig(mc_walks_per_end=0)  # legitimate: greedy-only run
    with pytest.raises(ValueError, match="rescue_rounds"):
        ScaffoldConfig(rescue_rounds=64)  # uid0 would leave int32 (rescue.py)
    ScaffoldConfig(rescue_rounds=0)       # legitimate: rescue disabled


def test_bucket_len_properties():
    from telomeri_tpu.utils.shapes import bucket_len

    assert bucket_len(0, 8) == 0
    seen = set()
    prev = 0
    for n in range(1, 200_000, 37):
        b = bucket_len(n, 8)
        assert b >= n and b % 8 == 0
        assert b <= max(n * 1.125 + 8, 8), (n, b)   # <= ~12.5% waste
        assert b >= prev                            # monotone
        prev = b
        seen.add(b)
    # bounded shape family (~8-16 per power of two) vs ~5400 exact multiples of 8
    assert len(seen) < 150


def test_bucket_len_multiple_respected():
    from telomeri_tpu.utils.shapes import bucket_len

    for m in (1, 8, 24, 640):
        for n in (1, 5, 100, 12345):
            assert bucket_len(n, m) % m == 0
            assert bucket_len(n, m) >= n


def test_dispatch_watchdog(tmp_path, caplog):
    """utils/watchdog.py: per-dispatch metrics, cross-run EWMA history, slow-
    dispatch warning, and a live in-flight hang warning."""
    import logging
    import time as _time

    from telomeri_tpu.utils import watchdog as wd
    from telomeri_tpu.utils.logging import Metrics

    hist = str(tmp_path / "hist.json")
    m = Metrics()
    w = wd.DispatchWatch(m, history_path=hist)
    with w.watch("stage:1024"):
        _time.sleep(0.01)
    rec = m.values["dispatches"]["stage:1024"]
    assert len(rec["s"]) == 1 and rec["s"][0] >= 0.01 and not rec["slow"]
    # history persisted
    w2 = wd.DispatchWatch(Metrics(), history_path=hist)
    assert w2.history["stage:1024"] > 0

    # completed-dispatch slowness: plant a tiny history, run a "slow" dispatch
    import json as _json

    with open(hist, "w") as f:
        _json.dump({"stage:1024": 0.001}, f)
    m3 = Metrics()
    w3 = wd.DispatchWatch(m3, history_path=hist)
    with caplog.at_level(logging.WARNING, logger="telomeri_tpu"):
        with w3.watch("stage:1024"):
            _time.sleep(0.01)
    # 0.01s vs 0.001 hist is 10x but under the 1.0s threshold floor: no warning
    assert not any("its usual" in r.message for r in caplog.records)
    assert not m3.values["dispatches"]["stage:1024"]["slow"]

    # POSITIVE path: drop the floor so a 0.02s dispatch against a 0.002s
    # history trips the 5x warning (real dispatches need > 5s)
    with open(hist, "w") as f:
        _json.dump({"stage:2048": 0.002}, f)
    m4 = Metrics()
    w4 = wd.DispatchWatch(m4, history_path=hist)
    old = wd._WARN_FACTOR

    try:
        wd._WARN_FACTOR = 0.005   # threshold = 0.005 * max(0.002, 1.0) = 5 ms
        with caplog.at_level(logging.WARNING, logger="telomeri_tpu"):
            with w4.watch("stage:2048"):
                _time.sleep(0.02)
    finally:
        wd._WARN_FACTOR = old
    assert any("its usual" in r.message for r in caplog.records)
    assert m4.values["dispatches"]["stage:2048"]["slow"]

    # in-flight hang warning fires while the dispatch is still running
    old_floor, old_repeat = wd._HANG_FLOOR_S, wd._REPEAT_S
    wd._HANG_FLOOR_S, wd._REPEAT_S = 0.05, 0.05
    try:
        with caplog.at_level(logging.WARNING, logger="telomeri_tpu"):
            with wd.DispatchWatch(Metrics(), history_path=hist).watch("hang:1"):
                _time.sleep(0.25)
        assert any("still in flight" in r.message for r in caplog.records)
    finally:
        wd._HANG_FLOOR_S, wd._REPEAT_S = old_floor, old_repeat


def test_pipeline_records_dispatches(tmp_path):
    """run_pipeline's metrics JSON gains per-dispatch stats (VERDICT r2 item 6)."""
    import os

    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.pipeline import run_pipeline
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    d = str(tmp_path / "data")
    write_dataset(simulate(SimConfig(genome_len=30_000, repeat_len=1_500,
                                     coverage=10.0, seed=2)), d)
    res = run_pipeline(
        os.path.join(d, "contigs.fa"), os.path.join(d, "reads.fa"),
        os.path.join(d, "read2contig.paf"), os.path.join(d, "read2read.paf"),
        str(tmp_path / "o.fa"),
        ScaffoldConfig(mc_walks_per_end=16, max_steps=12))
    disp = res.metrics.values.get("dispatches", {})
    assert any(k.startswith("run_walks:") for k in disp), disp
    rec = next(v for k, v in disp.items() if k.startswith("run_walks:"))
    assert rec["s"] and rec["hist_s"] is not None


def test_config_from_json_legacy_vs_typo_fields():
    """Advisor r4 item 4: known-removed legacy fields (mc_phase_steps) load
    with a warning in any mode, but a typo'd field in a USER config must
    raise with a did-you-mean hint instead of silently using the default.
    strict=False keeps the fully tolerant behavior."""
    import json

    import pytest

    from telomeri_tpu.config import ScaffoldConfig

    d = json.loads(ScaffoldConfig().to_json())
    d["mc_phase_steps"] = 8                      # legacy: always tolerated
    assert ScaffoldConfig.from_json(json.dumps(d)) == ScaffoldConfig()

    d["min_identitiy"] = 0.9                     # typo: strict raises w/ hint
    with pytest.raises(ValueError, match="min_identity"):
        ScaffoldConfig.from_json(json.dumps(d))
    assert ScaffoldConfig.from_json(json.dumps(d), strict=False) == \
        ScaffoldConfig()
