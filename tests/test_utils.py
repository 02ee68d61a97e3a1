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
