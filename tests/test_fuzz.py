"""Ingest-path fuzzing (VERDICT r3 missing #3): internally inconsistent PAF
rows — coordinates past sequence ends, inverted/zero-length blocks,
nmatch > blocklen, negative starts, values near/over int32 limits, duplicate
rows — must each be rejected by a NAMED filter rule or produce finite,
in-range geometry; the full pipeline on a poisoned dataset must neither crash
nor misjoin."""

import dataclasses

import numpy as np
import pytest

from telomeri_tpu.config import ScaffoldConfig
from telomeri_tpu.io.geometry import build_edges, malformed_mask
from telomeri_tpu.io.paf import PafRecords, parse_paf

I32 = np.iinfo(np.int32)


def _mk_paf(rows):
    """rows: (qid, qlen, qs, qe, strand, tid, tlen, ts, te, nm, bl)."""
    a = np.array(rows, dtype=np.int64)
    return PafRecords(
        qid=a[:, 0].astype(np.int32), qlen=a[:, 1].astype(np.int32),
        qstart=a[:, 2].astype(np.int32), qend=a[:, 3].astype(np.int32),
        strand=a[:, 4].astype(np.int8), tid=a[:, 5].astype(np.int32),
        tlen=a[:, 6].astype(np.int32), tstart=a[:, 7].astype(np.int32),
        tend=a[:, 8].astype(np.int32), nmatch=a[:, 9].astype(np.int32),
        blocklen=a[:, 10].astype(np.int32))


def _fuzz_rows(rng, n, n_seqs):
    """Mix of plausible and corrupted rows (seeded, deterministic)."""
    rows = []
    for _ in range(n):
        ql, tl = int(rng.integers(1, 50_000)), int(rng.integers(1, 50_000))
        qs = int(rng.integers(0, ql)); qe = int(rng.integers(qs + 1, ql + 1))
        ts = int(rng.integers(0, tl)); te = int(rng.integers(ts + 1, tl + 1))
        bl = max(qe - qs, te - ts)
        nm = int(rng.integers(0, bl + 1))
        row = [int(rng.integers(0, n_seqs)), ql, qs, qe, int(rng.integers(0, 2)),
               int(rng.integers(0, n_seqs)), tl, ts, te, nm, bl]
        kind = rng.integers(0, 10)
        if kind == 0:
            row[3] = ql + int(rng.integers(1, 1000))        # qe past qlen
        elif kind == 1:
            row[9] = bl + int(rng.integers(1, 1000))        # nmatch > blocklen
        elif kind == 2:
            row[3] = row[2]                                 # zero-length block
        elif kind == 3:
            row[7], row[8] = te, ts if ts < te else te - 1  # inverted block
        elif kind == 4:
            row[2] = -int(rng.integers(1, 1000))            # negative start
        elif kind == 5:
            row[10] = 0                                     # zero blocklen
        elif kind == 6:
            row[1] = 0                                      # zero-length seq
        elif kind == 7:                                     # near int32 limits
            row[1] = I32.max; row[2] = I32.max - int(rng.integers(1, 10_000))
            row[3] = I32.max; row[6] = I32.max
            row[8] = int(rng.integers(1, I32.max))
            row[7] = max(0, row[8] - int(rng.integers(1, 10_000)))
            row[10] = I32.max; row[9] = int(rng.integers(0, I32.max))
        # kind 8-9: leave plausible
        rows.append(row)
        if rng.random() < 0.2:
            rows.append(list(row))                          # duplicate row
    return rows


def _assert_edges_sane(paf, edges, st, seq_len):
    assert st.n_rows == len(paf)
    drops = (st.n_malformed + st.n_self + st.n_low_identity + st.n_short
             + st.n_internal + st.n_contained + st.n_high_overhang)
    assert drops + st.n_kept == st.n_rows       # every row has a named fate
    assert len(edges) == 2 * st.n_kept
    if not len(edges):
        return
    for a in (edges.es, edges.os_):
        assert np.isfinite(a).all()
    # geometry invariants rule 0 guarantees for every KEPT row (negative values
    # here are exactly what poisons scores and stitch coordinates)
    assert (edges.ol1 >= 1).all() and (edges.ol2 >= 1).all()
    assert (edges.oh1 >= 0).all() and (edges.oh2 >= 0).all()
    assert (edges.adv >= 0).all()
    assert (edges.nm >= 0).all() and (edges.bl >= 1).all()
    assert (edges.nm <= edges.bl).all()
    # stitch coordinates inside their sequences
    src_len = seq_len[edges.src // 2]
    dst_len = seq_len[edges.dst // 2]
    assert (edges.ue >= 0).all() and (edges.ue <= src_len).all()
    assert (edges.ve >= 0).all() and (edges.ve <= dst_len).all()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzzed_rows_named_fate_or_finite(seed):
    rng = np.random.default_rng(seed)
    n_seqs = 40
    paf = _mk_paf(_fuzz_rows(rng, 400, n_seqs))
    # overlap_geometry/build_edges never see a length table; invent one that
    # matches the per-row qlen/tlen claims closely enough for the ue/ve check
    # (the claims are what the stitcher would trust)
    cfg = ScaffoldConfig(min_identity=0.0, min_overlap=1)
    edges, st = build_edges(paf, cfg, n_seqs)
    # derive each sequence's length as the max any kept row claims (the
    # stitcher slices by actual stored sequences; this bounds ue/ve sanity)
    seq_len = np.zeros(n_seqs, np.int64)
    for sid, ln in ((paf.qid, paf.qlen), (paf.tid, paf.tlen)):
        np.maximum.at(seq_len, sid, ln)
    _assert_edges_sane(paf, edges, st, seq_len)
    assert st.n_malformed > 0                   # the fuzz really injected garbage


def test_malformed_mask_named_cases():
    rows = [
        [0, 1000, 0, 500, 0, 1, 1000, 0, 500, 450, 500],    # sane
        [0, 1000, 0, 1200, 0, 1, 1000, 0, 500, 450, 500],   # qe > qlen
        [0, 1000, 0, 500, 0, 1, 1000, 0, 500, 600, 500],    # nmatch > blocklen
        [0, 1000, 300, 300, 0, 1, 1000, 0, 500, 100, 500],  # zero-length block
        [0, 1000, 0, 500, 0, 1, 1000, 400, 200, 100, 500],  # inverted t block
        [0, 1000, -5, 500, 0, 1, 1000, 0, 500, 450, 500],   # negative start
        [0, 1000, 0, 500, 0, 1, 1000, 0, 500, 450, 0],      # zero blocklen
        [0, 0, 0, 0, 0, 1, 1000, 0, 500, 450, 500],         # zero-length seq
    ]
    bad = malformed_mask(_mk_paf(rows))
    assert bad.tolist() == [False] + [True] * 7


def test_fuzzed_paf_file_parses_and_filters(tmp_path):
    """File-level: the same garbage through the REAL parser (native C++ when
    built, else Python) — parse must not crash, and build_edges must give every
    row a named fate. Includes values that overflow int32 at the SoA cast."""
    rng = np.random.default_rng(7)
    names = [f"s{i}" for i in range(10)]
    lines = []
    for row in _fuzz_rows(rng, 150, 10):
        qn, tn = names[row[0]], names[row[5]]
        strand = "-" if row[4] else "+"
        lines.append("\t".join(
            [qn, str(row[1]), str(row[2]), str(row[3]), strand, tn]
            + [str(x) for x in row[6:]]))
    # int64-scale values: wrap at the int32 cast; must not crash anywhere
    lines.append(f"s0\t{2**33}\t0\t{2**33}\t+\ts1\t{2**33}\t0\t{2**33}\t10\t20")
    p = tmp_path / "fuzz.paf"
    p.write_text("\n".join(lines) + "\n")
    paf = parse_paf(str(p), {n: i for i, n in enumerate(names)})
    assert len(paf) == len(lines)
    cfg = ScaffoldConfig(min_identity=0.0, min_overlap=1)
    edges, st = build_edges(paf, cfg, 10)
    seq_len = np.zeros(10, np.int64)
    for sid, ln in ((paf.qid, paf.qlen), (paf.tid, paf.tlen)):
        np.maximum.at(seq_len, sid, np.maximum(ln, 0))
    _assert_edges_sane(paf, edges, st, seq_len)


def test_poisoned_pipeline_no_crash_no_misjoin(tmp_path):
    """A healthy simulated dataset with garbage rows appended to both PAF files
    (real sequence names, corrupt coordinates) must scaffold normally: no
    crash, no misjoin, poison dropped under rule 0."""
    from telomeri_tpu.pipeline import run_pipeline
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    sim = simulate(SimConfig(
        genome_len=120_000, repeat_len=4_000, n_repeat_copies=3,
        read_len_mean=2_500, read_len_sd=400, coverage=15.0,
        error_rate=0.02, seed=11))
    d = tmp_path / "data"
    write_dataset(sim, str(d))
    rng = np.random.default_rng(13)
    with open(d / "reads.fa") as f:
        read_names = [l[1:].strip() for l in f if l.startswith(">")]
    n_ctg = sum(1 for l in open(d / "contigs.fa") if l.startswith(">"))
    poison = []
    for _ in range(200):
        a = read_names[int(rng.integers(0, len(read_names)))]
        b = read_names[int(rng.integers(0, len(read_names)))]
        if a == b:
            continue
        ql = int(rng.integers(1, 5000))
        poison.append(f"{a}\t{ql}\t{-int(rng.integers(1, 99))}\t"
                      f"{ql + int(rng.integers(1, 500))}\t+\t{b}\t0\t"
                      f"{int(rng.integers(0, 5000))}\t{int(rng.integers(0, 2))}\t"
                      f"{int(rng.integers(500, 5000))}\t0")
    for fn in ("read2contig.paf", "read2read.paf"):
        with open(d / fn, "a") as f:
            f.write("\n".join(poison) + "\n")
    cfg = ScaffoldConfig(mc_walks_per_end=60, max_steps=24)
    res = run_pipeline(f"{d}/contigs.fa", f"{d}/reads.fa",
                       f"{d}/read2contig.paf", f"{d}/read2read.paf",
                       str(tmp_path / "out.fa"), cfg)
    fstats = res.metrics.as_dict()["metrics"]["filter"]
    assert fstats["n_malformed"] >= len(poison)       # both files poisoned
    adjacent = {(2 * c, 2 * c + 2) for c in range(n_ctg - 1)}
    pairs = {b.pair for b in res.accepted}
    assert pairs <= adjacent, f"misjoin from poisoned input: {pairs - adjacent}"
    assert len(res.scaffolds) >= 1
    # junction-level ground-truth check: no collapsed junction identity
    from telomeri_tpu.io.fasta import SequenceSet
    from telomeri_tpu.utils.validate import (
        junctions_from_segments,
        validate_assembly,
    )

    rep = validate_assembly(
        SequenceSet([s.name for s in res.scaffolds],
                    [np.frombuffer(s.seq.tobytes(), np.uint8)
                     for s in res.scaffolds]),
        SequenceSet(["genome"], [sim.genome]),
        junctions={s.name: junctions_from_segments(s.segments)
                   for s in res.scaffolds})
    assert rep["worst_identity"] > 0.9
