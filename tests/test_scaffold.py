"""Unit tests for bridge conflict resolution and the stitcher (SURVEY.md §5 item 1)."""

import numpy as np

from telomeri_tpu.io.fasta import SequenceSet, reverse_complement
from telomeri_tpu.io.geometry import EdgeSoA
from telomeri_tpu.scaffold.bridge import End, make_bridge, resolve_conflicts, start_end, terminal_end
from telomeri_tpu.scaffold.stitch import Stitcher, WalkPath, _Splicer


def test_end_mapping():
    # u = 2c+o: start leaves Right if forward, Left if reverse
    assert start_end(4) == End(2, True)
    assert start_end(5) == End(2, False)
    # v = 2c+o: arrival enters Left if forward, Right if reverse
    assert terminal_end(6) == End(3, False)
    assert terminal_end(7) == End(3, True)


def row(pair, count, score=1.0, uid=0):
    return dict(pair=pair, count=count, bucket=0, rep_uid=uid, rep_score=score)


def test_conflict_resolution_greedy_by_count():
    # two bridges compete for contig 0's Right end (node 0): higher count wins
    rows = [row((0, 2), 3, uid=1), row((0, 4), 5, uid=2)]
    acc = resolve_conflicts(rows)
    assert len(acc) == 1 and acc[0].pair == (0, 4)


def test_conflict_resolution_cycle_rejected():
    # 0R-1L, 1R-2L accepted; then 2R-0L would close a cycle
    rows = [
        row((0, 2), 5, uid=1),   # leaves 0R, arrives 1L
        row((2, 4), 4, uid=2),   # leaves 1R, arrives 2L
        row((4, 0), 3, uid=3),   # leaves 2R, arrives 0L -> cycle
    ]
    acc = resolve_conflicts(rows)
    assert len(acc) == 2
    assert {b.pair for b in acc} == {(0, 2), (2, 4)}


def test_conflict_resolution_inversion_self_loop_rejected():
    # pair (2c, 2c+1): start end (c,R), terminal end (c,R) -> same physical end
    acc = resolve_conflicts([row((0, 1), 9)])
    assert acc == []


def test_splicer_trim_across_chunks():
    sp = _Splicer(np.arange(10, dtype=np.uint8))
    sp.append(np.arange(10, 20, dtype=np.uint8))
    sp.trim_to(5)
    assert sp.length == 5
    sp.append(np.array([99], np.uint8))
    assert list(sp.result()) == [0, 1, 2, 3, 4, 99]


def _seq(s):
    return np.frombuffer(s.encode(), dtype=np.uint8)


def test_stitch_simple_overlap():
    # genome AAAACCGGGGTTTT: contig0 [0:6], read0 [4:10], contig1 [8:14]
    # read0 overlaps contig1 "GGTTTT" on "GG": edge 2->... contig1 node = 2*1=2 -> careful:
    # seq ids: contigs [0,1], reads [2]; node(contig0,+)=0, node(contig1,+)=2, node(read0,+)=4
    contigs = SequenceSet(["c0", "c1"], [_seq("AAAACC"), _seq("GGTTTT")])
    reads = SequenceSet(["r0"], [_seq("CCGGGG")])
    edges = EdgeSoA(
        src=np.array([0, 5, 4, 3], np.int32),
        dst=np.array([4, 1, 2, 5], np.int32),
        os_=np.zeros(4, np.float32), es=np.zeros(4, np.float32),
        adv=np.array([4, 4, 4, 4], np.int32),
        ue=np.array([6, 6, 6, 6], np.int32),
        ve=np.array([2, 2, 2, 2], np.int32),
        row=np.zeros(4, np.int32),
    )
    st = Stitcher(contigs, reads, edges)
    sc = st.stitch_chain("s", [0, 4, 2], [0, 2])
    assert sc.seq.tobytes() == b"AAAACCGGGGTTTT"
    assert sc.parts == [("contig", 0, 0), ("read", 0, 0), ("contig", 1, 0)]


def test_stitch_reverse_complement_read():
    # same as above but read given reverse-complemented: node(read0,-) = 5
    contigs = SequenceSet(["c0", "c1"], [_seq("AAAACC"), _seq("GGTTTT")])
    reads = SequenceSet(["r0"], [reverse_complement(_seq("CCGGGG"))])
    edges = EdgeSoA(
        src=np.array([0, 4, 5, 2], np.int32),
        dst=np.array([5, 1, 2, 4], np.int32),
        os_=np.zeros(4, np.float32), es=np.zeros(4, np.float32),
        adv=np.array([4, 4, 4, 4], np.int32),
        ue=np.array([6, 6, 6, 6], np.int32),
        ve=np.array([2, 2, 2, 2], np.int32),
        row=np.zeros(4, np.int32),
    )
    st = Stitcher(contigs, reads, edges)
    sc = st.stitch_chain("s", [0, 5, 2], [0, 2])
    assert sc.seq.tobytes() == b"AAAACCGGGGTTTT"
    assert sc.parts[1] == ("read", 0, 1)


def test_walkpath_mirror_roundtrip():
    wp = WalkPath(nodes=[0, 4, 6, 2], eids=[0, 2, 4])
    m = wp.mirrored()
    assert m.nodes == [3, 7, 5, 1]
    assert m.eids == [5, 3, 1]
    assert m.mirrored().nodes == wp.nodes and m.mirrored().eids == wp.eids



def test_emit_order_scaffolds_before_singletons():
    """Documented output contract (stitch.py docstring): bridged scaffolds first
    (by smallest member contig id, numeric), then singleton contigs."""
    from telomeri_tpu.scaffold.bridge import resolve_conflicts
    from telomeri_tpu.scaffold.stitch import emit_scaffolds

    # contigs: c0 (untouched), c1 [0:6], c2 [8:14]; read r0 [4:10] bridges c1-c2
    contigs = SequenceSet(["c0", "c1", "c2"],
                          [_seq("TTTT"), _seq("AAAACC"), _seq("GGTTTT")])
    reads = SequenceSet(["r0"], [_seq("CCGGGG")])
    edges = EdgeSoA(
        src=np.array([2, 7, 6, 5], np.int32),
        dst=np.array([6, 3, 4, 7], np.int32),
        os_=np.zeros(4, np.float32), es=np.zeros(4, np.float32),
        adv=np.array([4, 4, 4, 4], np.int32),
        ue=np.array([6, 6, 6, 6], np.int32),
        ve=np.array([2, 2, 2, 2], np.int32),
        row=np.zeros(4, np.int32),
    )
    accepted = resolve_conflicts([row((2, 4), 3, uid=0)])
    assert len(accepted) == 1
    paths = {0: WalkPath(nodes=[2, 6, 4], eids=[0, 2])}
    st = Stitcher(contigs, reads, edges)
    out = emit_scaffolds(accepted, paths, st)
    assert [s.name for s in out] == ["scaffold_00001", "scaffold_00000"]
    assert out[0].seq.tobytes() == b"AAAACCGGGGTTTT"
    assert out[1].seq.tobytes() == b"TTTT"


def test_agp_roundtrip(tmp_path):
    """AGP property: concatenating the oriented component slices named by the
    AGP rows reproduces each scaffold byte-for-byte (write_agp docstring)."""
    from telomeri_tpu.config import ScaffoldConfig
    from telomeri_tpu.io.fasta import read_fasta, reverse_complement
    from telomeri_tpu.pipeline import run_pipeline
    from telomeri_tpu.sim import SimConfig, simulate, write_dataset

    d = str(tmp_path / "data")
    write_dataset(simulate(SimConfig(genome_len=40_000, repeat_len=2_000,
                                     n_repeat_copies=2, read_len_mean=1_500,
                                     read_len_sd=200, coverage=12.0,
                                     error_rate=0.02, seed=5)), d)
    out = str(tmp_path / "s.fa")
    agp = str(tmp_path / "s.agp")
    run_pipeline(f"{d}/contigs.fa", f"{d}/reads.fa", f"{d}/read2contig.paf",
                 f"{d}/read2read.paf", out, ScaffoldConfig(mc_walks_per_end=50),
                 agp_path=agp)
    scaffolds = read_fasta(out)
    comp = {}
    for s in (read_fasta(f"{d}/contigs.fa"), read_fasta(f"{d}/reads.fa")):
        for i, n in enumerate(s.names):
            comp[n] = np.asarray(s.seqs[i])
    rebuilt: dict[str, list] = {}
    rows = [l.split("\t") for l in open(agp) if not l.startswith("#")]
    assert rows, "AGP has no component rows"
    for obj, obeg, oend, pn, ctype, cid, cbeg, cend, orient in rows:
        assert ctype == "W"
        seg = comp[cid][int(cbeg) - 1:int(cend)]
        if orient.strip() == "-":
            seg = reverse_complement(seg)
        rebuilt.setdefault(obj, []).append((int(obeg), seg))
    for i, name in enumerate(scaffolds.names):
        pieces = [s for _, s in sorted(rebuilt[name], key=lambda t: t[0])]
        assert np.array_equal(np.concatenate(pieces), scaffolds.seqs[i]), name
