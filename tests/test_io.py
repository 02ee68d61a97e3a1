"""Unit tests for FASTA/FASTQ/PAF ingest (SURVEY.md §5 item 1)."""

import numpy as np
import pytest

from telomeri_tpu.io.fasta import read_fasta, reverse_complement, write_fasta
from telomeri_tpu.io.paf import parse_paf


def _seq(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)


def test_reverse_complement():
    assert reverse_complement(_seq("ACGTN")).tobytes() == b"NACGT"
    s = _seq("ACGTACGGTTAA")
    assert np.array_equal(reverse_complement(reverse_complement(s)), s)


def test_fasta_roundtrip(tmp_path):
    names = ["a", "b with-ignored description", "c"]
    seqs = [_seq("ACGT" * 50), _seq("G"), _seq("")]
    p = str(tmp_path / "x.fa")
    write_fasta(p, [n.split()[0] for n in names], seqs, width=7)
    got = read_fasta(p)
    assert got.names == ["a", "b", "c"]
    for a, b in zip(got.seqs, seqs):
        assert np.array_equal(a, b)
    assert list(got.lengths) == [200, 1, 0]


def test_fasta_multiline_and_crlf(tmp_path):
    p = tmp_path / "m.fa"
    p.write_bytes(b">x desc here\r\nACGT\r\nTTTT\r\n>y\r\nGG\r\n")
    got = read_fasta(str(p))
    assert got.names == ["x", "y"]
    assert got.seqs[0].tobytes() == b"ACGTTTTT"
    assert got.seqs[1].tobytes() == b"GG"


def test_fastq(tmp_path):
    p = tmp_path / "r.fq"
    p.write_bytes(b"@r1 extra\nACGT\n+\nIIII\n@r2\nTT\n+\n!!\n")
    got = read_fasta(str(p))
    assert got.names == ["r1", "r2"]
    assert got.seqs[0].tobytes() == b"ACGT"
    assert got.seqs[1].tobytes() == b"TT"


def test_paf_parse(tmp_path):
    p = tmp_path / "o.paf"
    p.write_text(
        "r1\t100\t5\t95\t+\tc1\t500\t400\t490\t85\t90\t255\textra:i:1\n"
        "r2\t80\t0\t60\t-\tc1\t500\t0\t60\t55\t60\t255\n"
    )
    idx = {"r1": 1, "r2": 2, "c1": 0}
    rec = parse_paf(str(p), idx)
    assert len(rec) == 2
    assert list(rec.qid) == [1, 2]
    assert list(rec.tid) == [0, 0]
    assert list(rec.strand) == [0, 1]
    assert list(rec.qstart) == [5, 0]
    assert list(rec.tend) == [490, 60]
    assert list(rec.nmatch) == [85, 55]


def test_paf_unknown_name(tmp_path):
    p = tmp_path / "o.paf"
    p.write_text("rX\t100\t5\t95\t+\tc1\t500\t400\t490\t85\t90\t255\n")
    with pytest.raises(KeyError):
        parse_paf(str(p), {"c1": 0})
    rec = parse_paf(str(p), {"c1": 0}, strict=False)
    assert len(rec) == 0


def test_paf_bad_row(tmp_path):
    p = tmp_path / "bad.paf"
    p.write_text("r1\t100\t5\n")
    with pytest.raises(ValueError):
        parse_paf(str(p), {})


def test_fasta_empty_name_error(tmp_path):
    p = tmp_path / "e.fa"
    p.write_bytes(b">\nACGT\n")
    with pytest.raises(ValueError, match="empty sequence name"):
        read_fasta(str(p))


def test_fasta_header_leading_whitespace(tmp_path):
    p = tmp_path / "w.fa"
    p.write_bytes(b"> seq1 desc\nAC\n> seq2\nGT\n")
    got = read_fasta(str(p))
    assert got.names == ["seq1", "seq2"]


def test_fastq_truncated_record(tmp_path):
    p = tmp_path / "t.fq"
    p.write_bytes(b"@r1\nACGT\n+\nIIII\n@r2")
    with pytest.raises(ValueError, match="truncated"):
        read_fasta(str(p))


# --- lazy mmap-backed store (io/fasta.py _read_lazy; ARCHITECTURE.md memory budget) ---

def _assert_same(lazy, eager):
    assert lazy.names == eager.names
    assert list(lazy.lengths) == list(eager.lengths)
    for i in range(len(eager)):
        assert np.array_equal(np.asarray(lazy.seqs[i]), eager.seqs[i]), i


def test_lazy_fasta_parity(tmp_path):
    p = tmp_path / "x.fa"
    p.write_bytes(b">a desc\nACGTACG\nTTT\n>b\nG\n>c\n\n>d\nAAAA")  # multi-line, empty, no trailing \n
    # blank line after ">c" -> lazy falls back to eager (still correct)
    lazy, eager = read_fasta(str(p), lazy="on"), read_fasta(str(p))
    _assert_same(lazy, eager)


def test_lazy_fasta_singleline_zero_copy(tmp_path):
    p = tmp_path / "x.fa"
    p.write_bytes(b">a\nACGTACGT\n>b\nTTTTT\n")
    lazy, eager = read_fasta(str(p), lazy="on"), read_fasta(str(p))
    from telomeri_tpu.io.fasta import LazySequenceSet

    assert isinstance(lazy, LazySequenceSet)
    _assert_same(lazy, eager)
    assert not lazy.seqs[0].flags.owndata  # mmap view, not a copy


def test_lazy_fastq_parity(tmp_path):
    p = tmp_path / "r.fq"
    # quality line starting with '@' must not be mistaken for a header
    p.write_bytes(b"@r1 extra\nACGT\n+\n@III\n@r2\nTT\n+\n!!\n")
    lazy, eager = read_fasta(str(p), lazy="on"), read_fasta(str(p))
    from telomeri_tpu.io.fasta import LazySequenceSet

    assert isinstance(lazy, LazySequenceSet)
    _assert_same(lazy, eager)


def test_lazy_crlf_falls_back(tmp_path):
    p = tmp_path / "m.fa"
    p.write_bytes(b">x\r\nACGT\r\nTT\r\n")
    lazy = read_fasta(str(p), lazy="on")
    assert lazy.seqs[0].tobytes() == b"ACGTTT"


def test_lazy_empty_file(tmp_path):
    p = tmp_path / "e.fa"
    p.write_bytes(b"")
    lazy = read_fasta(str(p), lazy="on")
    assert len(lazy) == 0


def test_lazy_gzip_falls_back(tmp_path):
    import gzip

    p = tmp_path / "x.fa.gz"
    p.write_bytes(gzip.compress(b">a\nACGT\n"))
    lazy = read_fasta(str(p), lazy="on")
    assert lazy.names == ["a"] and lazy.seqs[0].tobytes() == b"ACGT"


def test_lazy_random_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    names = [f"s{i}" for i in range(30)]
    seqs = [np.frombuffer(rng.choice(list(b"ACGT"), size=int(n)).astype(np.uint8).tobytes(),
                          dtype=np.uint8) for n in rng.integers(0, 300, 30)]
    p = str(tmp_path / "r.fa")
    write_fasta(p, names, seqs, width=60)
    lazy, eager = read_fasta(p, lazy="on"), read_fasta(p)
    _assert_same(lazy, eager)


def test_lazy_no_trailing_newline(tmp_path):
    p = tmp_path / "x.fa"
    p.write_bytes(b">a\nACGT\n>b\nTTTTT")          # EOF right after sequence bytes
    lazy, eager = read_fasta(str(p), lazy="on"), read_fasta(str(p))
    from telomeri_tpu.io.fasta import LazySequenceSet

    assert isinstance(lazy, LazySequenceSet)
    _assert_same(lazy, eager)

    q = tmp_path / "r.fq"
    q.write_bytes(b"@r1\nACGT\n+\nIIII")            # FASTQ, no trailing newline
    lazy, eager = read_fasta(str(q), lazy="on"), read_fasta(str(q))
    _assert_same(lazy, eager)


def test_paf_minimap2_tag_columns(tmp_path):
    """Real minimap2 PAF rows carry SAM-like tag columns (tp:A:, cm:i:, s1:i:,
    dv:f:, ...) after the 12 standard fields; both parsers must ignore them and
    read the standard columns identically."""
    from telomeri_tpu.io.paf import parse_paf
    from telomeri_tpu.native import paf_native

    p = tmp_path / "tags.paf"
    p.write_text(
        "r1\t1000\t10\t900\t+\tc1\t5000\t100\t990\t850\t895\t60"
        "\ttp:A:P\tcm:i:80\ts1:i:500\tdv:f:0.0123\n"
        "r2\t800\t0\t700\t-\tc1\t5000\t200\t910\t640\t710\t0\ttp:A:S\n")
    rec = parse_paf(str(p), {"r1": 0, "r2": 1, "c1": 2})
    assert len(rec) == 2
    assert rec.nmatch.tolist() == [850, 640]
    assert rec.blocklen.tolist() == [895, 710]
    assert rec.strand.tolist() == [0, 1]
    if paf_native.available():
        raw = paf_native.parse_paf_columns(str(p))
        assert raw is not None and len(raw[2]) == 2
