"""Native C++ PAF parser ≡ pure-Python parser (SURVEY.md §3 row 3 native path)."""

import numpy as np
import pytest

from telomeri_tpu.io.paf import _parse_columns_py
from telomeri_tpu.native import paf_native

pytestmark = pytest.mark.skipif(
    not paf_native.available(), reason="native library not built")


def test_native_matches_python(tmp_path):
    p = tmp_path / "o.paf"
    p.write_bytes(
        b"r1\t100\t5\t95\t+\tc1\t500\t400\t490\t85\t90\t255\textra:i:1\n"
        b"\n"
        b"r2\t80\t0\t60\t-\tc1\t500\t0\t60\t55\t60\t255\r\n"
        b"weird name\t10\t0\t5\t+\tt\t10\t0\t5\t5\t5\t0\n"
    )
    qn, tn, ints = paf_native.parse_paf_columns(str(p))
    qn2, tn2, ints2 = _parse_columns_py(str(p))
    assert list(qn) == list(qn2)
    assert list(tn) == list(tn2)
    np.testing.assert_array_equal(ints, ints2)


def test_native_matches_python_on_simulated(toy_dataset_dir):
    import os

    p = os.path.join(toy_dataset_dir, "read2read.paf")
    qn, tn, ints = paf_native.parse_paf_columns(p)
    qn2, tn2, ints2 = _parse_columns_py(p)
    assert list(qn) == list(qn2) and list(tn) == list(tn2)
    np.testing.assert_array_equal(ints, ints2)


def test_native_error_short_row(tmp_path):
    p = tmp_path / "bad.paf"
    p.write_text("r1\t100\t5\n")
    with pytest.raises(ValueError, match="11 columns"):
        paf_native.parse_paf_columns(str(p))


def test_native_error_bad_strand(tmp_path):
    p = tmp_path / "bad.paf"
    p.write_text("r1\t100\t5\t95\t?\tc1\t500\t400\t490\t85\t90\t255\n")
    with pytest.raises(ValueError, match="strand"):
        paf_native.parse_paf_columns(str(p))


def test_native_empty_file(tmp_path):
    p = tmp_path / "e.paf"
    p.write_bytes(b"")
    qn, tn, ints = paf_native.parse_paf_columns(str(p))
    assert len(qn) == 0 and ints.shape == (0, 9)


def test_native_fastx_matches_python_fasta(tmp_path):
    from telomeri_tpu.io.fasta import _parse_fasta

    p = tmp_path / "m.fa"
    data = b">x desc here\r\nACGT\r\nTTTT\r\n>empty\n>y\nGG\n"
    p.write_bytes(data)
    names, seqs = paf_native.parse_fastx(str(p))
    ref = _parse_fasta(data)
    assert names == ref.names == ["x", "empty", "y"]
    for a, b in zip(seqs, ref.seqs):
        assert np.array_equal(np.asarray(a), b)


def test_native_fastx_matches_python_fastq(tmp_path):
    from telomeri_tpu.io.fasta import _parse_fastq

    p = tmp_path / "r.fq"
    data = b"@r1 extra\nACGT\n+\nIIII\n@r2\nTT\n+\n!!\n"
    p.write_bytes(data)
    names, seqs = paf_native.parse_fastx(str(p))
    ref = _parse_fastq(data)
    assert names == ref.names
    for a, b in zip(seqs, ref.seqs):
        assert np.array_equal(np.asarray(a), b)


def test_native_fastx_on_simulated(toy_dataset_dir):
    import os

    from telomeri_tpu.io.fasta import _parse_fasta

    p = os.path.join(toy_dataset_dir, "reads.fa")
    names, seqs = paf_native.parse_fastx(p)
    ref = _parse_fasta(open(p, "rb").read())
    assert names == ref.names
    assert all(np.array_equal(np.asarray(a), b) for a, b in zip(seqs, ref.seqs))


def test_native_fastx_bad_first_byte(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("hello")
    with pytest.raises(ValueError, match="not FASTA/FASTQ"):
        paf_native.parse_fastx(str(p))


def test_native_fastx_empty_name_and_truncated(tmp_path):
    p = tmp_path / "e.fa"
    p.write_bytes(b">\nACGT\n")
    with pytest.raises(ValueError, match="empty sequence name"):
        paf_native.parse_fastx(str(p))
    q = tmp_path / "t.fq"
    q.write_bytes(b"@r1\nACGT\n+\nIIII\n@r2")
    with pytest.raises(ValueError, match="truncated"):
        paf_native.parse_fastx(str(q))


def test_native_fastx_header_whitespace(tmp_path):
    p = tmp_path / "w.fa"
    p.write_bytes(b"> seq1 desc\nAC\n> seq2\nGT\n")
    names, seqs = paf_native.parse_fastx(str(p))
    assert names == ["seq1", "seq2"]
