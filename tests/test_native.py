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


# ---------------------------------------------------------------------------
# align_native parity (radix k-mer argsort + LIS chain)
# ---------------------------------------------------------------------------

needs_align_native = pytest.mark.skipif(
    not __import__("telomeri_tpu.native.align_native",
                   fromlist=["available"]).available(),
    reason="native library not built")


@needs_align_native
def test_radix_argsort_kmers_parity():
    from telomeri_tpu.native.align_native import radix_argsort_kmers

    rng = np.random.default_rng(3)
    for n, k in ((70_000, 24), (200_001, 11), (65_537, 31)):
        km = rng.integers(0, 1 << min(2 * k, 62), n, dtype=np.int64)
        skm, pos = radix_argsort_kmers(km, 2 * k)
        assert np.array_equal(skm, np.sort(km))
        assert np.array_equal(km[pos.astype(np.int64)], skm)
        # LSD radix is stable: matches numpy's stable argsort exactly
        assert np.array_equal(pos, np.argsort(km, kind="stable").astype(np.int32))


@needs_align_native
def test_kmer_index_native_vs_numpy_lookups():
    """KmerIndex must answer lookup_unique identically whichever sort built it."""
    from telomeri_tpu.native import align_native
    from telomeri_tpu.utils.align import KmerIndex, pack_kmers

    rng = np.random.default_rng(4)
    seq = np.frombuffer(rng.choice(list(b"ACGT"), size=80_000).astype(np.uint8)
                        .tobytes(), dtype=np.uint8)
    km = pack_kmers(seq, 15)
    native = KmerIndex.from_packed(km, 15)      # >= 1<<16: native radix path
    # force the numpy fallback
    orig = align_native.radix_argsort_kmers
    align_native.radix_argsort_kmers = lambda *a, **k: None
    try:
        fallback = KmerIndex.from_packed(km, 15)
    finally:
        align_native.radix_argsort_kmers = orig
    q = km[rng.integers(0, len(km), 5_000)]
    assert np.array_equal(native.lookup_unique(q), fallback.lookup_unique(q))


@needs_align_native
def test_lis_chain_native_parity():
    import bisect

    from telomeri_tpu.native.align_native import lis_chain as lis_native
    from telomeri_tpu.utils.align import lis_chain

    def py_lis(values):
        tails, tails_idx = [], []
        parent = np.full(len(values), -1, np.int64)
        for i, val in enumerate(int(x) for x in values):
            j = bisect.bisect_left(tails, val)
            if j == len(tails):
                tails.append(val)
                tails_idx.append(i)
            else:
                tails[j] = val
                tails_idx[j] = i
            if j > 0:
                parent[i] = tails_idx[j - 1]
        out = []
        i = tails_idx[-1]
        while i >= 0:
            out.append(i)
            i = parent[i]
        return np.array(out[::-1], np.int64)

    rng = np.random.default_rng(5)
    for n in (1, 17, 4_095, 4_096, 50_000):   # spans the native threshold
        v = rng.integers(0, max(n, 2), n).astype(np.int64)
        assert np.array_equal(lis_chain(v), py_lis(v)), n
        assert np.array_equal(lis_native(v), py_lis(v)), n


@needs_align_native
def test_myers_pair_native_parity():
    """Word-blocked C++ Myers == python-bigint Myers across word boundaries,
    modes, and indel-bearing targets."""
    from telomeri_tpu.native import align_native
    from telomeri_tpu.utils import align

    def py_myers(q, t, mode):
        orig = align_native.myers_pair
        align_native.myers_pair = lambda *a: None   # force the bigint path
        try:
            return align.myers_pair(q, t, mode)
        finally:
            align_native.myers_pair = orig

    rng = np.random.default_rng(7)
    rand = lambda n: np.frombuffer(
        rng.choice(list(b"ACGT"), n).astype(np.uint8).tobytes(), np.uint8)
    for m in (1, 63, 64, 65, 128, 129, 700):
        q = rand(m)
        targets = [rand(int(m * 1.2) + 1), q[: max(1, m - 2)].copy(),
                   np.concatenate([q[: m // 2], rand(m // 2 + 5)])]
        for t in targets:
            for mode in ("global", "free_t_start", "free_t_end"):
                assert align_native.myers_pair(q, t, mode) == \
                    py_myers(q, t, mode), (m, len(t), mode)


def test_gap_trace_parity_and_fallback():
    """tel_gap_trace (the polish stage's inter-anchor aligner) must emit the
    EXACT op sequence of the python _dp_trace mirror — same DP, same
    diagonal > up > left tie-break — and polish_region must produce identical
    votes through either path."""
    import pytest

    from telomeri_tpu.native import align_native
    from telomeri_tpu.scaffold import polish as P

    if not align_native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    code = {0: "M", 1: "D", 2: "I"}
    for _ in range(300):
        n, m = rng.integers(0, 96, 2)
        t = rng.choice(list(b"ACGT"), n).astype(np.uint8)
        q = rng.choice(list(b"ACGT"), m).astype(np.uint8)
        k, ti, qi = align_native.gap_trace(t, q)
        nat = [(code[int(a)], int(b), int(c)) for a, b, c in zip(k, ti, qi)]
        assert nat == P._dp_trace(t, q), (n, m)
    # polish output identical with the native path disabled (fallback parity)
    truth = rng.choice(list(b"ACGT"), 2000).astype(np.uint8)
    target = truth.copy()
    bad = rng.choice(2000, 60, replace=False)
    target[bad] = np.where(target[bad] == ord("A"), ord("C"),
                           ord("A")).astype(np.uint8)
    cands = [truth.copy() for _ in range(4)]
    out_nat, st_nat = P.polish_region(target, 0, 2000, cands)
    orig = align_native.gap_trace
    align_native.gap_trace = lambda *a: None
    try:
        out_py, st_py = P.polish_region(target, 0, 2000, cands)
    finally:
        align_native.gap_trace = orig
    np.testing.assert_array_equal(out_nat, out_py)
    assert st_nat == st_py and st_nat["subs"] == 60
