"""FASTA/FASTQ reading and FASTA writing (host side).

Reference parity: the C++ reference's SequenceLoader (SURVEY.md §3 rows 2, 14; the mount was
empty this round, so no file:line citation is possible — provenance in SURVEY.md §0).

Design (SURVEY.md §2.2): sequences stay host-side as numpy uint8 byte arrays for the
stitcher; only lengths and the id table ever go to the device. A C++ fast path
(telomeri_tpu/native) mmap-parses large files; this module is the portable fallback and
the single source of truth for semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_COMP = np.zeros(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTacgtNnUuRYKMrykm", b"TGCATGCANNAAYRMKyrmk"):
    _COMP[_a] = _b
# anything unmapped complements to 'N'
for _i in range(256):
    if _COMP[_i] == 0:
        _COMP[_i] = ord("N")


def reverse_complement(seq: np.ndarray) -> np.ndarray:
    """Reverse-complement a uint8 sequence array."""
    return _COMP[seq[::-1]]


@dataclass
class SequenceSet:
    """A set of named sequences as numpy byte arrays.

    names:   list of sequence ids (first whitespace-delimited token of the header)
    seqs:    list of np.uint8 arrays (ASCII bytes, case preserved)
    lengths: int64 array of sequence lengths
    index:   name -> position
    """

    names: list[str]
    seqs: list[np.ndarray]

    def __post_init__(self) -> None:
        self.lengths = np.array([len(s) for s in self.seqs], dtype=np.int64)
        self.index = {n: i for i, n in enumerate(self.names)}
        if len(self.index) != len(self.names):
            dupes = [n for n in self.index if self.names.count(n) > 1]
            raise ValueError(f"duplicate sequence names: {dupes[:5]}")

    def __len__(self) -> int:
        return len(self.names)


def _read_bytes(path: str) -> bytes:
    """Read a file, transparently decompressing gzip (magic-byte detection)."""
    with open(path, "rb") as f:
        head = f.read(2)
        if head == b"\x1f\x8b":
            import gzip

            f.seek(0)
            with gzip.open(f) as gz:
                return gz.read()
        return head + f.read()


def read_fasta(path: str) -> SequenceSet:
    """Read FASTA or FASTQ, plain or .gz (both auto-detected). Multi-line FASTA ok.

    Plain files use the C++ fast parser when built (parity-tested); gzipped files
    and the no-library case fall back to this module's Python parser."""
    with open(path, "rb") as f:
        gzipped = f.read(2) == b"\x1f\x8b"
    if not gzipped:
        from telomeri_tpu.native import paf_native

        native = paf_native.parse_fastx(path)
        if native is not None:
            return SequenceSet(native[0], native[1])
    data = _read_bytes(path)
    if not data:
        return SequenceSet([], [])
    if data[0:1] == b">":
        return _parse_fasta(data)
    if data[0:1] == b"@":
        return _parse_fastq(data)
    raise ValueError(f"{path}: not FASTA/FASTQ (first byte {data[0:1]!r})")


read_fastx = read_fasta  # alias; format is auto-detected


def _header_name(line: bytes, what: str) -> str:
    """First whitespace-delimited token after the marker byte; empty -> error."""
    toks = line[1:].split()
    if not toks:
        raise ValueError(f"{what} header with empty sequence name: {line[:30]!r}")
    return toks[0].decode()


def _parse_fasta(data: bytes) -> SequenceSet:
    names: list[str] = []
    seqs: list[np.ndarray] = []
    chunks: list[bytes] = []
    for line in data.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line:
            continue
        if line.startswith(b">"):
            if names:
                seqs.append(np.frombuffer(b"".join(chunks), dtype=np.uint8))
            names.append(_header_name(line, "FASTA"))
            chunks = []
        else:
            chunks.append(line)
    if names:
        seqs.append(np.frombuffer(b"".join(chunks), dtype=np.uint8))
    return SequenceSet(names, seqs)


def _parse_fastq(data: bytes) -> SequenceSet:
    names: list[str] = []
    seqs: list[np.ndarray] = []
    lines = data.split(b"\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].rstrip(b"\r")
        if not line:
            i += 1
            continue
        if not line.startswith(b"@"):
            raise ValueError(f"FASTQ record {len(names)}: expected '@', got {line[:20]!r}")
        if i + 1 >= n:
            raise ValueError(f"FASTQ record {len(names)}: truncated (header "
                             f"{line[:30]!r} has no sequence line)")
        names.append(_header_name(line, "FASTQ"))
        seqs.append(np.frombuffer(lines[i + 1].rstrip(b"\r"), dtype=np.uint8))
        # lines[i+2] is '+', lines[i+3] is quality — both ignored
        i += 4
    return SequenceSet(names, seqs)


def write_fasta(path: str, names: list[str], seqs: list[np.ndarray], width: int = 80) -> None:
    """Write sequences as FASTA with fixed line width (deterministic byte output)."""
    with open(path, "wb") as f:
        for name, seq in zip(names, seqs):
            f.write(b">" + name.encode() + b"\n")
            b = seq.tobytes()
            for off in range(0, len(b), width):
                f.write(b[off : off + width] + b"\n")
