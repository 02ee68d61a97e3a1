"""Build the native C++ helpers: `python -m telomeri_tpu.native.build`.

Produces telomeri_tpu/native/libtelomeri_native.so (loaded lazily via ctypes by
paf_native.py; everything degrades to the pure-Python parsers when absent)."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["paf_parser.cpp", "align_native.cpp"]
OUT = os.path.join(HERE, "libtelomeri_native.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *[os.path.join(HERE, s) for s in SOURCES],
        "-o", OUT,
    ]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(OUT)
