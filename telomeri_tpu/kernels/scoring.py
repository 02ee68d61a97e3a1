"""Overlap-extension scoring: SI / OS / ES (SURVEY.md §3 row 5).

Reference parity: the C++ reference computes these per-edge at graph build (HERA formulas;
mount empty, SURVEY.md §0). Three implementations share ONE op order so results are
bit-identical across host and device (SURVEY.md §7 "bit-identical" hard part):

  - `score_arrays_np`    : numpy float32 oracle (host pipeline + tests)
  - `score_overlaps_jnp` : jnp implementation (CPU fallback, vmap/jit friendly)
  - `score_overlaps_pallas` : Pallas TPU kernel — the "overlaps scored/s" metric
    (SURVEY.md §1 north star). Elementwise VPU work, HBM-bandwidth bound:
    8 int32 in + 3 f32 out = 44 B/row.

Formulas (ScaffoldConfig docstring has the geometry definitions):
  SI  = nmatch / blocklen
  OS  = SI * (OL1 + OL2) * 0.5
  pen = (OH1 + OH2) * 0.5
  ES1 = OS + EL1 * 0.5 - pen
  ES2 = OS + EL2 * 0.5 - pen
All arithmetic in float32, in exactly this order.

Cross-backend precision note (measured): TPU hardware f32 division is reciprocal-multiply
and can differ from IEEE numpy by <= 1 ulp (~2e-7 relative). CPU jnp and Pallas-interpret
are bit-identical to the numpy oracle (tests/test_scoring.py enforces this). Therefore a
RUN computes scores exactly once with one backend and every downstream decision (CSR edge
order, greedy argmax, MC sampling) uses those stored scores — results are deterministic
within a run and across hosts, while CPU-run vs TPU-run outputs may differ only if an
ES/OS ranking decision sits within 1 ulp (not observed on test data).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Lane/sublane tiling for the Pallas kernel: rows are processed as (BLOCK_M, 128) f32 tiles.
_LANES = 128
_BLOCK_M = 256  # 256*128 = 32768 rows per grid step; 11 arrays * 128KiB = ~1.4 MiB VMEM


def _score_formula(xp, nm, bl, ol1, ol2, oh1, oh2, el1, el2):
    """The one true op order (xp = np or jnp), float32 in/out."""
    f = lambda a: a.astype(xp.float32)
    si = f(nm) / xp.maximum(f(bl), xp.float32(1.0))
    os_ = si * ((f(ol1) + f(ol2)) * xp.float32(0.5))
    pen = (f(oh1) + f(oh2)) * xp.float32(0.5)
    es1 = os_ + f(el1) * xp.float32(0.5) - pen
    es2 = os_ + f(el2) * xp.float32(0.5) - pen
    return si, os_, es1, es2


def score_arrays_np(nm, bl, ol1, ol2, oh1, oh2, el1, el2):
    """Numpy float32 oracle. Returns (si, os, es1, es2)."""
    return _score_formula(np, nm, bl, ol1, ol2, oh1, oh2, el1, el2)


@jax.jit
def score_overlaps_jnp(nm, bl, ol1, ol2, oh1, oh2, el1, el2):
    """jnp implementation (any backend). Returns (si, os, es1, es2)."""
    return _score_formula(jnp, nm, bl, ol1, ol2, oh1, oh2, el1, el2)


def _score_kernel(nm, bl, ol1, ol2, oh1, oh2, el1, el2, si_o, os_o, es1_o, es2_o):
    si, os_, es1, es2 = _score_formula(
        jnp, nm[:], bl[:], ol1[:], ol2[:], oh1[:], oh2[:], el1[:], el2[:]
    )
    si_o[:] = si
    os_o[:] = os_
    es1_o[:] = es1
    es2_o[:] = es2


def scoring_tile_shape(n: int) -> tuple[int, int]:
    """(rows_pad, cols) tiling for n overlap rows: bucketed padding
    (utils/shapes.py) so the grid divides evenly AND the padded shape comes from a
    small family — the kernel program is reused across datasets instead of
    recompiling (~1 min/shape over a remote-compile tunnel)."""
    from telomeri_tpu.utils.shapes import bucket_len

    rows = max(-(-n // _LANES), 1)
    return max(bucket_len(rows, _BLOCK_M), _BLOCK_M), _LANES


def _score_kernel_os_es2(nm, bl, ol1, ol2, oh1, oh2, el1, el2, os_o, es2_o):
    _, os_, _, es2 = _score_formula(
        jnp, nm[:], bl[:], ol1[:], ol2[:], oh1[:], oh2[:], el1[:], el2[:]
    )
    os_o[:] = os_
    es2_o[:] = es2


@functools.partial(jax.jit, static_argnames=("interpret", "block_m", "outputs"))
def score_overlaps_pallas_tiled(nm, bl, ol1, ol2, oh1, oh2, el1, el2, *,
                                interpret=False, block_m=_BLOCK_M, outputs=4):
    """Pallas TPU scoring kernel over PRE-TILED (rows_pad, 128) int32 arrays
    (scoring_tile_shape). Returns four (rows_pad, 128) float32 arrays — or, with
    outputs=2, just (os, es2): the production rescore path only consumes those
    (io/geometry.py rescore_edges_device), saving 8 B/row of HBM write traffic.

    The tiled form is the fast path: padding 1-D inputs inside the call costs a
    full extra read+write of all 8 input arrays (measured 1.45x total on v5e —
    3.11 ms -> 2.15 ms at 8M rows). Callers that score repeatedly or at scale
    should store geometry tiled and call this directly. block_m is the grid row
    block (VMEM: 12 arrays x block_m x 512 B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows_pad, cols = nm.shape
    grid = (rows_pad // block_m,)
    spec = pl.BlockSpec((block_m, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows_pad, cols), jnp.float32)
    kernel, n_out = (_score_kernel, 4) if outputs == 4 else (_score_kernel_os_es2, 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=(spec,) * n_out,
        out_shape=(out_shape,) * n_out,
        interpret=interpret,
    )(nm, bl, ol1, ol2, oh1, oh2, el1, el2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_overlaps_pallas(nm, bl, ol1, ol2, oh1, oh2, el1, el2, *, interpret=False):
    """Pallas TPU scoring kernel over 1-D int32 row arrays.

    Pads rows to the (M, 128) f32 tile grid (scoring_tile_shape), runs
    score_overlaps_pallas_tiled, and slices the padding back off. Returns
    (si, os, es1, es2) float32 arrays of the input length.
    """
    n = nm.shape[0]
    rows_pad, cols = scoring_tile_shape(n)
    total = rows_pad * cols

    def prep(a):
        a = jnp.asarray(a, jnp.int32)
        return jnp.pad(a, (0, total - n)).reshape(rows_pad, cols)

    si, os_, es1, es2 = score_overlaps_pallas_tiled(
        *[prep(a) for a in (nm, bl, ol1, ol2, oh1, oh2, el1, el2)],
        interpret=interpret)
    flat = lambda a: a.reshape(total)[:n]
    return flat(si), flat(os_), flat(es1), flat(es2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_os_es2_pallas(nm, bl, ol1, ol2, oh1, oh2, el1, el2, *, interpret=False):
    """Production rescore fast path: only (os, es2) — the two columns
    io/geometry.py actually consumes — saving 8 B/row of HBM writes. Same op
    order as the 4-output kernel, so results are bitwise identical."""
    n = nm.shape[0]
    rows_pad, cols = scoring_tile_shape(n)
    total = rows_pad * cols

    def prep(a):
        a = jnp.asarray(a, jnp.int32)
        return jnp.pad(a, (0, total - n)).reshape(rows_pad, cols)

    os_, es2 = score_overlaps_pallas_tiled(
        *[prep(a) for a in (nm, bl, ol1, ol2, oh1, oh2, el1, el2)],
        interpret=interpret, outputs=2)
    flat = lambda a: a.reshape(total)[:n]
    return flat(os_), flat(es2)


def score_overlaps(nm, bl, ol1, ol2, oh1, oh2, el1, el2, backend: str = "auto"):
    """Dispatch: 'pallas' on TPU, 'jnp' elsewhere (backend='auto')."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas":
        return score_overlaps_pallas(nm, bl, ol1, ol2, oh1, oh2, el1, el2)
    if backend == "pallas_interpret":
        return score_overlaps_pallas(nm, bl, ol1, ol2, oh1, oh2, el1, el2, interpret=True)
    return score_overlaps_jnp(nm, bl, ol1, ol2, oh1, oh2, el1, el2)
