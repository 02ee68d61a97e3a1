"""VMEM-resident Pallas MC walk scan (round 4 experiment — VERDICT r3 next-#3).

BASELINE.md's walk roofline concluded the lax.scan engine is AT the v5e
HBM dynamic-gather limit (~43-60 M rows/s; a bare gather-only scan runs at the
same per-step time as the full engine), and that "substantially higher
walks/s requires a different hardware primitive". On the bench graph the
packed wide table (graph/tensorize.py -> engine.pack_wide) is ~8.6 MB
(5,632 rows x 384 int32) — small enough to PIN IN VMEM — so this kernel keeps
the whole table on-chip for a walk tile's entire S steps and gathers rows
from VMEM instead of HBM. Whether Mosaic's VMEM dynamic addressing actually
beats the HBM gather pipeline is exactly the experiment; the result (positive
or negative, with ms/step) is recorded in BASELINE.md.

Exact-parity design: the kernel reproduces _mc_fast_core's per-step integer
ops bit-for-bit (same draw `r = bits & 0x7FFFFFFF % total`, same
compare-count inverse-CDF, same one-hot lane picks) and streams out the same
per-step records; event resolution reuses engine._resolve_mc_events, so
results are BITWISE equal to the production engine (tested in interpret mode
on CPU and on TPU by tools/vmem_probe.py).

Gather strategies (the crux — Pallas has no documented vectorized gather):
  - "take":  jnp.take(table_value, cur, axis=0) inside the kernel; measured on
             TPU v5e (2026-08-21): Mosaic REJECTS it — its gather lowering
             requires input, indices, and output to share a shape ("Shape
             mismatch in input, indices and output").
  - "dyng":  jnp.take_along_axis with indices broadcast to the TABLE's shape
             and the walk tile forced equal to the table row count — the one
             form Mosaic's dynamic-gather rule accepts (same-shape gather
             along the sublane dim).
  - "loop":  jax.lax.fori_loop over the walk tile, one dynamic row slice per
             walk per step through VMEM scratch refs (value-level
             dynamic_slice is unimplemented in Mosaic); serializes on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from telomeri_tpu.walk.engine import (
    GraphDev,
    PlanDev,
    WalkResult,
    _resolve_mc_events,
    _stable_bits_table,
)

# leave headroom for tile outputs, bits, and double-buffering in ~16 MB VMEM
MAX_TABLE_BYTES = 12 * 2**20


def vmem_feasible(g: GraphDev) -> bool:
    return g.wide.size * 4 <= MAX_TABLE_BYTES


def _walk_kernel(bits_ref, start_ref, tbl_ref,
                 nxt_ref, tot_ref, eid_ref, adv_ref, es_ref,
                 cur_ref, rows_ref,
                 *, h: int, max_steps: int, strategy: str):
    wt = start_ref.shape[0]
    tbl = tbl_ref[:]                                   # (N, 6H) resident value
    lane = jax.lax.broadcasted_iota(jnp.int32, (wt, h), 1)

    def fetch(cur):
        """-> (nbr, cum, eid, adv, es_bits) blocks, each (Wt, H)."""
        if strategy == "take":
            rows = jnp.take(tbl, cur, axis=0)          # (Wt, 6H)
            return tuple(rows[:, k * h:(k + 1) * h] for k in range(5))
        if strategy == "dyng":
            # Mosaic's gather rule wants input/indices/output SAME-shape:
            # wt == table rows (enforced by the wrapper), indices broadcast
            # across one H-block at a time (a full-row index would be a
            # 50 MB VMEM value at table scale)
            idx = jnp.broadcast_to(cur[:, None], (wt, h))
            return tuple(
                jnp.take_along_axis(tbl[:, k * h:(k + 1) * h], idx, axis=0)
                for k in range(5))
        # "loop": one dynamic row slice per walk, ref-to-ref through VMEM
        # scratch (value-level dynamic_slice does not lower in Mosaic)
        cur_ref[:, 0] = cur

        def one(i, _):
            rows_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(cur_ref[i, 0], 1), :]
            return 0
        jax.lax.fori_loop(0, wt, one, 0)
        rows = rows_ref[:]
        return tuple(rows[:, k * h:(k + 1) * h] for k in range(5))

    # PYTHON-unrolled step loop: a traced step index would need dynamic
    # lane-dim indexing of bits/output refs, which Mosaic does not lower
    # (measured: "Unimplemented ... dynamic_slice"); max_steps is static and
    # small (<= 64), so full unroll is the supported form.
    cur = start_ref[:, 0]
    for s in range(max_steps):
        nbr_b, cum_b, eid_b, adv_b, es_b = fetch(cur)
        # integer VALUE indexing (cum_b[:, -1]) lowers through dynamic_slice,
        # which Mosaic does not implement — static slice + squeeze does
        total = jnp.squeeze(jax.lax.slice_in_dim(cum_b, h - 1, h, axis=1), 1)
        bits = bits_ref[:, s]
        r = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32) % jnp.maximum(
            total, 1)
        choice = jnp.minimum(
            jnp.sum((cum_b <= r[:, None]).astype(jnp.int32), axis=1), h - 1
        ).astype(jnp.int32)
        sel = lane == choice[:, None]
        pick = lambda a: jnp.sum(jnp.where(sel, a, 0), axis=1)
        nxt = pick(nbr_b)
        nxt_ref[:, s] = nxt
        tot_ref[:, s] = total
        eid_ref[:, s] = pick(eid_b)
        adv_ref[:, s] = pick(adv_b)
        es_ref[:, s] = pick(es_b)
        cur = jnp.where(nxt >= 0, nxt, cur)


@functools.partial(
    jax.jit,
    static_argnames=("max_steps", "tile", "strategy", "interpret"))
def _vmem_scan(g: GraphDev, start, bits_t, *, max_steps: int, tile: int,
               strategy: str, interpret: bool):
    w = start.shape[0]
    h = g.h
    kern = functools.partial(
        _walk_kernel, h=h, max_steps=max_steps, strategy=strategy)
    out = pl.pallas_call(
        kern,
        grid=(w // tile,),
        in_specs=[
            pl.BlockSpec((tile, max_steps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # bits
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # start
            pl.BlockSpec(g.wide.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # table, resident
        ],
        out_specs=[
            pl.BlockSpec((tile, max_steps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=[jax.ShapeDtypeStruct((w, max_steps), jnp.int32)
                   for _ in range(5)],
        scratch_shapes=([
            pltpu.VMEM((tile, 1), jnp.int32),       # cur (loop strategy)
            pltpu.VMEM((tile, 6 * h), jnp.int32),   # gathered rows scratch
        ] if strategy == "loop" else [
            pltpu.VMEM((8, 1), jnp.int32),          # unused placeholders
            pltpu.VMEM((8, 128), jnp.int32),
        ]),
        interpret=interpret,
    )(bits_t, start[:, None], g.wide)
    return out


def run_walks_mc_vmem(
    g: GraphDev, p: PlanDev, seed, *, n_anchors, max_steps: int,
    tile: int = 512, strategy: str = "take", interpret: bool = False,
) -> WalkResult:
    """All-MC walk batch through the VMEM-resident Pallas scan.

    Bitwise-identical to engine._run_walks_mc_fast on the same plan (shared
    RNG table, identical per-step integer ops, shared event resolution).
    Requires the packed table to fit the VMEM budget (vmem_feasible)."""
    if not vmem_feasible(g):
        raise ValueError(
            f"table {g.wide.size * 4 / 2**20:.1f} MiB exceeds the "
            f"{MAX_TABLE_BYTES / 2**20:.0f} MiB VMEM budget")
    if strategy == "dyng":
        tile = int(g.wide.shape[0])   # same-shape gather: tile == table rows
    w = p.start.shape[0]
    pad = -w % tile
    start = jnp.pad(p.start, (0, pad))
    uid = jnp.pad(p.uid, (0, pad))
    bits_t = jnp.transpose(_stable_bits_table(seed, uid, max_steps))  # (W', S)
    nxt, tot, eid, adv, es = _vmem_scan(
        g, start, bits_t, max_steps=max_steps, tile=tile, strategy=strategy,
        interpret=interpret)
    cut = lambda a: a[:w]
    return _resolve_mc_events(
        p, cut(nxt), cut(tot), cut(eid), cut(adv), cut(es),
        n_nodes=int(g.wide.shape[0]), n_anchors=n_anchors,
        max_steps=max_steps)
