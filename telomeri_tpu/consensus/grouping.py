"""Path grouping + consensus selection as sort/segment reductions (TPU).

Reference parity: the C++ reference's PathGroup histogram/consensus logic (SURVEY.md §3
rows 11-12; mount empty, SURVEY.md §0 — rules below are OUR normative spec, following
HERA's length-histogram grouping).

Normative rules (deterministic, host-count-invariant — SURVEY.md §7):
  1. Only successful walks participate.
  2. A walk from anchor-end a to terminal b represents the UNDIRECTED bridge
     {a->b, rc(b)->rc(a)}; its canonical pair is the lexicographic min of
     (a, b) and (b^1, a^1).
  3. Walks of a pair are grouped by path length (path_len in bp, >= 0 since every
     edge advance is positive). Two modes (ScaffoldConfig.grouping):
       - "windowed" (default; HERA's sparse-region split, SURVEY.md §3 row 11):
         sort the pair's path lengths ascending and split between consecutive
         walks whose lengths differ by MORE than group_window — groups are the
         maximal runs with adjacent gaps <= group_window. A true length cluster
         is never split by an arbitrary bucket edge (the round-1 fixed-bucket
         failure mode).
       - "fixed": bucket = path_len // group_window (round-1 behavior, kept for
         comparability).
  4. The winning group per pair is the most-populated group; ties break to the
     group with the SMALLER minimal path length (shorter bridge).
  5. The representative of the winning group is its max score_sum walk; exact ties
     break to the smaller walk uid.
  6. A pair yields a bridge only if the winning group holds >= min_group_support walks.

ConsensusResult.bucket reports the winning group's key: its minimal path length
(windowed) or its bucket index (fixed).

Implementation: lexicographic (pair, bucket) ordering via chained stable argsorts +
fixed-shape segment reductions — O(W log W), no dense (pairs x buckets) histogram, so it
scales to genome-size anchor counts (SURVEY.md §2.2 `consensus/`). int32-only on device
(JAX x64 is off). Runs identically on every host after walk summaries are all-gathered
(dist/).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_I32MAX = jnp.iinfo(jnp.int32).max


class WalkSummary(NamedTuple):
    """The per-walk fields consensus needs (device; this is what dist/ all-gathers)."""

    start: jax.Array      # (W,) int32
    terminal: jax.Array   # (W,) int32
    success: jax.Array    # (W,) bool
    path_len: jax.Array   # (W,) int32
    score_sum: jax.Array  # (W,) f32
    uid: jax.Array        # (W,) int32


class ConsensusResult(NamedTuple):
    """Per-segment outputs, fixed shape (W,); rows with valid=False are padding.

    Each valid row is one selected bridge: canonical pair (a, b), its winning-bucket
    support count, the representative walk's uid and score.
    """

    valid: jax.Array      # (W,) bool
    pair_a: jax.Array     # (W,) int32 canonical start anchor-end
    pair_b: jax.Array     # (W,) int32 canonical terminal anchor-end
    count: jax.Array      # (W,) int32 winning-group support
    bucket: jax.Array     # (W,) int32 winning length bucket
    rep_uid: jax.Array    # (W,) int32 representative walk uid
    rep_score: jax.Array  # (W,) f32 representative walk score_sum

    def to_numpy(self) -> "ConsensusResult":
        return ConsensusResult(*[np.asarray(a) for a in self])


def summarize(res, uid) -> WalkSummary:
    """WalkResult -> WalkSummary (start is nodes[:, 0])."""
    return WalkSummary(
        start=res.nodes[:, 0], terminal=res.terminal, success=res.success,
        path_len=res.path_len, score_sum=res.score_sum, uid=uid,
    )


def _lexsort_rows(keys_minor_to_major):
    """Stable argsort by several int32 keys (last = most significant), numpy.lexsort-style."""
    order = jnp.argsort(keys_minor_to_major[0], stable=True)
    for k in keys_minor_to_major[1:]:
        order = order[jnp.argsort(k[order], stable=True)]
    return order


@functools.partial(jax.jit, static_argnames=("group_window", "min_support", "grouping"))
def group_and_select(
    s: WalkSummary, *, n_anchors: int = 0, group_window: int, min_support: int,
    grouping: str = "windowed",
) -> ConsensusResult:
    # n_anchors is accepted for API symmetry but unused by the math (canonical
    # pairs + segment reductions never need it); it is deliberately NOT a static
    # jit arg, so one compiled consensus program serves every dataset of the same
    # walk-batch bucket (utils/shapes.py).
    if grouping not in ("windowed", "fixed"):
        raise ValueError(f"grouping must be windowed/fixed, got {grouping!r}")
    w = s.start.shape[0]
    if w == 0:  # no walks at all (e.g. empty PAF): nothing to group
        zi = jnp.zeros(0, jnp.int32)
        return ConsensusResult(
            valid=jnp.zeros(0, bool), pair_a=zi, pair_b=zi, count=zi, bucket=zi,
            rep_uid=zi, rep_score=jnp.zeros(0, jnp.float32))

    a = s.start.astype(jnp.int32)
    b = s.terminal.astype(jnp.int32)
    # canonical undirected pair: min((a,b), (b^1, a^1)) lexicographic (rule 2)
    ra, rb = b ^ 1, a ^ 1
    flip = (ra < a) | ((ra == a) & (rb < b))
    ca = jnp.where(flip, ra, a)
    cb = jnp.where(flip, rb, b)

    plen = s.path_len.astype(jnp.int32)
    # rule 3: the in-pair sort/group key is the bucket index (fixed) or the raw
    # path length (windowed — groups are found by gap-splitting the sorted runs)
    key = plen // group_window if grouping == "fixed" else plen
    valid = s.success
    # invalid rows sort to the very end
    ca = jnp.where(valid, ca, _I32MAX)
    cb = jnp.where(valid, cb, _I32MAX)
    key_k = jnp.where(valid, key, _I32MAX)

    order = _lexsort_rows([key_k, cb, ca])
    ca_s, cb_s, key_s = ca[order], cb[order], key_k[order]
    valid_s = valid[order]
    score_s = s.score_sum[order]
    uid_s = s.uid[order]

    # segment = one length group within a pair; pair segment = (pair) run
    neq = lambda x: jnp.concatenate([jnp.ones(1, bool), x[1:] != x[:-1]])
    pair_first = neq(ca_s) | neq(cb_s)
    if grouping == "fixed":
        seg_first = pair_first | neq(key_s)
    else:
        # HERA sparse-region split: a new group starts where the ascending sorted
        # path lengths jump by MORE than group_window (adjacent-gap clustering)
        gap = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), key_s[1:] - key_s[:-1]]) > group_window
        seg_first = pair_first | gap
    seg_id = jnp.cumsum(seg_first.astype(jnp.int32)) - 1
    pair_id = jnp.cumsum(pair_first.astype(jnp.int32)) - 1

    ssum = lambda v: jax.ops.segment_sum(v, seg_id, num_segments=w)
    smax_seg = lambda v: jax.ops.segment_max(v, seg_id, num_segments=w)

    seg_count = ssum(valid_s.astype(jnp.int32))
    seg_pair = smax_seg(jnp.where(valid_s, pair_id, -1))          # pair id of each segment
    # group key for reporting + rule-4 tie-break: bucket index (fixed) or the
    # group's MINIMAL path length (windowed; = first sorted member). Both are
    # strictly increasing across a pair's groups, so "smaller key" = "shorter".
    seg_bucket = -smax_seg(jnp.where(valid_s, -key_s, -_I32MAX))
    seg_bucket = jnp.where(seg_count > 0, seg_bucket, -1)
    seg_ca = smax_seg(jnp.where(valid_s, ca_s, -1))
    seg_cb = smax_seg(jnp.where(valid_s, cb_s, -1))

    # winner per pair (rule 4): max count, tie -> smaller bucket; two-stage reduction
    pair_ix = jnp.maximum(seg_pair, 0)
    best_count = jax.ops.segment_max(seg_count, pair_ix, num_segments=w)
    at_best = (seg_count > 0) & (seg_count == best_count[pair_ix])
    win_bucket = jax.ops.segment_min(
        jnp.where(at_best, seg_bucket, _I32MAX), pair_ix, num_segments=w)
    seg_is_winner = at_best & (seg_bucket == win_bucket[pair_ix])

    # representative (rule 5): max score within the winning segment, tie -> min uid
    win_pos = valid_s & seg_is_winner[seg_id]
    smax = smax_seg(jnp.where(win_pos, score_s, -jnp.inf))
    best_pos = win_pos & (score_s == smax[seg_id])
    rep_uid = jax.ops.segment_min(
        jnp.where(best_pos, uid_s, _I32MAX), seg_id, num_segments=w)

    out_valid = seg_is_winner & (seg_count >= min_support)        # rule 6
    return ConsensusResult(
        valid=out_valid,
        pair_a=seg_ca,
        pair_b=seg_cb,
        count=seg_count,
        bucket=seg_bucket,
        rep_uid=rep_uid,
        rep_score=smax.astype(jnp.float32),
    )


def consensus_oracle(
    s: WalkSummary, n_anchors: int, group_window: int, min_support: int,
    grouping: str = "windowed",
) -> list[dict]:
    """Scalar python reference of rules 1-6 (tests/test_consensus.py parity)."""
    by_pair: dict[tuple[int, int], list[int]] = {}
    start = np.asarray(s.start); term = np.asarray(s.terminal)
    succ = np.asarray(s.success); plen = np.asarray(s.path_len)
    score = np.asarray(s.score_sum); uid = np.asarray(s.uid)
    for i in range(len(start)):
        if not succ[i]:
            continue
        a, b = int(start[i]), int(term[i])
        cand = min((a, b), (b ^ 1, a ^ 1))
        by_pair.setdefault(cand, []).append(i)
    out = []
    for (a, b), members in sorted(by_pair.items()):
        # groups keyed by bucket index (fixed) or group min path length (windowed)
        if grouping == "fixed":
            buckets: dict[int, list[int]] = {}
            for i in members:
                buckets.setdefault(int(plen[i]) // group_window, []).append(i)
        else:
            members = sorted(members, key=lambda i: int(plen[i]))
            buckets = {}
            cur_key = None
            prev_len = None
            for i in members:
                li = int(plen[i])
                if prev_len is None or li - prev_len > group_window:
                    cur_key = li            # group's min length
                buckets.setdefault(cur_key, []).append(i)
                prev_len = li
        bk = min(buckets, key=lambda k: (-len(buckets[k]), k))
        walks = buckets[bk]
        if len(walks) < min_support:
            continue
        rep = min(walks, key=lambda i: (-score[i], uid[i]))
        out.append(dict(pair=(a, b), count=len(walks), bucket=bk,
                        rep_uid=int(uid[rep]), rep_score=float(score[rep])))
    return out


def compress(c: ConsensusResult) -> list[dict]:
    """Host-side: valid rows of a ConsensusResult as a sorted list of bridge dicts."""
    c = c.to_numpy()
    rows = [
        dict(pair=(int(c.pair_a[i]), int(c.pair_b[i])), count=int(c.count[i]),
             bucket=int(c.bucket[i]), rep_uid=int(c.rep_uid[i]),
             rep_score=float(c.rep_score[i]))
        for i in np.flatnonzero(c.valid)
    ]
    rows.sort(key=lambda r: r["pair"])
    return rows
