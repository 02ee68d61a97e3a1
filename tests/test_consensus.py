"""Consensus grouping tests: device implementation ≡ scalar oracle; rule checks."""

import jax.numpy as jnp
import numpy as np

from telomeri_tpu.consensus.grouping import (
    WalkSummary,
    compress,
    consensus_oracle,
    group_and_select,
)


def mk_summary(rows):
    """rows: (start, terminal, success, path_len, score)"""
    a = np.array(rows, dtype=object)
    n = len(rows)
    return WalkSummary(
        start=jnp.array([r[0] for r in rows], jnp.int32),
        terminal=jnp.array([r[1] for r in rows], jnp.int32),
        success=jnp.array([r[2] for r in rows], bool),
        path_len=jnp.array([r[3] for r in rows], jnp.int32),
        score_sum=jnp.array([r[4] for r in rows], jnp.float32),
        uid=jnp.arange(n, dtype=jnp.int32),
    )


def run(s, window=100, min_support=2, n_anchors=4, grouping="windowed"):
    return compress(group_and_select(
        s, n_anchors=n_anchors, group_window=window, min_support=min_support,
        grouping=grouping))


def test_basic_grouping_and_winner():
    s = mk_summary([
        (0, 2, True, 150, 5.0),   # pair (0,2), group {150,180} (gap 30 <= 100)
        (0, 2, True, 180, 7.0),   # <- winner group, rep (score 7)
        (0, 2, True, 950, 9.0),   # lone group (gap 770 > 100)
        (0, 2, False, 160, 8.0),  # failed: ignored
    ])
    out = run(s)
    assert len(out) == 1
    assert out[0]["pair"] == (0, 2)
    assert out[0]["count"] == 2
    assert out[0]["bucket"] == 150   # windowed: group's min path length
    assert out[0]["rep_uid"] == 1
    assert out[0]["rep_score"] == 7.0


def test_basic_grouping_fixed_mode():
    s = mk_summary([
        (0, 2, True, 150, 5.0),   # bucket 1
        (0, 2, True, 180, 7.0),   # bucket 1 <- winner
        (0, 2, True, 950, 9.0),   # bucket 9
        (0, 2, False, 160, 8.0),
    ])
    out = run(s, grouping="fixed")
    assert len(out) == 1
    assert out[0]["count"] == 2
    assert out[0]["bucket"] == 1     # fixed: bucket index
    assert out[0]["rep_uid"] == 1


def test_windowed_split_beats_fixed_bucket_edge():
    """Round-1 regression: a true length cluster straddling a fixed-bucket edge
    is split in half by fixed bucketing and LOSES to a smaller unimodal group;
    windowed split keeps the cluster whole and it wins (VERDICT round 1 item 2)."""
    s = mk_summary([
        # true cluster of 4 straddling the 100-bucket edge at 200
        (0, 2, True, 180, 1.0),
        (0, 2, True, 195, 2.0),
        (0, 2, True, 205, 3.0),
        (0, 2, True, 220, 4.0),
        # unimodal group of 3 inside one bucket, far away
        (0, 2, True, 910, 5.0),
        (0, 2, True, 920, 9.0),
        (0, 2, True, 930, 6.0),
    ])
    fixed = run(s, grouping="fixed")
    assert fixed[0]["count"] == 3 and fixed[0]["bucket"] == 9  # cluster split 2+2
    windowed = run(s, grouping="windowed")
    assert windowed[0]["count"] == 4          # cluster survives intact and wins
    assert windowed[0]["bucket"] == 180
    assert windowed[0]["rep_uid"] == 3        # max score within the cluster


def test_direction_canonicalization_merges():
    # walk 0: 0 -> 2 ; walk 1 is the rc-direction walk 3 -> 1 (canonical also (0,2))
    s = mk_summary([
        (0, 2, True, 150, 5.0),
        (3, 1, True, 160, 6.0),
    ])
    out = run(s)
    assert len(out) == 1
    assert out[0]["pair"] == (0, 2)
    assert out[0]["count"] == 2
    assert out[0]["rep_uid"] == 1


def test_tie_breaks_smaller_bucket():
    s = mk_summary([
        (0, 2, True, 950, 1.0),
        (0, 2, True, 990, 2.0),
        (0, 2, True, 150, 3.0),
        (0, 2, True, 160, 4.0),
    ])
    out = run(s)
    assert out[0]["bucket"] == 150  # two groups of 2; shorter group wins
    assert run(s, grouping="fixed")[0]["bucket"] == 1


def test_rep_tie_breaks_smaller_uid():
    s = mk_summary([
        (0, 2, True, 150, 5.0),
        (0, 2, True, 160, 5.0),
    ])
    out = run(s)
    assert out[0]["rep_uid"] == 0


def test_min_support():
    s = mk_summary([(0, 2, True, 150, 5.0)])
    assert run(s, min_support=2) == []
    assert len(run(s, min_support=1)) == 1


def test_multiple_pairs():
    s = mk_summary([
        (0, 2, True, 100, 1.0),
        (0, 2, True, 110, 2.0),
        (1, 5, True, 300, 3.0),   # different pair (but 5 not anchor-ish: still grouped)
        (1, 5, True, 320, 4.0),
    ])
    out = run(s, n_anchors=4)
    assert len(out) == 2
    assert out[0]["pair"] == (0, 2) and out[1]["pair"] == (1, 5)


def test_matches_oracle_random(rng):
    n = 500
    starts = rng.integers(0, 8, n)
    terms = rng.integers(0, 8, n)
    s = WalkSummary(
        start=jnp.array(starts, jnp.int32),
        terminal=jnp.array(terms, jnp.int32),
        success=jnp.array(rng.random(n) < 0.7, bool),
        path_len=jnp.array(rng.integers(0, 2000, n), jnp.int32),
        score_sum=jnp.array(
            rng.integers(1, 50, n).astype(np.float32), jnp.float32),  # ints -> exact ties occur
        uid=jnp.arange(n, dtype=jnp.int32),
    )
    for grouping in ("windowed", "fixed"):
        got = run(s, window=250, min_support=2, n_anchors=4, grouping=grouping)
        want = consensus_oracle(s, n_anchors=4, group_window=250, min_support=2,
                                grouping=grouping)
        assert got == want, grouping


def test_all_failed():
    s = mk_summary([(0, 2, False, 100, 1.0)] * 5)
    assert run(s) == []
