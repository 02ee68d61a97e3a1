"""Scoring parity tests: Pallas kernel ≡ jnp ≡ numpy oracle (SURVEY.md §5 item 2)."""

import numpy as np
import pytest

from telomeri_tpu.kernels.scoring import (
    score_arrays_np,
    score_overlaps_jnp,
    score_overlaps_pallas,
)


def random_geom(rng, n):
    return dict(
        nm=rng.integers(1, 5000, n).astype(np.int32),
        bl=rng.integers(1, 6000, n).astype(np.int32),
        ol1=rng.integers(0, 6000, n).astype(np.int32),
        ol2=rng.integers(0, 6000, n).astype(np.int32),
        oh1=rng.integers(0, 2000, n).astype(np.int32),
        oh2=rng.integers(0, 2000, n).astype(np.int32),
        el1=rng.integers(-1000, 30000, n).astype(np.int32),
        el2=rng.integers(-1000, 30000, n).astype(np.int32),
    )


def args(g):
    return (g["nm"], g["bl"], g["ol1"], g["ol2"], g["oh1"], g["oh2"], g["el1"], g["el2"])


def test_golden_values():
    # SI=0.9, OL=200 each -> OS=180; pen=0; EL=800 -> ES=580 (hand-computed, HERA formulas)
    si, os_, es1, es2 = score_arrays_np(
        np.array([180]), np.array([200]), np.array([200]), np.array([200]),
        np.array([0]), np.array([0]), np.array([800]), np.array([800]),
    )
    assert si[0] == pytest.approx(0.9)
    assert os_[0] == pytest.approx(180.0)
    assert es1[0] == es2[0] == pytest.approx(580.0)


def test_jnp_matches_np_bitwise(rng):
    g = random_geom(rng, 4097)
    ref = score_arrays_np(*args(g))
    got = score_overlaps_jnp(*args(g))
    for r, o in zip(ref, got):
        np.testing.assert_array_equal(r, np.asarray(o))


@pytest.mark.parametrize("n", [1, 127, 128, 1000, 32768, 70001])
def test_pallas_interpret_matches_np_bitwise(rng, n):
    g = random_geom(rng, n)
    ref = score_arrays_np(*args(g))
    got = score_overlaps_pallas(*args(g), interpret=True)
    for r, o in zip(ref, got):
        assert o.shape == (n,)
        np.testing.assert_array_equal(r, np.asarray(o))


def test_pallas_two_output_variant_bitwise(rng):
    from telomeri_tpu.kernels.scoring import score_os_es2_pallas

    g = random_geom(rng, 9000)
    _, os_ref, _, es2_ref = score_arrays_np(*args(g))
    os_, es2 = score_os_es2_pallas(*args(g), interpret=True)
    np.testing.assert_array_equal(os_ref, np.asarray(os_))
    np.testing.assert_array_equal(es2_ref, np.asarray(es2))


def test_zero_blocklen_guard():
    si, *_ = score_arrays_np(
        np.array([10]), np.array([0]), np.array([1]), np.array([1]),
        np.array([0]), np.array([0]), np.array([0]), np.array([0]),
    )
    assert np.isfinite(si[0]) and si[0] == 10.0  # nm / max(bl,1)
