"""Spread / response-map / linearize parity: JAX ops vs NumPy oracle,
plus hand-computed micro-cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from shape_based_matching_tpu.ops import response
from shape_based_matching_tpu.oracle import reference as oracle


@pytest.mark.parametrize("T", [4, 8])
def test_spread_matches_oracle(rng, T):
    q = rng.randint(0, 256, (32, 48), dtype=np.uint8)
    want = oracle.spread(q, T)
    got = np.asarray(response.spread(jnp.asarray(q), T))
    np.testing.assert_array_equal(got, want)


def test_spread_hand_case():
    q = np.zeros((8, 8), np.uint8)
    q[4, 4] = 0b00000010
    got = np.asarray(response.spread(jnp.asarray(q), 4))
    # dst[r, c] ORs src[r+dr, c+dc]: the bit spreads UP-LEFT of (4,4)
    want = np.zeros((8, 8), np.uint8)
    want[1:5, 1:5] = 2
    np.testing.assert_array_equal(got, want)


def test_response_maps_lut_semantics(rng):
    s = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    got = np.asarray(response.response_maps(jnp.asarray(s)))
    want = oracle.response_maps(s)
    np.testing.assert_array_equal(got, want)
    # exhaustive check against the reference SIMILARITY_LUT definition:
    # response = max over set bits b of w(circular distance to ori)
    for val in range(256):
        for ori in range(8):
            best = 0
            for b in range(8):
                if val & (1 << b):
                    d = min((b - ori) % 8, (ori - b) % 8)
                    best = max(best, 4 if d == 0 else (3 if d == 1 else 0))
            img = np.full((4, 4), val, np.uint8)
            r = oracle.response_maps(img)[ori]
            assert r[0, 0] == best, (val, ori)


@pytest.mark.parametrize("T", [4, 8])
def test_linearize_matches_oracle(rng, T):
    resp = rng.randint(0, 5, (8, 32, 48), dtype=np.uint8)
    want = oracle.linearize(resp, T)
    got = np.asarray(response.linearize(jnp.asarray(resp), T))
    np.testing.assert_array_equal(got, want)


def test_linearize_addressing():
    # accessLinearMemory invariant: lm[ori, (y%T)*T + x%T, (y//T)*W + x//T]
    # == resp[ori, y, x]
    T = 4
    resp = np.arange(8 * 16 * 20, dtype=np.uint8).reshape(8, 16, 20) % 5
    lm = oracle.linearize(resp, T)
    W = 20 // T
    for ori in (0, 3, 7):
        for y in (0, 5, 15):
            for x in (0, 7, 19):
                grid = (y % T) * T + (x % T)
                idx = (y // T) * W + (x // T)
                assert lm[ori, grid, idx] == resp[ori, y, x]
