"""CABAC engine round-trip and compression-sanity tests (host-side, no JAX)."""
import numpy as np
import pytest

from vvc_mm_tpu.common.cabac import BinEncoder, BinDecoder
from vvc_mm_tpu.common.contexts import ContextState, NUM_CTX, PROB_ONE


def test_roundtrip_random_bins(rng):
    bins = rng.integers(0, 2, size=5000)
    ctxs = rng.integers(0, NUM_CTX, size=5000)
    enc = BinEncoder()
    for b, c in zip(bins, ctxs):
        enc.encode_bin(int(b), int(c))
    data = enc.finish()
    dec = BinDecoder(data)
    out = [dec.decode_bin(int(c)) for c in ctxs]
    assert np.array_equal(out, bins)


def test_roundtrip_mixed_ep_and_ctx(rng):
    enc = BinEncoder()
    ops = []
    for _ in range(3000):
        kind = rng.integers(0, 4)
        if kind == 0:
            b, c = int(rng.integers(0, 2)), int(rng.integers(0, NUM_CTX))
            enc.encode_bin(b, c)
            ops.append(("ctx", b, c))
        elif kind == 1:
            b = int(rng.integers(0, 2))
            enc.encode_bin_ep(b)
            ops.append(("ep", b))
        elif kind == 2:
            v, n = int(rng.integers(0, 256)), 8
            enc.encode_bins_ep(v, n)
            ops.append(("eps", v, n))
        else:
            v, k = int(rng.integers(0, 1000)), int(rng.integers(0, 4))
            enc.encode_eg(v, k)
            ops.append(("eg", v, k))
    data = enc.finish()
    dec = BinDecoder(data)
    for op in ops:
        if op[0] == "ctx":
            assert dec.decode_bin(op[2]) == op[1]
        elif op[0] == "ep":
            assert dec.decode_bin_ep() == op[1]
        elif op[0] == "eps":
            assert dec.decode_bins_ep(op[2]) == op[1]
        else:
            assert dec.decode_eg(op[2]) == op[1]


def test_compression_of_biased_source(rng):
    """A 95%-zeros source must compress well below 1 bit/bin (entropy ~0.29)."""
    n = 20000
    bins = (rng.random(n) < 0.05).astype(int)
    enc = BinEncoder()
    for b in bins:
        enc.encode_bin(int(b), 0)
    data = enc.finish()
    bits_per_bin = len(data) * 8 / n
    assert bits_per_bin < 0.40, bits_per_bin
    dec = BinDecoder(data)
    assert all(dec.decode_bin(0) == int(b) for b in bins)


def test_ep_bins_cost_one_bit(rng):
    n = 8000
    bins = rng.integers(0, 2, size=n)
    enc = BinEncoder()
    for b in bins:
        enc.encode_bin_ep(int(b))
    data = enc.finish()
    assert abs(len(data) * 8 / n - 1.0) < 0.02


def test_unary_roundtrip(rng):
    vals = rng.integers(0, 8, size=200)
    enc = BinEncoder()
    for v in vals:
        enc.encode_unary(int(v), 3, 4, 7)
    data = enc.finish()
    dec = BinDecoder(data)
    assert [dec.decode_unary(3, 4, 7) for _ in vals] == vals.tolist()


def test_context_state_wpp_clone():
    """WPP context save/restore (reference: EncSlice.cpp:1928,2083)."""
    s = ContextState()
    s.update(5, 1)
    c = s.clone()
    s.update(5, 1)
    assert c.prob(5) != s.prob(5)
    assert c.prob(4) == s.prob(4)


def test_carry_propagation_stress():
    """Drive low toward 0xFFFF.. to exercise the carry path."""
    enc = BinEncoder()
    # encode many '1' bins at high prob-of-zero -> low accumulates near top
    for i in range(4000):
        enc.encode_bin(1 if i % 17 else 0, 0)
    data = enc.finish()
    dec = BinDecoder(data)
    for i in range(4000):
        assert dec.decode_bin(0) == (1 if i % 17 else 0)
