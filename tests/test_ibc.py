"""Intra block copy tests (reference: IBC, Hash/IbcHashMap + InterSearch
IBC search; here a wavefront-causal batched BV candidate set)."""
import numpy as np

from vvc_mm_tpu.common.wavefront import IBC_BASE, IBC_BVS
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def test_ibc_bvs_are_wavefront_causal():
    """Every candidate must lie on an earlier anti-diagonal d = 2*by+bx."""
    for dy, dx in IBC_BVS:
        assert 2 * dy + dx < 0, (dy, dx)


def _screen_frame(rng, h, w, s=8):
    """Screen-content-ish frame: a tiled repeating glyph pattern, so
    left/above block copies are near-perfect predictors."""
    tile = rng.integers(0, 256, size=(s, s)).astype(np.int32)
    y = np.tile(tile, (h // s, w // s))
    u = (y[::2, ::2] // 2).astype(np.int32)
    return [y, u, u.copy()]


def test_ibc_roundtrip_bitexact_and_used(rng):
    h = w = 64
    planes = _screen_frame(rng, h, w)
    cfg = EncCfg(width=w, height=h, qp=32, gop="AI", ibc=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence([planes])
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert all(v == "OK" for v in dec.hash_status.values()), dec.hash_status
    for p, q in zip(enc.results[0].recon, out[0].planes):
        np.testing.assert_array_equal(p, q)
    # on a perfectly tiled frame IBC must actually be chosen somewhere
    from vvc_mm_tpu.decoder.intra_parser import decode_intra_slice
    # recount from the decoder's parse: any mode >= IBC_BASE
    # (cheapest check: re-decode and look at the mode grid)
    from vvc_mm_tpu.common.bitstream import (BitReader, read_annexb,
                                             NAL_IDR, NAL_SPS)
    from vvc_mm_tpu.common.slice_ps import SPS, SliceHeader
    sps = None
    for nalu in read_annexb(stream):
        if nalu.nal_type == NAL_SPS:
            sps = SPS.read(BitReader(nalu.payload))
        if nalu.nal_type == NAL_IDR:
            br = BitReader(nalu.payload)
            SliceHeader.read(br, sps)
            body = bytes(nalu.payload[br._pos // 8:])
            s = sps.intra_block_size
            grids = decode_intra_slice(body, h // s, w // s, s, ibc=True)
            assert (grids[0] >= IBC_BASE).any()
            break


def test_ibc_beats_no_ibc_on_screen_content(rng):
    """Same frame, IBC on vs off: IBC must not lose PSNR and should save
    bits on tiled content."""
    planes = _screen_frame(rng, 64, 64)
    res = {}
    for ibc in (False, True):
        cfg = EncCfg(width=64, height=64, qp=32, gop="AI", ibc=ibc)
        enc = EncLib(cfg)
        enc.encode_sequence([planes])
        res[ibc] = enc.results[0]
    assert res[True].bits <= res[False].bits
    assert res[True].psnr_y >= res[False].psnr_y - 0.05


def test_ibc_with_tools_roundtrip(rng):
    """IBC composed with CCLM/LFNST/TS/MIP stays bit-exact."""
    planes = _screen_frame(rng, 64, 64)
    cfg = EncCfg(width=64, height=64, qp=30, gop="AI", ibc=True, cclm=True,
                 lfnst=True, transform_skip=True, mip=True, mrl=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence([planes])
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert all(v == "OK" for v in dec.hash_status.values()), dec.hash_status
    for p, q in zip(enc.results[0].recon, out[0].planes):
        np.testing.assert_array_equal(p, q)
