"""Quantization scaling lists (reference: Quant.cpp xSetScalingListDec,
scaling_list_data syntax): SPS carriage + bit-exact roundtrip + the
intended frequency shaping."""
import hashlib

import numpy as np

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


# HVS-style matrix: heavier quantization toward high frequencies
STEEP = tuple(int(16 + 2 * (x + y)) for y in range(8) for x in range(8))


def test_scaling_weights_resampling():
    from vvc_mm_tpu.common.quant import scaling_weights
    w16 = scaling_weights(STEEP, 16, 16)
    assert w16.shape == (16, 16)
    assert w16[0, 0] == 16 and w16[15, 15] == STEEP[63]
    w4 = scaling_weights(STEEP, 4, 4)
    assert w4.shape == (4, 4) and w4[0, 0] == 16


def test_scaling_list_roundtrip_bitexact(rng):
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(2.0, 1.0))
    cfg = EncCfg(width=64, height=64, qp=30, gop="LDP", intra_period=0,
                 search_range=8, scaling_list=STEEP)
    enc = EncLib(cfg)
    data = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(data)
    assert len(out) == 3
    for f, r in zip(sorted(out, key=lambda x: x.poc), enc.results):
        assert _md5(f.planes) == _md5(r.recon), f.poc


def test_scaling_list_shapes_spectrum(rng):
    """The steep matrix must reduce P-frame bits vs flat at equal QP
    (high-frequency residual coefficients get coarser steps)."""
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(2.0, 1.0))
    flat = EncLib(EncCfg(width=64, height=64, qp=30, gop="LDP",
                         intra_period=0, search_range=8))
    flat.encode_sequence(frames)
    steep = EncLib(EncCfg(width=64, height=64, qp=30, gop="LDP",
                          intra_period=0, search_range=8,
                          scaling_list=STEEP))
    steep.encode_sequence(frames)
    bits_flat = sum(r.bits for r in flat.results[1:])
    bits_steep = sum(r.bits for r in steep.results[1:])
    assert bits_steep < bits_flat
