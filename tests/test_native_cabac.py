"""Bit-identity of the native C entropy coder vs the Python specification."""
import numpy as np
import pytest

from vvc_mm_tpu.common.cabac import BinDecoder, BinEncoder
from vvc_mm_tpu.common.residual_coding import decode_coeffs, encode_coeffs
from vvc_mm_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native build unavailable")


def test_bin_stream_identity(rng):
    ops = []
    for _ in range(2000):
        kind = rng.integers(0, 4)
        if kind == 0:
            ops.append(("bin", int(rng.integers(0, 2)),
                        int(rng.integers(0, 40))))
        elif kind == 1:
            ops.append(("ep", int(rng.integers(0, 2))))
        elif kind == 2:
            ops.append(("bits", int(rng.integers(0, 256)), 8))
        else:
            ops.append(("eg", int(rng.integers(0, 100)),
                        int(rng.integers(0, 3))))

    def run_enc(enc):
        for op in ops:
            if op[0] == "bin":
                enc.encode_bin(op[1], op[2])
            elif op[0] == "ep":
                enc.encode_bin_ep(op[1])
            elif op[0] == "bits":
                enc.encode_bins_ep(op[1], op[2])
            else:
                enc.encode_eg(op[1], op[2])
        return enc.finish()

    py = run_enc(BinEncoder())
    nat = run_enc(native.NativeBinEncoder())
    assert py == nat

    # cross-decode: native decodes python bytes and vice versa
    for dec in (BinDecoder(py), native.NativeBinDecoder(py)):
        out = []
        for op in ops:
            if op[0] == "bin":
                out.append(("bin", dec.decode_bin(op[2]), op[2]))
            elif op[0] == "ep":
                out.append(("ep", dec.decode_bin_ep()))
            elif op[0] == "bits":
                out.append(("bits", dec.decode_bins_ep(8), 8))
            else:
                out.append(("eg", dec.decode_eg(op[2]), op[2]))
        assert out == ops


@pytest.mark.parametrize("size,chroma", [(8, False), (4, True), (16, False)])
def test_coeffs_identity(rng, size, chroma):
    blocks = []
    for _ in range(40):
        blk = np.zeros((size, size), dtype=np.int32)
        nnz = int(rng.integers(1, size * size // 2))
        pos = rng.choice(size * size, nnz, replace=False)
        blk.reshape(-1)[pos] = rng.integers(-40, 41, nnz)
        if not blk.any():
            blk[0, 0] = 1
        blocks.append(blk)

    epy = BinEncoder()
    ena = native.NativeBinEncoder()
    for blk in blocks:
        encode_coeffs(epy, blk, chroma)
        ena.encode_coeffs(blk, chroma)
    py, nat = epy.finish(), ena.finish()
    assert py == nat

    dpy = BinDecoder(py)
    dna = native.NativeBinDecoder(py)
    for blk in blocks:
        assert np.array_equal(decode_coeffs(dpy, size, size, chroma), blk)
        assert np.array_equal(dna.decode_coeffs(size, size, chroma), blk)


def test_factory_roundtrip_through_codec(rng):
    """Full intra slice through the factory (native when available) must
    decode bit-exactly."""
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    enc = EncLib(EncCfg(width=64, height=32, qp=30))
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, r in zip(out, enc.results):
        assert np.array_equal(f.planes[0], r.recon[0])
