"""LFNST secondary transform: kernels + full codec round trip."""
import hashlib

import numpy as np
import jax.numpy as jnp

from vvc_mm_tpu.common import lfnst
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_kernels_near_orthogonal():
    K = lfnst._kernels().astype(np.float64) / (1 << lfnst.SHIFT)
    for c in range(4):
        for k in range(lfnst.N_LFNST_CAND):
            g = K[c, k] @ K[c, k].T
            assert np.abs(g - np.eye(16)).max() < 0.05


def test_forward_inverse_roundtrip_small_error():
    rng = np.random.default_rng(3)
    coeff = rng.integers(-200, 200, (5, 8, 8)).astype(np.int32)
    cls = jnp.asarray(rng.integers(0, 4, 5).astype(np.int32))
    f = lfnst.forward(jnp.asarray(coeff), cls, 1)
    b = np.asarray(lfnst.inverse(f, cls, 1))
    # only the 4x4 region is transformed; rest untouched
    np.testing.assert_array_equal(b[:, 4:, :], coeff[:, 4:, :])
    assert np.abs(b[:, :4, :4] - coeff[:, :4, :4]).max() <= 8


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_allintra_lfnst_roundtrip_bitexact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=30,
                 intra_block_size=8, lfnst=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_all_intra_tools_together_bitexact():
    """MIP + CCLM + DepQuant + LFNST, one stream."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32,
                 intra_block_size=8, lfnst=True, mip=True, cclm=True,
                 dep_quant=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_mrl_roundtrip_bitexact():
    """Multi-reference-line intra: encode -> decode bit-exact."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=30,
                 intra_block_size=8, mrl=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_everything_on_bitexact():
    """All intra tools at once: MIP+CCLM+LFNST+MRL+DepQuant+WPP."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32,
                 intra_block_size=8, lfnst=True, mip=True, cclm=True,
                 dep_quant=True, mrl=True, wpp=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc
