"""CCLM chroma-from-luma: model math + full-codec bit-exact round trip."""
import hashlib

import numpy as np
import jax.numpy as jnp

from vvc_mm_tpu.common import cclm
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_params_recover_linear_model(rng):
    """Borders generated from an exact linear model must be recovered."""
    l = rng.integers(16, 240, (4, 16)).astype(np.int32)
    a_true, b_true = 0.5, 30.0
    c = np.clip(a_true * l + b_true, 0, 255).astype(np.int32)
    a, b = cclm.cclm_params(jnp.asarray(l), jnp.asarray(c))
    pred = np.asarray(cclm.cclm_predict(jnp.asarray(l)[:, :, None],
                                        a, b))[:, :, 0]
    assert np.abs(pred - c).max() <= 2      # integer rounding slack


def test_downsample_luma():
    x = jnp.arange(2 * 4 * 4, dtype=jnp.int32).reshape(2, 4, 4)
    d = np.asarray(cclm.downsample_luma(x))
    assert d.shape == (2, 2, 2)
    # 2x2 average with +2 rounding
    assert d[0, 0, 0] == (0 + 1 + 4 + 5 + 2) // 4


def test_flat_luma_gives_dc_chroma():
    """Zero luma dynamic range -> slope 0, prediction == c_min offset."""
    l = jnp.full((1, 8), 100, jnp.int32)
    c = jnp.full((1, 8), 60, jnp.int32)
    a, b = cclm.cclm_params(l, c)
    assert int(a[0]) == 0 and int(b[0]) == 60


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_allintra_cclm_roundtrip_bitexact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=30,
                 intra_block_size=8, cclm=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_cclm_helps_correlated_content():
    """On content whose chroma is a linear function of luma, CCLM must cut
    chroma bits (or raise chroma PSNR) vs the derived-mode-only coder."""
    rng = np.random.default_rng(7)
    h, w = 32, 64
    y = rng.integers(0, 255, (h, w)).astype(np.uint8)
    # smooth the luma so intra prediction isn't hopeless
    y = ((y.astype(np.int32) + np.roll(y, 1, 0) + np.roll(y, 1, 1)
          + np.roll(y, (1, 1), (0, 1))) // 4).astype(np.uint8)
    yd = y.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
    u = np.clip(yd * 0.5 + 40, 0, 255).astype(np.uint8)
    v = np.clip(255 - yd * 0.4, 0, 255).astype(np.uint8)
    frames = [[y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)]]
    base = EncLib(EncCfg(width=w, height=h, qp=30, intra_block_size=8))
    base.encode_sequence(frames)
    lm = EncLib(EncCfg(width=w, height=h, qp=30, intra_block_size=8,
                       cclm=True))
    lm.encode_sequence(frames)
    sb, sl = base.summary(), lm.summary()
    gain = (sl["psnr_u"] + sl["psnr_v"]) - (sb["psnr_u"] + sb["psnr_v"])
    assert sl["bits"] < sb["bits"] or gain > 0.2, (sb, sl)


def test_allintra_mip_roundtrip_bitexact():
    """MIP + CCLM + DepQuant together: encode -> decode bit-exact."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=30,
                 intra_block_size=8, cclm=True, mip=True, dep_quant=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_mip_predicts_smooth_gradient():
    """MIP's soft directional smoothers fit smooth ramps tightly."""
    from vvc_mm_tpu.common import mip as mip_mod
    s = 8
    # synthetic reference vector for a diagonal ramp block
    yy, xx = np.mgrid[-1:2 * s, -1:2 * s]
    plane = (10 + 3 * xx + 2 * yy).astype(np.int32)
    left = plane[1:2 * s + 1, 0][::-1]
    top = plane[0, :]
    cref = jnp.asarray(np.concatenate([left, top])[None].repeat(2, 0))
    pall = np.asarray(mip_mod.predict_mip_all(cref, s))
    target = (10 + 3 * np.arange(1, s + 1)[None, :]
              + 2 * np.arange(1, s + 1)[:, None])
    best = min(np.abs(pall[0, m] - target).mean()
               for m in range(pall.shape[1]))
    # must clearly beat a flat DC predictor at the boundary mean
    bdry = np.concatenate([left[:s], top[1:s + 1]])
    dc_err = np.abs(bdry.mean() - target).mean()
    assert best < dc_err * 0.95 and best < 20.0
