"""Explicit weighted prediction: fade content coding + bit-exact loop."""
import hashlib

import numpy as np

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _fade_frames(n=4, w=64, h=32):
    rng = np.random.default_rng(5)
    base_y = rng.integers(40, 200, (h, w)).astype(np.float64)
    base_y = (base_y + np.roll(base_y, 1, 0) + np.roll(base_y, 1, 1)) / 3
    base_u = rng.integers(90, 160, (h // 2, w // 2)).astype(np.float64)
    base_v = rng.integers(90, 160, (h // 2, w // 2)).astype(np.float64)
    out = []
    for i in range(n):
        g = 1.0 - 0.18 * i               # fade to black
        out.append([np.clip(base_y * g, 0, 255).astype(np.int32),
                    np.clip(128 + (base_u - 128) * g, 0, 255)
                    .astype(np.int32),
                    np.clip(128 + (base_v - 128) * g, 0, 255)
                    .astype(np.int32)])
    return out


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_wp_roundtrip_bitexact():
    frames = _fade_frames()
    cfg = EncCfg(width=64, height=32, qp=32, gop="LDP",
                 inter_block_size=16, weighted_pred=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_wp_helps_on_fade():
    frames = _fade_frames()
    base = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP",
                         inter_block_size=16))
    base.encode_sequence(frames)
    w = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP",
                      inter_block_size=16, weighted_pred=True))
    w.encode_sequence(frames)
    sb, sw = base.summary(), w.summary()
    # same-ish quality for fewer bits, or better quality
    assert (sw["bits"] < sb["bits"] and sw["psnr_y"] > sb["psnr_y"] - 0.1) \
        or sw["psnr_y"] > sb["psnr_y"] + 0.3, (sb, sw)


def test_wp_near_noop_on_ordinary_content():
    """No fade -> WP must not hurt: near-identical rate and quality."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3)
    enc = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP",
                        inter_block_size=16, weighted_pred=True))
    s1 = enc.encode_sequence(frames)
    base = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP",
                         inter_block_size=16))
    s2 = base.encode_sequence(frames)
    a, b = enc.summary(), base.summary()
    assert abs(len(s1) - len(s2)) <= max(8, 0.02 * len(s2))
    assert abs(a["psnr_y"] - b["psnr_y"]) < 0.1


def test_weighted_bipred_b_roundtrip():
    """Explicit weighted prediction on B slices (per-list tables,
    weighted bi combine; reference: xWeightedPredictionBi) — a fade
    sequence must round-trip bit-exactly and trigger the tables."""
    import hashlib

    import numpy as np

    from vvc_mm_tpu.common.typedefs import ChromaFormat
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    base = synthetic_sequence(fmt, 5, motion=(2.0, 1.0))
    # global fade: scale luma per frame so WP has something to model
    frames = []
    for t, f in enumerate(base):
        g = 1.0 - 0.12 * t
        frames.append([np.clip(f[0] * g, 0, 255).astype(np.int32),
                       f[1], f[2]])
    cfg = EncCfg(width=64, height=32, qp=32, gop="RA", gop_size=4,
                 weighted_bipred=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)

    def md5(ps):
        m = hashlib.md5()
        for p in ps:
            m.update(np.asarray(p).astype(np.uint8).tobytes())
        return m.hexdigest()

    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert md5(f.planes) == md5(res.recon), f.poc


def test_weighted_bipred_composes_with_bdof_gpm_roundtrip():
    """Weighted bi-prediction + BDOF + GPM + CIIP enabled TOGETHER: the
    tools gate off per slice where explicit weights are active and stay
    on elsewhere (reference precedence: BDOF biocheck0
    InterPrediction.cpp:566; DMVR no-WP condition :252) — round trip
    must stay bit-exact."""
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(3.0, 1.0))
    # fade half the frames so some B slices estimate weights and others
    # don't — both gating arms are exercised
    for i, f in enumerate(frames):
        if i >= 3:
            y = np.asarray(f[0])
            y[:] = np.clip(y * 0.6 + 20, 0, 255).astype(y.dtype)
    cfg = EncCfg(width=64, height=64, qp=32, gop="RA", gop_size=4,
                 weighted_bipred=True, bdof=True, gpm=True, ciip=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc
