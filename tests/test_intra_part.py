"""Two-level intra partitioning (16x16 vs 8x8 quads): round trip +
RD gain vs the fixed 8x8 grid (reference: QTMT intra split,
EncCu.cpp:499, split_cu_flag)."""
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


def test_intra_part_roundtrip_bitexact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="AI",
                 intra_split=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_intra_part_both_sizes_used():
    """Mixed content (flat sky + detail) must use both 16x16 whole blocks
    and 8x8 splits."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vvc_mm_tpu.common import intra_part
    from vvc_mm_tpu.common.wavefront import steps_to_grid, wavefront_coords
    from vvc_mm_tpu.utils import xfer

    rng = np.random.default_rng(5)
    h, w = 64, 64
    y = np.full((h, w), 120, np.int32)
    y[32:, :] = rng.integers(0, 255, size=(32, w))   # detailed lower half
    u = np.full((h // 2, w // 2), 128, np.int32)
    dev = xfer.upload_planes([y, u, u], 8)
    outs, _ = intra_part.encode_intra_frame_part(dev[0], dev[1], dev[2],
                                                 32, 8)
    split_steps = np.asarray(outs[0])
    coords, valid = wavefront_coords(h // 16, w // 16)
    split = steps_to_grid(split_steps, coords, valid)
    assert (split == 0).any() and (split == 1).any()


def test_intra_part_beats_fixed_grid():
    """RD cost (bits at comparable PSNR) must improve vs fixed 8x8 on the
    AI config (the VERDICT round-4 acceptance check, scaled down)."""
    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    base = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=37,
                         gop="AI"))
    base.encode_sequence(frames)
    p = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=37, gop="AI",
                      intra_split=True))
    p.encode_sequence(frames)
    sb, sp = base.summary(), p.summary()
    # allow a small PSNR shift; demand a real bit reduction
    assert sp["bits"] < sb["bits"]
    assert sp["psnr_y"] > sb["psnr_y"] - 0.25
