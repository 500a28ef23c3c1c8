"""Auxiliary subsystems: cache model, trace channels, HRD check, chroma
format gating (VERDICT round-4 'kill or cure the dead parity items')."""
import subprocess
import sys

import numpy as np
import pytest

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.cache_model import CacheModel
from vvc_mm_tpu.utils.yuv_io import (VideoFormat, YuvWriter,
                                     synthetic_sequence)

pytestmark = pytest.mark.smoke


def test_cache_model_line_simulation():
    """Overlapping MC windows must HIT; disjoint far windows must MISS."""
    cm = CacheModel()
    cm.start_frame(0)
    mvs = np.zeros((2, 4, 2), np.int64)       # all-zero MVs, 16x16 blocks
    cm.simulate_mc(mvs, 16, 64)
    f = cm.frames[0]
    assert f.misses > 0
    # neighboring blocks share filter-margin rows -> some hits
    assert f.hits > 0
    assert f.bytes_fetched == f.misses * cm.line_bytes
    assert "cache hit" in cm.report()


def test_cache_model_wired_into_decoder():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(3.0, 1.0))
    enc = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP"))
    stream = enc.encode_sequence(frames)
    cm = CacheModel()
    DecLib(cache_model=cm).decode_bytes(stream)
    # inter pictures recorded reference traffic
    assert any(f.samples > 0 for f in cm.frames)


def test_trace_channels_emit():
    """motion_model/mvd dtrace channels fire during an MM decode
    (reference: the DTRACE at CABACWriter.cpp:2110)."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID
    from vvc_mm_tpu.utils.trace import disable_trace, enable_trace

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(3.0, 1.0))
    mm = MMConfig(mpa=True, projection=ProjectionID.EQUIRECTANGULAR)
    enc = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP", mm=mm,
                        wrap_around=True, merge=False))
    stream = enc.encode_sequence(frames)
    tr = enable_trace(["motion_model", "mvd"])
    try:
        DecLib().decode_bytes(stream)
    finally:
        disable_trace()
    channels = {c for c, _ in tr.events}
    assert "motion_model" in channels
    assert "mvd" in channels


def test_trace_rule_condition():
    from vvc_mm_tpu.utils.trace import Trace
    tr = Trace(["mvd:by==1"])
    tr.log("mvd", by=0, bx=0, x=1, y=1)   # by ctx not set -> disabled
    tr.set_ctx(by=1)
    tr.log("mvd", by=1, bx=0, x=1, y=1)
    assert len(tr.events) == 1


def test_hrd_cpb_check_runs(tmp_path):
    """decoder_app reports HRD conformance when HRD params are signaled."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(2.0, 1.0))
    enc = EncLib(EncCfg(width=64, height=32, qp=37, gop="LDP",
                        target_bitrate_kbps=100, frame_rate=30.0))
    stream = enc.encode_sequence(frames)
    bs = tmp_path / "hrd.bin"
    bs.write_bytes(stream)
    import os
    env = dict(os.environ, VVC_JAX_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "vvc_mm_tpu.apps.decoder_app", "-b",
         str(bs)], capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr
    assert "HRD: CPB" in out.stdout


def test_chroma_format_rejected(tmp_path):
    """Non-4:2:0 CLI input is rejected with a clear error, not miscoded."""
    yuv = tmp_path / "in444.yuv"
    # write a tiny 4:4:4 frame (3 x 64 x 32 bytes)
    yuv.write_bytes(bytes(64 * 32 * 3))
    out = subprocess.run(
        [sys.executable, "-m", "vvc_mm_tpu.apps.encoder_app", "-i",
         str(yuv), "-b", str(tmp_path / "o.bin"), "-wdt", "64", "-hgt",
         "32", "--InputChromaFormat=444"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode != 0
    assert "4:2:0" in (out.stderr + out.stdout)


def test_profiling_stages_record():
    """INTERPRED_PROFILING analog: stage timers accumulate when enabled."""
    from vvc_mm_tpu.utils import profiling

    profiling.reset()
    old = profiling.ENABLED
    profiling.ENABLED = True
    try:
        with profiling.stage("unit_test_stage"):
            pass
        rep = profiling.report()
    finally:
        profiling.ENABLED = old
        profiling.reset()
    assert "unit_test_stage" in rep
