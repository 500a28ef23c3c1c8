"""Benchmark: the BASELINE.json north-star metric —
encoder frames/s/chip on ERP 2048x1024 random-access QP37 with the
multi-model motion tools active (MPA + ROT, wrap-around ERP).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference (VTM-17.2 + MM extension) cannot be built in
this environment (Eigen3 is fetched at configure time; zero egress —
source/3rdparty/External-Eigen3.cmake), so the baseline is a documented
estimate of single-thread VTM-class RA encoding at this resolution:
~0.05 frames/s (VTM RA encodes 2K-class content at tens of seconds per
frame on one core).  The BASELINE.json target is >=3x per chip.
"""
from __future__ import annotations

import json
import time

BASELINE_FPS = 0.05   # single-thread VTM-class RA 2048x1024 QP37 (estimate)

W, H, QP, NFRAMES = 2048, 1024, 37, 9


def main() -> None:
    import os

    import jax
    import numpy as np

    # persistent compile cache: repeat bench runs skip XLA recompiles
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ChromaFormat, ProjectionID
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

    fmt = VideoFormat(W, H, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, NFRAMES, motion=(4.0, 1.5))

    mm = MMConfig(mpa=True, rot=True,
                  projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=W, height=H, qp=QP, gop="RA", gop_size=8,
                 search_range=24, wrap_around=True, mm=mm)

    # warmup GOP: pay all jit compiles once
    warm = EncLib(cfg)
    warm.encode_sequence(frames[:3])

    enc = EncLib(cfg)
    t0 = time.perf_counter()
    enc.encode_sequence(frames)
    dt = time.perf_counter() - t0
    fps = NFRAMES / dt

    print(json.dumps({
        "metric": "erp2048x1024_ra_qp37_mm_encode_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
