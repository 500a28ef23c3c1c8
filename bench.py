"""Benchmark: the BASELINE.md operating points, one JSON line each, the
BASELINE.json north-star metric (ERP 2048x1024 RA QP37 multi-model) LAST
so drivers that parse the final line keep the headline metric.

Baseline note: the reference (VTM-17.2 + MM extension) cannot be built in
this environment (Eigen3 is fetched at configure time; zero egress —
source/3rdparty/External-Eigen3.cmake), so per-config baselines are
documented single-thread VTM-class estimates (VTM encodes 2K-class RA
content at tens of seconds per frame on one core; AI is ~10x faster;
832x480 RA ~5x faster).  The BASELINE.json target is >=3x per chip.
"""
from __future__ import annotations

import json
import time

QP = 37

# (name, baseline fps estimate, cfg builder, n_frames, n_warm)
def _configs():
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID
    from vvc_mm_tpu.encoder.enclib import EncCfg

    erp = dict(search_range=24, wrap_around=True)
    mpa = MMConfig(mpa=True, projection=ProjectionID.EQUIRECTANGULAR)
    full = MMConfig(mpa=True, ged=True, rot=True, mmmvp=True,
                    projection=ProjectionID.EQUIRECTANGULAR)
    mm_head = MMConfig(mpa=True, rot=True,
                       projection=ProjectionID.EQUIRECTANGULAR)
    return [
        # 1. AI 416x240 QP37 (cfg/encoder_intra_vtm.cfg analog)
        ("ai416x240_qp37_encode_fps", 0.5,
         EncCfg(width=416, height=240, qp=QP, gop="AI"), (416, 240), 8, 2),
        # 2. RA 832x480, standard motion, no 360 tools
        ("ra832x480_qp37_encode_fps", 0.1,
         EncCfg(width=832, height=480, qp=QP, gop="RA", gop_size=8,
                search_range=24), (832, 480), 9, 9),
        # 3. ERP 2048x1024 MPA-only RA (cfg-360Lib encoder_360_ERP analog)
        ("erp2048x1024_ra_qp37_mpa_encode_fps", 0.05,
         EncCfg(width=2048, height=1024, qp=QP, gop="RA", gop_size=4,
                mm=mpa, **erp), (2048, 1024), 5, 5),
        # 4. full multi-model RA (MPA+GED+ROT+MMMVP, signaled epipole)
        ("erp2048x1024_ra_qp37_fullmm_encode_fps", 0.04,
         EncCfg(width=2048, height=1024, qp=QP, gop="RA", gop_size=4,
                mm=full, epipoles=[(1, 0, 0.0, 0.0, 1.0)], **erp),
         (2048, 1024), 5, 5),
        # 5. HEADLINE (BENCH_r* continuity): ERP RA MPA+ROT
        ("erp2048x1024_ra_qp37_mm_encode_fps", 0.05,
         EncCfg(width=2048, height=1024, qp=QP, gop="RA", gop_size=8,
                mm=mm_head, **erp), (2048, 1024), 9, 9),
    ]


def main() -> None:
    import os

    import jax

    # persistent compile cache: repeat bench runs skip XLA recompiles
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vvc_mm_tpu.common.typedefs import ChromaFormat
    from vvc_mm_tpu.encoder.enclib import EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

    for name, base_fps, cfg, (w, h), n, n_warm in _configs():
        fmt = VideoFormat(w, h, 8, ChromaFormat.C420)
        frames = synthetic_sequence(fmt, n, motion=(4.0, 1.5))
        # warmup: pay all jit compiles once on a short prefix
        import copy
        warm = EncLib(copy.deepcopy(cfg))
        warm.encode_sequence(frames[:n_warm])
        enc = EncLib(copy.deepcopy(cfg))
        t0 = time.perf_counter()
        enc.encode_sequence(frames)
        dt = time.perf_counter() - t0
        fps = n / dt
        print(json.dumps({
            "metric": name,
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(fps / base_fps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
