"""Benchmark: all-intra encoder throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference (VTM-17.2 + MM extension) cannot be built in
this environment (Eigen3 is fetched at configure time, zero egress;
source/3rdparty/External-Eigen3.cmake), so the baseline is the documented
single-thread VTM-class all-intra speed on this config: ~0.2 frames/s at
416x240 QP37 (VTM AI encodes Class-D content at seconds-per-frame on one
core; BASELINE.md records that the repo publishes no numbers).  The target
from BASELINE.json is >=3x that per chip.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 0.2  # single-thread VTM-class AI 416x240 QP37 (estimate)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vvc_mm_tpu.common import wavefront
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

    w, h, qp, nframes = 416, 240, 37, 8
    # pad to block multiple (416x240 is 52x30 8x8 blocks — exact)
    fmt = VideoFormat(w, h, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, nframes)

    planes = [[jnp.asarray(p) for p in f] for f in frames]
    # warmup/compile
    outs, recon = wavefront.encode_intra_frame(*planes[0], qp, 8, 8)
    jax.block_until_ready(recon)

    t0 = time.perf_counter()
    for f in planes:
        outs, recon = wavefront.encode_intra_frame(*f, qp, 8, 8)
    jax.block_until_ready(recon)
    dt = time.perf_counter() - t0
    fps = nframes / dt

    print(json.dumps({
        "metric": "allintra_encode_fps_416x240_qp37",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
