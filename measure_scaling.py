"""Scaling-efficiency harness for the sharded-reference P encode
(BASELINE config-5 path): reports T(1) / (N * T(N)) on an N-device mesh.

On real multi-chip hardware this measures ICI scaling of the halo
pattern; in this environment only a VIRTUAL CPU mesh exists (the
devices share 2 physical cores), so the number printed here validates
the collective STRUCTURE and overhead, not interconnect bandwidth —
it is recorded with that caveat, never as a hardware scaling claim.

Usage: python measure_scaling.py [height_multiple_of_1024] [iters]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    from vvc_mm_tpu.common import inter_frame
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    from vvc_mm_tpu.parallel.sharding import (encode_p_frame_sharded_ref,
                                              make_mesh)
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    w = 512
    fmt = VideoFormat(w, h, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2, motion=(3.0, 2.0))
    orig = [np.asarray(p) for p in frames[1]]
    ref = [np.asarray(p) for p in frames[0]]
    n = len(jax.devices())
    mesh = make_mesh(n)

    import jax.numpy as jnp
    o = [jnp.asarray(p) for p in orig]
    r = [jnp.asarray(p) for p in ref]

    def run1():
        out = inter_frame.encode_p_frame(*o, *r, 32, 16, 8, 8, True)
        jax.block_until_ready(out[0])

    def runN():
        out = encode_p_frame_sharded_ref(orig, ref, qp=32, mesh=mesh,
                                         search_range=8, wrap_around=True)
        jax.block_until_ready(out[0])

    run1(); runN()                       # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        run1()
    t1 = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        runN()
    tn = (time.perf_counter() - t0) / iters
    eff = t1 / (n * tn)
    print(f"frame {w}x{h}, devices {n} (VIRTUAL cpu mesh, "
          f"{os.cpu_count()} physical cores)")
    print(f"T(1)={t1 * 1000:.1f} ms  T({n})={tn * 1000:.1f} ms  "
          f"T(1)/(N*T(N))={eff:.3f}")
    print("caveat: virtual mesh shares the host cores — this validates "
          "the halo-exchange structure and overhead, not ICI scaling")


if __name__ == "__main__":
    main()
