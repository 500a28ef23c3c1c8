"""Generate BD_r05.md: per-tool BD-rate table against this codec's own
anchors (apps/bd_rate.py methodology; see README "Conformance posture" —
the reference extension's own gains are reported the same way, BD-rate
vs the VTM anchor, in the cited paper).

Each row: one tool toggled on top of a common base configuration, QP
ladder {27, 32, 37, 42}, deterministic realistic content (bench.py
generator).  Negative BD-rate = the tool saves bits at equal PSNR.

Run on the TPU (or CPU, slowly):  python make_bd_r05.py
"""
from __future__ import annotations

import copy
import sys
import time

import numpy as np

QPS = (30, 36, 42)


def run_ladder(cfg, frames):
    from vvc_mm_tpu.encoder.enclib import EncLib
    rates, psnrs = [], []
    for qp in QPS:
        c = copy.deepcopy(cfg)
        c.qp = qp
        enc = EncLib(c)
        enc.encode_sequence(frames)
        s = enc.summary()
        rates.append(max(int(s["bits"]), 1))
        psnrs.append(float(s["psnr_y"]))
    return rates, psnrs


def main() -> None:
    import os

    import jax
    # CPU: TPU-tunnel AOT compiles for a fresh shape cost minutes per
    # (qp, toolset) program set; the BD table is a coding-efficiency
    # measurement, identical on any backend (decisions are
    # backend-bit-identical via the XLA kernel mirrors)
    jax.config.update("jax_platforms", "cpu")
    import tests.conftest  # noqa: F401  (machine-keyed CPU compile cache)

    from bench import realistic_sequence
    from vvc_mm_tpu.apps.bd_rate import bd_psnr, bd_rate
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID
    from vvc_mm_tpu.encoder.enclib import EncCfg

    w, h, n = 128, 64, 4
    frames = realistic_sequence(w, h, n, seed=23)
    mm = MMConfig(mpa=True, rot=True,
                  projection=ProjectionID.EQUIRECTANGULAR)

    base = dict(width=w, height=h, gop="RA", gop_size=4, search_range=24,
                wrap_around=True)
    rows = [
        # (label, anchor cfg kwargs, test cfg kwargs); rows sharing an
        # anchor reuse its ladder (cache below)
        ("merge/skip", dict(merge=False), dict(merge=True)),
        ("TMVP+HMVP", dict(), dict(tmvp=True)),
        ("MM (MPA+ROT)", dict(), dict(mm=mm)),
        ("MM quadtree (P)", dict(mm=mm), dict(mm=mm, qt_depth=1)),
        ("MTS (intra)", dict(), dict(mts=True)),
        ("LFNST", dict(), dict(lfnst=True)),
        ("RDOQ-lite", dict(), dict(rdoq=True)),
        ("dep. quant", dict(), dict(dep_quant=True)),
        ("SAO", dict(sao=False), dict(sao=True)),
        ("ALF", dict(alf=False), dict(alf=True)),
        ("CTC QP cascade", dict(ctc_qp_offsets=False), dict()),
        ("CTC-like preset", dict(),
         dict(tmvp=True, rdoq=True, dep_quant=True, mts=True,
              lfnst=True, mm=mm, qt_depth=1)),
    ]

    lines = [
        "# BD_r05 — per-tool BD-rate (round 5)",
        "",
        f"Content: deterministic realistic clip (bench.realistic_sequence"
        f", seed 23), ERP {w}x{h}, {n} frames, RA GOP4, QP ladder "
        f"{list(QPS)}.  BD-rate of tool-ON vs tool-OFF on otherwise "
        "identical configs (own-anchor methodology, apps/bd_rate.py; "
        "negative = bits saved at equal PSNR).",
        "",
        "| tool | BD-rate (%) | BD-PSNR (dB) |",
        "|---|---|---|",
    ]
    cache: dict = {}

    def ladder_cached(kw):
        key = repr(sorted(kw.items(), key=lambda x: x[0]))
        if key not in cache:
            cache[key] = run_ladder(EncCfg(**{**base, **kw}), frames)
        return cache[key]

    for label, akw, tkw in rows:
        t0 = time.time()
        ra, pa = ladder_cached(akw)
        rt, pt = ladder_cached(tkw)
        br = bd_rate(ra, pa, rt, pt)
        bp = bd_psnr(ra, pa, rt, pt)
        lines.append(f"| {label} | {br:+.2f} | {bp:+.3f} |")
        print(f"{label}: BD-rate {br:+.2f}%  BD-PSNR {bp:+.3f} dB "
              f"({time.time() - t0:.0f}s)", flush=True)
    lines.append("")
    out = "\n".join(lines) + "\n"
    with open("BD_r05.md", "w") as f:
        f.write(out)
    print("wrote BD_r05.md")


if __name__ == "__main__":
    main()
