"""Per-stage encoder timers (INTERPRED_PROFILING analog).

Reference: the MM extension's profiling build measures reprojection /
fractional-MV / interpolation / BDOF-pad time inside InterPrediction
(reference: source/Lib/CommonLib/InterPrediction.h:194-215,
TypeDef.h:140 INTERPRED_PROFILING).  The TPU analog times the frame
pipeline's STAGES (device programs are fused, so per-op timers would
measure dispatch, not work): search, positions, finish, filters,
entropy, transfers.

Off by default (zero overhead beyond a dict lookup); enable with
VVC_PROFILE=1 or --Profile on the encoder app.  Timing a stage with
`sync=` forces completion of its device outputs first — profiling
serializes the pipeline (like the reference's timers serialize around
the measured calls), so fps WITH profiling is not the production fps.
"""
from __future__ import annotations

import os
import time
from collections import defaultdict

ENABLED = os.environ.get("VVC_PROFILE", "") not in ("", "0")

_acc: dict[str, float] = defaultdict(float)
_cnt: dict[str, int] = defaultdict(int)


def enable() -> None:
    global ENABLED
    ENABLED = True


class stage:
    """Context manager: `with profiling.stage("mm_search", sync=out):`.
    `sync` (any pytree of device arrays) is block_until_ready'd on exit
    so the stage's device work is charged to the stage."""

    def __init__(self, name: str, sync=None) -> None:
        self.name = name
        self.sync = sync
        self._t0 = 0.0

    def __enter__(self):
        if ENABLED:
            self._t0 = time.perf_counter()
        return self

    def set_sync(self, sync) -> None:
        self.sync = sync

    def __exit__(self, *exc):
        if not ENABLED:
            return False
        if self.sync is not None:
            import jax
            jax.block_until_ready(self.sync)
        _acc[self.name] += time.perf_counter() - self._t0
        _cnt[self.name] += 1
        return False


def report() -> str:
    if not _acc:
        return "profiling: no stages recorded (set VVC_PROFILE=1)"
    total = sum(_acc.values())
    lines = [f"{'stage':<18}{'total s':>10}{'calls':>8}{'ms/call':>10}"
             f"{'share':>8}"]
    for k in sorted(_acc, key=lambda k: -_acc[k]):
        lines.append(f"{k:<18}{_acc[k]:>10.2f}{_cnt[k]:>8d}"
                     f"{1000.0 * _acc[k] / max(_cnt[k], 1):>10.1f}"
                     f"{100.0 * _acc[k] / total:>7.1f}%")
    lines.append(f"{'TOTAL':<18}{total:>10.2f}")
    return "\n".join(lines)


def reset() -> None:
    _acc.clear()
    _cnt.clear()
