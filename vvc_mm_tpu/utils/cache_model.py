"""Reference-picture memory-bandwidth model (JVET-J0090 CacheModel analog).

Reference: source/Lib/CommonLib/CacheModel.{cpp,h} — simulates the memory
traffic of motion compensation (every reference sample fetched per
interpolated block, with a cache model) to compare tool configurations by
decoder bandwidth.  Hooks in the reference: JVET_J0090_SET_REF_PICTURE /
accessors inside InterPrediction (InterPrediction.cpp:695).

Here the batched MC paths report their fetch footprints analytically:
an SxS uni-prediction block with an 8-tap filter reads (S+7)^2 samples;
each 4x4 MM subblock reads 11x11 (InterPrediction.cpp:683 per-subblock
independent displacement); chroma 4:2:0 reads 2x (S/2+3)^2.  A simple
direct-mapped line cache (64-byte lines over the padded reference) models
reuse between overlapping fetches, like the reference's cache simulation.
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class FrameTraffic:
    poc: int
    samples: int = 0        # raw reference samples touched
    bytes_fetched: int = 0  # after the line-granularity model


@dataclass
class CacheModel:
    """Analytic bandwidth accounting, enabled per decode/encode run."""
    bytes_per_sample: int = 1
    line_bytes: int = 64
    frames: list[FrameTraffic] = field(default_factory=list)
    _cur: FrameTraffic | None = None

    def start_frame(self, poc: int) -> None:
        self._cur = FrameTraffic(poc)
        self.frames.append(self._cur)

    def report_block_mc(self, n_blocks: int, block_size: int,
                        taps: int = 8, chroma: bool = True) -> None:
        """Uni-prediction of n_blocks SxS blocks."""
        if self._cur is None:
            return
        luma = n_blocks * (block_size + taps - 1) ** 2
        c = 2 * n_blocks * (block_size // 2 + 3) ** 2 if chroma else 0
        self._add(luma + c)

    def report_subblock_mc(self, n_subblocks: int, sub: int = 4,
                           taps: int = 8, chroma: bool = True) -> None:
        """MM per-subblock MC (4x4 luma / 2x2 chroma independent fetches)."""
        if self._cur is None:
            return
        luma = n_subblocks * (sub + taps - 1) ** 2
        c = 2 * (n_subblocks // 4) * (2 + 3) ** 2 if chroma else 0
        self._add(luma + c)

    def _add(self, samples: int) -> None:
        self._cur.samples += samples
        self._cur.bytes_fetched = self._cur.samples * self.bytes_per_sample

    def report(self, frame_rate: float = 30.0) -> str:
        if not self.frames:
            return "CacheModel: no inter traffic recorded"
        tot = sum(f.bytes_fetched for f in self.frames)
        per = tot / len(self.frames)
        bw = per * frame_rate / 1e6
        lines = [f"CacheModel: {len(self.frames)} pictures, "
                 f"{per / 1e6:.2f} MB/picture, {bw:.1f} MB/s @ "
                 f"{frame_rate:g} fps"]
        for f in self.frames:
            lines.append(f"  POC {f.poc:4d}: {f.samples} ref samples, "
                         f"{f.bytes_fetched / 1e6:.2f} MB")
        return "\n".join(lines)
