"""Top-level encoder library.

TPU-native analog of the reference EncLib/EncGOP (reference:
source/Lib/EncoderLib/EncLib.cpp — init:147, encodePrep:521, encode:734;
EncGOP.cpp:2253 compressGOP).  Round-1 scope: all-intra sequences
(BASELINE.json config 1); inter/GOP lands next (encoder/inter pipeline).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..common import alf, deblock, inter_frame, sao, wavefront
from ..common import quant
from ..common.bitstream import (BitWriter, NalUnit, write_annexb, NAL_SPS,
                                NAL_PPS, NAL_IDR, NAL_SEI, NAL_TRAIL)
from ..common.mm import epipole as epipole_mod
from ..common.mm import frame_codec as mm_codec
from ..common.mm.mvp_convert import MMVPConverter
from ..common.mm.reprojection import MVReprojection
from ..common.picture import psnr
from ..common.slice_ps import MMConfig, PPS, SPS, SliceHeader
from ..common.typedefs import MotionModelID, SliceType
from ..lib360.projection import make_projection
from ..utils import profiling, xfer
from .intra_coder import (encode_intra_slice,
                          encode_intra_slice_wpp)
from .inter_coder import (encode_b_slice, encode_p_slice, encode_p_slice_mm,
                          encode_p_slice_qt)


@dataclass
class EncCfg:
    """Encoder configuration (reference: EncCfg.h 'setter soup' — here a
    plain dataclass; CLI binding in apps/encoder_app.py)."""
    width: int = 0
    height: int = 0
    bit_depth: int = 8
    qp: int = 32
    intra_block_size: int = 8
    inter_block_size: int = 16
    frames: int = 0
    wrap_around: bool = False
    gop: str = "AI"              # "AI" | "LDP" | "RA" (hierarchical B)
    intra_period: int = 32       # IDR refresh interval (LDP / RA)
    gop_size: int = 8            # RA mini-GOP (reference:
                                 # cfg/encoder_randomaccess_vtm.cfg GOP table)
    ctc_qp_offsets: bool = True  # CTC-style per-temporal-layer QP
                                 # offsets for RA at fixed QP: I -3,
                                 # anchors +1, B layers +1/+4/+5/+6
                                 # (reference:
                                 # cfg/encoder_randomaccess_vtm_gop16.cfg
                                 # QPoffset column, IntraQPOffset)
    search_range: int = 24
    max_num_ref: int = 2         # active references per list (plain-grid
                                 # P path; reference: per-ref ME loop
                                 # InterSearch.cpp:4937, RPL selection
                                 # EncLib.cpp:2213).  2 = ref_idx syntax
                                 # on, 1 = single-ref like round 3
    qt_depth: int = 0            # inter quadtree depth (0 = fixed grid;
                                 # QTMT analog — common/qtree.py)
    mtt: bool = False            # BT/TT splits on top of the quadtree
                                 # lattice (common/mtt.py; needs
                                 # qt_depth > 0)
    affine: bool = False         # per-block 4-param affine motion
                                 # (common/affine.py; CLASSIC fixed grid)
    # multi-model motion tools (reference: EncAppCfg.cpp:1013-1020
    # --MPA/--3DT/--TAN/--ROT/--GED/--GEDA/--MMMVP/--Epipole)
    mm: MMConfig = field(default_factory=MMConfig)
    epipoles: list[tuple[int, int, float, float, float]] = field(
        default_factory=list)    # (curPOC, refPOC, x, y, z)
    metrics_360: bool = False    # per-POC WS-PSNR/S-PSNR/CPP-PSNR
                                 # (reference: TExt360EncGop)
    picture_hash_sei: bool = True  # decoded-picture-hash SEI (the
                                   # conformance oracle, EncGOP.cpp:4124)
    deblocking: bool = True      # in-loop deblocking filter
    target_bitrate_kbps: int = 0  # 0 = fixed QP; else lambda-domain RC
    frame_rate: float = 30.0
    sao: bool = True             # sample adaptive offset (luma)
    alf: bool = True             # adaptive loop filter (luma)
    mctf: bool = False           # GOP-based temporal pre-filter (reference:
                                 # EncTemporalFilter, EncApp.cpp:1547-1551)
    lmcs: bool = False           # luma mapping / reshaper (reference:
                                 # Reshape.{cpp,h}, EncReshape)
    bdof: bool = False           # bi-directional optical flow refinement
                                 # of bi-predicted blocks (common/bdof.py)
    dmvr: bool = False           # decoder-side MV refinement by bilateral
                                 # matching (common/dmvr.py)
    gpm: bool = False            # geometric partitioning merge blend
                                 # (common/gpm.py; reference: --Geo)
    ciip: bool = False           # combined inter/intra prediction
                                 # (common/gpm.py; reference: --CIIP)
    ibc: bool = False            # intra block copy (wavefront BV search;
                                 # reference: --IBC, IbcHashMap)
    rdoq: bool = False           # RDOQ-lite: rate-aware per-coefficient
                                 # level decision, encoder-only
                                 # (quant.quantize_rdoq; reference:
                                 # QuantRDOQ.cpp; --RDOQ)
    dep_quant: bool = False      # dependent quantization trellis
                                 # (common/depquant.py; reference:
                                 # DepQuant.cpp, --DepQuant)
    cclm: bool = False           # chroma-from-luma linear model
                                 # (common/cclm.py; reference: --CCLM)
    mip: bool = False            # matrix intra prediction
                                 # (common/mip.py; reference: --MIP)
    lfnst: bool = False          # low-frequency non-separable secondary
                                 # transform (common/lfnst.py; --LFNST)
    tmvp: bool = False           # TMVP + HMVP AMVP candidates (--TMVP)
    merge: bool = True           # merge/skip candidate machinery on the
                                 # dense-grid inter paths: 6-candidate list
                                 # (spatial/TMVP/HMVP/pairwise/zero),
                                 # merge_flag + merge_idx, encoder snapping
                                 # (reference: UnitTools.cpp:1059
                                 # getInterMergeCandidates; --Merge)
    log2_parallel_merge_level: int = 2  # merge-estimation region size:
                                 # spatial candidates inside the current
                                 # block's region are excluded so a region
                                 # derives lists in parallel (reference:
                                 # sps_log2_parallel_merge_level)
    mts: bool = False            # explicit MTS for intra luma: per-block
                                 # DCT2/DST7/DCT8 pair RD choice + mts_idx
                                 # syntax (reference: TrQuant getTrTypes,
                                 # --MTS)
    amvr: bool = False           # adaptive MV resolution (quarter/full/
                                 # 4-pel per block; reference: IMV loop
                                 # EncCu.cpp:775, --IMV)
    mrl: bool = False            # multi-reference-line intra (--MRL)
    intra_split: bool = False    # two-level intra partitioning: 16x16
                                 # superblocks split into 8x8 quads by RD
                                 # (common/intra_part.py; reference: one
                                 # level of QTMT intra, EncCu.cpp:499).
                                 # Base toolset only (no CCLM/MIP/... —
                                 # those ride the fixed-grid path)
    wpp: bool = False            # entropy substreams + entry points (--WPP)
    num_substreams: int = 4
    weighted_bipred: bool = False  # explicit weighted prediction on B
                                 # slices: per-list weight tables, the
                                 # weighted bi combine (reference:
                                 # xWeightedPredictionBi; --WeightedPredB).
                                 # Composes with BDOF/DMVR/GPM/CIIP per
                                 # SLICE with reference precedence:
                                 # weights win where present, the tools
                                 # stay on elsewhere (BDOF biocheck0,
                                 # InterPrediction.cpp:566)
    weighted_pred: bool = False  # explicit weighted prediction P slices
                                 # (reference: WeightPrediction.cpp,
                                 # WeightPredAnalysis; --WeightedPredP)
    transform_skip: bool = False  # per-block transform skip RD choice
                                  # (reference: transform_skip_flag;
                                  # --TransformSkip)
    bdpcm: bool = False          # BDPCM on TS blocks (--BDPCM)
    film_grain: bool = False     # film grain characteristics SEI +
                                 # analyzer (reference:
                                 # SEIFilmGrainAnalyzer/Synthesizer)
    lossless: bool = False       # all-TS qStep-1 lossless intra coding
                                 # (--Lossless; forces QP 4, filters off)
    scaling_list: tuple = ()     # 64-entry 8x8 quant scaling matrix
                                 # (--ScalingList; classic P path +
                                 # decoder; empty = flat)
    mcts_tiles: tuple = ()       # (cols, rows): motion-constrained tile
                                 # sets — ME clamped so every prediction
                                 # stays inside its block's tile, MCTS SEI
                                 # emitted (reference: MCTS.{cpp,h},
                                 # SEI temporal MCTS; --MCTSTiles)

    def make_sps(self) -> SPS:
        from ..common.slice_ps import HRDParams
        hrd = (HRDParams(bit_rate_kbps=self.target_bitrate_kbps,
                         cpb_size_kbits=2 * self.target_bitrate_kbps,
                         time_scale=int(self.frame_rate * 1000),
                         num_units_in_tick=1000)
               if self.target_bitrate_kbps > 0 else None)
        return SPS(width=self.width, height=self.height, hrd=hrd,
                   max_num_ref=self.max_num_ref,
                   log2_parallel_merge_level=self.log2_parallel_merge_level,
                   scaling_list=tuple(int(v) for v in self.scaling_list),
                   bit_depth=self.bit_depth,
                   intra_block_size=self.intra_block_size,
                   inter_block_size=self.inter_block_size,
                   wrap_around=self.wrap_around, deblocking=self.deblocking,
                   sao=self.sao, alf=self.alf, mm=self.mm,
                   inter_qt_depth=self.qt_depth, mtt=self.mtt,
                   affine=self.affine,
                   bdof=self.bdof, dmvr=self.dmvr, gpm=self.gpm,
                   ciip=self.ciip, ibc=self.ibc,
                   dep_quant=self.dep_quant, cclm=self.cclm, mip=self.mip,
                   lfnst=self.lfnst, tmvp=self.tmvp, merge=self.merge,
                   mrl=self.mrl,
                   mts=self.mts, amvr=self.amvr,
                   wpp=self.wpp, intra_split=self.intra_split,
                   num_substreams=self.num_substreams,
                   ts=self.transform_skip or self.lossless,
                   bdpcm=self.bdpcm, lossless=self.lossless)


@dataclass
class FrameResult:
    poc: int
    bits: int
    psnr_y: float
    psnr_u: float
    psnr_v: float
    recon: list[np.ndarray]           # internal domain (mapped under LMCS)
    seconds: float = 0.0
    metrics_360: dict | None = None   # WS-PSNR/S-PSNR-NN/CPP-PSNR (luma)
    recon_out: list[np.ndarray] | None = None  # display domain (LMCS
                                               # inverse-mapped); None ->
                                               # same as recon

    @property
    def output(self) -> list[np.ndarray]:
        return self.recon_out if self.recon_out is not None else self.recon


class EncLib:
    """reference: EncLib (EncLib.cpp:147 init / :734 encode)."""

    def __init__(self, cfg: EncCfg) -> None:
        if cfg.lossless:
            # lossless operating point: qStep 1 (QP 4 after the TS clamp),
            # in-loop filters off so recon == source exactly (reference:
            # the lossless cfg disables deblock/SAO/ALF/LMCS/DQ)
            cfg.qp = 4
            cfg.deblocking = cfg.sao = cfg.alf = cfg.lmcs = False
            cfg.dep_quant = False
            cfg.lfnst = False
            cfg.mts = False
        self.cfg = cfg
        self.sps = cfg.make_sps()
        self.pps = PPS(base_qp=cfg.qp)
        self.results: list[FrameResult] = []
        # POC -> decoded MV field of P frames (TMVP co-located source;
        # reference: the DPB's 4x4 motion buffer, CodingStructure.h:273)
        self._mv_fields: dict[int, np.ndarray] = {}
        # POC -> device-resident reconstruction (y, u, v) jnp arrays: the
        # DPB stays on the TPU so reference planes never re-cross the
        # host<->device tunnel (utils/xfer.py rationale)
        self._dpb_dev: dict[int, tuple] = {}
        self.reproj: MVReprojection | None = None
        # previous frame's per-model MV stack (device): temporal seed for
        # the model search diamonds (encoder-side state, non-normative)
        self._mm_seed = None
        self._mm_seed_qt = None
        self.epipole_list = epipole_mod.EpipoleList(cfg.mm.global_epipole)
        # decoder-mirror list: only epipoles already signaled in PHs — the
        # predictor must be derivable on the decoder side (reference:
        # EpipoleList availability gating, EpipoleList.cpp makeAvailable)
        self.coded_epipoles = epipole_mod.EpipoleList(cfg.mm.global_epipole)
        if cfg.mm.any_enabled():
            # reference: EncLib.cpp:335-357 projection + MVReprojection init
            proj = make_projection(int(cfg.mm.projection), cfg.width,
                                   cfg.height)
            self.reproj = MVReprojection(proj, cfg.width, cfg.height,
                                         cfg.mm.mm_offset_4x4,
                                         int(cfg.mm.ged_flavor))
            for (c, r, x, y, z) in cfg.epipoles:
                self.epipole_list.set_epipole(c, r, (x, y, z))
            self.mvp_conv = (MMVPConverter(cfg.width, cfg.height,
                                           int(cfg.mm.ged_flavor))
                             if cfg.mm.mmmvp else None)
        else:
            self.mvp_conv = None

    def _hash_sei(self, poc: int, recon: list[np.ndarray],
                  tid: int = 0) -> NalUnit:
        """Decoded-picture-hash SEI (reference: EncGOP.cpp:4124-4127,
        SEIEncoder::initDecodedPictureHashSEI — MD5 of the final
        reconstruction, verified by the decoder)."""
        import hashlib
        m = hashlib.md5()
        for p in recon:
            if self.cfg.bit_depth > 8:
                m.update(p.astype("<u2").tobytes())
            else:
                m.update(p.astype(np.uint8).tobytes())
        bw = BitWriter()
        bw.write(0, 8)                    # payload type 0: MD5
        bw.write_uvlc(poc)
        for b in m.digest():
            bw.write(b, 8)
        bw.align()
        # the SEI rides its picture's temporal id so temporal extraction
        # (apps/bitstream_extractor.py) drops them together
        return NalUnit(NAL_SEI, tid, bw.get_bytes())

    def _film_grain_sei(self, planes, recon) -> NalUnit | None:
        """Analyze source-vs-recon grain and emit an fgc SEI (reference:
        SEIFilmGrainAnalyzer -> SEI payload type 19)."""
        from ..common import film_grain as fg
        params = fg.analyze(np.asarray(planes[0]), np.asarray(recon[0]),
                            self.cfg.bit_depth)
        if params is None:
            return None
        self.film_grain_params = params
        bw = BitWriter()
        bw.write(fg.SEI_FILM_GRAIN, 8)
        params.write(bw)
        bw.align()
        return NalUnit(NAL_SEI, 0, bw.get_bytes())

    def encode_headers(self) -> list[NalUnit]:
        bw = BitWriter()
        self.sps.write(bw)
        sps_nal = NalUnit(NAL_SPS, 0, bw.get_bytes())
        bw = BitWriter()
        self.pps.write(bw)
        pps_nal = NalUnit(NAL_PPS, 0, bw.get_bytes())
        out = [sps_nal, pps_nal]
        if self.cfg.mcts_tiles:
            out.append(self._mcts_sei())
        return out

    SEI_MCTS = 134    # temporal motion-constrained tile sets (reference:
                      # SEI::TEMPORAL_MOTION_CONSTRAINED_TILE_SETS)

    def _mcts_sei(self) -> NalUnit:
        """Signal the tile grid whose sets are motion-constrained, so an
        extractor can pull any tile independently (reference: MCTS.{cpp,h}
        + the temporal MCTS SEI; the ME-side constraint lives in
        common/inter_frame.py mcts_clamp_mvs)."""
        cols, rows = self.cfg.mcts_tiles
        bw = BitWriter()
        bw.write(self.SEI_MCTS, 8)
        bw.write_uvlc(cols)
        bw.write_uvlc(rows)
        bw.align()
        return NalUnit(NAL_SEI, 0, bw.get_bytes())

    def encode_intra_frame(self, poc: int, planes: list[np.ndarray],
                           qp: int | None = None
                           ) -> tuple[NalUnit, FrameResult]:
        cfg = self.cfg
        qp = self.cfg.qp if qp is None else qp
        t0 = time.time()
        s = cfg.intra_block_size
        self._mm_seed = None        # closed GOP: no temporal seed across IDR
        self._mm_seed_qt = None
        dev = xfer.upload_planes(planes, cfg.bit_depth)
        if cfg.intra_split:
            return self._encode_intra_frame_part(poc, planes, dev, qp, t0)
        outs, recon = wavefront.encode_intra_frame(
            dev[0], dev[1], dev[2], qp, s, cfg.bit_depth,
            dep_quant=cfg.dep_quant, use_cclm=cfg.cclm,
            use_mip=cfg.mip, use_lfnst=cfg.lfnst, use_mrl=cfg.mrl,
            use_ts=cfg.transform_skip and not cfg.lossless,
            use_bdpcm=cfg.bdpcm, lossless=cfg.lossless, use_ibc=cfg.ibc,
            use_mts=cfg.mts, use_rdoq=cfg.rdoq)
        # ONE packed int16 D2H hop for all mode/level outputs (levels fit
        # int16, modes uint8) — tunnel round trips are the scarce resource
        (modes_steps, lm_steps, lf_steps, mrl_steps, ts_steps, mts_steps,
         ly, lu, lv) = xfer.pull_levels(*outs)
        nby, nbx = cfg.height // s, cfg.width // s
        coords, valid = wavefront.wavefront_coords(nby, nbx)
        modes = wavefront.steps_to_grid(modes_steps, coords, valid)
        lm = wavefront.steps_to_grid(lm_steps, coords, valid)
        lf = wavefront.steps_to_grid(lf_steps, coords, valid)
        mrl = wavefront.steps_to_grid(mrl_steps, coords, valid)
        tsg = wavefront.steps_to_grid(ts_steps, coords, valid)
        mtsg = wavefront.steps_to_grid(mts_steps, coords, valid)
        ly = wavefront.steps_to_grid(ly, coords, valid)
        lu = wavefront.steps_to_grid(lu, coords, valid)
        lv = wavefront.steps_to_grid(lv, coords, valid)

        use_ts_syntax = cfg.transform_skip and not cfg.lossless
        slice_args = dict(cclm=lm if cfg.cclm else None, mip=cfg.mip,
                          lfnst=lf if cfg.lfnst else None,
                          mrl=mrl if cfg.mrl else None,
                          ts=tsg if use_ts_syntax else None,
                          bdpcm=cfg.bdpcm, ibc=cfg.ibc,
                          mts=mtsg if cfg.mts else None)
        if cfg.wpp:
            payload = encode_intra_slice_wpp(
                modes, ly, lu, lv, num_substreams=cfg.num_substreams,
                **slice_args)
        else:
            payload = encode_intra_slice(modes, ly, lu, lv, **slice_args)
        if cfg.deblocking:
            bs_v, bs_h = deblock.boundary_strengths_intra(nby, nbx)
            ry, ru, rv = deblock.deblock_frame(
                recon["y"], recon["u"], recon["v"], bs_v, bs_h, s, qp,
                cfg.bit_depth)
            recon = dict(y=ry, u=ru, v=rv)
        recon, sao_params = self._sao_stage(recon, dev, qp)
        recon, alf_params = self._alf_stage(recon, dev[0], qp,
                                            (dev[1], dev[2]))
        sh = SliceHeader(poc=poc, slice_type=SliceType.I, qp=qp,
                         sao_params=sao_params, alf_params=alf_params,
                         alf_chroma_params=self._pending_alf_chroma,
                         ccalf_params=self._pending_ccalf)
        bw = BitWriter()
        sh.write(bw, self.sps)
        bw.write_bytes(payload)
        nal = NalUnit(NAL_IDR, 0, bw.get_bytes())
        self._dpb_dev[poc] = (recon["y"], recon["u"], recon["v"])
        rec, psnrs = xfer.finalize_recon(recon, dev, cfg.bit_depth)
        res = FrameResult(
            poc=poc, bits=len(nal.payload) * 8,
            psnr_y=psnrs[0], psnr_u=psnrs[1], psnr_v=psnrs[2],
            recon=rec, seconds=time.time() - t0)
        self._finish_frame(res, planes)
        self.results.append(res)
        return nal, res

    def _encode_intra_frame_part(self, poc, planes, dev, qp, t0):
        """Two-level (16 vs 8x8-quad) intra frame (common/intra_part.py)."""
        from ..common import intra_part
        from .intra_coder import encode_intra_slice_part
        cfg = self.cfg
        outs, recon = intra_part.encode_intra_frame_part(
            dev[0], dev[1], dev[2], qp, cfg.bit_depth)
        pulled = xfer.pull_levels(*outs)
        nsy = cfg.height // intra_part.SB
        nsx = cfg.width // intra_part.SB
        coords, valid = wavefront.wavefront_coords(nsy, nsx)
        grids = [wavefront.steps_to_grid(p, coords, valid) for p in pulled]
        payload = encode_intra_slice_part(*grids)
        if cfg.deblocking:
            # both sides deblock on the 8-grid (every possible transform
            # edge) — self-consistent, decoder mirrors identically
            nby, nbx = cfg.height // 8, cfg.width // 8
            bs_v, bs_h = deblock.boundary_strengths_intra(nby, nbx)
            ry, ru, rv = deblock.deblock_frame(
                recon["y"], recon["u"], recon["v"], bs_v, bs_h, 8, qp,
                cfg.bit_depth)
            recon = dict(y=ry, u=ru, v=rv)
        recon, sao_params = self._sao_stage(recon, dev, qp)
        recon, alf_params = self._alf_stage(recon, dev[0], qp,
                                            (dev[1], dev[2]))
        sh = SliceHeader(poc=poc, slice_type=SliceType.I, qp=qp,
                         sao_params=sao_params, alf_params=alf_params,
                         alf_chroma_params=self._pending_alf_chroma,
                         ccalf_params=self._pending_ccalf)
        bw = BitWriter()
        sh.write(bw, self.sps)
        bw.write_bytes(payload)
        nal = NalUnit(NAL_IDR, 0, bw.get_bytes())
        self._dpb_dev[poc] = (recon["y"], recon["u"], recon["v"])
        rec, psnrs = xfer.finalize_recon(recon, dev, cfg.bit_depth)
        res = FrameResult(
            poc=poc, bits=len(nal.payload) * 8,
            psnr_y=psnrs[0], psnr_u=psnrs[1], psnr_v=psnrs[2],
            recon=rec, seconds=time.time() - t0)
        self._finish_frame(res, planes)
        self.results.append(res)
        return nal, res

    def encode_p_frame(self, poc: int, planes: list[np.ndarray],
                       ref: list[np.ndarray], ref_poc: int,
                       qp: int | None = None,
                       ref2: list[np.ndarray] | None = None,
                       ref2_poc: int = -1
                       ) -> tuple[NalUnit, FrameResult]:
        """Low-delay P encode against one or two reference reconstructions
        (reference: EncGOP::compressGOP inter picture path; per-ref ME
        InterSearch.cpp:4937).  ref2 activates per-block ref_idx on the
        plain merge path."""
        cfg = self.cfg
        qp = self.cfg.qp if qp is None else qp
        t0 = time.time()
        s = cfg.inter_block_size
        dev = xfer.upload_planes(planes, cfg.bit_depth)
        rdev = self._dpb_dev.get(ref_poc)
        if rdev is None:
            rdev = xfer.upload_planes(ref, cfg.bit_depth)
        use_2ref = (ref2 is not None and cfg.max_num_ref >= 2
                    and cfg.merge and not cfg.mm.any_enabled()
                    and cfg.qt_depth == 0 and not cfg.affine
                    and not cfg.mcts_tiles and not cfg.wpp)
        if use_2ref:
            r2dev = self._dpb_dev.get(ref2_poc)
            if r2dev is None:
                r2dev = xfer.upload_planes(ref2, cfg.bit_depth)
        epipole_delta = None
        wp = None     # weighted prediction: plain-P path only
        if cfg.mm.any_enabled():
            active = cfg.mm.active_models()
            epipoles = None
            if cfg.mm.ged:
                ep = self.epipole_list.find_epipole(poc, ref_poc)
                pred = self.coded_epipoles.derive_predictor(poc, ref_poc)
                # PH epipole delta vs predictor (reference: EncGOP.cpp:3105)
                epipole_delta = tuple(
                    a - b for a, b in zip(epipole_mod.to_fixed(ep),
                                          epipole_mod.to_fixed(pred)))
                ep_used = epipole_mod.from_fixed(
                    tuple(a + b for a, b in
                          zip(epipole_mod.to_fixed(pred), epipole_delta)))
                self.coded_epipoles.set_epipole(poc, ref_poc, ep_used)
                epipoles = {MotionModelID.GEODESIC_CAMPOSE: ep_used}
            ep_for_mvp = (epipoles or {}).get(
                MotionModelID.GEODESIC_CAMPOSE)
            if cfg.qt_depth > 0:
                # MM x partitioning, merge-aware: the unit level runs the
                # flat-path search program (identical decisions), parents
                # are evaluated from their children, the tree resolves on
                # host, and leaves get the flat merge/skip syntax — so a
                # fully-split tree costs the flat grid plus split bins
                # (reference: EncCu.cpp:499 xCompressCU + the per-model
                # mode loop EncCu.cpp:775-798)
                from ..common import deblock as deblock_mod
                from ..common import qtree
                from ..common.mm import qt_codec
                from .inter_coder import (encode_p_slice_qt_mm,
                                          resolve_tree_qt_mm,
                                          select_qt_mm)
                nd = cfg.qt_depth
                with profiling.stage("mm_search") as ps:
                    per_dev, stack = qt_codec.search_qt_mm(
                        self.reproj, active, dev[0], rdev[0], qp, s, nd,
                        cfg.bit_depth, cfg.search_range, epipoles,
                        cfg.wrap_around, seed=self._mm_seed_qt)
                    ps.set_sync(per_dev[-1])
                self._mm_seed_qt = stack
                rd_dev = [qt_codec.qt_rd_stats(
                    self.reproj, active, t[0], t[1], dev[0], dev[1],
                    dev[2], rdev[0], rdev[1], rdev[2], qp, s >> i,
                    cfg.bit_depth, epipoles, cfg.wrap_around)
                    for i, t in enumerate(per_dev)]
                with profiling.stage("mm_select+pull"):
                    flat = [a for tup in per_dev for a in tup]
                    flat += [a for tup in rd_dev for a in tup]
                    pulled = xfer.pull_i32(*flat)
                    per_h = [tuple(pulled[6 * i:6 * i + 6])
                             for i in range(len(per_dev))]
                    off = 6 * len(per_dev)
                    rd_h = [tuple(pulled[off + 2 * i:off + 2 * i + 2])
                            for i in range(len(rd_dev))]
                    lam = quant.lambda_from_qp(qp, intra=False)
                    splits, leaf = resolve_tree_qt_mm(
                        per_h, rd_h, len(active), lam, nd)
                    midx_u, mv_u, decisions = select_qt_mm(
                        per_h, splits, leaf, active, lam ** 0.5, s, nd)
                with profiling.stage("mm_finish") as ps:
                    levels, recon, has_resid_u, leaf_id_u = \
                        qt_codec.enc_finish_qt_mm(
                            self.reproj, active, jnp.asarray(midx_u),
                            jnp.asarray(mv_u.astype(np.int32)),
                            [jnp.asarray(l) for l in leaf],
                            dev[0], dev[1], dev[2],
                            rdev[0], rdev[1], rdev[2], qp, s, nd,
                            cfg.bit_depth, epipoles, cfg.wrap_around)
                    ps.set_sync(recon["y"])
                arrs = [l for trio in levels for l in trio]
                lev_h = xfer.pull_levels(*arrs)
                lev_h = [tuple(lev_h[3 * i:3 * i + 3])
                         for i in range(nd + 1)]
                payload = encode_p_slice_qt_mm(splits, decisions, lev_h,
                                               s, nd, len(active))
                if cfg.deblocking:
                    bs_v, bs_h = qtree.qt_boundary_strengths(
                        jnp.asarray(mv_u.astype(np.int32)), has_resid_u,
                        leaf_id_u)
                    ry, ru, rv = deblock_mod.deblock_frame(
                        recon["y"], recon["u"], recon["v"], bs_v, bs_h,
                        s >> nd, qp, cfg.bit_depth)
                    recon = dict(y=ry, u=ru, v=rv)
                return self._finish_p_frame(poc, planes, recon, payload,
                                            ref_poc, qp, epipole_delta,
                                            t0, dev)
            if cfg.merge:
                # merge-aware fused search: candidate-field SADs ride the
                # single search program; host selection snaps blocks to
                # (model, mv) candidates, then positions/finish run from
                # the FINAL grids (model inheritance through merge,
                # reference: UnitTools.cpp:872-885)
                from .inter_coder import select_merge_mm
                with profiling.stage("mm_search") as ps:
                    out = mm_codec.search_p_mm_merge(
                        self.reproj, active, dev[0], rdev[0], qp, s,
                        cfg.bit_depth, cfg.search_range, epipoles,
                        cfg.wrap_around, seed=self._mm_seed)
                    ps.set_sync(out)
                with profiling.stage("mm_select+pull"):
                    (midx_h, stack_h, sad_h, cidx_h, cmv_h,
                     csad_h) = xfer.pull_i32(*out)
                lam_sqrt = quant.lambda_from_qp(qp, intra=False) ** 0.5
                mer_blk = max(0, self.sps.log2_parallel_merge_level
                              - (s.bit_length() - 1))
                f_midx, f_stack, mflag, midx_m = select_merge_mm(
                    midx_h, stack_h, sad_h, cidx_h, cmv_h, csad_h,
                    active, lam_sqrt, s, self.mvp_conv, ep_for_mvp,
                    mer_blk)
                model_idx = jnp.asarray(f_midx)
                mvs_stack = jnp.asarray(f_stack.astype(np.int32))
                self._mm_seed = mvs_stack
            else:
                # fused path: ONE search program, the shared positions
                # program, ONE residual/recon/deblock program; host entropy
                # overlaps the SAO/ALF device chain (frame_codec.py
                # fused-program rationale)
                model_idx, mvs_stack = mm_codec.search_p_mm(
                    self.reproj, active, dev[0], rdev[0], qp, s,
                    cfg.bit_depth, cfg.search_range, epipoles,
                    cfg.wrap_around, seed=self._mm_seed)
                self._mm_seed = mvs_stack
            with profiling.stage("mm_finish") as ps:
                # positions fused into the finish program (one dispatch)
                ly, lu, lv, recon = mm_codec.enc_finish_p_mm_fused(
                    self.reproj, active, model_idx, mvs_stack, dev, rdev,
                    qp, s, cfg.bit_depth, epipoles, cfg.wrap_around,
                    cfg.deblocking)
                ps.set_sync(recon["y"])

            def make_payload():
                if cfg.merge:
                    lyh, luh, lvh = xfer.pull_levels(ly, lu, lv)
                    return encode_p_slice_mm(
                        f_midx, active, f_stack.astype(np.int64),
                        lyh, luh, lvh, s, self.mvp_conv, ep_for_mvp,
                        merge_flag=mflag, merge_idx=midx_m)
                (lyh, luh, lvh, model_idx_h,
                 mvs_stack_h) = xfer.pull_levels(ly, lu, lv, model_idx,
                                                 mvs_stack)
                return encode_p_slice_mm(
                    model_idx_h, active, mvs_stack_h.astype(np.int64),
                    lyh, luh, lvh, s, self.mvp_conv, ep_for_mvp)

            return self._finish_slice_overlap(
                poc, planes, recon, make_payload, qp, t0, SliceType.P,
                [ref_poc], [], epipole_delta, 0, dev)
        elif cfg.qt_depth > 0 and cfg.mtt:
            # full multi-type-tree P encode (QT+BT+TT, common/mtt.py)
            from ..common import mtt as mtt_mod
            from ..common import qtree
            from .inter_coder import encode_p_slice_mtt
            out = mtt_mod.encode_p_frame_mtt(
                dev[0], dev[1], dev[2], rdev[0], rdev[1], rdev[2], qp, s,
                cfg.qt_depth, cfg.bit_depth, cfg.search_range,
                cfg.wrap_around)
            shapes = mtt_mod.rect_shapes(s, cfg.qt_depth)
            arrs = list(out["codes"]) + list(out["sq_mv"])
            for trio in out["sq_levels"]:
                arrs += list(trio)
            for info in shapes:
                key = (info[0], info[1])
                arrs.append(out["rect_mv"][key])
                arrs += list(out["rect_levels"][key])
            pulled = xfer.pull_levels(*arrs)
            nd = cfg.qt_depth
            codes_h = pulled[:nd]
            sq_mv_h = [m.astype(np.int64) for m in pulled[nd:2 * nd + 1]]
            off = 2 * nd + 1
            sq_lev_h = [tuple(pulled[off + 3 * i:off + 3 * i + 3])
                        for i in range(nd + 1)]
            off += 3 * (nd + 1)
            rect_mv_h, rect_lev_h = {}, {}
            for info in shapes:
                key = (info[0], info[1])
                rect_mv_h[key] = pulled[off].astype(np.int64)
                rect_lev_h[key] = tuple(pulled[off + 1:off + 4])
                off += 4
            payload = encode_p_slice_mtt(codes_h, sq_mv_h, sq_lev_h,
                                         rect_mv_h, rect_lev_h, s,
                                         cfg.qt_depth,
                                         use_merge=cfg.merge)
            recon = out["recon"]
            if cfg.deblocking:
                bs_v, bs_h = qtree.qt_boundary_strengths(
                    out["mv_unit"], out["has_resid_unit"],
                    out["leaf_id_unit"])
                ry, ru, rv = deblock.deblock_frame(
                    recon["y"], recon["u"], recon["v"], bs_v, bs_h,
                    s >> cfg.qt_depth, qp, cfg.bit_depth)
                recon = dict(y=ry, u=ru, v=rv)
            return self._finish_p_frame(poc, planes, recon, payload,
                                        ref_poc, qp, None, t0, dev)
        elif cfg.qt_depth > 0:
            # quadtree partitioned P encode (QTMT analog, common/qtree.py)
            from ..common import qtree
            qt = qtree.encode_p_frame_qt(
                dev[0], dev[1], dev[2], rdev[0], rdev[1], rdev[2], qp, s,
                cfg.qt_depth, cfg.bit_depth, cfg.search_range,
                cfg.wrap_around)
            flat_levels = [l for trio in qt["levels"] for l in trio]
            pulled = xfer.pull_levels(*qt["splits"], *qt["mvs"],
                                      *flat_levels)
            nsp, nmv = len(qt["splits"]), len(qt["mvs"])
            splits = pulled[:nsp]
            mvs_h = [m.astype(np.int64) for m in pulled[nsp:nsp + nmv]]
            lv_flat = pulled[nsp + nmv:]
            levels_h = [tuple(lv_flat[3 * i:3 * i + 3])
                        for i in range(len(qt["levels"]))]
            payload = encode_p_slice_qt(splits, mvs_h, levels_h, s,
                                        cfg.qt_depth,
                                        use_merge=cfg.merge)
            recon = qt["recon"]
            if cfg.deblocking:
                bs_v, bs_h = qtree.qt_boundary_strengths(
                    qt["mv_unit"], qt["has_resid_unit"],
                    qt["leaf_id_unit"])
                ry, ru, rv = deblock.deblock_frame(
                    recon["y"], recon["u"], recon["v"], bs_v, bs_h,
                    s >> cfg.qt_depth, qp, cfg.bit_depth)
                recon = dict(y=ry, u=ru, v=rv)
            return self._finish_p_frame(poc, planes, recon, payload,
                                        ref_poc, qp, None, t0, dev)
        elif cfg.affine:
            # per-block translational/affine decision (common/affine.py)
            from ..common import affine as affine_mod
            from .inter_coder import encode_p_slice_affine
            mvs, aff, dmv, ly, lu, lv, recon = \
                affine_mod.encode_p_frame_affine(
                    dev[0], dev[1], dev[2], rdev[0], rdev[1], rdev[2],
                    qp, s, cfg.bit_depth, cfg.search_range,
                    cfg.wrap_around)
            lyh, luh, lvh, mvs_h, aff_h, dmv_h = xfer.pull_levels(
                ly, lu, lv, mvs, aff, dmv)
            payload = encode_p_slice_affine(mvs_h, aff_h, dmv_h,
                                            lyh, luh, lvh)
        elif use_2ref:
            # two-reference merge pipeline: per-ref ME + ref_idx decision
            # on device, host merge selection with (ref, mv) candidates,
            # finish from the FINAL fields (reference: per-ref ME loop
            # InterSearch.cpp:4937 + ref_idx syntax)
            from .inter_coder import (encode_p_slice_2ref,
                                      select_merge_p_2ref)
            wp = (self._estimate_wp(planes, ref)
                  if cfg.weighted_pred else None)
            nby, nbx = cfg.height // s, cfg.width // s
            col = self._mv_fields.get(ref_poc) if cfg.tmvp else None
            col_dev = jnp.asarray(
                col.astype(np.int32) if col is not None
                else np.zeros((nby, nbx, 2), np.int32))
            out = inter_frame.search_p_frame_2ref(
                dev[0], rdev[0], r2dev[0], col_dev, qp, s, cfg.bit_depth,
                cfg.search_range, cfg.wrap_around, amvr=cfg.amvr)
            (ref_h, mvs_h, imv_h, sad_h, cref_h, cmv_h,
             csad_h) = xfer.pull_i32(*out)
            lam_sqrt = quant.lambda_from_qp(qp, intra=False) ** 0.5
            mer_blk = max(0, self.sps.log2_parallel_merge_level
                          - (s.bit_length() - 1))
            f_ref, f_mv, mflag, midx = select_merge_p_2ref(
                ref_h, mvs_h, sad_h, cref_h, cmv_h, csad_h, col,
                lam_sqrt, cfg.tmvp, mer_blk)
            mvs = jnp.asarray(f_mv.astype(np.int32))
            ly, lu, lv, recon = inter_frame.finish_p_frame_2ref(
                dev[0], dev[1], dev[2], tuple(rdev), tuple(r2dev),
                jnp.asarray(f_ref), mvs, qp, s, cfg.bit_depth,
                cfg.wrap_around,
                wp=None if wp is None else jnp.asarray(wp),
                scaling=tuple(cfg.scaling_list) or None)
            lyh, luh, lvh = xfer.pull_levels(ly, lu, lv)
            payload = encode_p_slice_2ref(
                f_ref, f_mv, lyh, luh, lvh, col_mvs=col,
                use_tmvp=cfg.tmvp, imv=imv_h if cfg.amvr else None,
                merge_flag=mflag, merge_idx=midx)
            self._mv_fields[poc] = f_mv.astype(np.int64)
        elif cfg.merge:
            # merge/skip pipeline: device search (ME + candidate-field
            # SADs) -> host merge selection in coding order -> device
            # finish from the FINAL MV field (inter_frame.search_p_frame /
            # finish_p_frame; reference: merge candidates
            # UnitTools.cpp:1059, EncCu xCheckRDCostMerge2Nx2N)
            from .inter_coder import select_merge_p
            wp = (self._estimate_wp(planes, ref)
                  if cfg.weighted_pred else None)
            nby, nbx = cfg.height // s, cfg.width // s
            col = self._mv_fields.get(ref_poc) if cfg.tmvp else None
            col_dev = jnp.asarray(
                col.astype(np.int32) if col is not None
                else np.zeros((nby, nbx, 2), np.int32))
            mvs_d, imv_d, sad_d, cmv_d, csad_d = inter_frame.search_p_frame(
                dev[0], rdev[0], col_dev, qp, s, cfg.bit_depth,
                cfg.search_range, cfg.wrap_around, amvr=cfg.amvr,
                mcts=tuple(cfg.mcts_tiles) or None)
            (mvs_h, imv_h, sad_h, cmv_h,
             csad_h) = xfer.pull_i32(mvs_d, imv_d, sad_d, cmv_d, csad_d)
            lam_sqrt = quant.lambda_from_qp(qp, intra=False) ** 0.5
            mer_blk = max(0, self.sps.log2_parallel_merge_level
                          - (s.bit_length() - 1))
            # MCTS clamps bind per-block MVs: a neighbor's MV can violate
            # this block's tile bound, so snapping is disabled there.
            # Under WPP the entropy pass resets HMVP per substream; the
            # selection must derive candidates with the same resets or
            # the decoder's list at the signaled merge_idx can differ.
            sub_starts: tuple[int, ...] = ()
            if cfg.wpp and cfg.tmvp:
                nsub = max(1, min(cfg.num_substreams, nby))
                sub_starts = tuple(round(i * nby / nsub)
                                   for i in range(1, nsub))
            final, mflag, midx = select_merge_p(
                mvs_h, sad_h, cmv_h, csad_h, col, lam_sqrt, cfg.tmvp,
                mer_blk, snap=not cfg.mcts_tiles,
                substream_starts=sub_starts)
            mvs = jnp.asarray(final.astype(np.int32))
            ly, lu, lv, recon = inter_frame.finish_p_frame(
                dev[0], dev[1], dev[2], rdev[0], rdev[1], rdev[2], mvs,
                qp, s, cfg.bit_depth, cfg.wrap_around,
                wp=None if wp is None else jnp.asarray(wp),
                scaling=tuple(cfg.scaling_list) or None)
            lyh, luh, lvh = xfer.pull_levels(ly, lu, lv)
            if cfg.wpp:
                from .inter_coder import encode_p_slice_wpp
                payload = encode_p_slice_wpp(
                    final, lyh, luh, lvh, col_mvs=col, use_tmvp=cfg.tmvp,
                    imv=imv_h if cfg.amvr else None, merge_flag=mflag,
                    merge_idx=midx, num_substreams=cfg.num_substreams)
            else:
                payload = encode_p_slice(final, lyh, luh, lvh,
                                         col_mvs=col, use_tmvp=cfg.tmvp,
                                         imv=imv_h if cfg.amvr else None,
                                         merge_flag=mflag, merge_idx=midx)
            self._mv_fields[poc] = final.astype(np.int64)
        else:
            wp = (self._estimate_wp(planes, ref)
                  if cfg.weighted_pred else None)
            out = inter_frame.encode_p_frame(
                dev[0], dev[1], dev[2], rdev[0], rdev[1], rdev[2], qp, s,
                cfg.bit_depth, cfg.search_range, cfg.wrap_around,
                wp=None if wp is None else jnp.asarray(wp),
                scaling=tuple(cfg.scaling_list) or None, amvr=cfg.amvr,
                mcts=tuple(cfg.mcts_tiles) or None)
            if cfg.amvr:
                mvs, imv, ly, lu, lv, recon = out
                lyh, luh, lvh, mvs_h, imv_h = xfer.pull_levels(
                    ly, lu, lv, mvs, imv)
            else:
                mvs, ly, lu, lv, recon = out
                imv_h = None
                lyh, luh, lvh, mvs_h = xfer.pull_levels(ly, lu, lv, mvs)
            col = self._mv_fields.get(ref_poc) if cfg.tmvp else None
            payload = encode_p_slice(mvs_h, lyh, luh, lvh,
                                     col_mvs=col, use_tmvp=cfg.tmvp,
                                     imv=imv_h)
            self._mv_fields[poc] = mvs_h.astype(np.int64)
        if cfg.deblocking:
            has_resid = (jnp.any(ly != 0, axis=(2, 3))
                         | jnp.any(lu != 0, axis=(2, 3))
                         | jnp.any(lv != 0, axis=(2, 3)))
            bs_v, bs_h = deblock.boundary_strengths_inter(
                jnp.asarray(mvs, dtype=jnp.int32), has_resid)
            ry, ru, rv = deblock.deblock_frame(
                recon["y"], recon["u"], recon["v"], bs_v, bs_h, s, qp,
                cfg.bit_depth)
            recon = dict(y=ry, u=ru, v=rv)
        recon, sao_params = self._sao_stage(recon, dev, qp)
        recon, alf_params = self._alf_stage(recon, dev[0], qp,
                                            (dev[1], dev[2]))
        sh = SliceHeader(poc=poc, slice_type=SliceType.P, qp=qp,
                         ref_pocs_l0=([ref_poc, ref2_poc] if use_2ref
                                      else [ref_poc]),
                         epipole_delta=epipole_delta,
                         sao_params=sao_params, alf_params=alf_params,
                         alf_chroma_params=self._pending_alf_chroma,
                         ccalf_params=self._pending_ccalf,
                         wp_params=(None if not cfg.weighted_pred or
                                    wp is None else
                                    tuple((int(a), int(b)) for a, b in wp)))
        bw = BitWriter()
        sh.write(bw, self.sps)
        bw.write_bytes(payload)
        nal = NalUnit(NAL_TRAIL, 0, bw.get_bytes())
        self._dpb_dev[poc] = (recon["y"], recon["u"], recon["v"])
        rec, psnrs = xfer.finalize_recon(recon, dev, cfg.bit_depth)
        res = FrameResult(
            poc=poc, bits=len(nal.payload) * 8,
            psnr_y=psnrs[0], psnr_u=psnrs[1], psnr_v=psnrs[2],
            recon=rec, seconds=time.time() - t0)
        self._finish_frame(res, planes)
        self.results.append(res)
        return nal, res

    def _estimate_wp(self, planes, ref):
        """DC/AC weight estimation (reference: WeightPredAnalysis): match
        each plane's mean/std to the reference; identity -> None."""
        out = []
        for o, r in zip(planes, ref):
            so, sr = float(np.std(o)), float(np.std(r))
            w = int(np.clip(round(64.0 * so / sr), 1, 255)) if sr > 1e-3 \
                else 64
            off = int(np.clip(round(float(np.mean(o))
                                    - w * float(np.mean(r)) / 64.0),
                              -128, 127))
            out.append((w, off))
        # signal only on a clear luma-level change (fades); chroma stats on
        # ordinary content are too noisy to pay the table for
        wy, oy = out[0]
        return out if (abs(wy - 64) > 2 or abs(oy) > 2) else None

    def _finish_p_frame(self, poc, planes, recon, payload, ref_poc, qp,
                        epipole_delta, t0, dev=None):
        return self._finish_slice(poc, planes, recon, payload, qp, t0,
                                  SliceType.P, [ref_poc], [],
                                  epipole_delta, 0, dev)

    def _finish_slice_overlap(self, poc, planes, recon, make_payload, qp,
                              t0, slice_type, ref_pocs_l0, ref_pocs_l1,
                              epipole_delta, tid, dev):
        """Inter-frame tail with entropy/filter overlap: dispatch the
        SAO + ALF-stats device stages first (no sync), run the host entropy
        pass (make_payload pulls the coded grids and writes CABAC) while
        the device chain executes, then finish the filters.  The filter
        chain never reads the entropy-coded grids, so the two are
        independent (reference analog: EncGOP's separate compressSlice /
        encodeSlice passes)."""
        cfg = self.cfg
        from . import filter_stage
        lam = quant.lambda_from_qp(qp, intra=False)
        sao_h = (filter_stage.sao_dispatch(recon, dev, lam, cfg.bit_depth)
                 if cfg.sao else None)
        post_sao = (dict(y=sao_h[0], u=sao_h[1], v=sao_h[2]) if cfg.sao
                    else recon)
        alf_h = (filter_stage.alf_stats_dispatch(post_sao, dev,
                                                 cfg.bit_depth)
                 if cfg.alf else None)
        with profiling.stage("entropy"):
            payload = make_payload()    # host entropy overlaps device filters
        self._pending_alf_chroma = None
        self._pending_ccalf = None
        sao_params = None
        if cfg.sao:
            recon, sao_params = filter_stage.sao_finish(recon, sao_h)
            recon = post_sao   # same values; keep the device chain's view
        alf_params = None
        if cfg.alf:
            recon, alf_params, self._pending_alf_chroma, \
                self._pending_ccalf = filter_stage.run_alf(
                    post_sao, dev, lam, cfg.bit_depth, stats_handles=alf_h)
        sh = SliceHeader(poc=poc, slice_type=slice_type, qp=qp,
                         temporal_id=tid, ref_pocs_l0=ref_pocs_l0,
                         ref_pocs_l1=ref_pocs_l1,
                         epipole_delta=epipole_delta,
                         sao_params=sao_params, alf_params=alf_params,
                         alf_chroma_params=self._pending_alf_chroma,
                         ccalf_params=self._pending_ccalf)
        bw = BitWriter()
        sh.write(bw, self.sps)
        bw.write_bytes(payload)
        nal = NalUnit(NAL_TRAIL, tid, bw.get_bytes())
        self._dpb_dev[poc] = (recon["y"], recon["u"], recon["v"])
        rec, psnrs = xfer.finalize_recon(recon, dev, cfg.bit_depth)
        res = FrameResult(
            poc=poc, bits=len(nal.payload) * 8,
            psnr_y=psnrs[0], psnr_u=psnrs[1], psnr_v=psnrs[2],
            recon=rec, seconds=time.time() - t0)
        self._finish_frame(res, planes)
        self.results.append(res)
        return nal, res

    def _finish_slice(self, poc, planes, recon, payload, qp, t0, slice_type,
                      ref_pocs_l0, ref_pocs_l1, epipole_delta, tid,
                      dev=None):
        """Shared inter-frame tail: SAO -> ALF -> slice header -> NAL ->
        stats (reference: EncGOP compressGOP tail per picture)."""
        cfg = self.cfg
        if dev is None:
            dev = xfer.upload_planes(planes, cfg.bit_depth)
        recon, sao_params = self._sao_stage(recon, dev, qp)
        recon, alf_params = self._alf_stage(recon, dev[0], qp,
                                            (dev[1], dev[2]))
        sh = SliceHeader(poc=poc, slice_type=slice_type, qp=qp,
                         temporal_id=tid, ref_pocs_l0=ref_pocs_l0,
                         ref_pocs_l1=ref_pocs_l1,
                         epipole_delta=epipole_delta,
                         sao_params=sao_params, alf_params=alf_params,
                         alf_chroma_params=self._pending_alf_chroma,
                         ccalf_params=self._pending_ccalf)
        bw = BitWriter()
        sh.write(bw, self.sps)
        bw.write_bytes(payload)
        nal = NalUnit(NAL_TRAIL, tid, bw.get_bytes())
        self._dpb_dev[poc] = (recon["y"], recon["u"], recon["v"])
        rec, psnrs = xfer.finalize_recon(recon, dev, cfg.bit_depth)
        res = FrameResult(
            poc=poc, bits=len(nal.payload) * 8,
            psnr_y=psnrs[0], psnr_u=psnrs[1], psnr_v=psnrs[2],
            recon=rec, seconds=time.time() - t0)
        self._finish_frame(res, planes)
        self.results.append(res)
        return nal, res

    def encode_b_frame(self, poc: int, planes: list[np.ndarray],
                       ref0: list[np.ndarray], ref0_poc: int,
                       ref1: list[np.ndarray], ref1_poc: int, tid: int = 0,
                       qp: int | None = None
                       ) -> tuple[NalUnit, FrameResult]:
        """Hierarchical-B encode against past+future references (reference:
        EncGOP compressGOP B pictures; RA GOP table
        cfg/encoder_randomaccess_vtm.cfg:13-33)."""
        cfg = self.cfg
        qp = self.cfg.qp if qp is None else qp
        t0 = time.time()
        s = cfg.inter_block_size
        dev = xfer.upload_planes(planes, cfg.bit_depth)
        r0 = self._dpb_dev.get(ref0_poc)
        if r0 is None:
            r0 = xfer.upload_planes(ref0, cfg.bit_depth)
        r1 = self._dpb_dev.get(ref1_poc)
        if r1 is None:
            r1 = xfer.upload_planes(ref1, cfg.bit_depth)
        oy, ou, ov = dev
        if cfg.mm.any_enabled():
            # multi-model B: per-list model search + uni/bi decision, with
            # projected DMVR on bi blocks when enabled (reference:
            # InterPrediction.cpp:2442 xProcessDMVRProjected).  GED
            # epipoles come from the decoder-mirrored list (exact ->
            # per-POC -> global fallback) so no extra PH syntax is needed
            # for B slices.
            active = cfg.mm.active_models()
            eps0 = eps1 = None
            if cfg.mm.ged:
                eps0 = {MotionModelID.GEODESIC_CAMPOSE:
                        self.coded_epipoles.find_epipole(poc, ref0_poc)}
                eps1 = {MotionModelID.GEODESIC_CAMPOSE:
                        self.coded_epipoles.find_epipole(poc, ref1_poc)}
            # fused path: ONE search program (both lists + uni/bi), the
            # shared DMVR/positions programs, ONE residual/recon/deblock
            # program; host entropy overlaps the SAO/ALF device chain
            mflag_mm = midx_mm = None
            if cfg.merge:
                # whole-motion MM merge: candidate-field SADs ride the
                # search program; host selection snaps (dir, model, mv)
                # triples in coding order
                from .inter_coder import select_merge_b_mm
                with profiling.stage("mm_search_b") as ps:
                    out = mm_codec.search_b_mm_merge(
                        self.reproj, active, oy, r0[0], r1[0], qp, s,
                        cfg.bit_depth, cfg.search_range, eps0, eps1,
                        cfg.wrap_around)
                    ps.set_sync(out)
                with profiling.stage("mm_select_b+pull"):
                    (m0h, m1h, s0h, s1h, d_h, sad_h, ci0h, ci1h, cm0h,
                     cm1h, cdh, csh) = xfer.pull_i32(*out)
                lam_sqrt = quant.lambda_from_qp(qp, intra=False) ** 0.5
                mer_blk = max(0, self.sps.log2_parallel_merge_level
                              - (s.bit_length() - 1))
                ep0_m = (eps0 or {}).get(MotionModelID.GEODESIC_CAMPOSE)
                ep1_m = (eps1 or {}).get(MotionModelID.GEODESIC_CAMPOSE)
                (f_m0, f_m1, f_s0, f_s1, f_d, mflag_mm,
                 midx_mm) = select_merge_b_mm(
                    m0h, m1h, s0h, s1h, d_h, sad_h, ci0h, ci1h, cm0h,
                    cm1h, cdh, csh, active, lam_sqrt, s, self.mvp_conv,
                    ep0_m, ep1_m, mer_blk)
                midx0 = jnp.asarray(f_m0)
                midx1 = jnp.asarray(f_m1)
                stack0 = jnp.asarray(f_s0.astype(np.int32))
                stack1 = jnp.asarray(f_s1.astype(np.int32))
                dirs = jnp.asarray(f_d)
                self._mm_seed = stack0
            else:
                midx0, midx1, stack0, stack1, dirs = mm_codec.search_b_mm(
                    self.reproj, active, oy, r0[0], r1[0], qp, s,
                    cfg.bit_depth, cfg.search_range, eps0, eps1,
                    cfg.wrap_around, seed=self._mm_seed)
                self._mm_seed = stack0
            if cfg.dmvr:
                # projected DMVR refines the *prediction* MVs through the
                # shared enc/dec programs; the SIGNALED stacks (and the
                # deblock MV field) stay unrefined (decoder mirror:
                # declib.py B-MM path, reconstruct_b_frame_mm dmvr=True)
                rstack0, rstack1 = mm_codec.projected_dmvr(
                    self.reproj, active, midx0, midx1, stack0, stack1,
                    dirs, r0[0], r1[0], s, cfg.bit_depth, eps0, eps1,
                    cfg.wrap_around)
            else:
                rstack0, rstack1 = stack0, stack1
            # positions fused into the finish program (one dispatch
            # instead of three — the tunnel round-trip per dispatch is a
            # measurable per-frame cost)
            ly, lu, lv, recon = mm_codec.enc_finish_b_mm_fused(
                self.reproj, active, midx0, midx1, stack0, stack1,
                rstack0, rstack1, dirs, (oy, ou, ov), tuple(r0),
                tuple(r1), qp, s, cfg.bit_depth, eps0, eps1,
                cfg.wrap_around, cfg.deblocking)
            ep0_mvp = (eps0 or {}).get(MotionModelID.GEODESIC_CAMPOSE)
            ep1_mvp = (eps1 or {}).get(MotionModelID.GEODESIC_CAMPOSE)

            def make_payload():
                from .inter_coder import encode_b_slice_mm
                if cfg.merge:
                    lyh, luh, lvh = xfer.pull_levels(ly, lu, lv)
                    return encode_b_slice_mm(
                        f_m0, f_m1, active, f_s0, f_s1, f_d, lyh, luh,
                        lvh, s, self.mvp_conv, ep0_mvp, ep1_mvp,
                        merge_flag=mflag_mm, merge_idx=midx_mm)
                (lyh, luh, lvh, midx0_h, midx1_h, s0_h, s1_h,
                 dirs_h) = xfer.pull_levels(ly, lu, lv, midx0, midx1,
                                            stack0, stack1, dirs)
                return encode_b_slice_mm(
                    midx0_h, midx1_h, active, s0_h.astype(np.int64),
                    s1_h.astype(np.int64), dirs_h, lyh, luh, lvh, s,
                    self.mvp_conv, ep0_mvp, ep1_mvp)

            return self._finish_slice_overlap(
                poc, planes, recon, make_payload, qp, t0, SliceType.B,
                [ref0_poc], [ref1_poc], None, tid, dev)
        if cfg.qt_depth > 0 and cfg.mtt:
            from ..common import mtt as mtt_mod
            from ..common import qtree
            from .inter_coder import encode_b_slice_mtt
            out = mtt_mod.encode_b_frame_mtt(
                oy, ou, ov, tuple(r0), tuple(r1), qp, s, cfg.qt_depth,
                cfg.bit_depth, cfg.search_range, cfg.wrap_around)
            shapes = mtt_mod.rect_shapes(s, cfg.qt_depth)
            arrs = (list(out["codes"]) + list(out["sq_mv0"])
                    + list(out["sq_mv1"]) + list(out["sq_dirs"]))
            for trio in out["sq_levels"]:
                arrs += list(trio)
            for info in shapes:
                key = (info[0], info[1])
                arrs += [out["rect_mv0"][key], out["rect_mv1"][key],
                         out["rect_dirs"][key]]
                arrs += list(out["rect_levels"][key])
            pulled = xfer.pull_levels(*arrs)
            nd = cfg.qt_depth
            codes_h = pulled[:nd]
            off = nd
            sq_mv0_h = [m.astype(np.int64)
                        for m in pulled[off:off + nd + 1]]
            off += nd + 1
            sq_mv1_h = [m.astype(np.int64)
                        for m in pulled[off:off + nd + 1]]
            off += nd + 1
            sq_dirs_h = pulled[off:off + nd + 1]
            off += nd + 1
            sq_lev_h = [tuple(pulled[off + 3 * i:off + 3 * i + 3])
                        for i in range(nd + 1)]
            off += 3 * (nd + 1)
            rect_mv0_h, rect_mv1_h, rect_dirs_h, rect_lev_h = {}, {}, {}, {}
            for info in shapes:
                key = (info[0], info[1])
                rect_mv0_h[key] = pulled[off].astype(np.int64)
                rect_mv1_h[key] = pulled[off + 1].astype(np.int64)
                rect_dirs_h[key] = pulled[off + 2]
                rect_lev_h[key] = tuple(pulled[off + 3:off + 6])
                off += 6
            payload = encode_b_slice_mtt(
                codes_h, sq_mv0_h, sq_mv1_h, sq_dirs_h, sq_lev_h,
                rect_mv0_h, rect_mv1_h, rect_dirs_h, rect_lev_h, s,
                cfg.qt_depth, use_merge=cfg.merge)
            recon = out["recon"]
            if cfg.deblocking:
                sel_mv = jnp.where(out["dirs_unit"][..., None] == 1,
                                   out["mv1_unit"], out["mv0_unit"])
                bs_v, bs_h = qtree.qt_boundary_strengths(
                    sel_mv, out["has_resid_unit"], out["leaf_id_unit"])
                ry, ru, rv = deblock.deblock_frame(
                    recon["y"], recon["u"], recon["v"], bs_v, bs_h,
                    s >> cfg.qt_depth, qp, cfg.bit_depth)
                recon = dict(y=ry, u=ru, v=rv)
            return self._finish_slice(poc, planes, recon, payload, qp, t0,
                                      SliceType.B, [ref0_poc], [ref1_poc],
                                      None, tid, dev)
        if cfg.qt_depth > 0:
            from ..common import qtree
            from .inter_coder import encode_b_slice_qt
            qt = qtree.encode_b_frame_qt(
                oy, ou, ov, tuple(r0), tuple(r1), qp, s, cfg.qt_depth,
                cfg.bit_depth, cfg.search_range, cfg.wrap_around,
                cfg.bdof, cfg.dmvr)
            flat_levels = [l for trio in qt["levels"] for l in trio]
            counts = [len(qt["splits"]), len(qt["mv0"]), len(qt["mv1"]),
                      len(qt["dirs"])]
            pulled = xfer.pull_levels(*qt["splits"], *qt["mv0"],
                                      *qt["mv1"], *qt["dirs"], *flat_levels)
            o0, o1, o2, o3 = np.cumsum(counts)
            splits = pulled[:o0]
            mv0s = [m.astype(np.int64) for m in pulled[o0:o1]]
            mv1s = [m.astype(np.int64) for m in pulled[o1:o2]]
            dirss = pulled[o2:o3]
            lv_flat = pulled[o3:]
            levels_h = [tuple(lv_flat[3 * i:3 * i + 3])
                        for i in range(len(qt["levels"]))]
            payload = encode_b_slice_qt(splits, mv0s, mv1s, dirss,
                                        levels_h, s, cfg.qt_depth,
                                        use_merge=cfg.merge)
            recon = qt["recon"]
            if cfg.deblocking:
                sel_mv = jnp.where(qt["dirs_unit"][..., None] == 1,
                                   qt["mv1_unit"], qt["mv0_unit"])
                bs_v, bs_h = qtree.qt_boundary_strengths(
                    sel_mv, qt["has_resid_unit"], qt["leaf_id_unit"])
                ry, ru, rv = deblock.deblock_frame(
                    recon["y"], recon["u"], recon["v"], bs_v, bs_h,
                    s >> cfg.qt_depth, qp, cfg.bit_depth)
                recon = dict(y=ry, u=ru, v=rv)
            return self._finish_slice(poc, planes, recon, payload, qp, t0,
                                      SliceType.B, [ref0_poc], [ref1_poc],
                                      None, tid, dev)
        mflag = midx = None
        use_wpb = cfg.weighted_bipred
        wp0 = wp1 = None
        if use_wpb:
            wp0 = self._estimate_wp(planes, ref0)
            wp1 = self._estimate_wp(planes, ref1)
            if wp0 is None and wp1 is None:
                use_wpb = False
            else:
                ident = [(64, 0)] * 3
                wp0 = wp0 if wp0 is not None else ident
                wp1 = wp1 if wp1 is not None else ident
        wp0_d = None if not use_wpb else jnp.asarray(
            np.asarray(wp0, dtype=np.int32))
        wp1_d = None if not use_wpb else jnp.asarray(
            np.asarray(wp1, dtype=np.int32))
        # reference precedence: explicit weights win per SLICE and the
        # refinement/blend tools gate off there (BDOF's biocheck0 /
        # DMVR's no-WP condition, InterPrediction.cpp:566,252; GPM/CIIP
        # never combine with explicit weights in VVC).  Slices without
        # active weights keep the tools — composition is per slice, not
        # a config-level exclusivity.  The decoder mirrors this from the
        # slice header's weight tables (declib.py B path).
        sl_bdof = cfg.bdof and not use_wpb
        sl_dmvr = cfg.dmvr and not use_wpb
        sl_gpm = cfg.gpm and not use_wpb
        sl_ciip = cfg.ciip and not use_wpb
        if cfg.merge:
            # merge/skip pipeline for B: device search with whole-motion
            # candidate-field SADs -> host selection in coding order ->
            # shared prediction/residual from the FINAL grids
            from .inter_coder import select_merge_b
            out = inter_frame.search_b_frame_merge(
                oy, r0[0], r1[0], qp, s, cfg.bit_depth, cfg.search_range,
                cfg.wrap_around, sl_gpm, sl_ciip)
            (mv0_h, mv1_h, dirs_h, gpm_h, sad_h, c0_h, c1_h, cd_h,
             cs_h) = xfer.pull_i32(*out)
            lam_sqrt = quant.lambda_from_qp(qp, intra=False) ** 0.5
            mer_blk = max(0, self.sps.log2_parallel_merge_level
                          - (s.bit_length() - 1))
            f0, f1, fd, mflag, midx = select_merge_b(
                mv0_h, mv1_h, dirs_h, sad_h, c0_h, c1_h, cd_h, cs_h,
                lam_sqrt, mer_blk)
            mv0_h, mv1_h, dirs_h = f0, f1, fd     # final grids (entropy)
            mv0 = jnp.asarray(f0.astype(np.int32))
            mv1 = jnp.asarray(f1.astype(np.int32))
            dirs = jnp.asarray(fd)
            gpm_modes = jnp.asarray(gpm_h)
        else:
            mv0, mv1, dirs, gpm_modes = inter_frame.search_b_frame(
                oy, r0[0], r1[0], qp, s, cfg.bit_depth, cfg.search_range,
                cfg.wrap_around, sl_gpm, sl_ciip)
        ly, lu, lv, _ = inter_frame.bpred_and_residual(
            oy, ou, ov, tuple(r0), tuple(r1), mv0, mv1, dirs, qp, s,
            cfg.bit_depth, cfg.wrap_around, sl_bdof, sl_dmvr,
            gpm_modes=gpm_modes, gpm=sl_gpm, ciip=sl_ciip,
            wp0=wp0_d, wp1=wp1_d)
        # The recon/filter chain never reads the entropy pass's coded
        # grids: unused-list MVP replacements are never selected by
        # `dirs` (prediction and deblock both pick the *used* list), so
        # the whole device chain is dispatched here and the host entropy
        # pass below runs concurrently with it.
        recon = inter_frame.reconstruct_b_frame(
            mv0, mv1, dirs, ly, lu, lv,
            tuple(r0), tuple(r1), qp, s, cfg.bit_depth, cfg.wrap_around,
            sl_bdof, sl_dmvr, gpm_modes=gpm_modes, gpm=sl_gpm,
            ciip=sl_ciip, wp0=wp0_d, wp1=wp1_d)
        if cfg.deblocking:
            has_resid = (jnp.any(ly != 0, axis=(2, 3))
                         | jnp.any(lu != 0, axis=(2, 3))
                         | jnp.any(lv != 0, axis=(2, 3)))
            sel_mv = jnp.where(dirs[..., None] == 1, mv1, mv0)
            bs_v, bs_h = deblock.boundary_strengths_inter(
                sel_mv.astype(jnp.int32), has_resid)
            ry, ru, rv = deblock.deblock_frame(
                recon["y"], recon["u"], recon["v"], bs_v, bs_h, s, qp,
                cfg.bit_depth)
            recon = dict(y=ry, u=ru, v=rv)
        from . import filter_stage
        lam = quant.lambda_from_qp(qp, intra=False)
        sao_h = (filter_stage.sao_dispatch(recon, dev, lam, cfg.bit_depth)
                 if cfg.sao else None)
        post_sao = (dict(y=sao_h[0], u=sao_h[1], v=sao_h[2]) if cfg.sao
                    else recon)
        alf_h = (filter_stage.alf_stats_dispatch(post_sao, dev,
                                                 cfg.bit_depth)
                 if cfg.alf else None)
        # host entropy overlaps the device filter chain dispatched above
        if cfg.merge:
            lyh, luh, lvh = xfer.pull_levels(ly, lu, lv)
        else:
            (lyh, luh, lvh, mv0_h, mv1_h, dirs_h,
             gpm_h) = xfer.pull_levels(ly, lu, lv, mv0, mv1, dirs,
                                       gpm_modes)
        if cfg.wpp and cfg.merge:
            from .inter_coder import encode_b_slice_wpp
            payload = encode_b_slice_wpp(
                mv0_h, mv1_h, dirs_h, lyh, luh, lvh, gpm_modes=gpm_h,
                use_gpm=sl_gpm, use_ciip=sl_ciip, merge_flag=mflag,
                merge_idx=midx, num_substreams=cfg.num_substreams)
        else:
            payload, _, _ = encode_b_slice(
                mv0_h, mv1_h, dirs_h, lyh, luh,
                lvh, gpm_modes=gpm_h, use_gpm=sl_gpm,
                use_ciip=sl_ciip, merge_flag=mflag, merge_idx=midx)
        self._pending_alf_chroma = None
        self._pending_ccalf = None
        sao_params = None
        if cfg.sao:
            recon, sao_params = filter_stage.sao_finish(recon, sao_h)
            recon = post_sao   # same values; keep the device chain's view
        alf_params = None
        if cfg.alf:
            recon, alf_params, self._pending_alf_chroma, \
                self._pending_ccalf = filter_stage.run_alf(
                    post_sao, dev, lam, cfg.bit_depth, stats_handles=alf_h)
        sh = SliceHeader(poc=poc, slice_type=SliceType.B, qp=qp,
                         temporal_id=tid, ref_pocs_l0=[ref0_poc],
                         ref_pocs_l1=[ref1_poc], sao_params=sao_params,
                         wp_params=(tuple((int(a), int(b)) for a, b in wp0)
                                    if use_wpb else None),
                         wp_params_l1=(tuple((int(a), int(b))
                                             for a, b in wp1)
                                       if use_wpb else None),
                         alf_params=alf_params,
                         alf_chroma_params=self._pending_alf_chroma,
                         ccalf_params=self._pending_ccalf)
        bw = BitWriter()
        sh.write(bw, self.sps)
        bw.write_bytes(payload)
        nal = NalUnit(NAL_TRAIL, tid, bw.get_bytes())
        self._dpb_dev[poc] = (recon["y"], recon["u"], recon["v"])
        rec, psnrs = xfer.finalize_recon(recon, dev, cfg.bit_depth)
        res = FrameResult(
            poc=poc, bits=len(nal.payload) * 8,
            psnr_y=psnrs[0], psnr_u=psnrs[1], psnr_v=psnrs[2],
            recon=rec, seconds=time.time() - t0)
        self._finish_frame(res, planes)
        self.results.append(res)
        return nal, res

    @staticmethod
    def ra_coding_order(n: int, gop_size: int) -> list[tuple[int, int, int,
                                                             int]]:
        """Hierarchical-B coding order: list of (poc, ref0_poc, ref1_poc,
        temporal_id); ref1_poc == -1 means P frame (trailing partial GOP).
        Mirrors the dyadic GOP tables of the reference CTC configs."""
        order: list[tuple[int, int, int, int]] = []

        def bisect(lo: int, hi: int, tid: int) -> None:
            if hi - lo < 2:
                return
            mid = (lo + hi) // 2
            order.append((mid, lo, hi, tid))
            bisect(lo, mid, tid + 1)
            bisect(mid, hi, tid + 1)

        pos = 0
        while pos + 1 < n:
            end = min(pos + gop_size, n - 1)
            order.append((end, pos, -1, 0))       # GOP anchor: P frame
            bisect(pos, end, 1)
            pos = end
        return order

    def _make_rc(self):
        """reference: RateCtrl.h EncRCSeq init from target bitrate."""
        if self.cfg.target_bitrate_kbps <= 0:
            return None
        from .rate_ctrl import RateControl
        return RateControl(self.cfg.target_bitrate_kbps * 1000.0,
                           self.cfg.frame_rate, self.cfg.width,
                           self.cfg.height)

    def encode_sequence(self, frames: list[list[np.ndarray]]) -> bytes:
        """Encode a frame list -> Annex-B bytes (AI / LDP / RA GOP)."""
        originals = frames
        if self.cfg.lmcs:
            # LMCS: forward-map luma once; the whole pipeline (incl. the
            # picture hash) runs in the mapped domain (common/reshape.py)
            from ..common import reshape
            cw = reshape.estimate_codewords(frames[0][0], self.cfg.bit_depth)
            self.sps.lmcs_cw = tuple(int(c) for c in cw)
            self.sps.lmcs = True
            self._fwd_lut = reshape.build_fwd_lut(cw, self.cfg.bit_depth)
            self._inv_lut = reshape.build_inv_lut(cw, self.cfg.bit_depth)
            frames = [[self._fwd_lut[f[0]], f[1], f[2]] for f in frames]
        if self.cfg.mctf and len(frames) > 1:
            # MCTF pre-filter on RA anchors before any encoding (reference:
            # EncApp.cpp:1547-1551 -> EncTemporalFilter::filter)
            from .mctf import prefilter_sequence
            frames = prefilter_sequence(frames, self.cfg.qp,
                                        self.cfg.bit_depth,
                                        period=max(self.cfg.gop_size, 1))
        nalus = self.encode_headers()
        rc = self._make_rc()

        def rc_qp(slice_type, tid=0):
            return rc.pick_qp(slice_type, tid) if rc else None

        def rc_upd(res):
            if rc:
                rc.update(res.bits)

        # CTC-style RA QP cascade at fixed QP (reference:
        # cfg/encoder_randomaccess_vtm_gop16.cfg QPoffset per temporal
        # layer + IntraQPOffset -3); rate control overrides it
        _B_OFF = (1, 1, 4, 5, 6)

        def ctc_qp(kind, tid=0):
            if rc or not self.cfg.ctc_qp_offsets \
                    or self.cfg.gop != "RA":
                return rc_qp(kind, tid)
            if kind == "I":
                return max(1, self.cfg.qp - 3)
            if kind == "P":
                return self.cfg.qp + 1
            return self.cfg.qp + _B_OFF[min(tid, len(_B_OFF) - 1)]

        if self.cfg.gop == "RA" and len(frames) > 1:
            dpb: dict[int, list[np.ndarray]] = {}
            nal, res = self.encode_intra_frame(0, frames[0],
                                               qp=ctc_qp("I"))
            rc_upd(res)
            nalus.append(nal)
            if self.cfg.film_grain:
                fg_nal = self._film_grain_sei(frames[0], res.recon)
                if fg_nal is not None:
                    nalus.append(fg_nal)
            if self.cfg.picture_hash_sei:
                nalus.append(self._hash_sei(0, res.recon))
            dpb[0] = res.recon
            order = self.ra_coding_order(len(frames), self.cfg.gop_size)
            # GOP-anchor P frames take the previous TWO anchors as their
            # reference list (RPL from the GOP structure; reference:
            # EncLib.cpp:2213 RPL selection, cfg GOP tables)
            anchors = [0]
            order2 = []
            for (poc, r0, r1, tid) in order:
                r2 = -1
                if r1 < 0:
                    r2 = anchors[-2] if len(anchors) >= 2 else -1
                    anchors.append(poc)
                order2.append((poc, r0, r1, r2, tid))
            for i, (poc, r0, r1, r2, tid) in enumerate(order2):
                if r1 < 0:
                    nal, res = self.encode_p_frame(
                        poc, frames[poc], dpb[r0], r0, qp=ctc_qp("P"),
                        ref2=dpb.get(r2) if r2 >= 0 else None,
                        ref2_poc=r2)
                else:
                    nal, res = self.encode_b_frame(poc, frames[poc],
                                                   dpb[r0], r0, dpb[r1], r1,
                                                   tid,
                                                   qp=ctc_qp("B", tid))
                rc_upd(res)
                dpb[poc] = res.recon
                nalus.append(nal)
                if self.cfg.picture_hash_sei:
                    nalus.append(self._hash_sei(poc, res.recon,
                                                max(tid, 0) if r1 >= 0
                                                else 0))
                # prune device-side DPB: keep only pictures still needed
                # as references by the remaining coding order
                needed = {p for (_, a, b, c, _t) in order2[i + 1:]
                          for p in (a, b, c) if p >= 0}
                for p in list(self._dpb_dev):
                    if p not in needed:
                        del self._dpb_dev[p]
            self.results.sort(key=lambda r: r.poc)
            self._lmcs_outputs(originals)
            return write_annexb(nalus)
        last_rec: list[np.ndarray] | None = None
        prev2_rec: list[np.ndarray] | None = None
        last_poc = prev2_poc = -1
        for poc, planes in enumerate(frames):
            is_intra = (self.cfg.gop == "AI" or last_rec is None
                        or (self.cfg.intra_period > 0
                            and poc % self.cfg.intra_period == 0))
            if is_intra:
                nal, res = self.encode_intra_frame(poc, planes,
                                                   qp=rc_qp("I"))
                # closed GOP: references never cross the IDR
                prev2_rec, prev2_poc = None, -1
            else:
                nal, res = self.encode_p_frame(poc, planes, last_rec,
                                               last_poc, qp=rc_qp("P"),
                                               ref2=prev2_rec,
                                               ref2_poc=prev2_poc)
            rc_upd(res)
            if poc == 0 and self.cfg.film_grain:
                fg_nal = self._film_grain_sei(planes, res.recon)
                if fg_nal is not None:
                    nalus.append(fg_nal)
            # LDP: the last TWO recons stay referenceable
            for p in list(self._dpb_dev):
                if p not in (poc, last_poc):
                    del self._dpb_dev[p]
            if is_intra:
                prev2_rec, prev2_poc = None, -1   # next P: IDR only
            else:
                prev2_rec, prev2_poc = last_rec, last_poc
            last_rec, last_poc = res.recon, poc
            nalus.append(nal)
            if self.cfg.picture_hash_sei:
                nalus.append(self._hash_sei(poc, res.recon))
        self._lmcs_outputs(originals)
        return write_annexb(nalus)

    def _lmcs_outputs(self, originals) -> None:
        """Inverse-map reconstructions to the display domain and re-score
        PSNR against the true originals (reference: the encoder reports
        PSNR on the inverse-reshaped picture, EncGOP xCalculateAddPSNR)."""
        if not self.cfg.lmcs:
            return
        for res in self.results:
            out_y = self._inv_lut[res.recon[0]]
            res.recon_out = [out_y, res.recon[1], res.recon[2]]
            res.psnr_y = psnr(originals[res.poc][0], out_y,
                              self.cfg.bit_depth)

    def _finish_frame(self, res: FrameResult, orig: list[np.ndarray]
                      ) -> FrameResult:
        """Per-POC metric hook (reference: EncGOP.cpp:4914
        m_ext360.calculatePSNRs)."""
        if self.cfg.metrics_360:
            from ..lib360.metrics import metrics_360
            res.metrics_360 = metrics_360(orig[0], res.recon[0],
                                          self.cfg.bit_depth)
        return res

    def _sao_stage(self, recon: dict, planes, qp: int):
        """Estimate + apply SAO on all three planes after deblocking
        (reference: EncGOP.cpp:3495 SAOProcess after deblock).  Returns
        (recon, sao_params-or-None).  One fused jit stage + one packed
        pull (encoder/filter_stage.py)."""
        if not self.cfg.sao:
            return recon, None
        from . import filter_stage
        lam = quant.lambda_from_qp(qp, intra=False)
        return filter_stage.run_sao(recon, planes, lam, self.cfg.bit_depth)

    def _alf_stage(self, recon: dict, orig_y, qp: int,
                   orig_uv: tuple | None = None):
        """Estimate + apply luma ALF after SAO (reference: EncGOP.cpp:3527
        ALFProcess), 5x5 chroma ALF and CC-ALF — fused into three jit
        stages with packed pulls (encoder/filter_stage.py).  Returns
        (recon, alf_params); chroma/CC-ALF params land on
        self._pending_alf_chroma / _pending_ccalf for the slice header."""
        self._pending_alf_chroma = None
        self._pending_ccalf = None
        if not self.cfg.alf:
            return recon, None
        from . import filter_stage
        lam = quant.lambda_from_qp(qp, intra=False)
        dev = (orig_y,) + (orig_uv if orig_uv is not None
                           else (recon["u"], recon["v"]))
        recon, luma_params, chroma_params, ccalf_params = \
            filter_stage.run_alf(recon, dev, lam, self.cfg.bit_depth)
        if orig_uv is not None:
            self._pending_alf_chroma = chroma_params
            self._pending_ccalf = ccalf_params
        return recon, luma_params

    def summary(self) -> dict:
        """reference: EncGOP::printOutSummary (EncGOP.cpp:4244)."""
        n = max(len(self.results), 1)
        out = dict(
            frames=len(self.results),
            bits=sum(r.bits for r in self.results),
            psnr_y=sum(r.psnr_y for r in self.results) / n,
            psnr_u=sum(r.psnr_u for r in self.results) / n,
            psnr_v=sum(r.psnr_v for r in self.results) / n,
            fps=n / max(sum(r.seconds for r in self.results), 1e-9))
        if self.cfg.metrics_360 and any(r.metrics_360 for r in self.results):
            ms = [r.metrics_360 for r in self.results if r.metrics_360]
            for key in ("ws_psnr", "s_psnr_nn", "cpp_psnr"):
                out[key] = sum(m[key] for m in ms) / len(ms)
        return out
