"""Dependent quantization (DepQuant) — trellis-coded quantization on TPU.

TPU-native analog of the reference DepQuant (reference:
source/Lib/CommonLib/DepQuant.cpp:821+ `class State` — a per-coefficient
sequential state machine; SURVEY.md §7 ranks it hard-part #3 and prescribes
the scan-based Viterbi formulation implemented here).

VVC's dependent quantization couples two scalar quantizers Q0/Q1 (offset by
half a step) through a 4-quantizer-state machine driven by level *parity*:

    state 0,1 -> Q0 (recon t = 2*level),        state 2,3 -> Q1 (t = 2*level-1)
    next_state = TRANS[state][level & 1],  TRANS = [[0,2],[2,0],[1,3],[3,1]]

so each reconstruction lives on a half-step lattice and the encoder chooses
the level *sequence* (a trellis path) minimizing sum(dist + lambda*rate).

Re-design for TPU (vs the reference's per-coefficient pointer-chasing):
  * the trellis runs as ONE `lax.scan` over the (static) coefficient scan,
    vectorized over the whole batch of blocks: the carry is a (B, 4) cost
    front; each step expands 4 states x 3 candidate levels and reduces by
    destination state with masked minima — pure VPU, no control flow.
  * backtracking is a second reversed `lax.scan` over the stored
    (level, source-state) decisions.
  * the *decoder* side (`dequantize_dep`) is the forward state machine as a
    trivial scan: integer-exact, shared by encoder reconstruction, so
    encoder recon == decoder recon bit-exactly (the decoded-picture-hash
    oracle, reference DecLib.cpp:868).

Coding order: the state machine runs over the full reversed diagonal scan
(high-frequency -> DC, the reference's coefficient coding order,
CommonLib/Rom.cpp scan tables) for *all* positions; trailing zeros produce
parity-0 transitions, keeping shapes static.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import rom
from .transforms import transform_shift, _clip16, _rshift_round

# state transition by level parity (reference: DepQuant.cpp state setup)
TRANS = np.array([[0, 2], [2, 0], [1, 3], [3, 1]], dtype=np.int32)
# quantizer offset per state: Q0 for {0,1}, Q1 for {2,3}
STATE_OFF = np.array([0, 0, 1, 1], dtype=np.int32)

_INF = jnp.float32(3e38)
MAX_LEVEL = (1 << 15) - 1


def _coding_order(log2w: int, log2h: int) -> np.ndarray:
    """Flat positions in coding order (reverse diagonal scan)."""
    return rom.scan_order(log2w, log2h)[::-1].copy()


def _rate_bits(level: jnp.ndarray) -> jnp.ndarray:
    """Cheap CABAC-ladder rate model in bits: sig flag ~0.7b for zeros;
    nonzero pays sig+sign+an EG-ish tail (2*log2(l+1)).  Encoder-only —
    affects decisions, never bitstream semantics."""
    lf = level.astype(jnp.float32)
    return jnp.where(level == 0, jnp.float32(0.7),
                     2.0 + 2.0 * jnp.log2(lf + 1.0))


@functools.partial(jax.jit, static_argnames=("qp", "log2w", "log2h",
                                             "bit_depth"))
def quantize_dep(coeff: jnp.ndarray, qp: int, log2w: int, log2h: int,
                 bit_depth: int = 8, lam: float | None = None
                 ) -> jnp.ndarray:
    """Trellis-quantize a (B, H, W) int32 coefficient batch.

    Returns signed int32 levels whose dependent reconstruction
    (`dequantize_dep`) minimizes distortion + lambda*rate along the scan.
    """
    b, h, w = coeff.shape
    n = h * w
    t_shift, odd = transform_shift(log2w, log2h, bit_depth)
    q_bits = rom.QUANT_SHIFT + qp // 6 + t_shift
    q_scale = int(rom.QUANT_SCALES[qp % 6])

    order = jnp.asarray(_coding_order(log2w, log2h))
    flat = coeff.reshape(b, n)
    sign = jnp.sign(flat)
    mag = jnp.abs(flat)
    if odd:
        mag = (mag * 181 + 128) >> 8
    # |coeff| in half-step units of the dependent lattice:
    # one full quantizer step == 2^q_bits / q_scale in (scaled-)coeff units.
    x_half = mag.astype(jnp.float32) * (q_scale / float(1 << (q_bits - 1)))
    xs = x_half[:, order]                          # (B, n) coding order

    if lam is None:
        # fold the pixel-domain lambda (0.57*2^((qp-12)/3), EncSlice.cpp:107)
        # into half-step units: dist_pixel = err_half^2 * hs^2 / (4^ts*2^odd)
        # with hs = 2^(q_bits-1)/q_scale, so the unit conversion factor is
        # 2^(2*(13+qp//6)) / (q_scale^2 * 2^odd).
        lam_pix = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        scale = (2.0 ** (26 + 2 * (qp // 6))
                 / (float(q_scale) ** 2 * (2.0 if odd else 1.0)))
        lam_h = jnp.float32(lam_pix / scale)
    else:
        lam_h = jnp.float32(lam)

    trans = jnp.asarray(TRANS)                     # (4, 2)
    soff = jnp.asarray(STATE_OFF)                  # (4,)

    def step(carry, x):
        cost = carry                               # (B, 4)
        # candidates per source state: nearest two lattice levels + zero
        o = soff[None, :].astype(jnp.float32)      # (1, 4)
        ideal = (x[:, None] + o) * 0.5             # (B, 4)
        l0 = jnp.clip(jnp.floor(ideal), 0, MAX_LEVEL - 1).astype(jnp.int32)
        cands = jnp.stack([jnp.zeros_like(l0), l0, l0 + 1], -1)  # (B,4,3)
        t = (2 * cands - soff[None, :, None] * (cands > 0)
             ).astype(jnp.float32)                 # (B, 4, 3) recon (half)
        err = x[:, None, None] - t
        c_cand = (cost[:, :, None] + err * err
                  + lam_h * _rate_bits(cands))     # (B, 4, 3)
        dest = trans[jnp.arange(4)[:, None], cands & 1]  # (B?,) -> (B,4,3)
        # reduce by destination state with masked minima
        new_cost = []
        new_lvl = []
        new_src = []
        flat_c = c_cand.reshape(b, 12)
        flat_l = cands.reshape(b, 12)
        flat_d = dest.reshape(b, 12)
        flat_s = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32)[:, None],
                                  (4, 3)).reshape(12)
        for sp in range(4):
            m = flat_d == sp
            cm = jnp.where(m, flat_c, _INF)
            k = jnp.argmin(cm, axis=1)             # (B,)
            new_cost.append(jnp.take_along_axis(cm, k[:, None], 1)[:, 0])
            new_lvl.append(jnp.take_along_axis(flat_l, k[:, None], 1)[:, 0])
            new_src.append(flat_s[k])
        return (jnp.stack(new_cost, 1),
                (jnp.stack(new_lvl, 1).astype(jnp.int32),
                 jnp.stack(new_src, 1).astype(jnp.int32)))

    init = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.float32),
         jnp.full((b, 3), _INF)], axis=1)          # start in state 0
    cost, (lvls, srcs) = jax.lax.scan(step, init, xs.T)
    # lvls/srcs: (n, B, 4).  Backtrack from the cheapest final state.
    final = jnp.argmin(cost, axis=1).astype(jnp.int32)     # (B,)

    def back(carry, ys):
        cur = carry                                # (B,)
        lv, sr = ys
        l = jnp.take_along_axis(lv, cur[:, None], 1)[:, 0]
        p = jnp.take_along_axis(sr, cur[:, None], 1)[:, 0]
        return p, l

    _, lev_rev = jax.lax.scan(back, final, (lvls[::-1], srcs[::-1]))
    lev_coding = lev_rev[::-1]                     # (n, B) coding order
    out = jnp.zeros((b, n), jnp.int32).at[:, order].set(lev_coding.T)
    return (out * sign).reshape(b, h, w)


@functools.partial(jax.jit, static_argnames=("qp", "log2w", "log2h",
                                             "bit_depth"))
def dequantize_dep(level: jnp.ndarray, qp: int, log2w: int, log2h: int,
                   bit_depth: int = 8) -> jnp.ndarray:
    """Normative dependent dequantization (the decoder state machine,
    reference: Quant.cpp dequant DQ path / DepQuant state recon).

    Integer-exact; shared by encoder reconstruction."""
    b, h, w = level.shape
    n = h * w
    t_shift, odd = transform_shift(log2w, log2h, bit_depth)
    dq_shift = 6 - t_shift + 1                     # +1: half-step lattice
    i_scale = int(rom.INV_QUANT_SCALES[qp % 6]) << (qp // 6)

    order = jnp.asarray(_coding_order(log2w, log2h))
    flat = level.reshape(b, n)
    ls = flat[:, order].T                          # (n, B) coding order
    trans = jnp.asarray(TRANS)
    soff = jnp.asarray(STATE_OFF)

    def step(state, l):
        a = jnp.abs(l)
        t = 2 * a - soff[state] * (a > 0)
        nxt = trans[state, a & 1]
        return nxt, (t * jnp.sign(l)).astype(jnp.int32)

    _, ts = jax.lax.scan(step, jnp.zeros((b,), jnp.int32), ls)
    tflat = jnp.zeros((b, n), jnp.int32).at[:, order].set(ts.T)
    c = tflat.reshape(b, h, w) * i_scale
    if odd:
        c = _clip16(_rshift_round(c * 181, 8 + dq_shift - 1))
    else:
        c = _clip16(_rshift_round(c, dq_shift))
    return c.astype(jnp.int32)
