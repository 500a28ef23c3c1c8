"""Affine motion tests (reference: xPredAffineBlk, AffineGradientSearch)."""
import jax.numpy as jnp
import numpy as np

from vvc_mm_tpu.common import affine
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def _zoom_frame(base, scale, h, w):
    """Sample `base` on a zoomed grid about the frame center (bilinear)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    sy = np.clip((yy - cy) / scale + cy, 0, base.shape[0] - 2)
    sx = np.clip((xx - cx) / scale + cx, 0, base.shape[1] - 2)
    y0, x0 = sy.astype(int), sx.astype(int)
    fy, fx = sy - y0, sx - x0
    out = (base[y0, x0] * (1 - fy) * (1 - fx)
           + base[y0, x0 + 1] * (1 - fy) * fx
           + base[y0 + 1, x0] * fy * (1 - fx)
           + base[y0 + 1, x0 + 1] * fy * fx)
    return np.round(out).astype(np.int32)


def _blurred(rng, h, w):
    x = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    k = np.ones(7) / 7.0
    for ax in (0, 1):
        x = np.apply_along_axis(np.convolve, ax, x, k, mode="same")
    return x


def test_affine_positions_translation_degenerates_to_classic():
    from vvc_mm_tpu.common.mm import mc as mm_mc
    mv = jnp.asarray(np.array([[[16, -32]]], np.int32))
    pos_a = affine.affine_positions(mv, jnp.zeros((1, 1, 2), jnp.int32),
                                    16, 16, 16)
    pos_c = mm_mc.classic_positions(0.0, 16, 16, mv, 16)
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_c))


def test_affine_search_recovers_zoom(rng):
    h, w = 64, 64
    base = _blurred(rng, h + 32, w + 32)[16:16 + h + 2, 16:16 + w + 2]
    ref = np.round(base[:h, :w]).astype(np.int32)
    cur = _zoom_frame(base, 1.06, h, w)[:h, :w]
    mv0, dmv, sad_a = affine.affine_search(
        jnp.asarray(cur), jnp.asarray(ref),
        jnp.zeros((h // 16, w // 16, 2), jnp.int32), 16)
    # zoom-in of 6% over a 16px block: |dmv| ~ 16*0.06*16 = 15 sixteenths
    assert np.abs(np.asarray(dmv)).max() > 2
    # affine must beat pure translation on this content
    from vvc_mm_tpu.encoder import me as me_mod
    from vvc_mm_tpu.common.inter_frame import MC_MARGIN, pad_ref
    rp = pad_ref(jnp.asarray(ref), MC_MARGIN, False)
    mv_i, _ = me_mod.hierarchical_search(jnp.asarray(cur), rp, 16, 8,
                                         MC_MARGIN, 0)
    _, sad_t = me_mod.fractional_refine(jnp.asarray(cur), rp, mv_i, 16,
                                        MC_MARGIN)
    assert np.asarray(sad_a).sum() < np.asarray(sad_t).sum() * 0.9


def test_affine_roundtrip_bitexact(rng):
    h, w = 64, 64
    base = _blurred(rng, h + 40, w + 40)
    frames = []
    for t in range(4):
        scale = 1.0 + 0.02 * t
        y = _zoom_frame(base[8:8 + h + 2, 8:8 + w + 2], scale, h, w)
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y, u, u.copy()])
    cfg = EncCfg(width=w, height=h, qp=33, gop="LDP", intra_period=0,
                 affine=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert len(out) == 4
    assert all(v == "OK" for v in dec.hash_status.values())
    for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
        for p, q in zip(r.recon, d.planes):
            np.testing.assert_array_equal(p, q)
