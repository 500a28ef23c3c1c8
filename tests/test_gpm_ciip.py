"""GPM (geometric partitioning) + CIIP tests (reference:
InterPrediction.cpp motionCompensationGeo / weightedGeoBlk; CIIP blend)."""
import numpy as np
import jax.numpy as jnp

from vvc_mm_tpu.common import gpm, interp
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def test_gpm_weights_shape_and_complement():
    w = gpm.gpm_weights(16)
    assert w.shape == (gpm.NUM_GPM_MODES, 16, 16)
    assert w.min() >= 0 and w.max() <= 8
    # opposite-angle mode is the complementary mask
    half = gpm.NUM_GPM_MODES // 2
    for k in range(half):
        np.testing.assert_array_equal(w[k] + w[k + half], 8 * np.ones_like(w[k]))


def test_gpm_blend_selects_halves(rng):
    """With a pure split mask, each half must come from its source."""
    p0 = jnp.full((1, 16, 16), 100, dtype=jnp.int32)
    p1 = jnp.full((1, 16, 16), 200, dtype=jnp.int32)
    # mode 0: vertical split (normal along +x): left w=0 -> p1, right w=8 -> p0
    out = np.asarray(gpm.gpm_blend(p0, p1, jnp.asarray([0], jnp.int32)))[0]
    assert out[:, 0].max() == 200 and out[:, -1].min() == 100


def test_gpm_search_finds_diagonal_split(rng):
    """orig = p0 on one side of a split, p1 on the other -> the chosen
    mode's blend must beat both plain averages."""
    s = 16
    p0 = rng.integers(0, 256, size=(1, s, s)).astype(np.int32)
    p1 = rng.integers(0, 256, size=(1, s, s)).astype(np.int32)
    w = gpm.gpm_weights(s)[3]          # a diagonal mask
    orig = np.where(w >= 4, p0[0], p1[0]).astype(np.int32)
    mode, sad = gpm.gpm_search(jnp.asarray(orig)[None], jnp.asarray(p0),
                               jnp.asarray(p1))
    avg = (p0[0] + p1[0] + 1) >> 1
    sad_avg = np.abs(avg - orig).sum()
    assert int(sad[0]) < sad_avg


def test_ciip_planar_is_smooth():
    """Planar from a constant prediction frame reproduces the constant."""
    pred = jnp.full((32, 32), 77, dtype=jnp.int32)
    blocks = np.asarray(gpm.ciip_from_pred(pred, 16))
    np.testing.assert_array_equal(blocks, np.full((4, 16, 16), 77))


def _sequence(rng, h, w, n):
    wide = rng.integers(0, 256, size=(h + 32, w + 32)).astype(np.int32)
    frames = []
    for t in range(n):
        y = wide[t:t + h, 2 * t:2 * t + w].astype(np.int32)
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y, u, u.copy()])
    return frames


def test_gpm_ciip_roundtrip_bitexact(rng):
    """RA encode with GPM+CIIP on -> decode -> hash OK + planes identical
    (the decoded-picture-hash oracle, DecLib.cpp:868)."""
    frames = _sequence(rng, 64, 64, 5)
    for flags in (dict(gpm=True), dict(ciip=True),
                  dict(gpm=True, ciip=True)):
        cfg = EncCfg(width=64, height=64, qp=32, gop="RA", gop_size=4,
                     **flags)
        enc = EncLib(cfg)
        stream = enc.encode_sequence(frames)
        dec = DecLib()
        out = dec.decode_bytes(stream)
        assert all(v == "OK" for v in dec.hash_status.values()), (
            flags, dec.hash_status)
        for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
            for p, q in zip(r.recon, d.planes):
                np.testing.assert_array_equal(p, q)


def test_gpm_used_on_split_motion(rng):
    """A frame whose halves move oppositely should actually select GPM on
    at least one block (sanity: the tool is reachable)."""
    h, w = 64, 128
    base = rng.integers(0, 256, size=(h + 64, w + 64)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    f0y = base[32:32 + h, 32:32 + w]
    # halves shifted in opposite directions, split mid-block
    f1y = np.concatenate([base[32:32 + h, 24:24 + w // 2 + 8],
                          base[32:32 + h, 48:40 + w // 2]], axis=1)
    frames = []
    for y in (f0y, f1y, f0y):
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y.astype(np.int32), u, u.copy()])
    cfg = EncCfg(width=w, height=h, qp=30, gop="RA", gop_size=2, gpm=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    dec.decode_bytes(stream)
    assert all(v == "OK" for v in dec.hash_status.values())
