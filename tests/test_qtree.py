"""Quadtree inter partitioning tests (QTMT analog, common/qtree.py)."""
import jax.numpy as jnp
import numpy as np

from vvc_mm_tpu.common import qtree
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def _frame(rng, h, w):
    y = rng.integers(0, 256, size=(h, w)).astype(np.int32)
    u = rng.integers(0, 256, size=(h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 256, size=(h // 2, w // 2)).astype(np.int32)
    return [y, u, v]


def _shift(planes, dx):
    return [np.roll(p, (0, dx if i == 0 else dx // 2), axis=(0, 1))
            .astype(np.int32) for i, p in enumerate(planes)]


def test_qt_resolved_mc_matches_leaf_mc(rng):
    """Unit-granularity MC of a merged leaf must equal leaf-size MC
    (position invariance of the separable filter)."""
    from vvc_mm_tpu.common import inter_frame
    ref = _frame(rng, 64, 64)
    mv32 = jnp.asarray(rng.integers(-40, 40, size=(2, 2, 2)), jnp.int32)
    p32 = inter_frame.mc_predict(*(jnp.asarray(p) for p in ref), mv32, 32,
                                 8, False)
    mv8 = jnp.repeat(jnp.repeat(mv32, 4, axis=0), 4, axis=1)
    p8 = inter_frame.mc_predict(*(jnp.asarray(p) for p in ref), mv8, 8,
                                8, False)
    for a, b in zip(p32, p8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qt_splits_on_divergent_motion(rng):
    """A 32-block whose quadrants move differently must split."""
    h, w = 64, 64
    base = rng.integers(0, 256, size=(h * 2, w * 2)).astype(np.int32)
    ref_y = base[:h, :w].copy()
    cur_y = ref_y.copy()
    # quadrants of the first 32x32 block move in opposite directions
    cur_y[0:16, 0:16] = base[4:20, 2:18]
    cur_y[0:16, 16:32] = base[2:18, 20:36]
    cur_y[16:32, 0:16] = base[18:34, 4:20]
    u = np.full((h // 2, w // 2), 128, np.int32)
    out = qtree.encode_p_frame_qt(
        jnp.asarray(cur_y), jnp.asarray(u), jnp.asarray(u),
        jnp.asarray(ref_y), jnp.asarray(u), jnp.asarray(u),
        qp=30, top=32, depth=2, search_range=12)
    assert bool(np.asarray(out["splits"][0])[0, 0])
    # static background blocks should stay unsplit
    assert not np.asarray(out["splits"][0]).all()
    # recon should be decent
    err = np.mean((np.asarray(out["recon"]["y"]) - cur_y) ** 2.0)
    assert err < 60.0


def test_qt_roundtrip_bitexact(rng):
    h, w = 64, 96
    wide = rng.integers(0, 256, size=(h + 16, w + 16)).astype(np.int32)
    frames = []
    for t in range(4):
        y = wide[t:t + h, 2 * t:2 * t + w].astype(np.int32)
        u = (y[::2, ::2] // 2).astype(np.int32)
        v = (y[::2, ::2] // 3).astype(np.int32)
        frames.append([y, u, v])
    cfg = EncCfg(width=w, height=h, qp=33, gop="LDP", intra_period=0,
                 inter_block_size=32, qt_depth=2)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert len(out) == 4
    assert all(v == "OK" for v in dec.hash_status.values())
    for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
        for p, q in zip(r.recon, d.planes):
            np.testing.assert_array_equal(p, q)


def test_qt_ra_gop_roundtrip_bitexact(rng):
    """RA hierarchical-B with quadtree partitioning decodes bit-exactly."""
    h, w = 64, 64
    wide = rng.integers(0, 256, size=(h + 32, w + 32)).astype(np.int32)
    frames = []
    for t in range(5):
        y = wide[t:t + h, 3 * t:3 * t + w].astype(np.int32)
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y, u, u.copy()])
    cfg = EncCfg(width=w, height=h, qp=34, gop="RA", gop_size=4,
                 inter_block_size=32, qt_depth=2)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert len(out) == 5
    assert all(v == "OK" for v in dec.hash_status.values())
    for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
        for p, q in zip(r.recon, d.planes):
            np.testing.assert_array_equal(p, q)


def test_qt_beats_fixed_grid_rd(rng):
    """On content with mixed motion granularity the quadtree should not
    lose to the fixed 16-grid in BD terms (bits at similar PSNR)."""
    h, w = 64, 64
    wide = rng.integers(0, 256, size=(h + 32, w + 32)).astype(np.int32)
    frames = []
    for t in range(3):
        y = wide[:h, 3 * t:3 * t + w].copy()
        # a small independently-moving object
        y[8:24, 8:24] = wide[40 + 2 * t:56 + 2 * t, 40:56]
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y.astype(np.int32), u, u.copy()])
    res = {}
    for name, kw in (("fixed", dict(inter_block_size=16)),
                     ("qt", dict(inter_block_size=32, qt_depth=2))):
        cfg = EncCfg(width=w, height=h, qp=32, gop="LDP", intra_period=0,
                     sao=False, alf=False, **kw)
        enc = EncLib(cfg)
        enc.encode_sequence(frames)
        s = enc.summary()
        res[name] = (s["bits"], s["psnr_y"])
    bits_fixed, psnr_fixed = res["fixed"]
    bits_qt, psnr_qt = res["qt"]
    # allow some tolerance: QT must not be much worse on both axes at once
    assert bits_qt < bits_fixed * 1.10 or psnr_qt > psnr_fixed - 0.05
