"""DMVR tests (reference: InterPrediction.cpp:2241 xProcessDMVR)."""
import jax.numpy as jnp
import numpy as np

from vvc_mm_tpu.common import dmvr
from vvc_mm_tpu.common.inter_frame import MC_MARGIN, pad_ref
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def test_dmvr_recovers_mirrored_offset(rng):
    """refs displaced by a mirrored +-1px error around the signaled MVs:
    the bilateral search must find exactly that offset."""
    base = rng.integers(0, 256, size=(80, 80)).astype(np.int32)
    ref0 = np.roll(base, (1, 1), axis=(0, 1)).astype(np.int32)   # d=(+1,+1)
    ref1 = np.roll(base, (-1, -1), axis=(0, 1)).astype(np.int32)
    mv0 = jnp.zeros((5, 5, 2), jnp.int32)
    mv1 = jnp.zeros((5, 5, 2), jnp.int32)
    dirs = jnp.full((5, 5), 2, jnp.int32)
    r0 = pad_ref(jnp.asarray(ref0), MC_MARGIN, False)
    r1 = pad_ref(jnp.asarray(ref1), MC_MARGIN, False)
    mv0r, mv1r = dmvr.dmvr_refine(r0, r1, mv0, mv1, dirs, 16, MC_MARGIN)
    # interior blocks (rolls wrap at edges): ref0(x+d) = base(x+d-1) matches
    # ref1(x-d) = base(x-d+1) at d = +1 -> mv0 += 16, mv1 -= 16
    assert (np.asarray(mv0r)[1:4, 1:4] == 16).all()
    assert (np.asarray(mv1r)[1:4, 1:4] == -16).all()
    # uni blocks untouched
    dirs0 = dirs.at[2, 2].set(0)
    mv0r, mv1r = dmvr.dmvr_refine(r0, r1, mv0, mv1, dirs0, 16, MC_MARGIN)
    assert (np.asarray(mv0r)[2, 2] == 0).all()


def test_dmvr_roundtrip_bitexact(rng):
    h, w = 64, 64
    wide = rng.integers(0, 256, size=(h + 16, w + 16)).astype(np.int32)
    frames = []
    for t in range(5):
        y = wide[t:t + h, 2 * t:2 * t + w].astype(np.int32)
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y, u, u.copy()])
    for qt in (0, 2):
        cfg = EncCfg(width=w, height=h, qp=34, gop="RA", gop_size=4,
                     dmvr=True, bdof=True, qt_depth=qt,
                     inter_block_size=32 if qt else 16)
        enc = EncLib(cfg)
        stream = enc.encode_sequence(frames)
        dec = DecLib()
        out = dec.decode_bytes(stream)
        assert all(v == "OK" for v in dec.hash_status.values()), qt
        for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
            for p, q in zip(r.recon, d.planes):
                np.testing.assert_array_equal(p, q)
