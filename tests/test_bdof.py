"""BDOF tests (reference: InterPrediction applyBiOptFlow)."""
import jax.numpy as jnp
import numpy as np

from vvc_mm_tpu.common import bdof, interp
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def _internal(p, bit_depth=8):
    return (jnp.asarray(p) << (interp.IF_INTERNAL_PREC - bit_depth))


def test_bdof_zero_flow_matches_plain_average(rng):
    """Identical L0/L1 predictions -> zero flow -> plain bi average."""
    p = rng.integers(0, 256, size=(6, 16, 16)).astype(np.int32)
    i0 = _internal(p)
    out = bdof.bdof_bi(i0, i0, 8)
    ref = interp.finalize_bi(i0, i0, 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bdof_reduces_error_on_subpel_shift(rng):
    """L0/L1 displaced by ±delta around the truth: BDOF must land closer to
    the midpoint signal than the plain average on smooth gradients."""
    xx, yy = np.meshgrid(np.arange(40, dtype=np.float64),
                         np.arange(20, dtype=np.float64))
    base = np.round(128 + 90 * np.sin(2 * np.pi * xx / 32)
                    * np.cos(2 * np.pi * yy / 48)).astype(np.int32)
    truth = base[2:18, 12:28]
    p0 = base[2:18, 11:27]      # shifted -1 px
    p1 = base[2:18, 13:29]      # shifted +1 px
    i0 = _internal(p0)[None]
    i1 = _internal(p1)[None]
    out = np.asarray(bdof.bdof_bi(i0, i1, 8))[0]
    avg = np.asarray(interp.finalize_bi(i0, i1, 8))[0]
    err_bdof = np.abs(out.astype(np.int64) - truth).mean()
    err_avg = np.abs(avg.astype(np.int64) - truth).mean()
    assert err_bdof < err_avg * 0.7, (err_bdof, err_avg)


def test_bdof_roundtrip_bitexact(rng):
    h, w = 64, 64
    wide = rng.integers(0, 256, size=(h + 16, w + 16)).astype(np.int32)
    frames = []
    for t in range(5):
        y = wide[t:t + h, 2 * t:2 * t + w].astype(np.int32)
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y, u, u.copy()])
    for qt in (0, 2):
        cfg = EncCfg(width=w, height=h, qp=34, gop="RA", gop_size=4,
                     bdof=True, qt_depth=qt,
                     inter_block_size=32 if qt else 16)
        enc = EncLib(cfg)
        stream = enc.encode_sequence(frames)
        dec = DecLib()
        out = dec.decode_bytes(stream)
        assert all(v == "OK" for v in dec.hash_status.values()), qt
        for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
            for p, q in zip(r.recon, d.planes):
                np.testing.assert_array_equal(p, q)
