"""Transform + quant core tests.

Model: the reference has no unit tests (SURVEY.md §4); we add kernel-level
tests the reference never had, plus roundtrip (self-conformance) oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from vvc_mm_tpu.common import rom, transforms, quant


def test_dst7_matches_spec_4pt():
    # The VVC spec DST7 4-point matrix is formula-defined; check exact values.
    t = rom.dst7_matrix(4)
    assert t[0].tolist() == [29, 55, 74, 84]


def test_dct2_orthogonality():
    for n in rom.TR_SIZES:
        t = rom.dct2_matrix(n).astype(np.int64)
        g = t @ t.T
        off = g - np.diag(np.diag(g))
        # rows ~ orthogonal: off-diagonal energy tiny vs diagonal (64^2*n)
        assert np.abs(off).max() <= n * 40, n
        assert np.allclose(np.diag(g), 4096 * n, rtol=0.02)


def test_scan_order_is_permutation():
    for lw, lh in [(2, 2), (3, 2), (4, 4), (5, 3), (6, 6)]:
        s = rom.scan_order(lw, lh)
        assert sorted(s.tolist()) == list(range(1 << (lw + lh)))
        assert s[0] == 0  # DC first


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (16, 16), (32, 32),
                                   (8, 4), (4, 16), (32, 8), (64, 64)])
@pytest.mark.parametrize("bd", [8, 10])
def test_transform_roundtrip_lossless_range(rng, shape, bd):
    """fwd -> inv without quant must reproduce residual (near-)exactly."""
    h, w = shape
    maxv = (1 << bd) - 1
    x = rng.integers(-maxv, maxv + 1, size=(4, h, w)).astype(np.int32)
    c = transforms.forward_transform(jnp.asarray(x), bit_depth=bd)
    r = transforms.inverse_transform(c, bit_depth=bd)
    err = np.abs(np.asarray(r) - x)
    # Integer transforms are not lossless (true of VTM too — lossless coding
    # uses transform skip); per-stage rounding noise grows ~sqrt(N).  This is
    # a regression canary, not an exactness oracle.
    scale = 1 << (bd - 8)   # coeff dynamic range is fixed at 15 bits
    assert err.max() <= 8 * scale, (shape, bd, err.max())
    assert float(np.sqrt(np.mean(err.astype(np.float64) ** 2))) <= 2.0 * scale


@pytest.mark.parametrize("qp", [22, 27, 32, 37])
@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (8, 16), (4, 8)])
def test_quant_roundtrip_error_bounded(rng, qp, shape, qp_scale=1.0):
    h, w = shape
    x = rng.integers(-255, 256, size=(8, h, w)).astype(np.int32)
    lw, lh = w.bit_length() - 1, h.bit_length() - 1
    c = transforms.forward_transform(jnp.asarray(x))
    lvl = quant.quantize(c, qp, lw, lh)
    dq = quant.dequantize(lvl, qp, lw, lh)
    r = transforms.inverse_transform(dq)
    rmse = float(np.sqrt(np.mean((np.asarray(r) - x) ** 2)))
    # quantization noise ~ qstep/sqrt(12); allow 1.2x slack
    assert rmse <= quant.qstep(qp) * 0.5 + 2.0, (qp, shape, rmse)


@pytest.mark.parametrize("trt", [rom.DST7, rom.DCT8])
def test_mts_roundtrip(rng, trt):
    x = rng.integers(-255, 256, size=(4, 8, 8)).astype(np.int32)
    c = transforms.forward_transform(jnp.asarray(x), tr_h=trt, tr_v=trt)
    r = transforms.inverse_transform(c, tr_h=trt, tr_v=trt)
    assert np.abs(np.asarray(r) - x).max() <= 6


def test_dequant_is_deterministic_int(rng):
    """Decoder-side dequant must be pure int -> bit-exact across platforms."""
    lvl = rng.integers(-50, 51, size=(2, 8, 8)).astype(np.int32)
    a = np.asarray(quant.dequantize(jnp.asarray(lvl), 30, 3, 3))
    b = np.asarray(quant.dequantize(jnp.asarray(lvl), 30, 3, 3))
    assert np.array_equal(a, b)
