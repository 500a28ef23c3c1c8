"""Intra prediction unit tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from vvc_mm_tpu.common import intra


def make_cref(h, w, left, top, corner_val):
    """Build combined ref vector from left[j], top[k] arrays."""
    c = np.zeros(2 * (h + w) + 1, dtype=np.int32)
    corner = h + w
    c[corner] = corner_val
    for j in range(h + w):
        c[corner - 1 - j] = left[j]
    for k in range(h + w):
        c[corner + 1 + k] = top[k]
    return c


@pytest.mark.parametrize("h,w", [(4, 4), (8, 8), (4, 8), (16, 16)])
def test_pure_vertical_copies_top(rng, h, w):
    left = rng.integers(0, 256, h + w)
    top = rng.integers(0, 256, h + w)
    c = make_cref(h, w, left, top, 128)
    pred = np.asarray(intra.predict_all_modes(jnp.asarray(c[None]), h, w))[0]
    # mode 50 = vertical (angle 0): every row equals the top reference row
    for y in range(h):
        assert np.array_equal(pred[50, y], top[:w]), y


@pytest.mark.parametrize("h,w", [(4, 4), (8, 8)])
def test_pure_horizontal_copies_left(rng, h, w):
    left = rng.integers(0, 256, h + w)
    top = rng.integers(0, 256, h + w)
    c = make_cref(h, w, left, top, 128)
    pred = np.asarray(intra.predict_all_modes(jnp.asarray(c[None]), h, w))[0]
    for x in range(w):
        assert np.array_equal(pred[18, :, x], left[:h]), x


def test_diag_mode34(rng):
    h = w = 4
    left = rng.integers(0, 256, h + w)
    top = rng.integers(0, 256, h + w)
    corner = 77
    c = make_cref(h, w, left, top, corner)
    pred = np.asarray(intra.predict_all_modes(jnp.asarray(c[None]), h, w))[0]
    # mode 34: 45-degree up-left diagonal; sample (1,1) <- corner,
    # sample (0,0) <- corner as well? No: (0,0) <- main ref at p=-1 = corner.
    assert pred[34, 0, 0] == corner
    assert pred[34, 1, 1] == corner
    # (0,1) takes top[0]
    assert pred[34, 0, 1] == top[0]
    # (1,0) takes left[0]
    assert pred[34, 1, 0] == left[0]


def test_dc_flat_block():
    h = w = 8
    left = np.full(h + w, 100)
    top = np.full(h + w, 100)
    c = make_cref(h, w, left, top, 100)
    pred = np.asarray(intra.predict_all_modes(jnp.asarray(c[None]), h, w))[0]
    # all modes of a flat reference predict flat 100
    assert np.all(pred == 100)


def test_planar_gradient():
    h = w = 8
    # linear ramp references -> planar reproduces the ramp closely
    top = np.arange(h + w) * 4 + 10
    left = np.arange(h + w) * 2 + 10
    c = make_cref(h, w, left, top, 10)
    pred = np.asarray(intra.predict_all_modes(jnp.asarray(c[None]), h, w))[0]
    p = pred[0]
    assert p[0, 0] >= 10 and p.max() <= top.max()
    # monotone along rows and columns
    assert np.all(np.diff(p[0]) >= 0) and np.all(np.diff(p[:, 0]) >= 0)


def test_predict_mode_matches_all_modes(rng):
    h = w = 8
    B = 5
    cref = rng.integers(0, 256, (B, 2 * (h + w) + 1)).astype(np.int32)
    modes = rng.integers(0, 67, B).astype(np.int32)
    allp = np.asarray(intra.predict_all_modes(jnp.asarray(cref), h, w))
    one = np.asarray(intra.predict_mode(jnp.asarray(cref),
                                        jnp.asarray(modes), h, w))
    for b in range(B):
        assert np.array_equal(one[b], allp[b, modes[b]])


def test_all_modes_within_ref_range(rng):
    h = w = 8
    cref = rng.integers(50, 200, (3, 2 * (h + w) + 1)).astype(np.int32)
    pred = np.asarray(intra.predict_all_modes(jnp.asarray(cref), h, w))
    assert pred.min() >= 40 and pred.max() <= 210
