"""Distortion / cost kernels: SSE, SAD, Hadamard SATD — batched.

TPU-native analog of the reference RdCost (reference:
source/Lib/CommonLib/RdCost.cpp — xGetSAD/xGetSSE/xGetHADs with SIMD
dispatch, RdCost.h:182-185 setDistParam).  All functions take batches and
reduce on the VPU/MXU; the Hadamard is two ±1 matrix multiplies (MXU-able).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def hadamard_matrix(n: int) -> np.ndarray:
    assert n & (n - 1) == 0
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared error over trailing 2 dims."""
    d = (a - b).astype(jnp.int32)
    return jnp.sum(d * d, axis=(-2, -1))


def sad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(a - b), axis=(-2, -1))


def satd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hadamard SATD over trailing (h, w) dims (any leading batch dims).

    Scaled to be SAD-comparable: sum|H_h D H_w^T| / (2*sqrt(h*w)) approx ->
    we use >> (log2(h)+log2(w)+2)//2 + 1 ... concretely /(2*sqrt(hw)) via
    integer shift (h, w powers of two)."""
    h, w = a.shape[-2], a.shape[-1]
    hh = jnp.asarray(hadamard_matrix(h))
    hw = jnp.asarray(hadamard_matrix(w))
    d = (a - b).astype(jnp.int32)
    t = jnp.einsum("...hw,kh->...kw", d, hh, preferred_element_type=jnp.int32)
    t = jnp.einsum("...kw,lw->...kl", t, hw, preferred_element_type=jnp.int32)
    shift = (h.bit_length() - 1 + w.bit_length() - 1 + 2) // 2
    return jnp.sum(jnp.abs(t), axis=(-2, -1)) >> shift
