"""Device-mesh sharding for the codec (the TPU answer to §2.8 of SURVEY.md).

The reference is single-threaded; its parallelism is *bitstream-structural*
(tiles / WPP / chunked encode + Parcat, reference: EncSlice.cpp:2024-2113,
App/Parcat/parcat.cpp:393-427).  The TPU mapping implemented here:

  * "gop"  mesh axis — frame-level parallelism: independent pictures (all-
    intra today, hierarchical-B frame groups next) are encoded concurrently,
    one per mesh slot.  This is the Parcat / chunked-encode analog and is the
    dominant axis for throughput.
  * "tile" mesh axis — intra-frame block parallelism: every wavefront step
    processes a batch of independent blocks; that lane dimension is sharded
    so one frame's work spreads across chips (CTU-tile analog).

Entropy coding stays host-side per substream and concatenates
deterministically (Parcat pattern), so sharding never touches bitstream
determinism.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common import wavefront


def make_mesh(n_devices: int | None = None) -> Mesh:
    """Factor the device list into a ("gop", "tile") mesh.

    The gop axis gets the larger factor (frame parallelism scales
    near-linearly; tile parallelism is bounded by wavefront width)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    tile = 1
    for t in (2,):
        if n % t == 0 and n // t >= 2:
            tile = t
    gop = n // tile
    mesh_devs = np.asarray(devs).reshape(gop, tile)
    return Mesh(mesh_devs, axis_names=("gop", "tile"))


@functools.partial(jax.jit, static_argnames=("block_size", "qp", "bit_depth"))
def _encode_batch(ys: jnp.ndarray, us: jnp.ndarray, vs: jnp.ndarray,
                  qp: int, block_size: int, bit_depth: int):
    f = functools.partial(wavefront.encode_intra_frame, qp=qp,
                          block_size=block_size, bit_depth=bit_depth)
    return jax.vmap(f)(ys, us, vs)


def encode_p_frame_sharded(orig: list[np.ndarray], ref: list[np.ndarray],
                           qp: int, mesh: Mesh, block_size: int = 16,
                           bit_depth: int = 8, search_range: int = 24,
                           wrap_around: bool = False):
    """Spatially-sharded P-frame encode: the current picture's rows are
    sharded over the whole mesh, the reference picture is replicated (the
    'reference-plane all-gather' strategy of SURVEY.md §2.9 — motion search
    reads +-search_range anywhere, so each shard holds the full ref while
    source pixels, residual transforms and reconstruction stay local to
    the shard; XLA inserts the collectives for the frame-level reductions).

    Returns (mvs, lev_y, lev_u, lev_v, recon) like inter_frame.encode_p_frame.
    """
    from ..common import inter_frame

    row_shard = NamedSharding(mesh, P(("gop", "tile"), None))
    repl = NamedSharding(mesh, P())
    oy = jax.device_put(jnp.asarray(orig[0]), row_shard)
    ou = jax.device_put(jnp.asarray(orig[1]), row_shard)
    ov = jax.device_put(jnp.asarray(orig[2]), row_shard)
    ry = jax.device_put(jnp.asarray(ref[0]), repl)
    ru = jax.device_put(jnp.asarray(ref[1]), repl)
    rv = jax.device_put(jnp.asarray(ref[2]), repl)
    return inter_frame.encode_p_frame(oy, ou, ov, ry, ru, rv, qp,
                                      block_size, bit_depth, search_range,
                                      wrap_around)


def encode_frames_sharded(frames: list[list[np.ndarray]], qp: int,
                          mesh: Mesh, block_size: int = 8,
                          bit_depth: int = 8):
    """Encode a batch of frames with the leading (frame) axis sharded over
    the full mesh.  Returns (outs, recon) with leading frame axis.

    The frame count must be a multiple of the mesh size (pad at call site
    with repeated frames if needed)."""
    ys = jnp.asarray(np.stack([f[0] for f in frames]))
    us = jnp.asarray(np.stack([f[1] for f in frames]))
    vs = jnp.asarray(np.stack([f[2] for f in frames]))
    sh = NamedSharding(mesh, P(("gop", "tile"), None, None))
    ys, us, vs = (jax.device_put(a, sh) for a in (ys, us, vs))
    return _encode_batch(ys, us, vs, qp, block_size, bit_depth)


def encode_b_frame_sharded(orig: list[np.ndarray], ref0: list[np.ndarray],
                           ref1: list[np.ndarray], qp: int, mesh: Mesh,
                           block_size: int = 16, bit_depth: int = 8,
                           search_range: int = 24,
                           wrap_around: bool = False):
    """Spatially-sharded B-frame encode: current picture rows sharded over
    the whole mesh, BOTH reference pictures replicated (each shard's
    bilateral search reads anywhere in either ref).  Returns
    (mv0, mv1, dirs, (lev_y, lev_u, lev_v), recon)."""
    from ..common import inter_frame

    row_shard = NamedSharding(mesh, P(("gop", "tile"), None))
    repl = NamedSharding(mesh, P())
    oy, ou, ov = (jax.device_put(jnp.asarray(p), row_shard) for p in orig)
    r0 = tuple(jax.device_put(jnp.asarray(p), repl) for p in ref0)
    r1 = tuple(jax.device_put(jnp.asarray(p), repl) for p in ref1)
    mv0, mv1, dirs, gpm_modes = inter_frame.search_b_frame(
        oy, r0[0], r1[0], qp, block_size, bit_depth, search_range,
        wrap_around)
    ly, lu, lv, recon = inter_frame.bpred_and_residual(
        oy, ou, ov, r0, r1, mv0, mv1, dirs, qp, block_size, bit_depth,
        wrap_around)
    return mv0, mv1, dirs, (ly, lu, lv), recon


def encode_p_frame_sharded_ref(orig: list[np.ndarray],
                               ref: list[np.ndarray], qp: int, mesh: Mesh,
                               block_size: int = 16, bit_depth: int = 8,
                               search_range: int = 8,
                               wrap_around: bool = False,
                               halo: int | None = None):
    """Row-sharded P encode with a ROW-SHARDED reference plane and halo
    exchange — the 6K/multi-host memory-scaling pattern (SURVEY.md §2.9:
    per-shard ref tiles + boundary exchange instead of replication;
    reference data layout: Picture.cpp:94 wrap buffer).

    Each shard holds only its row slab of the DPB; jax.lax.ppermute
    exchanges `halo` reference rows with the neighboring shards (the ICI
    collective on hardware), sized to cover the motion search
    (search_range + fractional + filter taps).  ERP wrap-around stays a
    LOCAL x-axis operation because the sharded axis is y.  Frame-edge
    shards edge-replicate, matching pad_ref, so the kept rows are
    BIT-EXACT with the unsharded encode (tests/test_sharding.py).

    Returns (mvs, lev_y, lev_u, lev_v, recon dict) with global shapes.
    """
    from jax.experimental.shard_map import shard_map

    from ..common import inter_frame

    devs = mesh.devices.reshape(-1)
    n = devs.size
    m1 = Mesh(devs, ("rows",))
    h, w = orig[0].shape
    hs = h // n
    if halo is None:
        halo = block_size * (-(-(search_range + 8) // block_size))
    assert halo % block_size == 0 and halo <= hs and hs % block_size == 0
    hc = halo // 2
    s = block_size

    def body(oy, ou, ov, ry, ru, rv):
        i = jax.lax.axis_index("rows")
        fwd = [(j, j + 1) for j in range(n - 1)]
        bwd = [(j + 1, j) for j in range(n - 1)]

        def haloed(r_l, hl):
            # top halo = bottom rows of the shard above; bottom halo =
            # top rows of the shard below; frame edges replicate (same
            # values pad_ref would produce in the unsharded encode)
            dn = jax.lax.ppermute(r_l[-hl:], "rows", fwd)
            up = jax.lax.ppermute(r_l[:hl], "rows", bwd)
            top = jnp.where(i == 0, jnp.repeat(r_l[:1], hl, 0), dn)
            bot = jnp.where(i == n - 1, jnp.repeat(r_l[-1:], hl, 0), up)
            return jnp.concatenate([top, r_l, bot], axis=0)

        def ext(o_l, hl):
            # halo rows of the CURRENT picture are never kept — extend
            # with edge rows so shapes line up
            return jnp.concatenate([jnp.repeat(o_l[:1], hl, 0), o_l,
                                    jnp.repeat(o_l[-1:], hl, 0)], axis=0)

        out = inter_frame.encode_p_frame(
            ext(oy, halo), ext(ou, hc), ext(ov, hc), haloed(ry, halo),
            haloed(ru, hc), haloed(rv, hc), qp, s, bit_depth,
            search_range, wrap_around)
        mvs, ly, lu, lv, recon = out
        hb = halo // s
        return (mvs[hb:-hb], ly[hb:-hb], lu[hb:-hb], lv[hb:-hb],
                recon["y"][halo:-halo], recon["u"][hc:-hc],
                recon["v"][hc:-hc])

    fn = shard_map(
        body, mesh=m1,
        in_specs=(P("rows", None),) * 6,
        out_specs=(P("rows", None, None), P("rows", None, None, None),
                   P("rows", None, None, None),
                   P("rows", None, None, None), P("rows", None),
                   P("rows", None), P("rows", None)))
    row_shard = NamedSharding(m1, P("rows", None))
    args = [jax.device_put(jnp.asarray(p), row_shard)
            for p in (*orig, *ref)]
    mvs, ly, lu, lv, ry2, ru2, rv2 = jax.jit(fn)(*args)
    return mvs, ly, lu, lv, dict(y=ry2, u=ru2, v=rv2)


def encode_p_frame_mm_sharded(reproj, active_models: list[int],
                              orig: list[np.ndarray],
                              ref: list[np.ndarray], qp: int, mesh: Mesh,
                              block_size: int = 16, bit_depth: int = 8,
                              search_range: int = 24,
                              wrap_around: bool = False):
    """Spatially-sharded multi-model P encode: rows of the current picture
    sharded, reference replicated; the per-model reprojection +
    position-MC programs partition over the row axis (XLA inserts the
    collectives).  Returns (model_idx, mvs_stack, levels, recon)."""
    from ..common.mm import frame_codec as mm_codec

    row_shard = NamedSharding(mesh, P(("gop", "tile"), None))
    repl = NamedSharding(mesh, P())
    oy, ou, ov = (jax.device_put(jnp.asarray(p), row_shard) for p in orig)
    ry, ru, rv = (jax.device_put(jnp.asarray(p), repl) for p in ref)
    model_idx, mvs_stack = mm_codec.search_p_mm(
        reproj, active_models, oy, ry, qp, block_size, bit_depth,
        search_range, None, wrap_around)
    positions = mm_codec.merged_positions(reproj, active_models, model_idx,
                                          mvs_stack, block_size, None)
    ly, lu, lv, recon = mm_codec.enc_finish_p_mm(
        model_idx, mvs_stack, positions, oy, ou, ov, ry, ru, rv, qp,
        block_size, bit_depth, wrap_around, True)
    return model_idx, mvs_stack, (ly, lu, lv), recon
