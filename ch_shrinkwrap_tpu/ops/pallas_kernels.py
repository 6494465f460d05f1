"""Pallas TPU kernels for the correspondence hot path.

The windowed nearest-face pass dominates each solver iteration
(BASELINE.md round-1 profile).  This kernel implements it natively:
each grid program owns 8 point blocks (to satisfy Mosaic's (8, 128)
block-shape tiling); the face table lives in HBM packed as an
(8, Fp) array — rows x, y, z, |c|^2 (+ padding rows) so a window is
one (8, W) DMA with a 128-aligned dynamic lane start; the (B x W)
distance tile is one MXU matmul (|p-c|^2 = |c|^2 - 2 p.c up to the
per-point |p|^2 constant) and the running (min, argmin) across anchors
stays on-chip.  Mosaic also compiles this orders of magnitude faster
than the equivalent XLA fusion, which matters behind the slow
remote-compile service (BASELINE.md).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCKS_PER_PROGRAM = 8

# experiment gate: single-sweep (min, argmin) via an order-preserving
# int32 key with the lane index packed into the low bits (read at
# trace time; set before process start)
_PACKED_SWEEP = os.environ.get('CSW_PACKED_SWEEP', '') not in ('', '0')


def _packed_min_argmin(d2):
    """One min-reduction (min, argmin) over the lane axis.

    jnp.min + jnp.argmin emit two full reduction sweeps over the
    (B, ncand) tile — the measured bound of the correspondence kernel.
    This packs the lane index into the low bits of an order-preserving
    int32 image of the f32 distances (IEEE-754 totally ordered via
    ``bits ^ ((bits>>31) & 0x7fffffff)``) and takes ONE int min; the
    decoded distance is quantized down by <= 2^nbits ulps (~1e-3
    relative at ncand=8192), far inside the correspondence tolerance
    (the fit is insensitive to brute-vs-windowed argmin differences),
    and ties resolve to the smallest lane exactly like argmin.
    """
    ncand = d2.shape[1]
    nbits = max(1, (ncand - 1).bit_length())
    mask = jnp.int32((1 << nbits) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
    flip = jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(bits, 31), 1)
    mono = bits ^ flip
    key = (mono & ~mask) | lane
    kmin = jnp.min(key, axis=1)
    j = kmin & mask
    mono_min = kmin ^ j
    flip_min = jax.lax.shift_right_logical(
        jax.lax.shift_right_arithmetic(mono_min, 31), 1)
    dmin = jax.lax.bitcast_convert_type(mono_min ^ flip_min,
                                        jnp.float32)
    return dmin, j.astype(jnp.int32)


def _window_kernel(starts_ref,            # (nb_pad*A,) scalar prefetch
                   pts_ref,               # (BP, 3, B) VMEM
                   cents8_ref,            # (8, Fp) HBM
                   subs8_ref,             # (8, nsub) VMEM: packed
                                          # subsample [x;y;z;c2;id;...]
                   dout_ref,              # (BP, B) VMEM
                   iout_ref,              # (BP, B) VMEM
                   jout_ref,              # (BP, B) VMEM subsample slot
                   cw_scratch,            # (2, 8, A*W + nsub) VMEM:
                                          # per-slot concatenated
                                          # anchor windows + subsample
                   sems,                  # (2, A) DMA semaphores
                   *, n_anchors, window):
    i = pl.program_id(0)
    BP = BLOCKS_PER_PROGRAM
    A = n_anchors
    W = window
    nsub = subs8_ref.shape[1]

    def start_dmas(b, slot):
        # all A anchor windows of block b into one concatenated tile
        for a in range(A):
            s0 = pl.multiple_of(
                starts_ref[(i * BP + b) * A + a], 128)
            pltpu.make_async_copy(
                cents8_ref.at[:, pl.ds(s0, W)],
                cw_scratch.at[slot, :, a * W:(a + 1) * W],
                sems.at[slot, a]).start()

    def wait_dmas(b, slot):
        for a in range(A):
            s0 = pl.multiple_of(
                starts_ref[(i * BP + b) * A + a], 128)
            pltpu.make_async_copy(
                cents8_ref.at[:, pl.ds(s0, W)],
                cw_scratch.at[slot, :, a * W:(a + 1) * W],
                sems.at[slot, a]).wait()

    # the subsample tile rides the tail of both slots
    cw_scratch[0, :, A * W:] = subs8_ref[...]
    cw_scratch[1, :, A * W:] = subs8_ref[...]
    start_dmas(0, 0)

    for b in range(BLOCKS_PER_PROGRAM):
        slot = b % 2
        if b + 1 < BLOCKS_PER_PROGRAM:
            start_dmas(b + 1, (b + 1) % 2)
        wait_dmas(b, slot)

        pts = pts_ref[b]                  # (3, B)
        B = pts.shape[1]

        # ONE distance tile + ONE (min, argmin) sweep over the
        # concatenated [anchor windows | subsample] candidates —
        # reduction-pass setup costs amortize 4x vs per-source sweeps
        cw = cw_scratch[slot, 0:3, :]                 # (3, AW+nsub)
        c2 = cw_scratch[slot, 3:4, :]                 # (1, AW+nsub)
        d2 = c2 - 2.0 * jax.lax.dot_general(
            pts, cw,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (B, AW+nsub)
        if _PACKED_SWEEP:
            dmin, j = _packed_min_argmin(d2)
        else:
            j = jnp.argmin(d2, axis=1).astype(jnp.int32)  # (B,)
            dmin = jnp.min(d2, axis=1)                    # (B,)

        # map the concatenated column back to a global face id
        anc = j // W                                  # A = sub region
        jw = j - anc * W
        fid_win = jw
        for a in range(A):
            s0 = starts_ref[(i * BP + b) * A + a]
            fid_win = fid_win + s0 * (anc == a).astype(jnp.int32)
        is_sub = j >= A * W
        js = jnp.clip(j - A * W, 0, nsub - 1)
        # winning subsample face id via a one-hot matmul over row 4
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, nsub), 1)
        onehot = (lane == js[:, None]).astype(jnp.float32)
        sub_fid = jax.lax.dot_general(
            onehot, subs8_ref[4:5, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0].astype(jnp.int32)
        fid = jnp.where(is_sub, sub_fid, fid_win)

        dout_ref[b, :] = dmin
        iout_ref[b, :] = fid
        # subsample slot per point: lets the caller route the rare
        # not-in-any-window winners in windowed_segment_sum without
        # inverting the subsample hash (only consulted for rows whose
        # winner is not inside any of the block's windows — exactly
        # the rows where the subsample region won the argmin)
        jout_ref[b, :] = js


def _window_fv_kernel(starts_ref,          # (nb_pad*A,) scalar prefetch
                      pts_ref,             # (BP, 3, B) VMEM
                      cents16_ref,         # (16, Fp) HBM: [x;y;z;c2;
                                           #  tri 9 rows; pad]
                      subs16_ref,          # (16, nsub) VMEM: same + id
                      dout_ref,            # (BP, B) VMEM
                      iout_ref,            # (BP, B) VMEM
                      jout_ref,            # (BP, B) VMEM subsample slot
                      wout_ref,            # (BP, 3, B) corner weights
                      afout_ref,           # (BP, 3, B) forward map
                      cw_scratch,          # (2, 16, A*W + nsub) VMEM
                      sems,                # (2, A) DMA semaphores
                      *, n_anchors, window):
    """window_min + in-kernel winner extraction: the winning face's 3
    corner positions are pulled from the SAME VMEM windows via one-hot
    MXU matmuls, and the inverse-corner-distance weights w and forward
    map Af = sum_j w_j fv_j are computed on-chip.  Eliminates the
    (N, 9)-from-(3Fp)-row XLA gather that sits on the >300k-row cache
    cliff (~79 ms/iter at 656k padded verts, the largest remaining op
    there).  Counterpart of the reference's per-point corner weights
    (mesh_conj_grad.py:460-ichunked calc_w)."""
    i = pl.program_id(0)
    BP = BLOCKS_PER_PROGRAM
    A = n_anchors
    W = window
    nsub = subs16_ref.shape[1]

    def start_dmas(b, slot):
        for a in range(A):
            s0 = pl.multiple_of(
                starts_ref[(i * BP + b) * A + a], 128)
            pltpu.make_async_copy(
                cents16_ref.at[:, pl.ds(s0, W)],
                cw_scratch.at[slot, :, a * W:(a + 1) * W],
                sems.at[slot, a]).start()

    def wait_dmas(b, slot):
        for a in range(A):
            s0 = pl.multiple_of(
                starts_ref[(i * BP + b) * A + a], 128)
            pltpu.make_async_copy(
                cents16_ref.at[:, pl.ds(s0, W)],
                cw_scratch.at[slot, :, a * W:(a + 1) * W],
                sems.at[slot, a]).wait()

    cw_scratch[0, :, A * W:] = subs16_ref[...]
    cw_scratch[1, :, A * W:] = subs16_ref[...]
    start_dmas(0, 0)

    for b in range(BLOCKS_PER_PROGRAM):
        slot = b % 2
        if b + 1 < BLOCKS_PER_PROGRAM:
            start_dmas(b + 1, (b + 1) % 2)
        wait_dmas(b, slot)

        pts = pts_ref[b]                  # (3, B)
        B = pts.shape[1]

        cw = cw_scratch[slot, 0:3, :]                 # (3, AW+nsub)
        c2 = cw_scratch[slot, 3:4, :]                 # (1, AW+nsub)
        d2 = c2 - 2.0 * jax.lax.dot_general(
            pts, cw,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (B, AW+nsub)
        if _PACKED_SWEEP:
            dmin, j = _packed_min_argmin(d2)
        else:
            j = jnp.argmin(d2, axis=1).astype(jnp.int32)  # (B,)
            dmin = jnp.min(d2, axis=1)                    # (B,)

        anc = j // W
        jw = j - anc * W
        fid_win = jw
        for a in range(A):
            s0 = starts_ref[(i * BP + b) * A + a]
            fid_win = fid_win + s0 * (anc == a).astype(jnp.int32)
        is_sub = j >= A * W
        js = jnp.clip(j - A * W, 0, nsub - 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, nsub), 1)
        onehot = (lane == js[:, None]).astype(jnp.float32)
        sub_fid = jax.lax.dot_general(
            onehot, subs16_ref[4:5, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0].astype(jnp.int32)
        fid = jnp.where(is_sub, sub_fid, fid_win)

        # winner corner extraction: per region, a one-hot matmul pulls
        # the 9 tri rows of the winning column.  j - a*W lands in
        # [0, W) only for the region that won, so exactly one region
        # contributes (window overlaps resolve to the argmin column).
        # HIGHEST precision: the one-hot matmul must reproduce the
        # f32 coordinates (single-pass bf16 would quantize ~500 nm
        # coords to ~2 nm steps).
        fv = jnp.zeros((9, B), jnp.float32)
        for a in range(A):
            jw_a = j - a * W                          # (B,)
            lane_w = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            oh = (lane_w == jw_a[:, None]).astype(jnp.float32)
            tri_w = cw_scratch[slot, 4:13, a * W:(a + 1) * W]
            fv = fv + jax.lax.dot_general(
                tri_w, oh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)   # (9, B)
        js_off = j - A * W
        oh_s = (lane == js_off[:, None]).astype(jnp.float32)
        fv = fv + jax.lax.dot_general(
            subs16_ref[5:14, :], oh_s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

        # corner weights + forward map (mesh_conj_grad.py calc_w):
        # w_j = 1/max(|fv_j - p|, 1e-6), normalized over the 3 corners
        ws = []
        for c in range(3):
            dxyz = fv[3 * c:3 * c + 3, :] - pts       # (3, B)
            d2c = (dxyz * dxyz).sum(0, keepdims=True)  # (1, B)
            ws.append(1.0 / jnp.maximum(jnp.sqrt(d2c), 1e-6))
        wsum = ws[0] + ws[1] + ws[2]
        af = jnp.zeros((3, B), jnp.float32)
        wrows = []
        for c in range(3):
            wn = ws[c] / wsum                          # (1, B)
            wrows.append(wn)
            af = af + wn * fv[3 * c:3 * c + 3, :]
        dout_ref[b, :] = dmin
        iout_ref[b, :] = fid
        jout_ref[b, :] = js
        wout_ref[b] = jnp.concatenate(wrows, axis=0)   # (3, B)
        afout_ref[b] = af


@partial(jax.jit, static_argnames=('window', 'n_anchors', 'interpret'))
def window_min_fv_pallas(blocks_t, starts, centers_t, c2, tri9_t,
                         sub_ids, window=4096, n_anchors=3,
                         interpret=False):
    """``window_min_pallas`` + in-kernel winner-corner extraction.

    tri9_t : (9, Fp) f32 — transposed corner positions (x0 y0 z0 x1 ..
        z2 rows), same Hilbert face order as ``centers_t``.
    Returns (d2_nop2 (nb, B), fid (nb, B) i32, js (nb, B) i32,
    w (nb, 3, B) f32 normalized corner weights,
    af (nb, 3, B) f32 forward map); caller adds |p|^2 to d2 and
    re-layouts w/af to (N, 3).
    """
    nb, _, B = blocks_t.shape
    Fp = centers_t.shape[1]
    BP = BLOCKS_PER_PROGRAM
    n_prog = -(-nb // BP)
    nb_pad = n_prog * BP
    if nb_pad != nb:
        blocks_t = jnp.concatenate(
            [blocks_t, jnp.zeros((nb_pad - nb, 3, B), blocks_t.dtype)])
        starts = jnp.concatenate(
            [starts, jnp.zeros((nb_pad - nb, starts.shape[1]),
                               starts.dtype)])

    Fp_al = -(-Fp // 128) * 128
    cents16 = jnp.zeros((16, Fp_al), jnp.float32)
    cents16 = cents16.at[0:3, :Fp].set(centers_t)
    cents16 = cents16.at[3, :Fp].set(c2)
    cents16 = cents16.at[3, Fp:].set(3.4e38)
    cents16 = cents16.at[4:13, :Fp].set(tri9_t)

    nsub = sub_ids.shape[0]
    nsub_al = -(-nsub // 128) * 128
    subs16 = jnp.zeros((16, nsub_al), jnp.float32)
    subs16 = subs16.at[0:3, :nsub].set(centers_t[:, sub_ids])
    subs16 = subs16.at[3, :nsub].set(c2[sub_ids])
    subs16 = subs16.at[3, nsub:].set(3.4e38)
    subs16 = subs16.at[4, :nsub].set(sub_ids.astype(jnp.float32))
    subs16 = subs16.at[5:14, :nsub].set(tri9_t[:, sub_ids])

    starts = jnp.clip((starts // 128) * 128, 0,
                      max(Fp_al - window, 0)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((BP, 3, B), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BP, B), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, B), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, B), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 3, B), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 3, B), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, n_anchors * window + nsub_al),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_anchors)),
        ],
    )

    kernel = partial(_window_fv_kernel, n_anchors=n_anchors,
                     window=window)
    d2, fid, js, w3, af3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb_pad, B), jnp.float32),
                   jax.ShapeDtypeStruct((nb_pad, B), jnp.int32),
                   jax.ShapeDtypeStruct((nb_pad, B), jnp.int32),
                   jax.ShapeDtypeStruct((nb_pad, 3, B), jnp.float32),
                   jax.ShapeDtypeStruct((nb_pad, 3, B), jnp.float32)],
        interpret=interpret,
    )(starts.reshape(-1), blocks_t, cents16, subs16)
    return d2[:nb], fid[:nb], js[:nb], w3[:nb], af3[:nb]


@partial(jax.jit, static_argnames=('window', 'n_anchors', 'interpret'))
def window_min_pallas(blocks_t, starts, centers_t, c2, sub_ids,
                      window=4096, n_anchors=3, interpret=False):
    """Per-block windowed (min |p-c|^2 - |p|^2, argmin face id),
    merged with a brute pass over the ``sub_ids`` face subsample (the
    far-point fallback) inside the kernel.

    blocks_t : (nb, 3, B) f32 — transposed point blocks
    starts : (nb, A) i32 — window start indices; rounded down to 128
        multiples here (DMA lane-offset alignment)
    centers_t : (3, Fp) f32 — transposed face centers (Hilbert order)
    c2 : (Fp,) f32 — |c|^2 with BIG on invalid faces
    sub_ids : (nsub,) i32 — hashed-subsample face indices
    Returns (d2_nop2 (nb, B), fid (nb, B) i32, js (nb, B) i32 —
    the subsample argmin slot per point); caller adds |p|^2.
    """
    nb, _, B = blocks_t.shape
    Fp = centers_t.shape[1]
    BP = BLOCKS_PER_PROGRAM
    n_prog = -(-nb // BP)
    nb_pad = n_prog * BP
    if nb_pad != nb:
        blocks_t = jnp.concatenate(
            [blocks_t, jnp.zeros((nb_pad - nb, 3, B), blocks_t.dtype)])
        starts = jnp.concatenate(
            [starts, jnp.zeros((nb_pad - nb, starts.shape[1]),
                               starts.dtype)])

    # pack [x; y; z; |c|^2; 0...] as (8, Fp_aligned)
    Fp_al = -(-Fp // 128) * 128
    cents8 = jnp.zeros((8, Fp_al), jnp.float32)
    cents8 = cents8.at[0:3, :Fp].set(centers_t)
    cents8 = cents8.at[3, :Fp].set(c2)
    cents8 = cents8.at[3, Fp:].set(3.4e38)

    # packed subsample table [x; y; z; |c|^2; face id; 0...]
    nsub = sub_ids.shape[0]
    nsub_al = -(-nsub // 128) * 128
    subs8 = jnp.full((8, nsub_al), 0.0, jnp.float32)
    subs8 = subs8.at[0:3, :nsub].set(centers_t[:, sub_ids])
    subs8 = subs8.at[3, :nsub].set(c2[sub_ids])
    subs8 = subs8.at[3, nsub:].set(3.4e38)
    subs8 = subs8.at[4, :nsub].set(sub_ids.astype(jnp.float32))

    starts = jnp.clip((starts // 128) * 128, 0,
                      max(Fp_al - window, 0)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((BP, 3, B), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BP, B), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, B), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, B), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, n_anchors * window + nsub_al),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_anchors)),
        ],
    )

    kernel = partial(_window_kernel, n_anchors=n_anchors, window=window)
    d2, fid, js = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb_pad, B), jnp.float32),
                   jax.ShapeDtypeStruct((nb_pad, B), jnp.int32),
                   jax.ShapeDtypeStruct((nb_pad, B), jnp.int32)],
        interpret=interpret,
    )(starts.reshape(-1), blocks_t, cents8, subs8)
    return d2[:nb], fid[:nb], js[:nb]
