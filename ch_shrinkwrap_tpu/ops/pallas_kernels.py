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

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCKS_PER_PROGRAM = 8
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
        j = jnp.argmin(d2, axis=1).astype(jnp.int32)      # (B,)
        dmin = jnp.min(d2, axis=1)                        # (B,)

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
