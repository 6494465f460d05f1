"""Pallas TPU kernel: windowed segment-sum (the A^T accumulation).

XLA TPU scatters run at ~0.5 GB/s at 1M rows, and the XLA scan
formulation of the windowed accumulation
(correspondence.windowed_segment_sum) pays ~11 us of op-dispatch
overhead per point block (BASELINE.md round-1 profile).  This kernel
does the same exact accumulation natively:

- every (point-block, anchor) pair is one *step* whose contributions
  land inside the contiguous 128-aligned face window [s0, s0 + W);
  the per-block subsample-fallback rows form one extra step per block
  targeting a virtual window appended after the face axis;
- steps are processed sorted by s0, so the target region only moves
  forward; a VMEM ring of RING_CHUNKS (C, 128)-chunks accumulates
  in place and flushes its oldest half to HBM with plain DMA writes
  (every output chunk is written exactly once) whenever the region
  advances past the ring — ~20 flushes per call in total;
- per step, the (B,) in-window offsets expand through a factorized
  hi/lo one-hot: two constant 0/1 matmuls build
  T1[b, h*C + c] = hi[b, h] * val[b, c] on the MXU and
  part = T1^T @ lo lands directly in (Wh, C, 128) chunk layout —
  no (B, W) one-hot on the VPU and no lane-dynamic indexing anywhere.

Replaces the reference's conj_grad_utils.c A^T CSR loop
(/root/reference/ch_shrinkwrap/conj_grad_utils.c) on the TPU path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS_PER_PROGRAM = 16
RING_CHUNKS = 256          # ring capacity in 128-face chunks
FLUSH_CHUNKS = 128         # flush granularity (half the ring)
FID_COL = 12               # f32 column carrying the winner face id
JS_COL = 13                # f32 column carrying the subsample slot


def _scatter_kernel(seq_ref,         # (steps*3,) prefetch [s0, blk, a]
                    starts_ref,      # ((nb+1)*A,) prefetch
                    vals_ref,        # (nb+1, C, B) HBM packed blocks,
                                     # or (nb+1, 9, B) [w|ah|fid|js]
                                     # rows when ``factored``
                    eh_ref,          # (Wh*C, Wh) VMEM constant
                    ec_ref,          # (Wh*C, C) VMEM constant
                    acc_in_ref,      # (n_chunks, C, 128) HBM (zeros,
                                     # aliased to the output)
                    acc_ref,         # (n_chunks, C, 128) HBM out
                    ring,            # (RING, C, 128) VMEM scratch
                    vscr,            # (2, rows, B) VMEM scratch
                    base_ref,        # (1,) SMEM
                    sems,            # (2,) in + (1,) flush DMA sems
                    *, n_steps, n_anchors, window, c_cols, factored):
    del acc_in_ref
    i = pl.program_id(0)
    SP = STEPS_PER_PROGRAM
    Wh = window // 128
    B = vals_ref.shape[2]

    def in_copy(t, slot):
        b = seq_ref[3 * t + 1]
        return pltpu.make_async_copy(vals_ref.at[b], vscr.at[slot],
                                     sems.at[slot])

    @pl.when(i == 0)
    def _init():
        ring[...] = jnp.zeros_like(ring)
        base_ref[0] = 0
        in_copy(0, 0).start()

    def flush(n_chunks_out):
        base = base_ref[0]
        cp = pltpu.make_async_copy(
            ring.at[pl.ds(0, n_chunks_out)],
            acc_ref.at[pl.ds(base, n_chunks_out)],
            sems.at[2])
        cp.start()
        cp.wait()

    for k in range(SP):
        t = i * SP + k
        slot = t % 2

        @pl.when(t + 1 < n_steps)
        def _next():
            in_copy(t + 1, (t + 1) % 2).start()

        in_copy(t, slot).wait()

        s0 = pl.multiple_of(seq_ref[3 * t + 0], 128)
        b = seq_ref[3 * t + 1]
        a = seq_ref[3 * t + 2]

        # advance the ring: half-flushes for the common monotone
        # creep, one full flush + restart for a beyond-ring jump
        def overflows():
            return s0 // 128 + Wh > base_ref[0] + RING_CHUNKS

        def half_flush():
            flush(FLUSH_CHUNKS)
            ring[pl.ds(0, RING_CHUNKS - FLUSH_CHUNKS)] = (
                ring[pl.ds(FLUSH_CHUNKS, RING_CHUNKS - FLUSH_CHUNKS)])
            ring[pl.ds(RING_CHUNKS - FLUSH_CHUNKS, FLUSH_CHUNKS)] = (
                jnp.zeros((FLUSH_CHUNKS,) + ring.shape[1:], ring.dtype))
            base_ref[0] = base_ref[0] + FLUSH_CHUNKS

        @pl.when(overflows())
        def _f1():
            half_flush()

        @pl.when(overflows())
        def _f2():
            half_flush()

        @pl.when(overflows())
        def _jump():
            flush(RING_CHUNKS)
            ring[...] = jnp.zeros_like(ring)
            base_ref[0] = s0 // 128

        raw = vscr[slot]                         # (rows, B)
        if factored == 'ah':
            # rows [w0 w1 w2 | res0 res1 res2 | fid js]: build the 12
            # per-corner products w_j * [res, 1] in-kernel (saves the
            # XLA-side (N, 12) materialization + repack; the ones
            # column's products are just w_j, already present).
            # Column order is the CONSUMER's interleaved (j, [res 1])
            # layout — the fold source slices 4-wide corner groups —
            # so the solver pays no (Fp, 12) permutation op.
            rows = []
            for j in range(3):
                rows += [raw[j:j + 1] * raw[3 + c:4 + c]
                         for c in range(3)]
                rows += [raw[j:j + 1]]
            valT = jnp.concatenate(
                rows + [jnp.zeros((c_cols - len(rows), B),
                                  jnp.float32)],
                axis=0)                          # (C, B)
            fid = raw[6, :].astype(jnp.int32)    # exact for < 2^24
            js = raw[7, :].astype(jnp.int32)
        elif factored == 'ahw2':
            # rows [w0 w1 w2 | res0 res1 res2 | fid js]: both passes'
            # products in one sweep — the interleaved 12-col AH layout
            # (see 'ah' above) and the 6 unique w_j*w_j' (the W2
            # Gram).  18 live columns need c_cols=24; the earlier
            # 18-col attempt used Cp=32 and stalled 3x (solver
            # comment) — at 24 the ring update and part matmul grow
            # only 1.5x while the second kernel's full per-step cost
            # disappears.
            rows = []
            for j in range(3):
                rows += [raw[j:j + 1] * raw[3 + c:4 + c]
                         for c in range(3)]
                rows += [raw[j:j + 1]]
            rows += [raw[j:j + 1] * raw[jp:jp + 1]
                     for (j, jp) in ((0, 0), (1, 1), (2, 2),
                                     (0, 1), (0, 2), (1, 2))]
            valT = jnp.concatenate(
                rows + [jnp.zeros((c_cols - len(rows), B),
                                  jnp.float32)],
                axis=0)                          # (C, B)
            fid = raw[6, :].astype(jnp.int32)
            js = raw[7, :].astype(jnp.int32)
        elif factored == 'w2':
            # rows [w0 w1 w2 | fid js]: the 6 unique w_j * w_j'
            # products — summed per face they let the solver contract
            # the subspace normal equations face-side and drop the
            # (N, 9s) AS gather (cg_block face_hcgc path)
            rows = [raw[j:j + 1] * raw[jp:jp + 1]
                    for (j, jp) in ((0, 0), (1, 1), (2, 2),
                                    (0, 1), (0, 2), (1, 2))]
            valT = jnp.concatenate(
                rows + [jnp.zeros((c_cols - len(rows), B),
                                  jnp.float32)],
                axis=0)                          # (C, B)
            fid = raw[3, :].astype(jnp.int32)
            js = raw[4, :].astype(jnp.int32)
        else:
            valT = raw
            fid = raw[FID_COL, :].astype(jnp.int32)
            js = raw[JS_COL, :].astype(jnp.int32)

        # routing: the first anchor window containing fid hosts the
        # row; the subsample step (a == n_anchors) takes the rest.
        # pad steps carry a == n_anchors with an all-zero block.
        # (scalar-conditioned selects and mixed scalar/vector boolean
        # ops don't legalize in Mosaic — everything below is 0/1 i32
        # arithmetic on lane vectors)
        is_sub_s = jnp.clip(a - (n_anchors - 1), 0, 1)    # 0/1 scalar
        isv = jnp.full((B,), 1, jnp.int32) * is_sub_s     # (B,) 0/1
        off_w = fid - s0
        off = js * isv + off_w * (1 - isv)
        inw = ((off_w >= 0) & (off_w < window)).astype(jnp.int32)
        taken = jnp.zeros((B,), jnp.int32)
        for a_prev in range(n_anchors):
            sp = starts_ref[b * n_anchors + a_prev]
            pa = jnp.clip(a - a_prev, 0, 1)               # a_prev < a
            op = fid - sp
            taken = jnp.maximum(
                taken,
                ((op >= 0) & (op < window)).astype(jnp.int32) * pa)
        notl = 1 - taken
        mask_i = notl * (isv + (1 - isv) * inw)           # (B,) 0/1

        # factorized one-hot accumulate (all (sublane, lane=B))
        hi_idx = off // 128
        lo_idx = off - hi_idx * 128
        hrow = jax.lax.broadcasted_iota(jnp.int32, (Wh, B), 0)
        hiT = ((hrow == hi_idx[None, :]).astype(jnp.int32)
               * mask_i[None, :]).astype(jnp.float32)     # (Wh, B)
        lrow = jax.lax.broadcasted_iota(jnp.int32, (128, B), 0)
        loT = (lrow == lo_idx[None, :]).astype(jnp.float32)  # (128, B)

        t1 = jax.lax.dot_general(                         # (Wh*C, B)
            eh_ref[...], hiT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # the default MXU path rounds operands to bf16; the 0/1
        # eh/hi/lo factors are bf16-exact, and the value operand goes
        # through a manual bf16 hi+lo split (~16-bit mantissa, two
        # fast passes instead of the 6-pass HIGHEST lowering)
        def vsplit(v):
            v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            return v_hi, v - v_hi

        v_hi, v_lo = vsplit(valT)
        dn2 = (((1,), (0,)), ((), ()))
        t2 = (jax.lax.dot_general(                        # (Wh*C, B)
                  ec_ref[...], v_hi, dimension_numbers=dn2,
                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(
                  ec_ref[...], v_lo, dimension_numbers=dn2,
                  preferred_element_type=jnp.float32))
        t12_hi, t12_lo = vsplit(t1 * t2)
        dnp = (((1,), (1,)), ((), ()))
        part = (jax.lax.dot_general(                      # (Wh*C, 128)
                    t12_hi, loT, dimension_numbers=dnp,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    t12_lo, loT, dimension_numbers=dnp,
                    preferred_element_type=jnp.float32))
        part3 = part.reshape(Wh, c_cols, 128)

        roff = s0 // 128 - base_ref[0]
        ring[pl.ds(roff, Wh)] = ring[pl.ds(roff, Wh)] + part3

        @pl.when(t == n_steps - 1)
        def _done():
            flush(RING_CHUNKS)


def _call_scatter(blocks, starts_al, sub_ids, num_segments,
                  block_size, window, factored, interpret,
                  discard_sub=False, cp=16, transposed_out=False):
    """Shared driver: sorts (block, anchor) steps and invokes the
    sliding-ring kernel.  ``blocks`` is (Cp, nb+1, B) with the last
    block all-zero (pad-step target)."""
    nbp, rows, Bsz = blocks.shape
    nb = nbp - 1
    Cp = cp
    A = starts_al.shape[1]
    nsub = sub_ids.shape[0]
    Fp_al = -(-num_segments // 128) * 128
    W = min(window, Fp_al)
    if nsub > W:
        raise ValueError('subsample larger than the window')

    sub_base = Fp_al            # virtual subsample window
    n_steps = nb * (A + 1)
    SP = STEPS_PER_PROGRAM
    n_steps_pad = -(-n_steps // SP) * SP

    key = jnp.concatenate(
        [starts_al, jnp.full((nb, 1), sub_base, jnp.int32)],
        axis=1).reshape(-1)
    blk = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), A + 1)
    anc = jnp.tile(jnp.arange(A + 1, dtype=jnp.int32), nb)
    order = jnp.argsort(key)
    seq = jnp.stack([key[order], blk[order], anc[order]], axis=1)
    # pad steps: subsample steps of the dedicated all-zero block
    pad_step = jnp.array([[sub_base, nb, A]], jnp.int32)
    seq = jnp.concatenate(
        [seq, jnp.tile(pad_step, (n_steps_pad - n_steps, 1))])

    starts_sc = jnp.concatenate(
        [starts_al, jnp.zeros((1, A), jnp.int32)]).reshape(-1)

    n_chunks = sub_base // 128 + RING_CHUNKS
    Wh = W // 128

    # constant routing matrices for the factorized one-hot:
    # eh[k, h(k)] = 1 and ec[k, c(k)] = 1 with k = h * Cp + c
    kk = jnp.arange(Wh * Cp)
    eh = (kk[:, None] // Cp
          == jnp.arange(Wh)[None, :]).astype(jnp.float32)
    ec = (kk[:, None] % Cp
          == jnp.arange(Cp)[None, :]).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps_pad // SP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((RING_CHUNKS, Cp, 128), jnp.float32),
            pltpu.VMEM((2, rows, Bsz), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    kernel = partial(_scatter_kernel, n_steps=n_steps_pad,
                     n_anchors=A, window=W, c_cols=Cp,
                     factored=factored)
    acc_zero = jnp.zeros((n_chunks, Cp, 128), jnp.float32)
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, Cp, 128), jnp.float32),
        input_output_aliases={5: 0},   # acc_zero (6th operand) -> out
        interpret=interpret,
    )(seq.reshape(-1), starts_sc, blocks, eh, ec, acc_zero)

    if transposed_out:
        # lane-major (Cp, faces) output: major-axes transpose only
        # (the 128-lane minor stays), vs the row-major form's full
        # (chunk, 128, Cp) retile — consumers assembling the fold
        # source keep everything lane-major (solver lane-major path)
        acc_t = jnp.transpose(acc, (1, 0, 2)).reshape(Cp, -1)
        if discard_sub:
            return acc_t[:, :num_segments]
        sub_t = acc_t[:, sub_base:sub_base + nsub]
        return acc_t[:, :num_segments].at[:, sub_ids].add(sub_t)

    acc2 = jnp.transpose(acc, (0, 2, 1)).reshape(-1, Cp)
    if discard_sub:
        # rows the windows didn't claim are the caller's concern
        # (a host-verified exact side-scatter) — drop the virtual-
        # window accumulation instead of folding it back
        return acc2[:num_segments]
    sub_rows = acc2[sub_base:sub_base + nsub]
    return acc2[:num_segments].at[sub_ids].add(sub_rows)


@partial(jax.jit,
         static_argnames=('num_segments', 'block_size', 'window',
                          'interpret', 'discard_sub'))
def windowed_segment_sum_pallas(vals, fid, js, starts, sub_ids,
                                num_segments, block_size=256,
                                window=None, interpret=False,
                                discard_sub=False):
    """Exact ``segment_sum(vals, fid) -> (num_segments, C)`` via the
    sorted sliding-window kernel.  ``starts``/``js``/``sub_ids`` are
    the WindowedMeta fields of the matching correspondence call (the
    routing invariant — every fid lies inside one of its block's
    windows or equals sub_ids[js] — comes from there).
    """
    N, C = vals.shape
    window = _resolve_w(window)
    nb = starts.shape[0]
    Bsz = block_size
    Fp_al = -(-num_segments // 128) * 128
    W = min(window, Fp_al)
    Cp = 16
    if C > FID_COL:
        raise ValueError(f'at most {FID_COL} value columns')
    Npad = nb * Bsz

    valsp = jnp.zeros((Npad, Cp), jnp.float32).at[:N, :C].set(vals)
    valsp = valsp.at[:N, FID_COL].set(fid.astype(jnp.float32))
    valsp = valsp.at[:N, JS_COL].set(js.astype(jnp.float32))
    # padded rows keep zero values: any in-range target is harmless

    starts_al = jnp.clip((starts // 128) * 128, 0, max(Fp_al - W, 0))
    blocks = jnp.concatenate(
        [jnp.transpose(valsp.reshape(nb, Bsz, Cp), (0, 2, 1)),
         jnp.zeros((1, Cp, Bsz), jnp.float32)])          # (nb+1,Cp,B)
    out = _call_scatter(blocks, starts_al, sub_ids, num_segments,
                        Bsz, window, None, interpret,
                        discard_sub=discard_sub)
    return out[:, :C]


def _resolve_w(window):
    from .correspondence import CORR_W
    return CORR_W if window is None else window


@partial(jax.jit,
         static_argnames=('num_segments', 'block_size', 'window',
                          'interpret', 'transposed_out'))
def windowed_ah_pallas(w, res, fid, js, starts, sub_ids, num_segments,
                       block_size=256, window=None, interpret=False,
                       transposed_out=False):
    """A^T accumulation with the per-corner products formed in-kernel:
    ``segment_sum((w[:, :, None] * concat([res, 1])[:, None, :])
    .reshape(N, 12), fid)`` without materializing the (N, 12) operand
    — the kernel receives packed rows [w | res | fid js] per block.
    Output columns are the consumer's interleaved (j, [res, 1])
    layout: col 4j+c = w_j * res_c for c < 3, col 4j+3 = w_j.
    """
    window = _resolve_w(window)
    N = w.shape[0]
    nb = starts.shape[0]
    Bsz = block_size
    Fp_al = -(-num_segments // 128) * 128
    W = min(window, Fp_al)
    Cp = 16
    Npad = nb * Bsz

    def blockify(x2, rows):
        # (N, rows) -> (nb, rows, B) via small per-field transposes
        xp = jnp.zeros((Npad, rows), jnp.float32).at[:N].set(x2)
        return jnp.transpose(xp.reshape(nb, Bsz, rows), (0, 2, 1))

    blocks = jnp.concatenate([
        blockify(w, 3),
        blockify(res, 3),
        blockify(fid.astype(jnp.float32)[:, None], 1),
        blockify(js.astype(jnp.float32)[:, None], 1),
    ], axis=1)                                           # (nb, 8, B)
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((1, 8, Bsz), jnp.float32)])   # (nb+1,8,B)

    starts_al = jnp.clip((starts // 128) * 128, 0, max(Fp_al - W, 0))
    out = _call_scatter(blocks, starts_al, sub_ids, num_segments,
                        Bsz, window, 'ah', interpret,
                        transposed_out=transposed_out)
    return out[:12] if transposed_out else out[:, :12]


@partial(jax.jit,
         static_argnames=('num_segments', 'block_size', 'window',
                          'interpret', 'transposed_out'))
def windowed_ahw2_pallas(w, res, fid, js, starts, sub_ids,
                         num_segments, block_size=256, window=None,
                         interpret=False, transposed_out=False):
    """One-sweep fusion of ``windowed_ah_pallas`` and
    ``windowed_w2_pallas``: the two kernels stream identical
    (block, anchor) steps over identical packed inputs, and the
    per-step cost is dominated by step machinery, not live columns —
    a single pass with c_cols=24 (18 live) replaces both.  Returns
    ``(ah, w2)`` with the same shapes/column orders as the two
    separate calls."""
    window = _resolve_w(window)
    N = w.shape[0]
    nb = starts.shape[0]
    Bsz = block_size
    Fp_al = -(-num_segments // 128) * 128
    W = min(window, Fp_al)
    Npad = nb * Bsz

    def blockify(x2, rows):
        xp = jnp.zeros((Npad, rows), jnp.float32).at[:N].set(x2)
        return jnp.transpose(xp.reshape(nb, Bsz, rows), (0, 2, 1))

    blocks = jnp.concatenate([
        blockify(w, 3),
        blockify(res, 3),
        blockify(fid.astype(jnp.float32)[:, None], 1),
        blockify(js.astype(jnp.float32)[:, None], 1),
    ], axis=1)                                           # (nb, 8, B)
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((1, 8, Bsz), jnp.float32)])   # (nb+1,8,B)

    starts_al = jnp.clip((starts // 128) * 128, 0, max(Fp_al - W, 0))
    out = _call_scatter(blocks, starts_al, sub_ids, num_segments,
                        Bsz, window, 'ahw2', interpret,
                        cp=24, transposed_out=transposed_out)
    if transposed_out:
        return out[:12], out[12:18]
    return out[:, :12], out[:, 12:18]


@partial(jax.jit,
         static_argnames=('num_segments', 'block_size', 'window',
                          'interpret', 'transposed_out'))
def windowed_w2_pallas(w, fid, js, starts, sub_ids, num_segments,
                       block_size=256, window=None, interpret=False,
                       transposed_out=False):
    """Per-face sums of the 6 unique correspondence-weight products
    ``segment_sum(w_j * w_j', fid)`` with the products formed
    in-kernel — the W2 operand of the solver's face-side subspace
    normal equations (cg_block face_hcgc).  Output columns:
    [w0w0 w1w1 w2w2 w0w1 w0w2 w1w2]."""
    window = _resolve_w(window)
    N = w.shape[0]
    nb = starts.shape[0]
    Bsz = block_size
    Fp_al = -(-num_segments // 128) * 128
    W = min(window, Fp_al)
    Npad = nb * Bsz

    def blockify(x2, rows):
        xp = jnp.zeros((Npad, rows), jnp.float32).at[:N].set(x2)
        return jnp.transpose(xp.reshape(nb, Bsz, rows), (0, 2, 1))

    blocks = jnp.concatenate([
        blockify(w, 3),
        blockify(fid.astype(jnp.float32)[:, None], 1),
        blockify(js.astype(jnp.float32)[:, None], 1),
        jnp.zeros((nb, 3, Bsz), jnp.float32),  # 8-row HBM tiling pad
    ], axis=1)                                           # (nb, 8, B)
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((1, 8, Bsz), jnp.float32)])   # (nb+1,8,B)

    starts_al = jnp.clip((starts // 128) * 128, 0, max(Fp_al - W, 0))
    out = _call_scatter(blocks, starts_al, sub_ids, num_segments,
                        Bsz, window, 'w2', interpret,
                        transposed_out=transposed_out)
    return out[:6] if transposed_out else out[:, :6]
