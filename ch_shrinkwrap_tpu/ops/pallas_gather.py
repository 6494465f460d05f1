"""Pallas TPU kernel: sliding-ring windowed row gather.

XLA-TPU row gathers are fast while the source table is VMEM-resident
and collapse into latency-bound row streaming beyond ~300k rows
(measured: the ncc neighbor gather 5.9 -> 65 ms and the S-direction
gathers ~8 -> 54 ms going from 164k to 656k padded vertices,
BASELINE.md).  The round-2 pure-XLA banded formulation (scan +
dynamic_slice windows; pruned round 4 — git history has it) re-read
every window from HBM per block and LOST (2.99 -> 1.88 iters/s).  This
kernel keeps the windows resident and sidesteps XLA's pathological
scatter for the tail:

- both the vertex table and the index array are Hilbert-ordered
  (TriangleMesh.spatial_sort / meshdata.from_mesh), so each 128-row
  index chunk reads a narrow band of the table (best-mass 128-aligned
  window, measured 96-98% row coverage at 656k verts) and the bands
  creep monotonically;
- a circular VMEM ring of (csub, RING_LANES) holds the table band,
  rows as LANES, advanced by host-scheduled DMA descriptors split at
  the wrap point — each table row is DMA'd into VMEM once per call;
- each 128-row chunk gathers through ``jnp.take_along_axis`` along
  lanes (Mosaic ``tpu.dynamic_gather``, a hardware in-register
  shuffle; the sublane axis only supports single-vreg sources, so the
  table is kept transposed with columns as sublanes), one 128-lane
  segment at a time over the chunk's span, merged by select;
- rows the chunk window cannot cover (a few-% tail at Hilbert curve
  jumps) are PATCHED, not scattered: the host rewrites their (static)
  indices to a patch region appended after the table, the wrapper
  gathers their values into that region per call (a small gather —
  cheap; XLA's scatter at this scale runs ~10M rows/s and would eat
  the whole win), and the kernel reads them through a second, small
  sliding ring whose windows are per-step contiguous by construction.
  Only patch rows evicted by ring-capacity edge cases fall back to an
  XLA scatter fixup (normally zero; the wrapper skips the op then).

Output is written in transposed (csub, R) layout (rows as lanes, the
shape the kernel computes in); the wrapper transposes back.  Exact:
pure data movement, no arithmetic on the values.

Counterpart of the reference's directly-indexed C loops over the
vertex array (/root/reference/ch_shrinkwrap/conj_grad_utils.c:249-370,
membrane_mesh_utils.c:985-1121), which never face this problem at
reference scales.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_SUB = 16                 # max table columns
RING_LANES = 16384         # main ring capacity in table rows (pow 2)
RING_SEGS = RING_LANES // 128
PATCH_LANES = 4096         # patch ring capacity (pow 2)
PATCH_SEGS = PATCH_LANES // 128
PATCH_CHUNK_SEGS = 2       # segments scanned per chunk in the patch
CHUNKS_PER_STEP = 16       # 128-row chunks per grid step (= 2048 rows)
STEP_ROWS = CHUNKS_PER_STEP * 128


def _c_sub(c):
    """Sublane count for a C-column table: the f32 sublane quantum (8)
    or the full 16 — narrower tables halve ring and output traffic."""
    return 8 if c <= 8 else C_SUB


class RingGatherSchedule(NamedTuple):
    """Host-built static schedule for ``ring_gather`` (indices are
    static per remesh block; table values may change per call).
    Registered as a pytree with the integers as static aux data so it
    can be passed straight through jitted callers."""
    bases: jax.Array       # (nsteps*CPS,) i32 chunk window bases
    pbases: jax.Array      # (nsteps*CPS,) i32 chunk patch bases
    dmas: jax.Array        # (nsteps*8,) i32 per-step descriptors:
                           # [s0,l0,s1,l1, p0,pl0,p1,pl1] (segments;
                           # patch sources offset into the patch area)
    idx: jax.Array         # (Rp_chunks, 128) i32 patched indices
    targets: jax.Array     # (P_pad,) i32 table rows feeding the patch
    uncov: Optional[jax.Array]  # (U_pad,) i32 fallback rows or None
    n_steps: int
    n_patch: int           # patch region lanes (128-multiple)
    span: int
    n_rows: int
    cps: int = CHUNKS_PER_STEP   # 128-row chunks per grid step
    kmaj_block: int = 0    # >0: stream is block-interleaved k-major —
                           # rows ordered (v_block, k, v%block) over a
                           # (V, K) index table so the consumer can
                           # reduce over k with V on the lane axis
                           # (full 128-lane utilization; plain
                           # (V, K, C) layouts use C of 128 lanes)
    care: Optional[jax.Array] = None   # (R,) bool stream mask (same
                           # order as idx rows), for masked consumers


jax.tree_util.register_pytree_node(
    RingGatherSchedule,
    lambda s: ((s.bases, s.pbases, s.dmas, s.idx, s.targets, s.uncov,
                s.care),
               (s.n_steps, s.n_patch, s.span, s.n_rows, s.cps,
                s.kmaj_block)),
    lambda aux, ch: RingGatherSchedule(*ch[:6], *aux, care=ch[6]))


def _gather_kernel(bases_ref,      # (nsteps*CPS,) prefetch
                   pbases_ref,     # (nsteps*CPS,) prefetch
                   dmas_ref,       # (nsteps*8,) prefetch
                   idx_ref,        # (CPS, 128) i32 block (pipelined)
                   src_ref,        # (csub, Vp_al + n_patch) HBM
                   out_ref,        # (csub, STEP_ROWS) block (pipelined)
                   ring,           # (csub, RING_LANES) VMEM scratch
                   pring,          # (csub, PATCH_LANES) VMEM scratch
                   sems,           # (4,) DMA semaphores
                   *, span, n_steps, csub, patch_lane0,
                   cps=CHUNKS_PER_STEP):
    i = pl.program_id(0)
    n_seg = span // 128
    p0seg = patch_lane0 // 128

    def dmas(t, slot):
        """The four (possibly idempotent) ring-fill descriptors of
        step t.  Lengths are in 128-lane segments; zero-length copies
        are encoded by the host as 1-segment re-copies."""
        out = []
        for k, (dst, dsegs, sbase) in enumerate((
                (ring, RING_SEGS, 0), (pring, PATCH_SEGS, p0seg))):
            for j in range(2):
                s = dmas_ref[8 * t + 4 * k + 2 * j]
                ln = dmas_ref[8 * t + 4 * k + 2 * j + 1]
                r = s % dsegs
                out.append(pltpu.make_async_copy(
                    src_ref.at[:, pl.ds((sbase + s) * 128, ln * 128)],
                    dst.at[:, pl.ds(r * 128, ln * 128)],
                    sems.at[2 * slot + k]))
        return out

    @pl.when(i == 0)
    def _first():
        for c in dmas(0, 0):
            c.start()

    for c in dmas(i, i % 2):
        c.wait()

    @pl.when(i + 1 < n_steps)
    def _next():
        for c in dmas(i + 1, (i + 1) % 2):
            c.start()

    for c in range(cps):
        base = bases_ref[i * cps + c]
        pbase = pbases_ref[i * cps + c]
        idxv = idx_ref[c:c + 1, :]                        # (1, 128) i32
        iv = jnp.broadcast_to(idxv, (csub, 128))
        off = iv - base
        acc = jnp.zeros((csub, 128), jnp.float32)
        for s in range(n_seg):
            seg = (base // 128 + s) % RING_SEGS
            xs = ring[:, pl.ds(seg * 128, 128)]           # (csub, 128)
            loc = jnp.clip(off - s * 128, 0, 127)
            g = jnp.take_along_axis(xs, loc, axis=1)
            sel = (off >= s * 128) & (off < (s + 1) * 128)
            acc = jnp.where(sel, g, acc)
        # patch rows: indices rewritten to patch_lane0 + patch pos
        poff = iv - (patch_lane0 + pbase)
        for s in range(PATCH_CHUNK_SEGS):
            seg = (pbase // 128 + s) % PATCH_SEGS
            xs = pring[:, pl.ds(seg * 128, 128)]
            loc = jnp.clip(poff - s * 128, 0, 127)
            g = jnp.take_along_axis(xs, loc, axis=1)
            sel = (poff >= s * 128) & (poff < (s + 1) * 128)
            acc = jnp.where(sel, g, acc)
        out_ref[:, pl.ds(c * 128, 128)] = acc


def _best_mass_base(tc, cc, span, n_rows):
    """Per-chunk best-mass 128-aligned window base: densest
    ``span``-wide window over the chunk's cared targets (sliding
    count over the sorted targets; argmax first-on-ties).  Native C++
    when available (the numpy formulation costs ~12 s at 13M rows on
    a 1-core host; the native pass ~0.3 s).  ``tc`` may be int32 (the
    native fast path — no copy) or int64 (numpy fallback dtype)."""
    from .. import native
    nat = native.best_mass_bases(tc.reshape(-1), cc.reshape(-1),
                                 tc.shape[1], span, n_rows)
    if nat is not None:
        return nat.astype(np.int64)
    tc = tc.astype(np.int64, copy=False)
    nc = tc.shape[0]
    ts = np.sort(np.where(cc, tc, np.int64(1) << 40), axis=1)
    eff = span - 128
    # vectorized per-row searchsorted: shift each row into its own
    # disjoint value range so one global sorted search answers all
    # rows at once (a python loop over ~1e5 chunks costs minutes)
    rowoff = (np.arange(nc, dtype=np.int64) << 42)[:, None]
    flat = (ts + rowoff).ravel()
    hi = (np.searchsorted(flat, (ts + eff + rowoff).ravel(),
                          side='right').reshape(nc, -1)
          - np.arange(nc, dtype=np.int64)[:, None] * ts.shape[1])
    cnt = hi - np.arange(tc.shape[1])[None, :]
    bestj = np.argmax(np.where(ts < (np.int64(1) << 40), cnt, -1),
                      axis=1)
    base = (ts[np.arange(nc), bestj] // 128) * 128
    base = np.where(base >= n_rows, 0, base)
    # clip against the 128-ALIGNED table end (the DMA source is lane-
    # padded): clipping to the raw row count would misalign the base
    n_al = -(-n_rows // 128) * 128
    return np.clip(base, 0, max(n_al - span, 0))


ANCHOR_W = 16              # care-chunk half-window for the base anchor
ANCHOR_AHEAD = 4096        # max rows a base may leave its anchor


def _anchor_clamp_bases(base, tc, cc, span, n_src_rows):
    """Clamp each care-chunk's window base to a SMOOTHED local
    trajectory (running lower-median over the +/-ANCHOR_W surrounding
    care-chunks' care-value medians, edge-replicated).

    Raw best-mass bases are outlier-fragile on surgered fit meshes: a
    care-sparse chunk (e.g. a high-k neighbor slot) whose few care
    values sit tens of thousands of rows ahead gets a far-ahead base,
    the monotone prefetch head jumps with it, and every trailing chunk
    within RING_LANES loses residency — measured 156k of 180k patch
    rows on the j=65 north-star topology came from residency loss, not
    out-of-span values (debug_out/ob_Vp186368_j65.npz).  Clamped,
    outliers cost only their own patch entries and the head stays
    smooth.  Must stay bit-identical to the native pass in
    topology.cpp:ring_schedule_native."""
    m = cc.sum(1)
    carech = m > 0
    if not carech.any():
        return base
    ts = np.sort(np.where(cc, tc, np.int32(0x7fffffff)), axis=1)
    med = ts[np.arange(len(m)), np.maximum(m - 1, 0) // 2]
    meds = med[carech].astype(np.int64)
    K = len(meds)
    # running lower-median over the VALID window [i-W, i+W] & [0, K)
    # only — edge-REPLICATED windows let an outlier at either end of
    # the stream dominate its own anchor (17 of 33 entries become the
    # outlier itself) and drag the prefetch head exactly the way the
    # clamp exists to prevent
    W = ANCHOR_W
    anchor = np.empty(K, np.int64)
    if K > 2 * W + 1:
        win = np.arange(K - 2 * W)[:, None] + np.arange(2 * W + 1)
        anchor[W:K - W] = np.sort(meds[win], axis=1)[:, W]
        edges = list(range(W)) + list(range(K - W, K))
    else:
        edges = range(K)
    for i in edges:
        seg = meds[max(i - W, 0):min(i + W, K - 1) + 1]
        anchor[i] = np.sort(seg)[(len(seg) - 1) // 2]
    b = base[carech].astype(np.int64)
    lo = np.maximum(anchor - ANCHOR_AHEAD, 0)
    b = np.clip(b, lo, anchor + ANCHOR_AHEAD)
    b = (b // 128) * 128
    n_al = -(-n_src_rows // 128) * 128
    b = np.clip(b, 0, max(n_al - span, 0))
    out = base.copy()
    out[carech] = b.astype(base.dtype)
    return out


def _step_dma_descs(step_hi, ring_segs):
    """Per-step ring-advance descriptors [lo, len, lo2, len2] from the
    running per-step head (in segments); splits at the ring wrap and
    encodes empty copies as idempotent 1-segment re-copies."""
    n_steps = len(step_hi)
    out = np.zeros((n_steps, 4), np.int64)
    prev = max(int(step_hi[0]) - ring_segs, 0)
    for s in range(n_steps):
        lo, hi_s = prev, int(step_hi[s])
        lo = max(lo, hi_s - ring_segs)
        ln = hi_s - lo
        if ln <= 0:
            lo, ln = max(hi_s - 1, 0), min(1, max(hi_s, 1))
        r_lo = lo % ring_segs
        first = min(ln, ring_segs - r_lo)
        out[s] = (lo, first, lo + first, ln - first)
        if ln - first == 0:
            out[s, 2] = max(lo + first - 1, 0)
            out[s, 3] = min(1, lo + first)
        prev = hi_s
    return out


def blocked_kmajor_stream(tbl, care_tbl, block=1024):
    """Reorder a (V, K) index table into the block-interleaved k-major
    stream r = (v//block)*K*block + k*block + v%block.  For fixed k the
    chunk windows follow the table's Hilbert locality (patch fractions
    ~2-4%, measured), each block's K-sweep stays ring-resident (the
    oscillation is bounded by the block span << RING_LANES), and the
    consumer can reshape the gather output to (C, nb, K, block) and
    reduce over k with the vertex axis on LANES — plain (V, K, C)
    layouts put C<=8 of 128 lanes to work and run the reduction at a
    few % of HBM bandwidth (the 656k compute_ncc profile)."""
    V, K = tbl.shape
    if V % block:
        raise ValueError('table rows must be a multiple of block')
    nb = V // block
    idx = np.ascontiguousarray(
        tbl.reshape(nb, block, K).transpose(0, 2, 1)).reshape(-1)
    care = np.ascontiguousarray(
        care_tbl.reshape(nb, block, K).transpose(0, 2, 1)).reshape(-1)
    return idx, care


def ring_gather_schedule(idx_flat, care_mask, n_src_rows, span=1024,
                         max_patch_frac=1 / 8, fixed_layout=False,
                         fixed_patch_frac=1 / 16, fixed_uncov=2048,
                         cps=CHUNKS_PER_STEP, kmaj_block=0,
                         care_out=False):
    """Host-side schedule for ``ring_gather``.  Returns a
    ``RingGatherSchedule`` or None when the patch tail exceeds
    ``max_patch_frac`` (caller falls back to the XLA gather).

    ``fixed_layout=True`` makes every static field a function of the
    CAPACITY alone (R, span): the patch region is always sized to
    ``fixed_patch_frac`` of R and the uncovered-row fixup always a
    ``fixed_uncov``-long (-1 padded) array.  The in-fit driver needs
    this: schedule statics are part of the jit cache key, and a
    data-sized patch region would recompile the whole solver program
    at every remesh boundary (~60-90 s each through the remote
    service).  Returns None when the data exceeds the fixed budgets
    (measured patch fractions run 2-4% of rows on Hilbert-sorted fit
    meshes; the 1/16 budget is ~2x the worst observed)."""
    if fixed_layout:
        # production path: the ENTIRE schedule in one native pass
        # (~0.1 s vs ~0.6 s numpy at the fit-capacity ncc table on
        # this 1-core host; built at every remesh boundary)
        from .. import native
        R = int(np.asarray(idx_flat).shape[0])
        budget = max(1, int(R * fixed_patch_frac))
        n_patch = (max(128, -(-budget // 128) * 128)
                   + PATCH_CHUNK_SEGS * 128)
        nat = native.ring_schedule(
            idx_flat, care_mask, n_src_rows, span, RING_SEGS,
            PATCH_SEGS, PATCH_CHUNK_SEGS, cps,
            patch_cap=n_patch, uncov_cap=fixed_uncov)
        if nat is not None:
            (bases, pbases, dmas, idx_p, targets, uncov,
             n_patch_rows, n_uncov) = nat
            if n_patch_rows > budget or n_uncov > fixed_uncov:
                import logging
                logging.getLogger(__name__).warning(
                    'ring schedule over budget: R=%d span=%d '
                    'patch_rows=%d/budget=%d uncov=%d/cap=%d',
                    R, span, n_patch_rows, budget, n_uncov,
                    fixed_uncov)
                return None
            # uncov is None in the (overwhelmingly common) zero case:
            # the compiled program then carries NO fixup op at all —
            # the transposed-output fixup is a minor-axis scatter that
            # costs a full-buffer copy (~15 ms at 656k, measured).  A
            # mid-fit topology that DOES produce uncovered rows gets
            # the fixup variant as a separate (lazily compiled) cache
            # entry — a one-time service stall, never wrong results.
            return RingGatherSchedule(
                bases=jnp.asarray(bases), pbases=jnp.asarray(pbases),
                dmas=jnp.asarray(dmas), idx=jnp.asarray(idx_p),
                targets=jnp.asarray(targets),
                uncov=(jnp.asarray(uncov) if n_uncov > 0 else None),
                n_steps=-(-R // (cps * 128)), n_patch=n_patch,
                span=span, n_rows=R, cps=cps, kmaj_block=kmaj_block,
                care=(jnp.asarray(_care_u8(care_mask))
                      if care_out else None))

    # int32 end-to-end: the native best-mass pass and every derived
    # array take int32 directly; the int64 detour used to cost ~2 s of
    # pure dtype-conversion copies per fit-capacity ncc schedule on
    # this 1-core host (profiled 2026-08-18)
    t = np.ascontiguousarray(idx_flat, np.int32)
    care = np.ascontiguousarray(care_mask, bool)
    R = t.shape[0]
    step_rows = cps * 128
    n_steps = -(-R // step_rows)
    Rp = n_steps * step_rows
    if Rp != R:
        t = np.pad(t, (0, Rp - R))
        care = np.pad(care, (0, Rp - R))
    nc = Rp // 128
    tc = t.reshape(nc, 128)
    cc = care.reshape(nc, 128)
    Vp_al = -(-n_src_rows // 128) * 128

    base = _best_mass_base(tc, cc, span, n_src_rows).astype(np.int32)
    base = _anchor_clamp_bases(base, tc, cc, span, n_src_rows)
    off = tc - base[:, None]
    cov = (off >= 0) & (off < span)

    # main-ring residency: the NEXT step's ring-fill DMA is prefetched
    # while this step computes, so a chunk may only read segments that
    # survive that prefetch — check against the next step's head.
    seg_hi = (base + span) // 128                # exclusive
    head = np.maximum.accumulate(seg_hi)
    step_hi = head.reshape(n_steps, cps)[:, -1]
    next_head = np.concatenate([step_hi[1:], step_hi[-1:]])
    resident = (base // 128) >= (np.repeat(next_head, cps) - RING_SEGS)
    cov &= resident[:, None]

    # every cared uncovered row becomes a patch row: its value is
    # staged (by the wrapper, per call) into the patch region in row
    # order, so per-chunk patch windows are contiguous by construction
    patch_rows = ~cov & cc
    n_patch_rows = int(patch_rows.sum())
    frac = fixed_patch_frac if fixed_layout else max_patch_frac
    if n_patch_rows > max(1, int(R * frac)):
        return None

    ppos = np.cumsum(patch_rows.reshape(-1),
                     dtype=np.int32) - np.int32(1)  # patch pos per row
    ppos = ppos.reshape(nc, 128)
    first_p = np.where(patch_rows.any(1),
                       np.argmax(patch_rows, axis=1), 0)
    chunk_p0 = ppos[np.arange(nc), first_p]       # first patch pos
    pbase = np.where(patch_rows.any(1), (chunk_p0 // 128) * 128, 0)

    # patch-ring residency (same prefetch rule); chunks straddling a
    # capacity edge drop their patch rows to the XLA fallback
    p_seg_hi = (pbase + PATCH_CHUNK_SEGS * 128) // 128
    p_head = np.maximum.accumulate(np.where(patch_rows.any(1),
                                            p_seg_hi, 0))
    p_step_hi = p_head.reshape(n_steps, cps)[:, -1]
    p_next = np.concatenate([p_step_hi[1:], p_step_hi[-1:]])
    p_res = (pbase // 128) >= (np.repeat(p_next, cps) - PATCH_SEGS)
    # a chunk's patch rows must also FIT its 2-segment window
    p_fit = (ppos - pbase[:, None]) < PATCH_CHUNK_SEGS * 128
    patch_ok = patch_rows & p_res[:, None] & p_fit
    uncov_rows = patch_rows & ~patch_ok

    # extra PATCH_CHUNK_SEGS segments of slack: a chunk's 2-segment
    # patch window (and its ring-fill DMA) may overhang the last
    # staged patch row — keep those reads in-bounds
    sized_rows = (max(1, int(R * fixed_patch_frac)) if fixed_layout
                  else n_patch_rows)
    n_patch = (max(128, -(-sized_rows // 128) * 128)
               + PATCH_CHUNK_SEGS * 128)
    patch_lane0 = Vp_al

    # rewrite patched indices into the patch region
    t_patched = np.where(patch_ok, np.int32(patch_lane0) + ppos, tc)
    # targets feeding the patch region, in patch order
    targets = np.zeros(n_patch, np.int32)
    targets[ppos[patch_rows]] = tc[patch_rows]

    uncov_ids = np.flatnonzero(uncov_rows.reshape(-1)[:R])
    if fixed_layout:
        # None in the zero case (program carries no fixup op — see
        # the native-path comment above); else the fixed 2048-wide
        # -1-padded array so the fixup program shape is data-free
        if len(uncov_ids) > fixed_uncov:
            return None
        if len(uncov_ids) == 0:
            uncov = None
        else:
            uncov = np.full(fixed_uncov, -1, np.int32)
            uncov[:len(uncov_ids)] = uncov_ids
            uncov = jnp.asarray(uncov)
    elif len(uncov_ids):
        u_pad = -(-len(uncov_ids) // 1024) * 1024
        uncov = np.full(u_pad, -1, np.int32)
        uncov[:len(uncov_ids)] = uncov_ids
        uncov = jnp.asarray(uncov)
    else:
        uncov = None

    main_dmas = _step_dma_descs(step_hi, RING_SEGS)
    patch_dmas = _step_dma_descs(np.maximum(p_step_hi, 1), PATCH_SEGS)
    dmas = np.concatenate([main_dmas, patch_dmas], axis=1)

    return RingGatherSchedule(
        bases=jnp.asarray(base.astype(np.int32, copy=False)),
        pbases=jnp.asarray(pbase.astype(np.int32, copy=False)),
        dmas=jnp.asarray(dmas.reshape(-1).astype(np.int32)),
        idx=jnp.asarray(t_patched.astype(np.int32, copy=False)),
        targets=jnp.asarray(targets.astype(np.int32, copy=False)),
        uncov=uncov, n_steps=n_steps, n_patch=n_patch, span=span,
        n_rows=R, cps=cps, kmaj_block=kmaj_block,
        care=(jnp.asarray(_care_u8(care_mask))
              if care_out else None))


def _care_u8(care_mask):
    """Device care mask normalized to uint8 regardless of whether the
    native stream prep (uint8) or a numpy fallback (bool) produced it:
    the dtype is part of the pjit cache key, so mixed dtypes would give
    machines without the native library a different compiled-program
    signature (and one cache miss after upgrade)."""
    a = np.ascontiguousarray(care_mask)
    return a.view(np.uint8) if a.dtype == np.bool_ else a


@partial(jax.jit, static_argnames=('n_steps', 'n_patch', 'span',
                                   'n_rows', 'interpret', 'cps',
                                   'transposed_out', 'n_src_rows',
                                   'also_transposed'))
def _ring_gather_impl(src, bases, pbases, dmas, idx, targets, uncov,
                      n_steps, n_patch, span, n_rows, interpret,
                      cps=CHUNKS_PER_STEP, transposed_out=False,
                      n_src_rows=None, also_transposed=False):
    R = n_rows
    if n_src_rows is not None:
        # pre-transposed source: src is (csub, n_src_rows) lane-major
        # (rows = table columns).  Producers that already hold the
        # lane-major form (the solver's fused fold input) then skip
        # the (R, C)->T relayout and patch-row gather below — measured
        # ~6 ms/iter at the 656k fold (scripts/attr_inblock.py).
        csub, C = src.shape[0], src.shape[0]
        Vp = n_src_rows
    else:
        Vp, C = src.shape
        csub = _c_sub(C)
    Vp_al = -(-Vp // 128) * 128
    step_rows = cps * 128
    Rp = n_steps * step_rows

    if n_src_rows is not None:
        safe_t = jnp.clip(targets, 0, Vp - 1)
        patch_t = src[:, safe_t] * (targets >= 0)[None, :]
        src_t = jnp.zeros((csub, Vp_al + n_patch), jnp.float32)
        src_t = src_t.at[:, :Vp].set(src.astype(jnp.float32))
        src_t = src_t.at[:, Vp_al:].set(patch_t.astype(jnp.float32))
    else:
        # staged source: transposed table + per-call patch values
        patch_vals = src[targets]                      # (n_patch, C)
        src_t = jnp.zeros((csub, Vp_al + n_patch), jnp.float32)
        src_t = src_t.at[:C, :Vp].set(src.T.astype(jnp.float32))
        src_t = src_t.at[:C, Vp_al:].set(
            patch_vals.T.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((cps, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((csub, step_rows), lambda i, *_: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((csub, RING_LANES), jnp.float32),
            pltpu.VMEM((csub, PATCH_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out_t = pl.pallas_call(
        partial(_gather_kernel, span=span, n_steps=n_steps,
                csub=csub, patch_lane0=Vp_al, cps=cps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((csub, Rp), jnp.float32),
        interpret=interpret,
    )(bases, pbases, dmas, idx, src_t)

    if transposed_out:
        # kernel-native (csub, Rp) layout: rows = table columns, lanes
        # = gather rows.  Consumers that reduce over k (the blocked
        # k-major streams) keep the gather-row axis on LANES this way
        # instead of paying ~6%-lane-utilization (R, K, C) layouts.
        res = out_t.astype(src.dtype)
        if uncov is not None:
            tgt = jnp.where(uncov >= 0, uncov, Rp)
            flat = idx.reshape(-1)
            urows = flat[jnp.clip(uncov, 0, Rp - 1)]
            if n_src_rows is not None:
                uval_t = src[:, urows]
            else:
                uval_t = src[urows].T
            res = res.at[:C, tgt].set(uval_t.astype(src.dtype),
                                      mode='drop')
        return res

    if n_src_rows is not None:
        raise ValueError('pre-transposed sources require '
                         'transposed_out=True')
    res = out_t[:C, :R].T.astype(src.dtype)
    res_t = out_t.astype(src.dtype) if also_transposed else None

    if uncov is not None:
        # exact fixup of patch-capacity evictions (normally absent)
        tgt = jnp.where(uncov >= 0, uncov, R)
        flat = idx.reshape(-1)
        uval = src[flat[jnp.clip(uncov, 0, Rp - 1)]]
        res = res.at[tgt].set(uval, mode='drop')
        if also_transposed:
            tgt_t = jnp.where(uncov >= 0, uncov, Rp)
            res_t = res_t.at[:C, tgt_t].set(uval.T, mode='drop')
    if also_transposed:
        return res, res_t
    return res


def ring_gather(src, sched, interpret=False, transposed_out=False,
                src_rows=None, also_transposed=False):
    """``src[idx_flat]`` for a (Vp, C<=16) f32 table via the
    sliding-ring kernel; ``sched`` from ``ring_gather_schedule`` built
    on the same (static) index array.  ``transposed_out=True`` returns
    the kernel-native (csub, Rp) layout (rows = columns, lanes =
    gather rows) for consumers that reduce along the stream.

    ``src_rows``: pass the table's ROW count to mark ``src`` as
    already lane-major (csub, src_rows) — skips the internal (R, C)
    transpose relayout (requires ``transposed_out=True``).

    ``also_transposed``: with row-major output, ALSO return the
    kernel-native transposed form (it exists anyway — the row-major
    result is its .T) as (res, res_t)."""
    return _ring_gather_impl(src, sched.bases, sched.pbases,
                             sched.dmas, sched.idx, sched.targets,
                             sched.uncov, sched.n_steps,
                             sched.n_patch, sched.span, sched.n_rows,
                             interpret, cps=sched.cps,
                             transposed_out=transposed_out,
                             n_src_rows=src_rows,
                             also_transposed=also_transposed)
