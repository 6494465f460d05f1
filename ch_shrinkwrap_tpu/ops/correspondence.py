"""Point -> nearest-face correspondence on device.

TPU-native replacement for the reference's per-iteration cKDTree query
over face centers (``_compute_weight_matrix4``,
/root/reference/ch_shrinkwrap/mesh_conj_grad.py:433-516) and its
"~10x faster but inexact" octree variant (mesh_conj_grad.py:459-481).

Four device paths behind one interface (all static-shape, jit-safe):

* ``nearest_face_bruteforce`` — exact: squared distance via
  ``|p - c|^2 = |p|^2 + |c|^2 - 2 p.c`` (the ``-2 P C^T`` term on the
  MXU), streamed over face chunks x point blocks with a running
  (min, argmin) merge so nothing of size N x F materializes.
* ``nearest_face_grid`` — spatial-hash grid over face centers
  (XOR hash, sort + searchsorted buckets, per-cell candidate cap),
  27-neighbor-cell lookup.  Correct but gather-bound on TPU.
* ``nearest_face_blocked`` — Hilbert-sorted point blocks with
  per-block candidate tables (face -> k nearest block centroids).
* ``nearest_face_windowed`` — THE production path: both points and
  faces Hilbert-sorted, each point block reads contiguous face windows
  (pure dynamic_slice / one DMA in the Pallas variant,
  ``ops.pallas_kernels``) at index-diverse anchors; a hashed-subsample
  brute pass bounds the error for far points (same error model as the
  reference's octree approximation) and ``refine_correspondence``
  snaps near-misses along the face-adjacency graph.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# A/B knob (round-5 656k sweep): width of the contiguous Hilbert
# face windows shared by the correspondence sweep and the windowed
# A^T scatter.  Default 2048 is the production value; override via
# CSW_CORR_W for in-block A/Bs only (all sites read this one
# constant, keeping sweep and scatter windows consistent).
import os as _os
CORR_W = int(_os.environ.get('CSW_CORR_W', 2048))
# anchor-count knob for the same sweep; 3 is the production value
CORR_A = int(_os.environ.get('CSW_CORR_A', 3))

BIG = jnp.float32(3.4e38)


# ----------------------------------------------------------------------
# exact brute force (blocked)

@partial(jax.jit, static_argnames=('face_chunk', 'point_block'))
def nearest_face_bruteforce(points, centers, f_mask, face_chunk=4096,
                            point_block=8192):
    """Exact nearest valid face center for each point.

    Returns (dist (N,), idx (N,) int32).  N must not be huge-times-F:
    work is streamed in (point_block x face_chunk) tiles.
    """
    N = points.shape[0]
    Fp = centers.shape[0]
    n_fchunks = -(-Fp // face_chunk)
    Fpad = n_fchunks * face_chunk
    n_pblocks = -(-N // point_block)
    Npad = n_pblocks * point_block

    c = jnp.zeros((Fpad, 3), jnp.float32).at[:Fp].set(centers)
    m = jnp.zeros((Fpad,), bool).at[:Fp].set(f_mask)
    c2 = jnp.where(m, (c * c).sum(-1), BIG)
    c_chunks = c.reshape(n_fchunks, face_chunk, 3)
    c2_chunks = c2.reshape(n_fchunks, face_chunk)
    bases = jnp.arange(n_fchunks, dtype=jnp.int32) * face_chunk

    p = jnp.zeros((Npad, 3), jnp.float32).at[:N].set(points)
    p_blocks = p.reshape(n_pblocks, point_block, 3)

    def per_block(pb):
        p2 = (pb * pb).sum(-1)

        def body(carry, chunk):
            best_d2, best_i = carry
            cc, cc2, base = chunk
            d2 = p2[:, None] + cc2[None, :] - 2.0 * jnp.dot(
                pb, cc.T, preferred_element_type=jnp.float32)
            j = jnp.argmin(d2, axis=1)
            dmin = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
            upd = dmin < best_d2
            best_d2 = jnp.where(upd, dmin, best_d2)
            best_i = jnp.where(upd, base + j.astype(jnp.int32), best_i)
            return (best_d2, best_i), None

        init = (jnp.full((point_block,), BIG, jnp.float32),
                jnp.zeros((point_block,), jnp.int32))
        (d2, i), _ = jax.lax.scan(body, init, (c_chunks, c2_chunks, bases))
        return d2, i

    d2, i = jax.lax.map(per_block, p_blocks)
    d2 = d2.reshape(-1)[:N]
    i = i.reshape(-1)[:N]
    return jnp.sqrt(jnp.maximum(d2, 0.0)), i


# ----------------------------------------------------------------------
# shared helpers

def _subsample_ids(n_total, n_sub):
    """Quasi-uniform face subsample: stratified + hash-jittered.

    A plain stride aliases with structured face orderings (e.g. the
    4-block interleaving of subdivision meshes) and can skip whole
    regions.  Pure Knuth multiplicative hashing (``i * 2654435761
    % n_total``) decorrelates from the ordering but equidistributes
    POORLY for unlucky ``n_total``: at the 263168-face capacity the
    1024 hashed ids left gaps of ~1500 consecutive faces (vs ~280 at
    187392), which collapsed the windowed search's far-point fallback
    — measured 0.92 nearest-face agreement vs 0.98 at neighboring
    capacities, and a 99-iter fit at that capacity wrinkled hard
    enough to shred in the neck pass.  One jittered sample per
    ``n_total / n_sub`` stratum keeps the worst gap below two strata
    for EVERY capacity while the in-stratum hash keeps the
    decorrelation.
    """
    import numpy as np
    n_sub = min(n_sub, n_total)
    i = np.arange(n_sub, dtype=np.uint64)
    base = i * np.uint64(n_total) // np.uint64(n_sub)
    strat = max(n_total // n_sub, 1)
    # jitter from the HIGH bits of the multiplicative hash: the low
    # bits of i * K mod a small stratum correlate with i (K mod strat
    # can be 1), which would leave the jitter a deterministic ramp
    jit = ((i * np.uint64(2654435761)) >> np.uint64(17)) \
        % np.uint64(strat)
    ids = np.minimum(base + jit, np.uint64(n_total - 1))
    return jnp.asarray(np.unique(ids.astype(np.int32)))


# ----------------------------------------------------------------------
# spatial-hash grid

def _cell_hash(ix, iy, iz, table_size):
    """XOR spatial hash of integer cell coordinates into [0, T)."""
    h = (ix * jnp.int32(73856093)) ^ (iy * jnp.int32(19349663)) \
        ^ (iz * jnp.int32(83492791))
    return jnp.abs(h) % jnp.int32(table_size)


@partial(jax.jit,
         static_argnames=('table_size', 'cell_cap', 'n_subsample',
                          'point_block'))
def nearest_face_grid(points, centers, f_mask, cell_size,
                      table_size=1 << 18, cell_cap=32, n_subsample=2048,
                      point_block=65536):
    """Approximate-near-exact nearest face via a spatial hash grid.

    For points within ~cell_size of the surface (the overwhelming
    majority in a shrinkwrap fit) the 27-cell search is exact up to
    hash-bucket truncation (``cell_cap`` faces per cell).  A strided
    ``n_subsample``-face brute-force pass provides a bounded-error
    fallback for far points, keeping all shapes static.
    """
    N = points.shape[0]
    Fp = centers.shape[0]

    inv_h = 1.0 / cell_size
    fc = jnp.floor(centers * inv_h).astype(jnp.int32)
    fhash = _cell_hash(fc[:, 0], fc[:, 1], fc[:, 2], table_size)
    fhash = jnp.where(f_mask, fhash, jnp.int32(table_size))  # invalid last

    order = jnp.argsort(fhash)
    sorted_hash = fhash[order]                    # (Fp,)
    sorted_centers = centers[order]

    # hashed subsample fallback (invalid entries carry BIG distance)
    sub_ids = _subsample_ids(Fp, n_subsample)
    sub_c = centers[sub_ids]
    sub_m = f_mask[sub_ids]
    sub_c2 = jnp.where(sub_m, (sub_c * sub_c).sum(-1), BIG)

    n_pblocks = -(-N // point_block)
    Npad = n_pblocks * point_block
    p = jnp.zeros((Npad, 3), jnp.float32).at[:N].set(points)
    p_blocks = p.reshape(n_pblocks, point_block, 3)

    offs = jnp.array([(dx, dy, dz) for dx in (-1, 0, 1)
                      for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
                     dtype=jnp.int32)             # (27, 3)

    def per_block(pb):
        PB = pb.shape[0]
        pcell = jnp.floor(pb * inv_h).astype(jnp.int32)   # (PB, 3)

        best_d2 = jnp.full((PB,), BIG, jnp.float32)
        best_i = jnp.zeros((PB,), jnp.int32)

        def cell_pass(carry, off):
            best_d2, best_i = carry
            cc = pcell + off[None, :]
            qh = _cell_hash(cc[:, 0], cc[:, 1], cc[:, 2], table_size)
            start = jnp.searchsorted(sorted_hash, qh)
            end = jnp.searchsorted(sorted_hash, qh, side='right')
            # up to cell_cap candidates per cell
            idx = start[:, None] + jnp.arange(cell_cap)[None, :]
            valid = idx < end[:, None]
            idx_c = jnp.clip(idx, 0, Fp - 1)
            cand_c = sorted_centers[idx_c]                # (PB, cap, 3)
            d2 = ((cand_c - pb[:, None, :]) ** 2).sum(-1)
            d2 = jnp.where(valid, d2, BIG)
            j = jnp.argmin(d2, axis=1)
            dmin = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
            fid = order[jnp.take_along_axis(idx_c, j[:, None], 1)[:, 0]]
            upd = dmin < best_d2
            return (jnp.where(upd, dmin, best_d2),
                    jnp.where(upd, fid.astype(jnp.int32), best_i)), None

        (best_d2, best_i), _ = jax.lax.scan(
            cell_pass, (best_d2, best_i), offs)

        # fallback: strided subsample brute force
        p2 = (pb * pb).sum(-1)
        d2s = p2[:, None] + sub_c2[None, :] - 2.0 * jnp.dot(
            pb, sub_c.T, preferred_element_type=jnp.float32)
        js = jnp.argmin(d2s, axis=1)
        dsub = jnp.take_along_axis(d2s, js[:, None], 1)[:, 0]
        isub = sub_ids[js]
        upd = dsub < best_d2
        best_d2 = jnp.where(upd, dsub, best_d2)
        best_i = jnp.where(upd, isub, best_i)
        return best_d2, best_i

    d2, i = jax.lax.map(per_block, p_blocks)
    d2 = d2.reshape(-1)[:N]
    i = i.reshape(-1)[:N]
    return jnp.sqrt(jnp.maximum(d2, 0.0)), i


# ----------------------------------------------------------------------
# blocked two-stage search (the production TPU path)
#
# TPUs are gather-averse: the per-point hash-grid lookup above spends
# its time on millions of tiny row gathers.  The cloud, however, is
# STATIC for the whole fit — so sort the points once by Morton code
# (spatial blocks of consecutive points are spatially tight) and search
# per block: stage 1 assigns every face to its few nearest block
# centroids (one dense face x block distance matrix + top-k), stage 2
# computes a dense (block_points x block_candidates) distance tile per
# block — batched MXU/VPU compute with one candidate-row gather per
# BLOCK instead of per point.

def morton_order(points, bits=10):
    """Host-side Morton (Z-order) sort permutation for a point cloud."""
    import numpy as np
    p = np.asarray(points, dtype=np.float64)
    lo = p.min(0)
    hi = p.max(0)
    q = ((p - lo) / np.maximum(hi - lo, 1e-12) * ((1 << bits) - 1)
         ).astype(np.uint64)

    def spread(x):
        x &= (1 << bits) - 1
        x = (x | (x << 32)) & 0x1f00000000ffff
        x = (x | (x << 16)) & 0x1f0000ff0000ff
        x = (x | (x << 8)) & 0x100f00f00f00f00f
        x = (x | (x << 4)) & 0x10c30c30c30c30c3
        x = (x | (x << 2)) & 0x1249249249249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind='stable')


def hilbert_order(points, bits=10):
    """Host-side Hilbert-curve sort permutation (Skilling transpose).

    Unlike the Morton curve, the Hilbert curve has no octant jumps:
    consecutive-index runs are spatially CONNECTED patches, which is
    what the blocked search's per-block candidate sets rely on.
    """
    import numpy as np
    return np.argsort(hilbert_codes_for(points, bits), kind='stable')


def hilbert_codes_for(points, bits=10, lo=None, hi=None):
    """uint64 Hilbert codes of the points, quantized over their own
    bounding box (the sort key behind :func:`hilbert_order`, exposed
    so callers can combine it with partition flags into ONE argsort —
    fit_point_order's two per-partition sorts cost ~0.7 s/fit at 1e6
    points on this 1-core host).  ``lo``/``hi`` override the
    quantization box (points outside clip): fit_point_order passes the
    dense partition's box so sparse background outliers don't coarsen
    the surface points' quantization."""
    import numpy as np
    p = np.asarray(points, dtype=np.float64)
    if lo is None:
        lo = p.min(0)
    if hi is None:
        hi = p.max(0)
    p = np.clip(p, lo, hi)
    X = ((p - lo) / np.maximum(hi - lo, 1e-12) * ((1 << bits) - 1)
         ).astype(np.uint32).copy()

    if len(X) >= 4096:
        from .. import native
        code = native.hilbert_codes(X, bits)
        if code is not None:
            return code

    M = np.uint32(1 << (bits - 1))
    # inverse undo (Skilling, "Programming the Hilbert curve", 2004)
    Q = M
    while Q > 1:
        P = np.uint32(Q - 1)
        for i in range(3):
            cond = (X[:, i] & Q) != 0
            x0_inv = X[:, 0] ^ P
            t = (X[:, 0] ^ X[:, i]) & P
            x0_swp = X[:, 0] ^ t
            xi_swp = X[:, i] ^ t
            xi_new = np.where(cond, X[:, i], xi_swp)
            X[:, 0] = np.where(cond, x0_inv, x0_swp)
            if i != 0:
                X[:, i] = xi_new
        Q = np.uint32(Q >> 1)
    # Gray encode
    for i in range(1, 3):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), np.uint32)
    Q = M
    while Q > 1:
        t = np.where((X[:, 2] & Q) != 0, t ^ np.uint32(Q - 1), t)
        Q = np.uint32(Q >> 1)
    for i in range(3):
        X[:, i] ^= t

    # transpose-interleave into a single key (axis 0 holds MSBs)
    code = np.zeros(len(X), np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(3):
            code = (code << np.uint64(1)) | ((X[:, i] >> b) & 1).astype(
                np.uint64)
    return code


def fit_point_order(points, grid_n=128, sparse_fraction=0.1):
    """Once-per-fit point permutation for the blocked search.

    Hilbert order alone lets sparse background-noise points drag a
    block across huge empty volumes (the curve visits them between
    surface patches), wrecking that block's candidate coverage for the
    surface points caught inside.  Partition by local density first,
    Hilbert-sort each part, and put the sparse part last: dense blocks
    stay spatially tight, sparse blocks hold only noise points whose
    far matches tolerate the subsample fallback's bounded error.

    Density is a grid-cell occupancy count (a kNN radius estimate costs
    ~14 s at 1e6 points on this host; the histogram costs ~0.3 s and
    partitions equivalently for this purpose).
    """
    import numpy as np

    points = np.asarray(points)
    lo = points.min(0)
    hi = points.max(0)
    h = float((hi - lo).max()) / grid_n
    if h <= 0:
        return hilbert_order(points).astype(np.int64)
    cells = np.floor((points - lo) / h).astype(np.int64)
    key = (cells[:, 0] * (grid_n + 2) + cells[:, 1]) * (grid_n + 2) \
        + cells[:, 2]
    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    occupancy = counts[inv]
    thresh = max(2.0, sparse_fraction * float(np.median(counts)))
    sparse = occupancy < thresh
    # ONE argsort over (sparse flag, hilbert code): dense points first
    # in curve order, then sparse, exactly as the old two-partition
    # construction but without the second full sort (1.10 -> ~0.55 s
    # at 1e6 points).  Each partition keeps its OWN quantization box
    # (the old behavior): one shared box measurably hurts — global box
    # coarsens the surface points' quantization under far background
    # outliers, and clipping sparse points to the dense box destroys
    # their depth ordering (windowed-id agreement 0.981 -> 0.978 on
    # the production-shape test either way).
    dense_pts = points[~sparse] if sparse.any() and not sparse.all() \
        else points
    codes = hilbert_codes_for(points, lo=dense_pts.min(0),
                              hi=dense_pts.max(0))
    if sparse.any():
        sp = points[sparse]
        codes[sparse] = hilbert_codes_for(sp)
    key = codes | (sparse.astype(np.uint64) << np.uint64(62))
    return np.argsort(key, kind='stable').astype(np.int64)


@partial(jax.jit,
         static_argnames=('block_size', 'cand_cap', 'face_k',
                          'block_chunk', 'face_chunk', 'n_subsample'))
def nearest_face_blocked(points, centers, f_mask, block_size=256,
                         cand_cap=2048, face_k=16, block_chunk=8,
                         face_chunk=16384, n_subsample=2048):
    """Nearest face for Morton-sorted points via per-block candidates.

    ``points`` must be sorted so consecutive ``block_size`` runs are
    spatially coherent (see :func:`morton_order`); exactness holds when
    each point's true nearest face is among the ``cand_cap`` faces
    assigned to its block (faces pick their ``face_k`` nearest block
    centroids) — in practice >99.9% of near-surface points, with the
    remainder still matched to a nearby face.
    """
    N = points.shape[0]
    Fp = centers.shape[0]
    nblocks = -(-N // block_size)
    Npad = nblocks * block_size

    p = jnp.zeros((Npad, 3), jnp.float32).at[:N].set(points)
    # pad replicates the last real point so padding never perturbs
    # block centroids toward the origin
    if Npad != N:
        p = p.at[N:].set(points[N - 1])
    blocks = p.reshape(nblocks, block_size, 3)
    # median centroid: robust against background-noise points that get
    # curve-interleaved into a surface block
    bcent = jnp.median(blocks, axis=1)                   # (nb, 3)

    # ---- stage 1: assign each face to its face_k nearest block
    # centroids (tiny top-k per face: cheap to compile, unlike a
    # top-cand_cap-per-block sort which blows up TPU compile time),
    # then build per-block candidate tables capped by distance rank.
    b2 = (bcent * bcent).sum(-1)

    def face_chunk_topk(cch):
        cc = cch
        d2 = ((cc * cc).sum(-1)[:, None] + b2[None, :]
              - 2.0 * jnp.dot(cc, bcent.T,
                              preferred_element_type=jnp.float32))
        neg, idx = jax.lax.top_k(-d2, face_k)            # (fc, k)
        return -neg, idx.astype(jnp.int32)

    n_fchunks = -(-Fp // face_chunk)
    Fpad2 = n_fchunks * face_chunk
    cpad = jnp.zeros((Fpad2, 3), jnp.float32).at[:Fp].set(centers)
    d2k, blk = jax.lax.map(face_chunk_topk,
                           cpad.reshape(n_fchunks, face_chunk, 3))
    d2k = d2k.reshape(Fpad2, face_k)[:Fp]
    blk = blk.reshape(Fpad2, face_k)[:Fp]
    blk = jnp.where(f_mask[:, None], blk, nblocks)       # invalid -> sentinel

    pair_block = blk.reshape(-1)                          # (Fp*k,)
    pair_face = jnp.broadcast_to(
        jnp.arange(Fp, dtype=jnp.int32)[:, None], (Fp, face_k)).reshape(-1)
    pair_d = d2k.reshape(-1)
    # sort by (block, distance) so the cap keeps the nearest faces
    order_d = jnp.argsort(pair_d)
    order_b = jnp.argsort(pair_block[order_d], stable=True)
    order_final = order_d[order_b]
    sb = pair_block[order_final]
    sf = pair_face[order_final]
    starts = jnp.searchsorted(sb, jnp.arange(nblocks + 1))
    rank = jnp.arange(sb.shape[0]) - starts[jnp.clip(sb, 0, nblocks)]
    ok = (sb < nblocks) & (rank < cand_cap)
    table = jnp.full((nblocks + 1, cand_cap), -1, jnp.int32)
    table = table.at[jnp.where(ok, sb, nblocks),
                     jnp.where(ok, rank, 0)].set(
        jnp.where(ok, sf, -1).astype(jnp.int32))
    table = table[:nblocks]                               # (nb, cap)

    # ---- stage 2: dense per-block point x candidate tiles
    n_bchunks = -(-nblocks // block_chunk)
    nb_pad = n_bchunks * block_chunk
    blocks_p = jnp.zeros((nb_pad, block_size, 3), jnp.float32
                         ).at[:nblocks].set(blocks)
    table_p = jnp.full((nb_pad, cand_cap), -1, jnp.int32
                       ).at[:nblocks].set(table)

    # strided-subsample fallback set: covers blocks that attracted no
    # candidate faces (e.g. background-noise clusters far off-surface)
    sub_ids = _subsample_ids(Fp, n_subsample)
    sub_c = centers[sub_ids]
    sub_m = f_mask[sub_ids]
    sub_c2 = jnp.where(sub_m, (sub_c * sub_c).sum(-1), BIG)

    def per_chunk(chunk):
        bp, tb = chunk                                    # (bc,B,3),(bc,C)
        safe = jnp.clip(tb, 0, Fp - 1)
        cc = centers[safe]                                # (bc, C, 3)
        valid = tb >= 0
        c2 = jnp.where(valid, (cc * cc).sum(-1), BIG)     # (bc, C)
        p2 = (bp * bp).sum(-1)                            # (bc, B)
        d2 = (p2[:, :, None] + c2[:, None, :]
              - 2.0 * jnp.einsum('bpd,bcd->bpc', bp, cc,
                                 preferred_element_type=jnp.float32))
        d2 = jnp.where(valid[:, None, :], d2, BIG)
        j = jnp.argmin(d2, axis=2)                        # (bc, B)
        dmin = jnp.take_along_axis(d2, j[..., None], 2)[..., 0]
        fid = jnp.take_along_axis(safe, j, 1)
        fid = jnp.where(jnp.take_along_axis(valid, j, 1), fid, 0)

        # subsample fallback for this chunk
        flat = bp.reshape(-1, 3)
        d2s = (p2.reshape(-1)[:, None] + sub_c2[None, :]
               - 2.0 * jnp.dot(flat, sub_c.T,
                               preferred_element_type=jnp.float32))
        js = jnp.argmin(d2s, axis=1)
        dsub = jnp.take_along_axis(d2s, js[:, None], 1)[:, 0].reshape(
            bp.shape[0], -1)
        isub = sub_ids[js].reshape(bp.shape[0], -1)
        upd = dsub < dmin
        return (jnp.where(upd, dsub, dmin),
                jnp.where(upd, isub, fid).astype(jnp.int32))

    d2f, fidf = jax.lax.map(per_chunk,
                            (blocks_p.reshape(n_bchunks, block_chunk,
                                              block_size, 3),
                             table_p.reshape(n_bchunks, block_chunk,
                                             cand_cap)))
    d2f = d2f.reshape(-1)[:N]
    fidf = fidf.reshape(-1)[:N]
    return jnp.sqrt(jnp.maximum(d2f, 0.0)), fidf


class WindowedMeta(NamedTuple):
    """Scatter-routing metadata from the windowed correspondence:
    enough to re-locate every point's winning face inside one of its
    block's contiguous windows (or the shared subsample) without any
    global scatter — consumed by ``windowed_segment_sum``.  Array-only
    (jit-transparent); pass block_size/window statically alongside."""
    starts: jax.Array      # (nb, A) i32 128-aligned window starts
    js: jax.Array          # (N,) i32 subsample argmin slot per point
    sub_ids: jax.Array     # (nsub,) i32 subsample face ids


@partial(jax.jit,
         static_argnames=('block_size', 'window', 'n_subsample',
                          'n_anchors'))
def windowed_anchor_starts(points, centers, f_mask, block_size=256,
                           window=None, n_subsample=1024, n_anchors=None):
    """Anchor-window starts for ``nearest_face_windowed``: per point
    block, ``n_anchors`` index-diverse 128-aligned window starts into
    the Hilbert-sorted face array.

    Split out so the solver can hoist it OUT of the per-iteration scan:
    points never move during a fit and faces drift by nanometers per CG
    iteration while a window spans ~2048 Hilbert-consecutive faces, so
    anchors chosen from the block-entry face centers stay valid for the
    whole remesh block (the in-loop subsample fallback still re-checks
    every iteration with fresh centers).  Returns (nb, A) i32 starts.
    """
    if window is None:
        window = CORR_W
    if n_anchors is None:
        n_anchors = CORR_A
    N = points.shape[0]
    Fp = centers.shape[0]
    window = min(window, Fp)
    nblocks = -(-N // block_size)
    Npad = nblocks * block_size

    p = jnp.zeros((Npad, 3), jnp.float32).at[:N].set(points)
    if Npad != N:
        p = p.at[N:].set(points[N - 1])
    bcent = jnp.median(p.reshape(nblocks, block_size, 3), axis=1)

    sub_ids = _subsample_ids(Fp, n_subsample)
    sub_c = centers[sub_ids]
    sub_m = f_mask[sub_ids]
    sub_c2 = jnp.where(sub_m, (sub_c * sub_c).sum(-1), BIG)

    # anchor faces per block: the n_anchors nearest subsample faces to
    # the centroid — a spatial ball maps to several disjoint index runs
    # of the Hilbert face order, and each anchor opens a window into
    # one run
    n_pool = 12
    d2b = ((bcent * bcent).sum(-1)[:, None] + sub_c2[None, :]
           - 2.0 * jnp.dot(bcent, sub_c.T,
                           preferred_element_type=jnp.float32))
    _, top = jax.lax.top_k(-d2b, n_pool)                 # (nb, P)
    pool = sub_ids[top]                                  # (nb, P)
    w_half = window // 2
    # greedy index-diverse selection: each anchor must open a window
    # disjoint from the already-chosen ones (spatially-near subsample
    # faces often share an index run; diversity is the point)
    anchors = [pool[:, 0]]
    chosen_mask = jnp.zeros(pool.shape, bool).at[:, 0].set(True)
    for _a in range(1, n_anchors):
        far_from = jnp.ones(pool.shape, bool)
        for ch in anchors:
            far_from &= jnp.abs(pool - ch[:, None]) > w_half
        ok = far_from & ~chosen_mask
        # first (nearest-by-distance) pool entry that is index-far
        any_ok = ok.any(1)
        pick = jnp.argmax(ok, axis=1)
        fallback = jnp.argmax(~chosen_mask, axis=1)
        pick = jnp.where(any_ok, pick, fallback)
        chosen_mask = chosen_mask.at[jnp.arange(pool.shape[0]),
                                     pick].set(True)
        anchors.append(pool[jnp.arange(pool.shape[0]), pick])
    anchors = jnp.stack(anchors, axis=1)                 # (nb, A)
    starts = jnp.clip(anchors - w_half, 0, max(Fp - window, 0))
    return starts.astype(jnp.int32)


class WindowedPointsPrep(NamedTuple):
    """Point-side invariants of ``nearest_face_windowed`` (Pallas
    path): points never move during a fit, so the padding, the
    (nb, 3, B) block transpose and the |p|^2 row can be computed once
    per solver BLOCK and reused across its iterations (the in-scan
    recompute was ~6 ms/iter of pure relayout at 1e6 points)."""
    blocks_t: jax.Array      # (nb, 3, B) f32
    p2: jax.Array            # (nb, B) f32


@partial(jax.jit, static_argnames=('block_size',))
def windowed_points_prep(points, block_size=256):
    N = points.shape[0]
    nblocks = -(-N // block_size)
    Npad = nblocks * block_size
    p = jnp.zeros((Npad, 3), jnp.float32).at[:N].set(points)
    if Npad != N:
        p = p.at[N:].set(points[N - 1])
    blocks = p.reshape(nblocks, block_size, 3)
    return WindowedPointsPrep(
        blocks_t=jnp.transpose(blocks, (0, 2, 1)),
        p2=(blocks * blocks).sum(-1))


@partial(jax.jit,
         static_argnames=('block_size', 'window', 'block_chunk',
                          'n_subsample', 'use_pallas', 'pallas_interpret',
                          'return_meta', 'n_anchors'))
def nearest_face_windowed(points, centers, f_mask, block_size=256,
                          window=None, block_chunk=8, n_subsample=1024,
                          use_pallas=False, pallas_interpret=False,
                          return_meta=False, n_anchors=None, starts=None,
                          prep=None):
    """Nearest face via contiguous Hilbert windows — the production
    TPU path.

    Requires BOTH sides spatially sorted: points by ``fit_point_order``
    and faces by ``hilbert_order`` of their centers (meshdata.from_mesh
    does this).  Each point block then reads one contiguous ``window``
    of the face array around its centroid's anchor face — a pure
    ``dynamic_slice``, no large gathers (XLA TPU gathers of (block,
    cand) index tables are both compile- and runtime-pathological).
    The anchor comes from a hashed-subsample search per block centroid
    (or a precomputed ``starts`` (nb, A) table — see
    ``windowed_anchor_starts``); the same subsample acts as the
    far-point fallback, and the face-adjacency polish pass snaps the
    remaining boundary cases.
    """
    if window is None:
        window = CORR_W
    if n_anchors is None:
        n_anchors = CORR_A
    N = points.shape[0]
    Fp = centers.shape[0]
    # tiny meshes: a window can't exceed the face array (the Pallas
    # branch DMAs from a 128-lane-aligned table, so clamp to that)
    if use_pallas:
        window = min(window, -(-Fp // 128) * 128)
    else:
        window = min(window, Fp)
    nblocks = -(-N // block_size)
    Npad = nblocks * block_size

    if prep is None or not use_pallas:
        p = jnp.zeros((Npad, 3), jnp.float32).at[:N].set(points)
        if Npad != N:
            p = p.at[N:].set(points[N - 1])
        blocks = p.reshape(nblocks, block_size, 3)

    # hashed subsample for the fallback (and anchors when not given)
    sub_ids = _subsample_ids(Fp, n_subsample)
    sub_c = centers[sub_ids]
    sub_m = f_mask[sub_ids]
    sub_c2 = jnp.where(sub_m, (sub_c * sub_c).sum(-1), BIG)

    if starts is None:
        starts = windowed_anchor_starts(
            points, centers, f_mask, block_size=block_size,
            window=window, n_subsample=n_subsample,
            n_anchors=n_anchors)

    if not use_pallas:
        n_bchunks = -(-nblocks // block_chunk)
        nb_pad = n_bchunks * block_chunk
        blocks_p = jnp.zeros((nb_pad, block_size, 3), jnp.float32
                             ).at[:nblocks].set(blocks)
        starts_p = jnp.zeros((nb_pad, n_anchors), jnp.int32
                             ).at[:nblocks].set(starts.astype(jnp.int32))

    fmask_f = f_mask.astype(jnp.float32)

    if use_pallas:
        from .pallas_kernels import window_min_pallas
        if prep is not None:
            blocks_t, p2b = prep.blocks_t, prep.p2
        else:
            blocks_t = jnp.transpose(blocks, (0, 2, 1))   # (nb, 3, B)
            p2b = (blocks * blocks).sum(-1)               # (nb, B)
        centers_t = centers.T                             # (3, Fp)
        c2_all = jnp.where(f_mask, (centers * centers).sum(-1), BIG)
        # the kernel merges the subsample fallback in-VMEM
        d2k, fidk, jsk = window_min_pallas(
            blocks_t, starts.astype(jnp.int32), centers_t, c2_all,
            sub_ids.astype(jnp.int32), window=window,
            n_anchors=n_anchors, interpret=pallas_interpret)
        d2f = (d2k + p2b).reshape(-1)[:N]
        fidf = fidk.reshape(-1)[:N]
        d_out = jnp.sqrt(jnp.maximum(d2f, 0.0))
        if return_meta:
            Fp_al = -(-Fp // 128) * 128
            starts_al = jnp.clip(
                (starts.astype(jnp.int32) // 128) * 128, 0,
                max(Fp_al - min(window, Fp_al), 0))
            meta = WindowedMeta(
                starts=starts_al, js=jsk.reshape(-1)[:N],
                sub_ids=sub_ids.astype(jnp.int32))
            return d_out, fidf, meta
        return d_out, fidf

    def per_chunk(chunk):
        bp, st = chunk                               # (bc,B,3),(bc,A)

        def one_block(args):
            pb, s0s = args                           # (B,3), (A,)
            p2 = (pb * pb).sum(-1)
            best_d = jnp.full((pb.shape[0],), BIG, jnp.float32)
            best_i = jnp.zeros((pb.shape[0],), jnp.int32)
            for a_ in range(n_anchors):
                s0 = s0s[a_]
                cw = jax.lax.dynamic_slice(centers, (s0, 0), (window, 3))
                mw = jax.lax.dynamic_slice(fmask_f, (s0,), (window,))
                c2 = jnp.where(mw > 0, (cw * cw).sum(-1), BIG)
                d2 = (p2[:, None] + c2[None, :]
                      - 2.0 * jnp.dot(pb, cw.T,
                                      preferred_element_type=jnp.float32))
                j = jnp.argmin(d2, axis=1)
                dmin = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
                upd = dmin < best_d
                best_d = jnp.where(upd, dmin, best_d)
                best_i = jnp.where(upd, (s0 + j).astype(jnp.int32),
                                   best_i)
            return best_d, best_i

        dmin, fid = jax.vmap(one_block)((bp, st))

        # subsample fallback for this chunk
        flat = bp.reshape(-1, 3)
        p2f = (flat * flat).sum(-1)
        d2s = (p2f[:, None] + sub_c2[None, :]
               - 2.0 * jnp.dot(flat, sub_c.T,
                               preferred_element_type=jnp.float32))
        js = jnp.argmin(d2s, axis=1)
        dsub = jnp.take_along_axis(d2s, js[:, None], 1)[:, 0].reshape(
            bp.shape[0], -1)
        isub = sub_ids[js].reshape(bp.shape[0], -1)
        upd = dsub < dmin
        return (jnp.where(upd, dsub, dmin),
                jnp.where(upd, isub, fid).astype(jnp.int32))

    d2f, fidf = jax.lax.map(per_chunk,
                            (blocks_p.reshape(n_bchunks, block_chunk,
                                              block_size, 3),
                             starts_p.reshape(n_bchunks, block_chunk,
                                              n_anchors)))
    d2f = d2f.reshape(-1)[:N]
    fidf = fidf.reshape(-1)[:N]
    return jnp.sqrt(jnp.maximum(d2f, 0.0)), fidf


def nearest_face(points, centers, f_mask, face_chunk=4096, method='auto',
                 cell_size=None, **kw):
    """Dispatcher: grid hash when a cell size is given (production),
    otherwise exact blocked brute force."""
    if method == 'grid' or (method == 'auto' and cell_size is not None):
        return nearest_face_grid(points, centers, f_mask, cell_size, **kw)
    return nearest_face_bruteforce(points, centers, f_mask,
                                   face_chunk=face_chunk)


# ----------------------------------------------------------------------
# correspondence weights + sparse operators

def correspondence_weights(positions, faces, point_xyz, nearest_idx):
    """Inverse-distance weights of each point over its nearest face's
    three vertices (mesh_conj_grad.py:488-516).

    Returns
    -------
    v_idx : (N, 3) i32 — vertex indices of the nearest face
    w : (N, 3) f32 — row-normalized 1/max(dist, 1e-6) weights
    """
    v_idx = faces[nearest_idx]                       # (N, 3)
    fv = positions[v_idx]                            # (N, 3, 3)
    d = jnp.sqrt(((fv - point_xyz[:, None, :]) ** 2).sum(-1))
    w = 1.0 / jnp.maximum(d, 1e-6)
    w = w / w.sum(-1, keepdims=True)
    return v_idx, w


def a_apply(f, v_idx, w):
    """Forward operator: predicted surface point per localization,
    ``A f = sum_i w_i f[v_idx_i]`` (mesh_conj_grad.py:518-551)."""
    return (f[v_idx] * w[..., None]).sum(axis=1)     # (N, 3)


def ah_apply(r, v_idx, w, n_vertices):
    """Adjoint operator: scatter-add point residuals onto the three
    vertices of each point's face, ``A^T r`` — the TPU counterpart of
    ``c_shrinkwrap_ah_helper`` (conj_grad_utils.c:123-167)."""
    vals = (w[..., None] * r[:, None, :]).reshape(-1, 3)   # (3N, 3)
    idx = v_idx.reshape(-1)
    return jax.ops.segment_sum(vals, idx, num_segments=n_vertices)


@partial(jax.jit, static_argnames=('n_iter',))
def refine_correspondence(points, centers, face_nbrs, fid, n_iter=3):
    """Local descent on the face-adjacency graph.

    Starting from an approximate match, repeatedly test the current
    face's three edge-neighbors and move to whichever center is closer.
    Snaps any near-miss (off by a few faces) to the true local nearest
    face; costs n_iter gathers of 4 rows per point.
    """
    def step(_, state):
        fid, d2 = state
        nb = face_nbrs[fid]                       # (N, 3)
        safe = jnp.clip(nb, 0, centers.shape[0] - 1)
        cc = centers[safe]                        # (N, 3, 3)
        dd = ((cc - points[:, None, :]) ** 2).sum(-1)
        dd = jnp.where(nb >= 0, dd, BIG)
        j = jnp.argmin(dd, axis=1)
        dmin = jnp.take_along_axis(dd, j[:, None], 1)[:, 0]
        better = dmin < d2
        fid = jnp.where(better, jnp.take_along_axis(safe, j[:, None],
                                                    1)[:, 0], fid)
        d2 = jnp.where(better, dmin, d2)
        return fid, d2

    d2 = ((centers[fid] - points) ** 2).sum(-1)
    fid, d2 = jax.lax.fori_loop(0, n_iter, step, (fid, d2))
    return jnp.sqrt(jnp.maximum(d2, 0.0)), fid


def windowed_segment_sum(vals, fid, meta: WindowedMeta, num_segments,
                         block_size=256, window=2048, scan_chunk=1):
    """segment_sum(vals, fid) -> (num_segments, C) without a global
    scatter.

    XLA-TPU scatters run at ~0.5 GB/s at 1M rows (scripts/
    probe_layout.py); here every row's target is known to lie inside
    one of its block's ``n_anchors`` contiguous 128-aligned windows
    (or the shared subsample) — exactly the candidate set the windowed
    correspondence searched.  A ``lax.scan`` over point blocks
    accumulates each window region with a factorized one-hot MXU
    matmul (hi/lo decomposition of the in-window offset keeps the
    one-hot build off the VPU critical path) and a
    dynamic_slice/dynamic_update_slice read-modify-write; the rare
    not-in-any-window rows (subsample fallback winners) accumulate
    into a (nsub, C) side table folded in with one tiny scatter.
    """
    N, C = vals.shape
    Bsz = block_size
    # same clamp as the windowed search applies for tiny face tables
    W = min(window, -(-num_segments // 128) * 128)
    Wh = W // 128
    nb = meta.starts.shape[0]
    A = meta.starts.shape[1]
    nsub = meta.sub_ids.shape[0]
    nsh = nsub // 128
    Npad = nb * Bsz
    Fp_al = -(-num_segments // 128) * 128

    valsp = jnp.zeros((Npad, C), vals.dtype).at[:N].set(vals)
    fidp = jnp.zeros((Npad,), jnp.int32).at[:N].set(fid)
    jsp = jnp.zeros((Npad,), jnp.int32).at[:N].set(meta.js)

    def one_block(carry, val, f, st, j):
        acc, sacc = carry
        B = val.shape[0]
        left = jnp.ones((B,), bool)
        for a in range(A):
            s0 = st[a]
            off = f - s0
            ina = left & (off >= 0) & (off < W)
            hi = ((jax.lax.broadcasted_iota(jnp.int32, (B, Wh), 1)
                   == (off // 128)[:, None]) & ina[:, None]
                  ).astype(jnp.float32)
            lo = (jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
                  == (off % 128)[:, None]).astype(jnp.float32)
            t1 = (hi[:, :, None] * val[:, None, :]).reshape(B, Wh * C)
            part = jax.lax.dot_general(
                t1, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (Wh*C, 128)
            part = jnp.transpose(part.reshape(Wh, C, 128),
                                 (0, 2, 1)).reshape(W, C)
            region = jax.lax.dynamic_slice(acc, (s0, 0), (W, C))
            acc = jax.lax.dynamic_update_slice(acc, region + part,
                                               (s0, 0))
            left = left & ~ina
        # subsample remainder (hi/lo factorized the same way)
        hi = ((jax.lax.broadcasted_iota(jnp.int32, (B, nsh), 1)
               == (j // 128)[:, None]) & left[:, None]
              ).astype(jnp.float32)
        lo = (jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
              == (j % 128)[:, None]).astype(jnp.float32)
        t1 = (hi[:, :, None] * val[:, None, :]).reshape(B, nsh * C)
        spart = jax.lax.dot_general(
            t1, lo, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sacc = sacc + jnp.transpose(spart.reshape(nsh, C, 128),
                                    (0, 2, 1)).reshape(nsub, C)
        return acc, sacc

    # scan_chunk > 1 unrolls several blocks per scan step; measured
    # slower on TPU v5e (6.6 vs 6.8 iters/s at the bench scale), so
    # the default stays 1
    CH = scan_chunk
    nch = -(-nb // CH)
    nbp = nch * CH
    if nbp != nb:
        pad = nbp - nb
        valsp = jnp.concatenate(
            [valsp, jnp.zeros((pad * Bsz, C), valsp.dtype)])
        fidp = jnp.concatenate([fidp, jnp.zeros((pad * Bsz,), jnp.int32)])
        jsp = jnp.concatenate([jsp, jnp.zeros((pad * Bsz,), jnp.int32)])
        starts_all = jnp.concatenate(
            [meta.starts, jnp.zeros((pad, A), jnp.int32)])
    else:
        starts_all = meta.starts

    def body(carry, inp):
        vals_c, fid_c, st_c, js_c = inp    # (CH,B,C),(CH,B),(CH,A),(CH,B)
        for k in range(CH):
            carry = one_block(carry, vals_c[k], fid_c[k], st_c[k],
                              js_c[k])
        return carry, None

    acc0 = jnp.zeros((Fp_al, C), jnp.float32)
    sacc0 = jnp.zeros((nsub, C), jnp.float32)
    (acc, sacc), _ = jax.lax.scan(
        body, (acc0, sacc0),
        (valsp.reshape(nch, CH, Bsz, C), fidp.reshape(nch, CH, Bsz),
         starts_all.reshape(nch, CH, A), jsp.reshape(nch, CH, Bsz)))
    acc = acc[:num_segments].at[meta.sub_ids].add(sacc)
    return acc
