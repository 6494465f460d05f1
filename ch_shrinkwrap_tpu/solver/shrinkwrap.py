"""Device-resident shrinkwrap conjugate-gradient solver.

TPU-native rebuild of the production solver path
``ShrinkwrapMeshConjGrad.search`` + ``TikhonovConjugateGradient.subsearch``
(/root/reference/ch_shrinkwrap/mesh_conj_grad.py:150-292,
/root/reference/ch_shrinkwrap/conj_grad.py:183-229): an N-direction
subspace minimization of

    || W (points - A f) ||^2 + sum_i lam_i^2 || L_i (f - fdef_i) ||^2

where A is the point->face correspondence operator (rebuilt each
iteration), L_i the identity, and fdef_0 the curvature-aware `_ncc`
prior.  One entire remesh block (``rf`` outer iterations) runs as a
single ``jax.lax.scan`` under ``jit`` — correspondence (blocked MXU
nearest-face matmul), gather/segment_sum mat-vecs, the tiny (<=4x4)
normal-equation solve, and the position update never leave the device.

The reference's early-stop test statistic (orthogonality of search
directions, conj_grad.py:151-162) is carried through the scan and
freezes the state when triggered, preserving static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import correspondence as corr
from ..ops import normals as _normals

class SolverDiagnostics(NamedTuple):
    """Per-iteration traces (length = num_iters; frozen after halt)."""
    tests: jax.Array        # orthogonality test statistic
    ress: jax.Array         # ||res||
    n_done: jax.Array       # number of iterations actually applied
    S: jax.Array            # (Vp, 3, s_size) final search directions
    res: jax.Array          # (N, 3) final weighted residuals
    point_influence: jax.Array  # (Vp,) |A^T 1| per vertex
    d: jax.Array            # (N,) final point->face distances
    # Gaussian curvature at the block's final positions, computed
    # in-program when the driver requests it (``want_curv_K``): the
    # boundary-time neck diagnostic then reads diags.K instead of
    # dispatching a separate curvature program through the remote
    # service (~0.3 s per remesh boundary, 18x per north-star fit).
    K: jax.Array = None     # (Vp,) or None


def compute_ncc(f, nbr_v, vnormals, point_influence, v_mask,
                ring_sched=None):
    """The curvature-aware smoothing prior `_ncc`
    (mesh_conj_grad.py:770-820): neighbor centroid plus an
    alpha * normal offset, with alpha derived from neighbor-normal
    geometry and gated by squared point influence."""
    Vp = f.shape[0]
    K = nbr_v.shape[1]
    nmask = (nbr_v >= 0) & v_mask[:, None]
    ms = nmask.sum(-1)
    ms_safe = jnp.maximum(ms, 1)
    safe = jnp.clip(nbr_v, 0, Vp - 1)

    # one wide-row (Vp*K,)-gather of [position, normal] records —
    # gathers are row-count bound, so batching the two 3-col gathers
    # into one gather halves the cost; rows pad to 8 columns for a
    # clean (8, 128) tiling of both the source and the gather output
    fn = jnp.concatenate(
        [f, vnormals, jnp.zeros((Vp, 2), f.dtype)], axis=1)  # (Vp, 8)
    ov_v = ov_u = None
    if isinstance(ring_sched, tuple) \
            and not hasattr(ring_sched, 'kmaj_block'):
        # plain 3-tuple (RingGatherSchedule is itself a NamedTuple):
        # (schedule over the first Kn neighbor slots, fixed-width
        # overflow pair lists for the rare valence > Kn vertices)
        ring_sched, ov_v, ov_u = ring_sched
    if ring_sched is not None and getattr(ring_sched, 'kmaj_block', 0):
        # blocked k-major stream: the whole prior computes with the
        # VERTEX axis on lanes (full 128-lane utilization) — the plain
        # (Vp, K, C) layouts below run their K-reductions on C<=8 of
        # 128 lanes (~25 GB/s effective, the 40 ms compute_ncc line of
        # the 656k per-op profile)
        from ..ops.pallas_gather import ring_gather
        B = ring_sched.kmaj_block
        Kn = ring_sched.n_rows // Vp    # stream neighbor slots (<= K)
        nb = Vp // B
        gt = ring_gather(fn, ring_sched,
                         transposed_out=True)       # (8, Rp)
        g = gt[:6, :Vp * Kn].reshape(6, nb, Kn, B)
        nmask_t = (ring_sched.care.reshape(nb, Kn, B)
                   & v_mask.reshape(nb, 1, B))      # (nb, Kn, B)
        mf = nmask_t.astype(f.dtype)
        pos = g[0:3] * mf[None]                     # (3, nb, Kn, B)
        nrm = g[3:6]
        ms_t = nmask_t.sum(1).astype(f.dtype)       # (nb, B)
        sum_pos_t = pos.sum(2)                      # (3, nb, B)
        if ov_v is not None:
            # exact overflow contributions (valence > Kn slots of the
            # K-wide table; fixed-width -1-padded lists keep the
            # program capacity-constant).  All ops are O(16384).
            ovm = (ov_v >= 0) & v_mask[jnp.clip(ov_v, 0, Vp - 1)]
            sv = jnp.where(ovm, ov_v, 0)
            su = jnp.where(ovm, ov_u, 0)
            ovf = ovm.astype(f.dtype)
            pos_u = f[su] * ovf[:, None]            # (O, 3)
            ov_pos = jax.ops.segment_sum(pos_u, sv, num_segments=Vp)
            ov_cnt = jax.ops.segment_sum(ovf, sv, num_segments=Vp)
            sum_pos_t = sum_pos_t + ov_pos.T.reshape(3, nb, B)
            ms_t = ms_t + ov_cnt.reshape(nb, B)
        ms_safe_t = jnp.maximum(ms_t, 1.0)
        vc_t = sum_pos_t / ms_safe_t[None]          # (3, nb, B)
        # alpha_j = ((pos_k - vc) . n_k) / sqrt(2 (max(n.n_k, 0) + 1))
        t_pos = (pos * nrm).sum(0)                  # (nb, Kn, B)
        t_vc = (vc_t[:, :, None, :] * nrm).sum(0)   # (nb, Kn, B)
        vn_t = (vnormals.T).reshape(3, nb, B)
        ndn = (nrm * vn_t[:, :, None, :]).sum(0)    # (nb, Kn, B)
        denom = jnp.sqrt(2.0 * (jnp.maximum(ndn, 0.0) + 1.0))
        a_num_t = ((t_pos - t_vc * mf) / denom
                   * mf).sum(1)                     # (nb, B)
        if ov_v is not None:
            vc_rm = vc_t.reshape(3, Vp).T           # (Vp, 3) small
            n_u = vnormals[su]
            ndn_o = (n_u * vnormals[sv]).sum(-1)
            den_o = jnp.sqrt(2.0 * (jnp.maximum(ndn_o, 0.0) + 1.0))
            t_o = ((f[su] - vc_rm[sv]) * n_u).sum(-1) / den_o * ovf
            ov_num = jax.ops.segment_sum(t_o, sv, num_segments=Vp)
            a_num_t = a_num_t + ov_num.reshape(nb, B)
        alpha_t = a_num_t / ms_safe_t
        pi_t = point_influence.reshape(nb, B)
        alpha_t = alpha_t * jnp.minimum(pi_t ** 2, 1.0)
        out_t = vc_t + alpha_t[None] * vn_t         # (3, nb, B)
        empty = (ms_t == 0)
        out_t = jnp.where(empty[None], (f.T).reshape(3, nb, B), out_t)
        return out_t.reshape(3, Vp).T
    if ring_sched is not None:
        # large-table path: sliding-ring Mosaic gather (XLA's gather
        # falls off a cache cliff above ~300k source rows)
        from ..ops.pallas_gather import ring_gather
        vg = ring_gather(fn, ring_sched).reshape(Vp, K, 8)
    else:
        vg = fn[safe]                                # (Vp, K, 8)
    vpos = vg[..., 0:3]
    n_n = vg[..., 3:6]
    vc = (vpos * nmask[..., None]).sum(1) / ms_safe[:, None]

    c_n = (vpos - vc[:, None, :]) * nmask[..., None]
    n_dot_n = (n_n * vnormals[:, None, :]).sum(-1)
    alpha_j = ((c_n * n_n).sum(-1)
               / jnp.sqrt(2.0 * (jnp.maximum(n_dot_n, 0.0) + 1.0)))
    alpha = (alpha_j * nmask).sum(-1) / ms_safe
    alpha = alpha * jnp.minimum(point_influence ** 2, 1.0)

    vc = vc + alpha[:, None] * vnormals
    return jnp.where((ms == 0)[:, None], f, vc)


@partial(jax.jit,
         static_argnames=('num_iters', 'use_shrink', 'face_chunk',
                          'corr_method', 'polish_iters',
                          'pallas_interpret', 'face_hcgc',
                          'want_curv_K', 'spmd_mesh'))
def cg_block(positions, faces, f_mask, v_mask, nbr_v,
             points, sigma_inv, weights, point_mask,
             lam0, shrink_lam=0.0, num_iters=5,
             use_shrink=False, face_chunk=2048, stop_eps=1e-6,
             corr_method='brute', cell_size=1.0, face_nbrs=None,
             polish_iters=0, pallas_interpret=False,
             fold_starts=None, fold_uncov=None,
             ring_tri=None, ring_ncc=None, ring_fold=None,
             face_hcgc=False, active_iters=None,
             nbr_f=None, want_curv_K=False,
             ring_tri_cb=None, spmd_mesh=None):
    """Run ``num_iters`` CG iterations on device; returns
    (new_positions, SolverDiagnostics).

    Parameters
    ----------
    positions : (Vp, 3) f32 padded vertex positions
    faces, f_mask, v_mask, nbr_v : padded MeshArrays fields
    points : (N, 3) f32 localizations
    sigma_inv : (N, 3) f32 inverse localization errors
    weights : (N, 3) f32 residual weights (typically normalized
        sigma_inv — see opt driver); zero rows are masked out of the
        subspace solve like the reference's ``self.mask``
    point_mask : (N,) bool — padding mask for the point cloud
    lam0 : regularization weight (= step_size * kc / 2,
        _membrane_mesh.pyx:1483-1486)
    use_shrink : enable the shrink prior as a second working
        regularization term (the reference declares it but its
        ``n_smooth = min(len(Lfuncs), len(lams))`` clamp leaves it
        dead — SURVEY §2 quirks; here it actually works)
    fold_starts, fold_uncov : optional static faces->verts fold
        schedule from ``meshdata.fold_schedule`` — routes the A^T
        second stage through the sliding-ring kernel plus an exact
        side-scatter of the host-verified uncovered rows.  XLA's
        segment_sum wins below ~300k padded vertices (cache-resident
        output) and collapses above; the driver gates on that.
    ring_tri, ring_ncc : optional ``RingGatherSchedule``s
        (``ops.pallas_gather.ring_gather_schedule``) routing the
        faces-index gathers (tri / S_tri) and the ncc neighbor gather
        through the sliding-ring Mosaic kernel — the production
        large-table path (4-5x XLA's cliff gather at 656k verts).
    ring_fold : optional (sched, inc_mask, ov_rows, ov_verts) from the
        driver (``meshdata.incidence_table`` + ring schedule over it):
        runs the faces->verts fold as ring-GATHER of each vertex's
        incident (face, corner) rows + masked sum — the scatter-free
        inverse of the fold, replacing both XLA's cliff segment_sum
        AND the windowed scatter kernel (59 ms/iter at 656k).
        ``ov_rows/ov_verts`` carry valence>K overflow rows (rare)
        through one tiny exact scatter-add; None when empty.
    face_hcgc : contract the subspace normal equations face-side
        (eliminates the (N, 9s) AS gather).  Only valid with
        corr_method='windowed_pallas' AND when every unmasked point
        has strictly positive weights in all coordinates (the caller
        checks; zero-weight coordinates need the per-point el_mask).
    ring_tri_cb : optional corner-blocked (j-major) variant of
        ``ring_tri`` (``meshdata.fit_ring_schedules``): with face_hcgc
        active, the S gather runs through it with the kernel-native
        transposed output so each corner's (3s, Fp) block is a
        contiguous lane slice and Gc/Hc contract lane-major on the
        MXU.  Ignored without W2 (the per-point path needs row-major
        S_tri).
    spmd_mesh : optional ``jax.sharding.Mesh`` with a ``points``
        axis (static arg — Mesh is hashable).  Mosaic custom calls do
        not SPMD-partition under GSPMD, so with a mesh present the two
        point-axis kernel sites — the windowed correspondence sweep
        and the fused A^T/W2 scatter — run under ``shard_map``: each
        chip sweeps its own contiguous slice of the Hilbert-sorted
        cloud against the REPLICATED face table, and the face-side
        accumulators psum over ICI.  The vertex/face-side ring kernels
        run replicated (identical on every chip).  Everything else is
        plain XLA and GSPMD places it.  The cloud must be sharded so
        every chip holds whole 256-point search blocks
        (``parallel.sharding.shard_points`` pads to 256 * n_devices).
    active_iters : optional RUNTIME iteration count <= num_iters:
        iterations beyond it are skipped through the frozen branch.
        Lets the driver run variable-length blocks (to the next
        remesh/punch boundary) against one compiled program instead
        of one compile per distinct block length.
    """
    if face_hcgc and corr_method != 'windowed_pallas':
        raise ValueError('face_hcgc requires corr_method='
                         "'windowed_pallas'")
    Vp = positions.shape[0]
    N = points.shape[0]
    n_smooth = 2 if use_shrink else 1
    n_dirs0 = n_smooth + 1          # before the classic-CG last step
    s_size = n_dirs0 + 1

    pmask3 = point_mask[:, None]
    el_mask = (weights > 0) & pmask3                  # subsearch mask
    lam = jnp.array([lam0, shrink_lam], jnp.float32)

    ones_pts = jnp.ones((N, 3), jnp.float32) * pmask3

    # anchor-window selection hoisted OUT of the scan: points are
    # fixed and faces drift by nanometers per iteration while a
    # window spans ~2048 Hilbert-consecutive faces, so block-entry
    # anchors stay valid for the whole remesh block (the subsample
    # fallback still re-checks every iteration with fresh centers).
    # Saves the per-iteration median/top_k/greedy small-op tail
    # (~25 ms/iter at 1e6 pts — BASELINE.md per-op table).
    corr_starts = None
    corr_prep = None
    if corr_method in ('windowed', 'windowed_pallas'):
        centers0 = positions[faces].mean(1)
        corr_starts = corr.windowed_anchor_starts(points, centers0,
                                                  f_mask)
        if corr_method == 'windowed_pallas':
            # point-side padding/transpose/|p|^2 are iteration-
            # invariant too (~6 ms/iter of relayout at 1e6 points)
            corr_prep = corr.windowed_points_prep(points)

    ai = jnp.asarray(num_iters if active_iters is None
                     else active_iters, jnp.int32)

    def iteration_live(carry, it):
        f, S_last, tests_hist, halted, _prev_diag = carry

        # one f[faces] gather shared by centers + face/vertex normals;
        # the vertex-normal scatter is deferred and fused into the A^T
        # scatter below (same faces.reshape(-1) index)
        if ring_tri is not None:
            from ..ops.pallas_gather import ring_gather
            tri = ring_gather(f, ring_tri).reshape(-1, 3, 3)
        else:
            tri = f[faces]
        centers = tri.mean(1)
        vn_corners = _normals.vertex_normal_corners(
            f, faces, f_mask, tri=tri)

        # --- correspondence (rebuilt once per iteration, like calc_w)
        if corr_method == 'grid':
            dmean, fi = corr.nearest_face_grid(points, centers, f_mask,
                                               cell_size)
        elif corr_method == 'blocked':
            # expects fit_point_order-sorted points (driver does this)
            dmean, fi = corr.nearest_face_blocked(points, centers, f_mask)
        elif corr_method == 'windowed':
            # expects fit_point_order-sorted points AND hilbert-sorted
            # faces (meshdata.from_mesh does the latter)
            dmean, fi = corr.nearest_face_windowed(points, centers,
                                                   f_mask,
                                                   starts=corr_starts)
        elif corr_method == 'windowed_pallas':
            if spmd_mesh is not None:
                # per-shard Pallas sweep over local point blocks; the
                # face table (centers/f_mask) is replicated, so every
                # result is exact and no collective is needed here
                from jax.sharding import PartitionSpec as P

                def _sweep(pts_l, cen, fm, starts_l, prep_l):
                    return corr.nearest_face_windowed(
                        pts_l, cen, fm, use_pallas=True,
                        return_meta=True,
                        pallas_interpret=pallas_interpret,
                        starts=starts_l, prep=prep_l)

                dmean, fi, corr_meta = jax.shard_map(
                    _sweep, mesh=spmd_mesh,
                    in_specs=(P('points'), P(), P(), P('points'),
                              P('points')),
                    out_specs=(P('points'), P('points'),
                               corr.WindowedMeta(starts=P('points'),
                                                 js=P('points'),
                                                 sub_ids=P())),
                    check_vma=False)(points, centers, f_mask,
                                     corr_starts, corr_prep)
            else:
                dmean, fi, corr_meta = corr.nearest_face_windowed(
                    points, centers, f_mask, use_pallas=True,
                    return_meta=True,
                    pallas_interpret=pallas_interpret,
                    starts=corr_starts, prep=corr_prep)
        else:
            dmean, fi = corr.nearest_face_bruteforce(
                points, centers, f_mask, face_chunk=face_chunk)
        if corr_method != 'brute' and face_nbrs is not None \
                and polish_iters > 0:
            dmean, fi = corr.refine_correspondence(points, centers,
                                                   face_nbrs, fi,
                                                   n_iter=polish_iters)
        # weights + forward map reuse the face-side ``tri``
        # gather.  Gather through a 2-D row-major view and KEEP
        # the flat (N, 9) layout — XLA-TPU lowers >2-D gathers
        # with a minor-most batch dim ~8x slower (56.6 vs 7.1 ms
        # at 1M rows, scripts/probe_layout.py), and the
        # (N,9)->(N,3,3) reshape is a paid relayout
        fv9 = tri.reshape(-1, 9)[fi]                 # (N, 9)
        fvj = [fv9[:, 3 * j:3 * j + 3] for j in range(3)]
        dvert = jnp.stack(
            [jnp.sqrt(((fj - points) ** 2).sum(-1)) for fj in fvj],
            axis=-1)                                 # (N, 3)
        w = 1.0 / jnp.maximum(dvert, 1e-6)
        w = w / w.sum(-1, keepdims=True)
        w = w * pmask3
        Af = sum(fvj[j] * w[:, j:j + 1] for j in range(3))

        # --- weighted residuals (mesh_conj_grad.py:222-248)
        res = weights * (points - Af)
        w_dist = 1.0 / (dmean[:, None] * sigma_inv / 2.0 + 1.0)
        res = res * w_dist * pmask3

        # --- priors (A^T of residuals and ones, two-stage: points ->
        # (face, corner) slots by fi, then (face, corner) -> vertices
        # by the static faces table.  Scatters are row-count bound on
        # TPU, so N + 3*Fp wide rows beat the direct 3*N-row scatter,
        # and rows are widened to batch both operands in one pass)
        Fp = faces.shape[0]
        # per-corner values w_j * [res, 1]: 4 cols per corner (the
        # reference's A^T 1 scatters ones into 3 identical coordinate
        # columns — one column + sqrt(3) at readout is the same
        # number; scatter cost grows ~3.3 ms/column at this scale)
        W2 = None
        if corr_method == 'windowed_pallas':
            # scatter-free: route rows through their block's sorted
            # windows in the sliding-ring Pallas kernel (XLA scatter
            # runs ~0.5 GB/s at this scale); the w_j * [res, 1]
            # per-corner products form in-kernel, so the (N, 12)
            # operand never materializes.  Column order: 0..8 =
            # w_j * res_c (j-major), 9..11 = w_j
            from ..ops.pallas_scatter import (windowed_ah_pallas,
                                              windowed_ahw2_pallas)
            if spmd_mesh is not None:
                # per-shard accumulation of local points into the full
                # (Fp, C) face accumulators, then ONE psum over ICI —
                # the SPMD form of the reference's A^T scatter-add
                # (c_shrinkwrap_ah_helper, conj_grad_utils.c:123-167)
                from jax.sharding import PartitionSpec as P

                if face_hcgc:
                    def _scat(w_l, res_l, fi_l, js_l, st_l, sub):
                        a, w2 = windowed_ahw2_pallas(
                            w_l, res_l, fi_l, js_l, st_l, sub,
                            num_segments=Fp,
                            interpret=pallas_interpret)
                        return jax.lax.psum((a, w2), 'points')
                    acc, W2 = jax.shard_map(
                        _scat, mesh=spmd_mesh,
                        in_specs=(P('points'), P('points'),
                                  P('points'), P('points'),
                                  P('points'), P()),
                        out_specs=(P(), P()), check_vma=False)(
                        w, res, fi, corr_meta.js, corr_meta.starts,
                        corr_meta.sub_ids)
                else:
                    def _scat(w_l, res_l, fi_l, js_l, st_l, sub):
                        a = windowed_ah_pallas(
                            w_l, res_l, fi_l, js_l, st_l, sub,
                            num_segments=Fp,
                            interpret=pallas_interpret)
                        return jax.lax.psum(a, 'points')
                    acc = jax.shard_map(
                        _scat, mesh=spmd_mesh,
                        in_specs=(P('points'), P('points'),
                                  P('points'), P('points'),
                                  P('points'), P()),
                        out_specs=P(), check_vma=False)(
                        w, res, fi, corr_meta.js, corr_meta.starts,
                        corr_meta.sub_ids)
            elif face_hcgc:
                # both accumulators in ONE kernel sweep: the AH and
                # W2 passes stream identical (block, anchor) steps
                # over identical packed inputs, and per-step cost
                # scales only mildly with live columns (Cp 16 -> 24:
                # 14 + 14 -> 19 ms at 656k, bit-exact —
                # scripts/probe_ahw2.py; the previously noted 3x
                # stall was a Cp=32 cliff, not the fusion)
                acc, W2 = windowed_ahw2_pallas(
                    w, res, fi, corr_meta.js, corr_meta.starts,
                    corr_meta.sub_ids, num_segments=Fp,
                    interpret=pallas_interpret)  # (Fp,12), (Fp,6)
            else:
                acc = windowed_ah_pallas(
                    w, res, fi, corr_meta.js,
                    corr_meta.starts, corr_meta.sub_ids,
                    num_segments=Fp,
                    interpret=pallas_interpret)              # (Fp, 12)
            # the kernel emits the (j, [res, 1]) 4-wide interleaved
            # layout directly (column order baked in-kernel), shared
            # with the segment_sum branch — no permutation op
            face_acc = acc
        else:
            ah_in = jnp.concatenate([res, ones_pts[:, :1]],
                                    axis=1)                  # (N, 4)
            per_corner = (w[..., None] * ah_in[:, None, :])  # (N, 3, 4)
            face_acc = jax.ops.segment_sum(
                per_corner.reshape(N, 12), fi,
                num_segments=Fp)                             # (Fp, 12)
        if ring_fold is not None:
            # the vertex-normal corners ride the same scatter
            # (7-col rows)
            fused = jnp.concatenate(
                [vn_corners.reshape(Fp * 3, 3),
                 face_acc.reshape(Fp * 3, 4)], axis=1)       # (Fp*3, 7)
            # scatter-free fold: gather each vertex's incident rows
            # (static incidence table, host-inverted) through the
            # sliding-ring kernel and sum — beats both XLA's cliff
            # segment_sum (235 ms) and the windowed scatter kernel
            # (59 ms) at 656k verts
            from ..ops.pallas_gather import ring_gather
            f_sched, inc_mask, ov_rows, ov_verts = ring_fold
            KI = inc_mask.shape[1]
            if f_sched.care is not None and KI == 8 \
                    and f_sched.n_rows == Vp * KI \
                    and f_sched.n_rows % (f_sched.cps * 128) == 0:
                # masked KI-group sum on the kernel-native transposed
                # layout: lanes = stream rows (full utilization), and
                # the adjacent-8-lane group sum is a (128, 16) 0/1
                # matmul on the MXU — the row-major (Vp, KI, 7) masked
                # sum ran on 7 of 128 lanes (~10 ms of the 656k
                # per-iter profile)
                Rf = f_sched.n_rows
                # strip the in-gather uncov fixup (a minor-axis
                # scatter on the big transposed buffer = full-buffer
                # copy); uncovered rows read 0 from the kernel, so the
                # exact fixup is a tiny scatter-ADD on the folded
                # output below
                gt = ring_gather(fused, f_sched._replace(uncov=None),
                                 transposed_out=True)     # (8, Rf)
                cm = f_sched.care.astype(fused.dtype)
                gt = (gt * cm[None, :]).reshape(8, Rf // 128, 128)
                gm = (jax.lax.broadcasted_iota(jnp.int32, (128, 16), 0)
                      // KI
                      == jax.lax.broadcasted_iota(jnp.int32, (128, 16),
                                                  1)
                      ).astype(fused.dtype)
                out7t = jax.lax.dot_general(
                    gt, gm, (((2,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)
                out7 = (out7t.reshape(8, Vp)[:7]).T        # (Vp, 7)
                if f_sched.uncov is not None:
                    u = f_sched.uncov
                    um = u >= 0
                    uv = fused[f_sched.idx.reshape(-1)[
                        jnp.clip(u, 0, Rf - 1)]] * um[:, None]
                    out7 = out7.at[jnp.where(um, u // KI, Vp)].add(
                        uv, mode='drop')
            else:
                vg7 = ring_gather(fused, f_sched).reshape(Vp, KI, 7)
                out7 = (vg7 * inc_mask[..., None]).sum(1)  # (Vp, 7)
            if ov_rows is not None:
                # -1-padded fixed-width overflow lists (capacity-
                # constant program layout): padding rows contribute
                # zero and target the dropped out-of-range row
                ovm = ov_rows >= 0
                ovals = (fused[jnp.clip(ov_rows, 0, fused.shape[0] - 1)]
                         * ovm[:, None])
                out7 = out7.at[jnp.where(ovm, ov_verts, Vp)].add(
                    ovals, mode='drop')
        elif fold_starts is not None:
            # static 3-band window schedule (host-verified): the
            # sliding-ring kernel accumulates in-band rows; the ~1%
            # uncovered tail lands via a tiny exact scatter
            fused = jnp.concatenate(
                [vn_corners.reshape(Fp * 3, 3),
                 face_acc.reshape(Fp * 3, 4)], axis=1)       # (Fp*3, 7)
            from ..ops.pallas_scatter import windowed_segment_sum_pallas
            tgt = faces.reshape(-1)
            out7 = windowed_segment_sum_pallas(
                fused, tgt, jnp.zeros((tgt.shape[0],), jnp.int32),
                fold_starts, jnp.zeros((1,), jnp.int32),
                num_segments=Vp, block_size=512,
                interpret=pallas_interpret, discard_sub=True)
            safe_u = jnp.maximum(fold_uncov, 0)
            uvals = fused[safe_u] * (fold_uncov >= 0)[:, None]
            out7 = out7.at[tgt[safe_u]].add(uvals)           # (Vp, 7)
        else:
            fused = jnp.concatenate(
                [vn_corners.reshape(Fp * 3, 3),
                 face_acc.reshape(Fp * 3, 4)], axis=1)       # (Fp*3, 7)
            out7 = jax.ops.segment_sum(fused, faces.reshape(-1),
                                       num_segments=Vp)      # (Vp, 7)
        vn = _normals.normalize_vertex_normals(out7[:, :3])
        S0_raw = out7[:, 3:6]
        point_influence = jnp.sqrt(3.0) * jnp.abs(out7[:, 6])
        ncc = compute_ncc(f, nbr_v, vn, point_influence, v_mask,
                          ring_sched=ring_ncc)

        vmask3 = v_mask[:, None]
        S0 = S0_raw * vmask3
        pref0 = (f - ncc) * vmask3
        prefs = [pref0]
        dirs = [S0, -pref0]
        if use_shrink:
            # shrink prior: f - 30 p, p = max(1 - |A^T 1|, 0) n
            # (mesh_conj_grad.py:893-909)
            p_shrink = (jnp.maximum(1.0 - point_influence, 0.0)[:, None]
                        * vn) * vmask3
            pref1 = 30.0 * p_shrink
            prefs.append(pref1)
            dirs.append(-pref1)
        dirs.append(S_last)                      # classic-CG memory
        S = jnp.stack(dirs, axis=-1)             # (Vp, 3, s_size)

        # last column only active after the first iteration
        active = jnp.arange(s_size) < jnp.where(it > 0, s_size, n_dirs0)

        # --- orthogonality test statistic (conj_grad.py:151-162);
        # reference enumerates ordered pairs (i, j != i, j >= 1) over
        # the first n_dirs0 directions
        def cos_abs(i, j):
            num = (S[..., i] * S[..., j]).sum()
            den = (jnp.linalg.norm(S[..., i].ravel())
                   * jnp.linalg.norm(S[..., j].ravel()))
            return jnp.abs(num) / jnp.maximum(den, 1e-30)

        pairs = [(i, j) for i in range(n_dirs0) for j in range(1, n_dirs0)
                 if i != j]
        test = 1.0
        for (i, j) in pairs:
            test = test - cos_abs(i, j) / len(pairs)

        # --- subspace solve (conj_grad.py:183-229); all direction
        # forward maps share the correspondence.  Gather face-side
        # first (3*Fp rows of (3, s) records), then per point through
        # a 2-D row-major view (XLA-TPU >2-D gathers with a minor
        # batch dim are ~8x slower — scripts/probe_layout.py); the
        # corner sum runs on flat 2-D slices to avoid 4-D relayouts
        use_cb = (W2 is not None and ring_tri_cb is not None)
        if use_cb:
            # corner-blocked lane-major subspace path: gather S
            # through the three per-corner streams with the
            # kernel-native transposed output — each corner's
            # (3s, Fp) block comes out lane-major directly (no (R, C)
            # retile of the gather output), and Gc/Hc contract over
            # faces as MXU matmuls with a tiny diagonal extraction,
            # replacing the row-major einsums (S_tri 15.3 + hcgc
            # einsums 7.4 ms/iter at 656k)
            from ..ops.pallas_gather import ring_gather
            ks = 3 * s_size
            S2 = S.reshape(Vp, ks)
            Sc_t = [ring_gather(S2, ring_tri_cb[a],
                                transposed_out=True)[:ks, :Fp]
                    for a in range(3)]                   # (3s, Fp)
            S_tri = None
        elif ring_tri is not None:
            from ..ops.pallas_gather import ring_gather
            S_tri = ring_gather(S.reshape(Vp, 3 * s_size),
                                ring_tri).reshape(Fp, 9 * s_size)
        else:
            S_tri = (S.reshape(Vp, 3 * s_size)[faces.reshape(-1)]
                     .reshape(Fp, 9 * s_size))             # (Fp, 9s)
        if use_cb:
            # lane-major face-side normal equations (see the comment
            # on the row-major branch below for the algebra): with
            # Sc_t[a] = S4[:, a].T laid out (i*s + k, f), the Gc
            # contraction per corner is one (3s, Fp) @ (Fp, 3) MXU
            # matmul whose (i, k, i') reshape yields Gc[k] on the
            # i = i' diagonal; Hab likewise is (3s, Fp) @ (Fp, 3s)
            # with the (i, k, i, l) diagonal.  Identical weights and
            # masking semantics: E / W2 are zero on faces without
            # points, so masked/garbage S rows contribute nothing.
            ks = 3 * s_size
            # the contraction dimension is Fp (~10^6): the default MXU
            # bf16 multiply loses ~1e-3 relative on Gc, which the
            # subspace solve turns into visible step-direction drift
            # (probe_cb parity); 'highest' keeps the fp32 mantissa at
            # ~3x the (tiny) matmul cost
            _pr = 'highest'
            Gc = 0.0
            for j in range(3):
                # w_j * res columns sit at 4j..4j+3 (interleaved)
                Mj = jnp.einsum('af,fi->ai', Sc_t[j],
                                acc[:, 4 * j:4 * j + 3],
                                precision=_pr)
                Gc = Gc + jnp.einsum('iki->k',
                                     Mj.reshape(3, s_size, 3))
            pair_col = {(0, 0): 0, (1, 1): 1, (2, 2): 2,
                        (0, 1): 3, (0, 2): 4, (1, 2): 5}
            Hc = 0.0
            for (a, b), col in pair_col.items():
                w2col = W2[:, col]
                Za_t = Sc_t[a] * w2col[None, :]
                Mab = jnp.einsum('af,bf->ab', Za_t, Sc_t[b],
                                 precision=_pr)
                Hab = jnp.einsum('ikil->kl',
                                 Mab.reshape(3, s_size, 3, s_size))
                Hc = Hc + (Hab if a == b else Hab + Hab.T)
        elif W2 is not None:
            # face-side normal equations: AS[n,i,k] =
            # sum_j w_nj S_tri[fi_n, j, i, k], so with
            # E[f,j,i]   = sum_{n: fi=f} w_nj res_ni   (= A^T cols)
            # W2[f,j,j'] = sum_{n: fi=f} w_nj w_nj'    (w2 kernel)
            # the quadratic forms contract over FACES:
            #   Gc[k]   = sum_f,j,i   S4[f,j,i,k] E[f,j,i]
            #   Hc[k,l] = sum_f,a,b,i W2[f,a,b] S4[f,a,i,k] S4[f,b,i,l]
            # eliminating the (N, 9s) AS gather (the 656k-vert
            # profile's second-largest op) and the N-row einsums.
            # Valid because res is zero exactly where el_mask is
            # false (res = weights * (...) and el_mask = weights > 0)
            # and the caller asserts el_mask has no per-coordinate
            # structure beyond the point mask (face_hcgc flag).
            # Contract corner pairs one at a time in the flat 2-D
            # (Fp, 3s) layout — batched tiny (3x3 @ 3xs) einsums
            # lower to a 21 ms/iter mess of relayouts at this scale.
            ks = 3 * s_size
            Sc = [S_tri[:, ks * a:ks * (a + 1)].reshape(Fp, 3, s_size)
                  for a in range(3)]
            Gc = sum(jnp.einsum('fik,fi->k', Sc[j],
                                acc[:, 4 * j:4 * j + 3])
                     for j in range(3))
            pair_col = {(0, 0): 0, (1, 1): 1, (2, 2): 2,
                        (0, 1): 3, (0, 2): 4, (1, 2): 5}
            Hc = 0.0
            for (a, b), col in pair_col.items():
                Za = Sc[a] * W2[:, col, None, None]
                Hab = jnp.einsum('fik,fil->kl', Za, Sc[b])
                Hc = Hc + (Hab if a == b else Hab + Hab.T)
        else:
            ASr = S_tri[fi]                                # (N, 9s)
            ks = 3 * s_size
            AS = sum(ASr[:, ks * j:ks * (j + 1)] * w[:, j:j + 1]
                     for j in range(3)).reshape(-1, 3, s_size)
            ASm = AS * el_mask[..., None]                  # (N, 3, s)
            res_m = res * el_mask

            Hc = jnp.einsum('nik,nil->kl', ASm, ASm)
            Gc = jnp.einsum('nik,ni->k', ASm, res_m)

        H = Hc
        G = Gc
        for i, pref in enumerate(prefs):
            # L = identity: LS = S, Hw = S^T S, Gw = -S^T pref
            Sv = S * vmask3[..., None]
            Hw = jnp.einsum('vik,vil->kl', Sv, Sv)
            Gw = -jnp.einsum('vik,vi->k', Sv, pref)
            H = H + lam[i] ** 2 * Hw
            G = G + lam[i] ** 2 * Gw

        # deactivate unused columns: unit diagonal, zero rhs
        act_f = active.astype(jnp.float32)
        H = H * act_f[None, :] * act_f[:, None] + jnp.diag(1.0 - act_f)
        # tiny Tikhonov jitter for numerical safety of the 4x4 solve
        H = H + 1e-20 * jnp.eye(s_size)
        G = G * act_f

        c = jnp.linalg.solve(H, G)
        step = jnp.einsum('vik,k->vi', S, c) * vmask3
        fnew = f + step

        # --- stop condition (mesh_conj_grad.py:1009-1016)
        a, b, c3 = tests_hist[0], tests_hist[1], tests_hist[2]
        stop = (c3 < b) & (b < a) & (a < stop_eps)
        halted_new = halted | stop

        f_out = jnp.where(halted_new, f, fnew)
        S_last_out = jnp.where(halted_new, S_last, fnew - f)
        tests_new = jnp.where(halted_new, tests_hist,
                              jnp.array([tests_hist[1], tests_hist[2],
                                         test]))

        # heavy diagnostics ride the carry with plain replacement:
        # once halted, f is frozen, so the next iteration recomputes
        # IDENTICAL values from it — no where(halted) freeze copies
        # and no stacked scan outputs needed
        trace = (jnp.where(halted_new, jnp.nan, test),
                 jnp.linalg.norm(res.ravel()),
                 (~halted_new).astype(jnp.int32))
        return (f_out, S_last_out, tests_new, halted_new,
                (S, res, point_influence, dmean)), trace

    def iteration(carry, it):
        # frozen branch: once halted (orthogonality stop) or past
        # ``active_iters`` (the driver runs variable-length blocks —
        # to the next surgery boundary — against ONE compiled shape),
        # skip the whole body instead of computing and discarding
        halted = carry[3]
        frozen_trace = (jnp.float32(jnp.nan), jnp.float32(0.0),
                        jnp.int32(0))
        return jax.lax.cond(
            halted | (it >= ai),
            lambda c: (c, frozen_trace),
            lambda c: iteration_live(c, it),
            carry)

    init_diag = (jnp.zeros((Vp, 3, s_size), jnp.float32),
                 jnp.zeros((N, 3), jnp.float32),
                 jnp.zeros((Vp,), jnp.float32),
                 jnp.zeros((N,), jnp.float32))
    init = (positions,
            jnp.zeros_like(positions),
            jnp.full((3,), jnp.inf, jnp.float32),
            jnp.zeros((), bool),
            init_diag)
    (f_final, _, _, _, (S_f, res_f, pi_f, d_f)), (tests, ress, dones) = \
        jax.lax.scan(iteration, init, jnp.arange(num_iters))

    K_out = None
    if want_curv_K and nbr_f is not None:
        # Gaussian curvature at the final positions for the boundary
        # neck diagnostic (pyx:1516-1527 recomputes curvature on the
        # updated mesh before flagging necks).  Only .K is consumed,
        # so XLA prunes the rest of the CurvatureState (the quadric
        # pass, dH/dK, energies) as dead code.
        from ..ops.curvature import curvature_grad
        K_out = curvature_grad(f_final, faces, f_mask, v_mask,
                               nbr_v, nbr_f).K

    diags = SolverDiagnostics(
        tests=tests, ress=ress, n_done=dones.sum(),
        S=S_f, res=res_f, point_influence=pi_f, d=d_f, K=K_out)
    return f_final, diags


def block_call(positions, faces, f_mask, v_mask, nbr_v,
               points, sigma_inv, weights, point_mask,
               lam0, shrink_lam, *, num_iters, active_iters,
               use_shrink, face_chunk, corr_method, cell_size,
               face_nbrs, fold_starts=None, fold_uncov=None,
               ring_tri=None, ring_ncc=None, ring_fold=None,
               nbr_f=None, want_curv_K=False, face_hcgc=False,
               ring_tri_cb=None, spmd_mesh=None,
               pallas_interpret=False):
    """The single call-shape for ``cg_block`` shared by the fit driver
    and the compile prewarmer.

    pjit's trace cache keys on the *call signature*, not just the
    bound values: an explicitly-passed default (``want_curv_K=False``)
    and an omitted one are DIFFERENT cache entries (measured — a full
    retrace plus a remote-service executable reload).  Routing every
    production caller through this one site makes the prewarmer's
    dummy call and the driver's real call byte-identical by
    construction, so they cannot drift apart.

    """
    return cg_block(
        positions, faces, f_mask, v_mask, nbr_v,
        points, sigma_inv, weights, point_mask,
        lam0, shrink_lam, num_iters=num_iters,
        active_iters=active_iters,
        use_shrink=use_shrink, face_chunk=face_chunk,
        corr_method=corr_method, cell_size=cell_size,
        face_nbrs=face_nbrs,
        fold_starts=fold_starts, fold_uncov=fold_uncov,
        ring_tri=ring_tri, ring_ncc=ring_ncc, ring_fold=ring_fold,
        nbr_f=nbr_f, want_curv_K=want_curv_K, face_hcgc=face_hcgc,
        ring_tri_cb=ring_tri_cb, spmd_mesh=spmd_mesh,
        pallas_interpret=pallas_interpret)
