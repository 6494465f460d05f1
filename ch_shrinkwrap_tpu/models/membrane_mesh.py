"""MembraneMesh — the flagship NanoWrap model/driver.

TPU-native rebuild of the reference's Cython ``MembraneMesh``
(/root/reference/ch_shrinkwrap/_membrane_mesh.pyx:78-1681): the host
object owns the compact mesh and the fit schedule, while every CG block
(``remesh_frequency`` iterations) runs as a single fused device program
(`solver.shrinkwrap.cg_block`).  Between blocks the host performs the
batched topology passes (remesh on the edge-length schedule, Gaussian-
curvature neck removal, short-edge cleanup, hole punching) and re-pads
the device arrays.

Public surface mirrors the reference: ``shrink_wrap`` /
``opt_conjugate_gradient`` drivers, curvature properties
(``curvature_mean`` etc.), optimizer diagnostics (``S0..S3``,
``point_dis``, ``rms_point_sc``, ``point_influence``), topology surgery
(``punch_holes``, ``remove_necks``, ``remove_extra_short_edges``,
``delaunay_remesh``) and ``residual_histogram``.
"""

from __future__ import annotations

import logging
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.core import TriangleMesh
from ..mesh import remesh as _remesh
from ..ops import meshdata
from ..ops import curvature as _curv
from ..ops import correspondence as _corr
from ..ops import normals as _norm
from ..solver.shrinkwrap import block_call

logger = logging.getLogger(__name__)

DESCENT_METHODS = ['conjugate_gradient', 'skeleton']
DEFAULT_DESCENT_METHOD = 'conjugate_gradient'

KBT = _curv.KBT


class MembraneMesh(TriangleMesh):
    """Triangle mesh with Canham-Helfrich state and shrinkwrap drivers.

    Constructor parity with the reference (_membrane_mesh.pyx:79-120):
    accepts ``(vertices, faces)`` or ``mesh=...`` plus keyword
    overrides for every optimizer/topology parameter.
    """

    def __init__(self, vertices=None, faces=None, mesh=None, **kwargs):
        # Bending stiffness (units of kBT-scaled eV, pyx:82-84)
        self.kc = 20.0 * KBT
        self.kg = -20.0 * KBT
        self.c0 = 0.0

        # Optimizer parameters (pyx:95-102)
        self.step_size = 1.0
        self.beta_1 = 0.8
        self.beta_2 = 0.7
        self.eps = 1e-8
        self.max_iter = 250
        self.remesh_frequency = 100
        self.delaunay_remesh_frequency = 150
        self.delaunay_eps = 1.0

        self.search_k = 200
        self.search_rad = 100
        self.skip_prob = 0.0
        self.smooth_curvature = True

        self.neck_threshold_low = -1e-4
        self.neck_threshold_high = 1e-2
        self.neck_first_iter = -1
        # low-side neck criterion: 'threshold' (reference-identical)
        # or 'separator' (connectivity-proven waist rings, opt-in —
        # see remove_necks)
        self.neck_detector = 'threshold'
        # separator-mode knobs: candidate bound (relaxed — connectivity
        # plus the median gate do the discrimination), the per-patch
        # median-K coherence bound, and the constriction ratio (patch
        # ring radius over adjacent surface radius; a true waist
        # constricts).  These defaults are the grid-validated config
        # (BASELINE.md round 4) and the recipe traits mirror them.
        self.neck_separator_threshold = -1e-5
        self.neck_separator_median = -2e-4
        self.neck_separator_constriction = 0.9
        # opt-in thin-tube pinch protection (TwoToruses low-cw regime,
        # BASELINE.md round 4): the remesh collapse pass skips edges
        # whose endpoint normals diverge beyond acos(veto_cos) unless
        # the edge is pathologically short — on a junction whose tube
        # diameter approaches the target edge length, collapsing the
        # divergent-normal circumferential edges is what pinches it
        self.remesh_collapse_veto = False
        self.remesh_collapse_veto_cos = 0.5
        self.shrink_weight = 0.0
        self.truncate_at = 2 ** 31
        # Skip the internal remesh inside boundary surgeries
        # (remove_necks / remove_extra_short_edges) when the driver's
        # scheduled remesh immediately follows — it redoes the same
        # split/collapse work at the scheduled target.  False = the
        # reference's exact doubled sequence (pyx:1539-1546).
        self.defer_boundary_remesh = True

        # capacity bucketing quantum for device arrays
        self.pad_quantum = 1024
        # 'final': ONE static shape for the whole fit, predicted from
        # the edge-length schedule — one compile / one executable-load
        # per fit (the remote compile service charges ~15-200 s per
        # program, dwarfing the padded-size device cost of early
        # blocks).  'bucketed': pow2 capacity ladder, ~log2(growth)
        # programs — smaller early blocks, more service stalls.
        self.capacity_mode = 'final'
        self.face_chunk = 2048
        # correspondence kernel: 'brute' (exact), 'grid' (spatial
        # hash), 'blocked', 'windowed', 'windowed_pallas', or 'auto'
        # (windowed[_pallas on TPU] once N*F crosses the brute budget)
        self.corr_method = 'auto'

        self._points = None
        self._sigma = None
        # cloud-derived compile prewarm handle
        # (solver.prewarm.prewarm_for_cloud) — adopted or canceled at
        # the first opt_conjugate_gradient call
        self.early_prewarm = None
        self._last_diag = None
        self._curv_state = None
        self.mdh = {}

        TriangleMesh.__init__(self, vertices, faces, mesh, **kwargs)

        self.vertex_properties = ['E', 'curvature_principal0',
                                  'curvature_principal1', 'point_dis',
                                  'rms_point_sc', 'point_influence']
        self.vertex_vector_properties = ['S0', 'S1', 'S2', 'S3']

    # ------------------------------------------------------------------
    # curvature state (cached, recomputed on demand)

    def _invalidate(self):
        TriangleMesh._invalidate(self)
        self._curv_state = None

    def _invalidate_geometry(self):
        TriangleMesh._invalidate_geometry(self)
        self._curv_state = None

    def _initialize_curvature_vectors(self):
        """Reference API parity (pyx:188): drop cached curvature."""
        self._curv_state = None

    def _padded_meshdata(self):
        """Device meshdata padded to power-of-two buckets: diagnostic
        and curvature programs then recompile only when the mesh
        crosses a bucket (~log2(growth) times per fit), not on every
        1024-quantum size change (the remote compile service charges
        tens of seconds per shape — a 99-iteration fit was measured
        spending 1300 s recompiling the curvature kernel).

        The padded arrays are cached on the mesh's topology revision:
        position-only updates (``set_positions`` between CG blocks)
        refresh just the (Vp, 3) position pad instead of rebuilding —
        and re-uploading through the device tunnel — the neighbor
        tables (~50 MB, 0.6-0.9 s per diagnostic call at 163k verts)."""
        q = self.pad_quantum

        def b(n):
            c = q
            while c < n:
                c *= 2
            return c

        cached = getattr(self, '_diag_ma_cache', None)
        if (cached is not None and cached[0] == self._topo_rev
                and cached[1].positions.shape[0] >= self.vertices.shape[0]
                and cached[1].faces.shape[0] >= self.faces.shape[0]):
            rev, ma, geom_rev = cached
            if geom_rev != self._geom_rev:
                pos = np.zeros((ma.positions.shape[0], 3), np.float32)
                pos[:self.vertices.shape[0]] = self.vertices
                ma = ma._replace(positions=jnp.asarray(pos))
                self._diag_ma_cache = (rev, ma, self._geom_rev)
            return ma
        # rebuild (topology changed): KEEP the previous capacities when
        # they still cover — a fit-donated cache carries the fit's
        # (v_cap, f_cap), and shrinking surgery (punch/necks) must not
        # bounce the curvature program to a different pow2 shape (one
        # cold service compile per new shape, ~15-100 s)
        if (cached is not None
                and cached[1].positions.shape[0] >= self.vertices.shape[0]
                and cached[1].faces.shape[0] >= self.faces.shape[0]):
            v_cap = cached[1].positions.shape[0]
            f_cap = cached[1].faces.shape[0]
        else:
            v_cap, f_cap = b(self.vertices.shape[0]), b(self.faces.shape[0])
        ma = meshdata.from_mesh(self, v_cap=v_cap, f_cap=f_cap, quantum=q)
        self._diag_ma_cache = (self._topo_rev, ma, self._geom_rev)
        return ma

    def _donate_diag_meshdata(self, ma, positions_dev):
        """Fit-driver hook: adopt the CG block's device-resident padded
        meshdata (+ post-block positions, already padded on device) as
        the diagnostic cache, so the boundary-time curvature read
        (remove_necks) pays no table rebuild and no re-upload."""
        self._diag_ma_cache = (self._topo_rev,
                               ma._replace(positions=positions_dev),
                               self._geom_rev)

    def _populate_curvature_grad(self):
        ma = self._padded_meshdata()
        if (ma.host or {}).get('lazy_tables'):
            # fit-donated meshdata with lazy (never-uploaded) neighbor
            # tables: the device curvature kernel reads them for real
            ma = meshdata.materialize_tables(ma)
            self._diag_ma_cache = (self._topo_rev, ma, self._geom_rev)
        st = _curv.curvature_grad(
            ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            ma.nbr_f, kc=self.kc, kg=self.kg, c0=self.c0)
        # device results are fetched lazily, one field per _curv(key)
        # access: through the device tunnel each fetch costs real
        # latency, and most callers (remove_necks!) want a single field
        self._curv_state = {'_dev': st}
        return self._curv_state

    def _curv(self, key):
        if self._curv_state is None:
            if key == 'K' and getattr(self, 'use_native_neck_k', True):
                # K-only fast path for the boundary neck diagnostic
                # (remove_necks, pyx:1212-1213 consumes only K): the
                # native host kernel avoids both the folded device
                # curvature in the CG block and the standalone
                # curvature program — together ~9 MB of TPU executable
                # through the remote service (scripts/
                # probe_exec_census.py) — at ~0.1 s/boundary host cost.
                from .. import native
                V = self.vertices.shape[0]
                nbr_v = None
                cached = getattr(self, '_diag_ma_cache', None)
                if cached is not None and cached[0] == self._topo_rev:
                    h = cached[1].host or {}
                    nv_h = h.get('nbr_v')
                    if nv_h is not None and nv_h.shape[0] >= V:
                        nbr_v = nv_h[:V]
                K_nat = native.gaussian_k(self.vertices, self.faces,
                                          nbr_v=nbr_v)
                if K_nat is not None:
                    self._curv_state = {'_native_K': K_nat}
            if self._curv_state is None:
                self._populate_curvature_grad()
        st = self._curv_state
        if key not in st:
            if '_dev' not in st or getattr(st['_dev'], key) is None:
                # fit-donated partial state (only K) or the native
                # K-only seed: repopulate fully on any other field
                if key == 'K' and '_native_K' in st:
                    out = st['_native_K'][:self.vertices.shape[0]]
                    if self.smooth_curvature:
                        out = self.smooth_per_vertex_data(out)
                    st[key] = out
                    return st[key]
                st = self._populate_curvature_grad()
            V = self.vertices.shape[0]
            out = np.asarray(getattr(st['_dev'], key))[:V]
            if self.smooth_curvature and key in ('H', 'K', 'k_0', 'k_1'):
                out = self.smooth_per_vertex_data(out)
            st[key] = out
        return st[key]

    @property
    def curvature_mean(self):
        return self._curv('H')

    @property
    def curvature_gaussian(self):
        return self._curv('K')

    @property
    def curvature_principal0(self):
        return self._curv('k_0')

    @property
    def curvature_principal1(self):
        return self._curv('k_1')

    @property
    def eigenvector_principal0(self):
        return self._curv('e_0')

    @property
    def eigenvector_principal1(self):
        return self._curv('e_1')

    @property
    def E(self):
        return np.nan_to_num(self._curv('E'))

    @property
    def pE(self):
        return np.nan_to_num(self._curv('pE'))

    def curvature_grad(self, dN=0.1, skip_prob=0.0):
        """Bending-energy gradient along vertex normals (pyx:349-496)."""
        return self._curv('dEdN')

    # ------------------------------------------------------------------
    # optimizer diagnostics (parity with pyx:1563-1634)

    def _diag(self):
        if self._last_diag is None:
            raise RuntimeError('no solver diagnostics yet - run '
                               'shrink_wrap first')
        return self._last_diag

    def _S_col(self, i):
        d = self._diag()
        V = self.vertices.shape[0]
        S = np.asarray(d.S)
        if i >= S.shape[-1]:
            return np.zeros((V, 3), np.float32)
        if S.shape[0] < V:
            # topology changed since the last CG block (e.g. trailing
            # remesh); pad the stale diagnostic rather than crash
            out = np.zeros((V, 3), np.float32)
            out[:S.shape[0]] = S[:, :, i]
            return out
        return S[:V, :, i]

    @property
    def S0(self):
        return self._S_col(0)

    @property
    def S1(self):
        return self._S_col(1)

    @property
    def S2(self):
        return self._S_col(2)

    @property
    def S3(self):
        return self._S_col(3)

    @property
    def point_dis(self):
        s0 = self.S0
        return np.sqrt((s0 * s0).sum(1))

    @property
    def point_influence(self):
        """|A^T 1| per vertex.  Uses the last solver diagnostics when
        the topology hasn't changed since; recomputed fresh otherwise
        (the reference instead invalidates cg after remesh,
        _membrane_mesh.pyx:1549, leaving the property broken)."""
        V = self.vertices.shape[0]
        if self._last_diag is not None:
            pi = np.asarray(self._last_diag.point_influence)
            if pi.shape[0] >= V:
                return pi[:V]
        if self._points is None:
            raise RuntimeError('no point cloud - run shrink_wrap first')
        ma = self._padded_meshdata()
        pts = jnp.asarray(self._points.astype(np.float32))
        _, fi, centers = self._nearest_for_diagnostics(ma, pts)
        v_idx, w = _corr.correspondence_weights(ma.positions, ma.faces,
                                                pts, fi)
        out = np.asarray(_corr.ah_apply(
            jnp.ones((pts.shape[0], 3), jnp.float32), v_idx, w,
            ma.positions.shape[0]))[:V]
        return np.sqrt((out * out).sum(1))

    def _nearest_for_diagnostics(self, ma, pts):
        """Nearest-face lookup for diagnostics, sized appropriately."""
        centers = ma.positions[ma.faces].mean(1)
        N = pts.shape[0]
        if N * ma.faces.shape[0] > 2e9:
            order = _corr.fit_point_order(np.asarray(pts))
            inv = np.empty(len(order), np.int64)
            inv[order] = np.arange(len(order))
            d, fi = _corr.nearest_face_windowed(
                jnp.asarray(np.asarray(pts)[order]), centers, ma.f_mask)
            return jnp.asarray(np.asarray(d)[inv]), \
                jnp.asarray(np.asarray(fi)[inv]), centers
        d, fi = _corr.nearest_face_bruteforce(pts, centers, ma.f_mask,
                                              face_chunk=self.face_chunk)
        return d, fi, centers

    @property
    def rms_point_sc(self):
        """|A^T(|res| replicated)| per vertex (pyx:1611-1623)."""
        d = self._diag()
        # diag rows can exceed N when the cloud was padded for sharding
        res = np.asarray(d.res)[:self._points.shape[0]]
        rn = np.sqrt((res * res).sum(1))[:, None] * np.ones(3)[None, :]
        ma = self._padded_meshdata()
        pts = jnp.asarray(self._points.astype(np.float32))
        _, fi, centers = self._nearest_for_diagnostics(ma, pts)
        v_idx, w = _corr.correspondence_weights(ma.positions, ma.faces,
                                                pts, fi)
        out = np.asarray(_corr.ah_apply(jnp.asarray(rn.astype(np.float32)),
                                        v_idx, w, ma.positions.shape[0]))
        out = out[:self.vertices.shape[0]]
        return np.sqrt((out * out).sum(1))

    # ------------------------------------------------------------------
    # remesh wrapper (reference remesh + curvature invalidation,
    # pyx:249-252)

    def remesh(self, n=5, target_edge_length=-1.0, l=0.5, n_relax=10):
        veto = (float(getattr(self, 'remesh_collapse_veto_cos', 0.5))
                if getattr(self, 'remesh_collapse_veto', False) else None)
        _remesh.remesh(self, n=n, target_edge_length=target_edge_length,
                       l=l, n_relax=n_relax, collapse_veto_cos=veto)
        self._initialize_curvature_vectors()

    # ------------------------------------------------------------------
    # topology surgery

    def _separator_neck_vertices(self, K, t_cand, t_median,
                                 constriction=0.9,
                                 min_piece=16, max_comp_frac=0.05):
        """Negative-K neck detection by SEPARATION, not by threshold
        alone: candidate vertices (K < ``t_cand``) are grouped into
        connected patches, and a patch is a neck iff it borders >= 2
        sizable components of the remaining (non-candidate) surface —
        i.e. removing it provably disconnects the mesh.  This is the
        criterion the reference's own TODO asks for but never builds
        (pyx:1201-1219 removes every flagged vertex unconditionally):
        a catenoid waist ring separates; scattered wrinkle-noise
        saddles — whose K overlaps the waist K at SMLM noise, the
        measured reason the pure threshold cannot resolve the
        neck-stress grid (BASELINE.md) — do not.

        Separation alone is NOT sufficient on tube-like surfaces: a
        chain of noise saddles circling a healthy tube disconnects it
        just like a waist ring does (measured: the first separator
        grid over-cut CollinearCapsules into 5 components).  The
        discriminator is COHERENCE: a true catenoid waist is negatively
        curved around its whole ring (K = -1/c^2), while a noise chain
        assembled at a relaxed ``t_cand`` hugs the threshold — so a
        patch is only accepted when its median K clears ``t_median``.

        Host-side, O(E): two sparse connected-component passes plus a
        border-edge join.  ``max_comp_frac`` rejects percolating
        candidate networks (a relaxed ``t_cand`` may connect a large
        noise fraction; a real waist ring is a few hundred vertices)."""
        import scipy.sparse as sp
        from scipy.sparse.csgraph import connected_components

        V = self.vertices.shape[0]
        cand = K < t_cand
        n_cand = int(cand.sum())
        if n_cand == 0 or n_cand == V:
            return np.zeros(0, np.int64)
        he = self.halfedges
        ok = (he.src >= 0) & (he.vertex >= 0)
        src = he.src[ok].astype(np.int64)
        dst = he.vertex[ok].astype(np.int64)

        def comps(edge_mask):
            g = sp.coo_matrix(
                (np.ones(int(edge_mask.sum()), np.int8),
                 (src[edge_mask], dst[edge_mask])), shape=(V, V))
            return connected_components(g, directed=False)

        # components of the complement (surface minus candidates) and
        # of the candidate-induced subgraph
        _, lab_rest = comps(~cand[src] & ~cand[dst])
        n_k, lab_cand = comps(cand[src] & cand[dst])

        rest_sizes = np.bincount(lab_rest[~cand], minlength=V)
        cand_sizes = np.bincount(lab_cand[cand], minlength=n_k)

        # border edges candidate -> complement; count DISTINCT sizable
        # complement components adjacent to each candidate patch
        border = cand[src] & ~cand[dst]
        bk = lab_cand[src[border]]
        br = lab_rest[dst[border]]
        sizable = rest_sizes[br] >= min_piece
        pairs = np.unique(bk[sizable].astype(np.int64) * V
                          + br[sizable])
        touch_counts = np.bincount((pairs // V).astype(np.int64),
                                   minlength=n_k)

        size_cap = max(512, int(max_comp_frac * V))
        sep = (touch_counts >= 2) & (cand_sizes <= size_cap)
        if not sep.any():
            return np.zeros(0, np.int64)
        # border map patch -> adjacent sizable complement comps (for
        # the constriction gate below)
        adj = {}
        for k_l, r_l in zip(bk[sizable], br[sizable]):
            adj.setdefault(int(k_l), set()).add(int(r_l))

        def _constriction_ratio(pmask, sid):
            """ring radius of the patch over the local radius of its
            adjacent surface pieces — a true neck is a CONSTRICTION
            (catenoid waist c < tube radius), while a coherently
            negative wrinkle band on a healthy tube has the tube's own
            radius (measured: a 444-vert body band at medK -2.1e-4
            passed the median gate and shredded the gap-25 grid row).
            Axis = least-variance direction of the patch vertices (the
            ring-plane normal); radius = mean in-plane distance."""
            P = self.vertices[pmask]
            c = P.mean(0)
            D = P - c
            try:
                _, _, vt = np.linalg.svd(D, full_matrices=False)
            except np.linalg.LinAlgError:
                return np.inf
            axis = vt[-1]
            ax = D @ axis
            r_patch = float(np.linalg.norm(
                D - ax[:, None] * axis[None], axis=1).mean())
            if not np.isfinite(r_patch) or r_patch <= 0:
                return np.inf
            ratios = []
            for r_l in adj.get(sid, ()):
                Q = self.vertices[~cand & (lab_rest == r_l)] - c
                qax = Q @ axis
                band = np.abs(qax) < 3.0 * r_patch
                if band.sum() < 8:
                    continue
                Qb = Q[band]
                r_side = float(np.linalg.norm(
                    Qb - (Qb @ axis)[:, None] * axis[None],
                    axis=1).mean())
                if r_side > 0:
                    ratios.append(r_patch / r_side)
            # the patch must constrict relative to BOTH sides; with no
            # measurable side, reject (inf)
            return max(ratios) if len(ratios) >= 2 else np.inf

        # coherence + constriction gates
        sep_ids = np.flatnonzero(sep)
        keep = []
        for sid in sep_ids:
            pmask = cand & (lab_cand == sid)
            kk = K[pmask]
            med_ok = len(kk) and float(np.median(kk)) < t_median
            ratio = _constriction_ratio(pmask, int(sid)) if med_ok \
                else np.inf
            ok = med_ok and ratio < constriction
            if logger.isEnabledFor(logging.DEBUG):
                c = self.vertices[pmask].mean(0)
                logger.debug(
                    'separator patch %d: %d verts, medK %.2e, touches '
                    '%d, constriction %.2f, centroid (%.0f,%.0f,%.0f) '
                    '-> %s', sid, int(pmask.sum()),
                    float(np.median(kk)), int(touch_counts[sid]),
                    ratio, c[0], c[1], c[2],
                    'CUT' if ok else 'reject')
            if ok:
                keep.append(sid)
        if not keep:
            return np.zeros(0, np.int64)
        sel = np.zeros(n_k, bool)
        sel[np.asarray(keep)] = True
        return np.flatnonzero(cand & sel[lab_cand])

    def remove_necks(self, neck_curvature_threshold_low=-1e-4,
                     neck_curvature_threshold_high=1e-2,
                     defer_remesh=False):
        """Sever necks flagged by extreme Gaussian curvature
        (pyx:1201-1219): delete flagged vertices, repair the holes,
        remesh, drop severed inner fragments.

        ``defer_remesh=True`` skips the internal full remesh pass: the
        fit driver calls this only at remesh boundaries, where the
        scheduled ``remesh(5, target, 0.5)`` immediately follows and
        redoes the same split/collapse work at the scheduled target
        (the reference pays the doubled pass, pyx:1539+1546; measured
        ~92% of the surgery wall-clock here).  ``False`` reproduces the
        reference sequence exactly.

        ``self.neck_detector`` selects the low-side criterion:
        ``'threshold'`` (default, reference-identical: every vertex
        below the low threshold) or ``'separator'`` (opt-in: connected
        negative-K patches that provably disconnect the surface — see
        :meth:`_separator_neck_vertices`; candidates are taken at the
        relaxed ``self.neck_separator_threshold`` so a waist ring
        whose K only partially clears the user threshold is still
        caught whole, which is what defeats the partial-ring re-seal
        failure mode of the committed neck-stress grid).  The high
        side (spike removal) is threshold-based in both modes."""
        import time as _time
        t0 = _time.time()
        if (os.environ.get('CSW_FINE_TIMERS')
                and self._curv_state is None
                and not getattr(self, 'use_native_neck_k', True)):
            self._populate_curvature_grad()
            jax.block_until_ready(self._curv_state['_dev'].K)
            logger.info('necks fine: curv dispatch+device %.2fs',
                        _time.time() - t0)
        K = self.curvature_gaussian
        t_curv = _time.time() - t0
        detector = getattr(self, 'neck_detector', 'threshold')
        if detector == 'separator':
            t_cand = float(getattr(self, 'neck_separator_threshold',
                                   -1e-5))
            t_median = float(getattr(self, 'neck_separator_median',
                                     -2e-4))
            t_constr = float(getattr(self, 'neck_separator_constriction',
                                     0.9))
            low_verts = self._separator_neck_vertices(K, t_cand,
                                                      t_median,
                                                      t_constr)
            high_verts = np.flatnonzero(
                K > neck_curvature_threshold_high)
            # the high-side spike flags keep the wrinkle-noise safety
            # valve; separator flags are connectivity-proven necks and
            # bypass it
            if len(high_verts) > 0.25 * self.vertices.shape[0]:
                high_verts = high_verts[:0]
            verts = np.union1d(low_verts, high_verts)
            if len(verts):
                t1 = _time.time()
                self.unsafe_remove_vertices(verts)
                self.repair()
                t2 = _time.time()
                if not defer_remesh:
                    self.remesh(n_relax=0)
                t3 = _time.time()
                self.remove_inner_surfaces()
                logger.info(
                    'remove_necks[separator]: %d ring + %d spike '
                    'verts - curv %.2fs, remove+repair %.2fs, remesh '
                    '%.2fs, inner %.2fs', len(low_verts),
                    len(high_verts), t_curv, t2 - t1, t3 - t2,
                    _time.time() - t3)
            else:
                logger.info('remove_necks[separator]: 0 verts (curv '
                            '%.2fs)', t_curv)
            return
        verts = np.flatnonzero((K < neck_curvature_threshold_low)
                               | (K > neck_curvature_threshold_high))
        # Safety valve (deviation from the reference, which removes the
        # flagged set unconditionally): when a large fraction of the
        # surface trips the thresholds they are flagging wrinkle noise,
        # not necks — removing them would shred the mesh into blobs.
        if len(verts) > 0.25 * self.vertices.shape[0]:
            logger.warning(
                'remove_necks: %d/%d vertices exceed the curvature '
                'thresholds (wrinkle noise, not necks) - skipping; '
                'widen neck_threshold_low/high for this dataset',
                len(verts), self.vertices.shape[0])
            return
        if len(verts) > 0:
            t1 = _time.time()
            self.unsafe_remove_vertices(verts)
            self.repair()
            t2 = _time.time()
            if not defer_remesh:
                self.remesh(n_relax=0)
            t3 = _time.time()
            self.remove_inner_surfaces()
            logger.info(
                'remove_necks: %d verts flagged - curv %.2fs, '
                'remove+repair %.2fs, remesh %.2fs, inner %.2fs',
                len(verts), t_curv, t2 - t1, t3 - t2,
                _time.time() - t3)
        else:
            logger.info('remove_necks: 0 verts flagged (curv read '
                        '%.2fs)', t_curv)

    def remove_extra_short_edges(self, threshold=0.05,
                                 defer_remesh=False):
        """Remove vertices on pathologically short edges that topology
        prevented collapsing (pyx:1221-1237).

        ``defer_remesh`` as in :meth:`remove_necks`: skip the internal
        remesh when the driver's scheduled remesh follows at the same
        boundary."""
        he = self.halfedges
        el = he.length
        if el.size == 0:
            return
        short = el < threshold * np.median(el)
        verts = np.unique(he.vertex[short])
        if len(verts) > 0:
            import time as _time
            t1 = _time.time()
            # short-edge cleanup is a HYGIENE pass: it must never
            # change the surface's component count.  Measured failure
            # (TwoToruses 39-iter/cw=10, round 5): the two walls of a
            # thinning junction touch, the near-zero edges land here,
            # and repair() after the removal tears the junction into
            # two disjoint tori — the round-3/4 "remesh pinch" was
            # actually this pass.  Snapshot + roll back when the
            # component count increases (removing enclosed debris via
            # remove_inner_surfaces may still DECREASE it).
            snap_v = self.vertices.copy()
            snap_f = self.faces.copy()
            n_before = self.connected_components()[1]
            self.unsafe_remove_vertices(verts)
            self.repair()
            t2 = _time.time()
            if not defer_remesh:
                self.remesh(n_relax=0)
            t3 = _time.time()
            self.remove_inner_surfaces()
            n_after = self.connected_components()[1]
            if n_after > n_before or (n_after == 0 and n_before > 0):
                self.set_topology(snap_v, snap_f)
                self._initialize_curvature_vectors()
                logger.info(
                    'short_edges: rolled back (%d verts - removal '
                    'would disconnect the surface; keeping the short '
                    'edges this boundary)', len(verts))
                return
            logger.info(
                'short_edges: %d verts - remove+repair %.2fs, remesh '
                '%.2fs, inner %.2fs', len(verts), t2 - t1, t3 - t2,
                _time.time() - t3)

    def punch_holes(self, pts, eps=10.0):
        """Fenestrate the mesh between opposing unsupported face pairs
        (pyx:1163-1199); see ``models.holepunch`` for the passes."""
        from . import holepunch
        n = holepunch.punch_holes(self, pts, eps=eps)
        self._initialize_curvature_vectors()
        return n

    def delaunay_remesh(self, points, eps=1.0):
        """Rebuild the surface from the Delaunay outer hull of the
        current vertices (pyx:612-641)."""
        from ..eval import delaunay_utils
        v = self.vertices.astype(np.float64)
        import scipy.spatial
        d = scipy.spatial.Delaunay(v)
        tri = delaunay_utils.orient_simps(d, v)
        ext_inds = delaunay_utils.greedy_ext_simps(tri, self)
        simps = delaunay_utils.del_simps(tri, ext_inds)
        faces = delaunay_utils.surf_from_delaunay(simps)
        old_v, idxs = np.unique(faces.ravel(), return_inverse=True)
        reindexed = np.arange(len(old_v))[idxs].reshape(faces.shape)
        self.set_topology(v[old_v], reindexed.astype(np.int32))
        self._initialize_curvature_vectors()

    # ------------------------------------------------------------------
    # the fit driver

    def opt_conjugate_gradient(self, points, sigma, max_iter=10,
                               step_size=1.0, weights=None, **kwargs):
        """Outer fit loop (pyx:1427-1560): CG blocks of ``rf``
        iterations on device, topology passes between blocks, linear
        edge-length refinement schedule."""
        import time as _time
        _ft0 = os.environ.get('CSW_FINE_TIMERS') and _time.time
        _pre = {'t': _ft0 and _ft0()}

        def _mark(name):
            if _ft0:
                now = _ft0()
                logger.info('pre-loop: %s %.2fs', name, now - _pre['t'])
                _pre['t'] = now

        r = (self.remesh_frequency != 0) and (self.remesh_frequency <= max_iter)
        dr = ((self.delaunay_remesh_frequency != 0)
              and (self.delaunay_remesh_frequency <= max_iter))

        if r and dr:
            rf = math.gcd(self.remesh_frequency,
                          self.delaunay_remesh_frequency)
        elif r:
            rf = self.remesh_frequency
        elif dr:
            rf = self.delaunay_remesh_frequency
        else:
            rf = max_iter

        if r:
            initial_length = self._mean_edge_length
            if kwargs.get('minimum_edge_length', -1) < 0:
                final_length = float(np.clip(np.min(sigma) / 2.5, 1.0, 50.0))
            else:
                final_length = kwargs.get('minimum_edge_length')
            m = (final_length - initial_length) / (rf * np.ceil(max_iter / rf))

        neck_first_iter = getattr(self, 'neck_first_iter', -1)

        points = np.ascontiguousarray(points, dtype=np.float32)
        N = points.shape[0]
        # sigma -> per-point inverse errors (pyx:1460-1473)
        if np.isscalar(sigma):
            sigma_inv = np.full((N, 3), 1.0 / float(sigma), np.float32)
        else:
            sigma = np.asarray(sigma)
            if sigma.ndim == 1 and sigma.shape[0] == N:
                sigma_inv = (1.0 / sigma)[:, None].repeat(3, 1)
            elif sigma.ndim == 2 and sigma.shape == (N, 3):
                sigma_inv = 1.0 / sigma
            else:
                raise ValueError(
                    f"Sigma must be scalar, ({N},) or ({N},3); got "
                    f"{np.shape(sigma)}")
            sigma_inv = sigma_inv.astype(np.float32)

        if weights is None:
            w = sigma_inv
        else:
            w = np.asarray(weights, dtype=np.float32).reshape(N, 3)
        res_weights = (w / w.mean()).astype(np.float32)

        lam0 = float(step_size * self.kc / 2.0)
        use_shrink = self.shrink_weight > 0
        shrink_lam = float(self.shrink_weight)

        n_iter = int(min(max_iter, getattr(self, 'truncate_at', max_iter)))

        # decide the correspondence kernel for this problem size and
        # (for the blocked path) sort the cloud once for block locality
        method = self.corr_method
        approx_n_faces = 2 * self.vertices.shape[0]
        dmesh = getattr(self, 'device_mesh', None)
        if dmesh is not None and not hasattr(dmesh, 'devices'):
            from ..parallel.sharding import make_device_mesh
            dmesh = make_device_mesh(int(dmesh))
            self.device_mesh = dmesh
        if method == 'auto':
            big = N * approx_n_faces > 2e9
            on_tpu = jax.default_backend() == 'tpu'
            method = (('windowed_pallas' if on_tpu else 'windowed')
                      if big else 'brute')
        # Mosaic custom calls don't SPMD-partition under GSPMD, so a
        # sharded fit runs the production Pallas path through
        # shard_map (cg_block spmd_mesh): per-chip correspondence
        # sweeps over the local cloud slice, psum'd A^T/W2
        # accumulators, replicated vertex-side ring kernels.  On a
        # non-TPU mesh (the virtual-CPU dryrun/test mesh) the kernels
        # run in interpret mode.
        spmd_mesh = dmesh if (dmesh is not None
                              and method == 'windowed_pallas') else None
        pallas_interp = bool(spmd_mesh is not None
                             and jax.default_backend() != 'tpu')
        # observability: which correspondence kernel THIS fit ran (the
        # dryrun asserts the sharded path kept the production method)
        self._last_corr_method = method
        # face-side normal equations need strictly positive weights on
        # every coordinate (zero-weight coords require the per-point
        # el_mask in the N-row path) — one host check per fit
        # (order-invariant: computed before the locality sort so the
        # compile prewarmer below can start ahead of it)
        uniform_weights = bool(np.all(res_weights > 0))

        # Device-array capacity policy.  'bucketed': pad each block to
        # the next power-of-two bucket above the CURRENT mesh
        # (monotone) — early blocks of a growing fit then run at small
        # static shapes (device ops, meshdata padding, and ring
        # schedules all scale with the PADDED size, and the <=
        # log2(growth) distinct shapes are all persistently cached).
        # 'final' (default): one shape for the whole fit, predicted
        # from the edge-length schedule — one compile + ONE executable
        # load per fit, but every block pays final-size host+device
        # cost.
        # 'two': one mid-size rung (~half the predicted final capacity)
        # for the growth phase + the final rung, with the final
        # program prewarmed in the background while the early blocks
        # run — the growth phase (85 of the north star's 94 active
        # iterations run below half the final vertex count) pays
        # mid-capacity device/host cost AND its first executable load
        # is the ~half-size mid program; the final load overlaps real
        # fit work instead of the pre-loop only.
        cap_mode = getattr(self, 'capacity_mode', 'final')
        self._cap_rungs = []
        if r and cap_mode in ('final', 'two'):
            # the finest edge length the fit will actually remesh to is
            # the LAST EXECUTED remesh boundary's target (the loop
            # below uses initial + m*(j+1) at j = the largest
            # remesh-frequency multiple <= n_iter), NOT the schedule's
            # asymptote at max_iter — for the 99-iter north star that's
            # 5.33 vs 5.0, a 14% face-count overprediction
            last_remesh_iter = (n_iter // self.remesh_frequency) \
                * self.remesh_frequency
            # clamp to the schedule's own endpoints: when n_iter is an
            # exact multiple of remesh_frequency the linear schedule
            # evaluates PAST final_length at the last boundary (the
            # reference leaves this unclamped, pyx:1541-1546 — with a
            # steep schedule the target goes NEGATIVE and the capacity
            # prediction explodes; fixed here and in the loop below,
            # SURVEY §5 quirk policy)
            pred_final_len = max(float(np.clip(
                initial_length + m * (last_remesh_iter + 1),
                min(initial_length, final_length),
                max(initial_length, final_length))), 1e-3)
            # F = area / equilateral-triangle-area(l), times a measured
            # ~1.15 irregularity factor (real remeshed meshes carry more
            # faces than the equilateral estimate at their mean length);
            # 1.15 headroom on top (the seed surface is an OUTER wrap,
            # so its area is an upper bound on the final area; overshoot
            # falls back to the bucket-grow path below).  An earlier 2.0
            # "factor" here double-counted F and pushed v_cap over the
            # 300k-row ring-gather cliff, making every block's window
            # schedules data-dependent — the reason round-3 runs used
            # buckets.
            pred_faces = 1.15 * self.area() / (np.sqrt(3.0) / 4.0
                                               * pred_final_len ** 2)
            pred_faces = max(pred_faces, self.faces.shape[0])
            f_cap = meshdata.round_up_bucket(int(1.15 * pred_faces),
                                             self.pad_quantum)
            v_cap = meshdata.round_up_bucket(int(1.15 * pred_faces / 2) + 8,
                                             self.pad_quantum)
            if cap_mode == 'two':
                v_mid = meshdata.round_up_bucket(
                    max(v_cap // 2, self.vertices.shape[0] + 8),
                    self.pad_quantum)
                # XLA-TPU emission is pathological in a capacity band:
                # 38-44 MB executables at v_cap 93184-114688 (60 MB at
                # the 65k bucket, round 3) vs ~8 MB at >= 131072 — and
                # the RUNTIME stays degraded further up (5-iter block
                # at 1e6 pts: 0.503 s @131072, 0.477 @147456,
                # 0.400 @163840, 0.423 @186368 — measured 2026-08-20).
                # Clamp the mid rung to the first capacity that is
                # sane in BOTH size and speed (probe:
                # scripts/probe_capacity_band.py; BASELINE.md round 4).
                if (jax.default_backend() == 'tpu'
                        and 32768 < v_mid < 163840 <= v_cap):
                    v_mid = 163840
                f_mid = meshdata.round_up_bucket(
                    max(2 * v_mid - 4, self.faces.shape[0]),
                    self.pad_quantum)
                if v_mid < v_cap and f_mid < f_cap:
                    self._cap_rungs = [(v_cap, f_cap)]
                    v_cap, f_cap = v_mid, f_mid
                # else: seed already past half-final — degenerate to
                # the single final program
        else:
            v_cap = f_cap = None

        # static compiled block length: blocks run to the next surgery
        # boundary with the tail skipped at runtime (cg_block
        # active_iters) — one compiled shape per capacity bucket
        # instead of one per gcd-block length (the reference's
        # rf = gcd(remesh, punch) collapses to 1-iteration blocks
        # whenever both cadences are active, pyx:1430-1441; the
        # SCHEDULE keeps those semantics, only the device batching
        # differs)
        ni_static = n_iter
        if r:
            ni_static = min(ni_static, self.remesh_frequency)
        if dr:
            ni_static = min(ni_static, self.delaunay_remesh_frequency)

        # neck removal reads Gaussian curvature at every remesh
        # boundary.  With the native host kernel available the
        # boundary computes K itself (~40 ms, native.gaussian_k via
        # the _curv fast path) and the block carries NO curvature
        # program — the folded device K was measured at ~4.2 MB of
        # the block executable plus a 4.9 MB standalone program
        # (scripts/probe_exec_census.py), i.e. ~15 s of remote-service
        # load per fit at its ~0.6 MB/s.  Without the native library
        # the old fold is kept (diag.K, no standalone dispatch).
        from .. import native as _native
        have_native_k = (getattr(self, 'use_native_neck_k', True)
                         and _native.get_lib() is not None)
        want_K = bool(r and neck_first_iter > 0 and dmesh is None
                      and not have_native_k)

        # Overlap the predictable compiles/loads with host work: a
        # daemon thread issues dummy cg_block(/curvature) calls whose
        # shapes+statics match the real blocks (solver.prewarm),
        # started BEFORE the cloud is ordered/uploaded — single-program
        # fits then hide their one executable load (~7.5 s through the
        # remote service even on persistent-cache hits) behind the
        # pre-loop host work and first boundary build; bucketed fits
        # climb the capacity ladder ahead of the growing mesh.
        # cancel any prewarmer left over from a previous fit call
        if getattr(self, '_prewarm_cancel', None) is not None:
            self._prewarm_cancel.set()
        prewarm_cancel = None
        # A cloud-derived EARLY prewarm (solver.prewarm.prewarm_for_cloud,
        # started before wrap_start) is ADOPTED when its statics match
        # and its capacities cover this fit's prediction within a 1.35x
        # slack band: padding to the (slightly larger) prewarmed caps
        # costs a few percent of device time and saves the whole
        # executable-load exposure the early start already paid down.
        # A mismatch (undershoot, oversized estimate, different
        # statics) cancels the handle and falls through to the normal
        # prewarm below.
        adopted_early = False
        stat_kw = dict(N=int(N), lam0=lam0, shrink_lam=shrink_lam,
                       ni_static=int(ni_static),
                       use_shrink=bool(use_shrink),
                       face_chunk=int(self.face_chunk),
                       corr_method=method,
                       uniform_weights=uniform_weights,
                       want_curv_K=bool(want_K),
                       ring_min_verts=int(getattr(
                           self, 'ring_gather_min_verts', 32768)),
                       pad_quantum=int(self.pad_quantum))
        # observability (and the early-prewarm adoption contract test)
        self._prewarm_statics = stat_kw
        self._final_caps_pred = ((v_cap, f_cap)
                                 if v_cap is not None else None)
        ep = getattr(self, 'early_prewarm', None)
        if ep is not None:
            fits = (cap_mode == 'final' and v_cap is not None
                    and dmesh is None
                    and ep.compatible(**stat_kw)
                    and ep.v_cap >= v_cap and ep.f_cap >= f_cap
                    and ep.v_cap <= int(1.35 * v_cap)
                    and ep.f_cap <= int(1.35 * f_cap))
            if fits:
                logger.info('early prewarm adopted: caps (%d, %d) -> '
                            '(%d, %d)', v_cap, f_cap, ep.v_cap, ep.f_cap)
                v_cap, f_cap = ep.v_cap, ep.f_cap
                prewarm_cancel = ep.cancel_event
                adopted_early = True
            else:
                logger.info('early prewarm NOT adopted (caps (%d, %d) '
                            'vs predicted (%s, %s) or statics) - '
                            'canceled', ep.v_cap, ep.f_cap, v_cap, f_cap)
                ep.cancel()
            self.early_prewarm = None
        self._adopted_early_prewarm = adopted_early
        if (not adopted_early
                and getattr(self, 'prewarm_compiles', True) and dmesh is None
                and jax.default_backend() == 'tpu'):
            from ..solver import prewarm as _prewarm
            single = cap_mode == 'final' and v_cap is not None
            eager = (single or (cap_mode == 'two' and v_cap is not None))
            if eager:
                # 'final': the one program.  'two': the mid rung the
                # first block waits on, then the final rung warmed in
                # the background while the growth phase runs under mid.
                ladder = [(v_cap, f_cap)] + list(self._cap_rungs)
            else:
                if r:
                    vf, ff = _prewarm.predict_final_sizes(
                        self, final_length)
                else:
                    vf, ff = self.vertices.shape[0], self.faces.shape[0]
                ladder = _prewarm.bucket_ladder(
                    self.vertices.shape[0], self.faces.shape[0], vf, ff,
                    quantum=self.pad_quantum)
            _, prewarm_cancel = _prewarm.start_prewarm_thread(
                ladder, N, lam0, shrink_lam,
                int(ni_static), use_shrink, self.face_chunk, method,
                self.kc, self.kg, self.c0, quantum=self.pad_quantum,
                ring_min_verts=int(getattr(self, 'ring_gather_min_verts',
                                           32768)),
                uniform_weights=uniform_weights,
                want_curv_K=want_K,
                # single-program fit: the prewarm's dummy call IS the
                # fit's one compile — issue it immediately and don't
                # skip it.  Bucketed: the driver requests ladder[0]
                # itself right away; warming it would duplicate the
                # service request in front of the one the fit waits on.
                skip_first_block=not eager,
                initial_wait=0.0 if eager else 2.0,
                # the native boundary K makes the standalone device
                # curvature program dead weight — don't queue its
                # compile/load on the service
                warm_curvature=not have_native_k)
        self._prewarm_cancel = prewarm_cancel
        _mark('cappred+prewarm_start')

        if method in ('blocked', 'windowed', 'windowed_pallas'):
            from ..ops.correspondence import fit_point_order
            order = fit_point_order(points)
            points = np.ascontiguousarray(points[order])
            sigma_inv = sigma_inv[order]
            res_weights = res_weights[order]
            self._points = points       # diagnostics follow this order

        _mark('sigma+order')

        if dmesh is not None:
            # localization axis sharded over the device mesh; vertex
            # state is placed replicated below and GSPMD inserts the
            # psums for the A^T scatter-adds (SURVEY §2 census: TP row)
            from ..parallel.sharding import shard_points
            pts_j, sig_j, w_j, pmask = shard_points(
                dmesh, points, sigma_inv, res_weights)
        else:
            pts_j = jnp.asarray(points)
            sig_j = jnp.asarray(sigma_inv)
            w_j = jnp.asarray(res_weights)
            _mark('upload_pts')
            pmask = jnp.ones(N, bool)
            if _ft0:
                pmask.block_until_ready()
                _mark('pmask_fill')

        from ..utils.tracing import FitTrace
        if getattr(self, 'trace', None) is None:
            self.trace = FitTrace()

        last_area = self.area()

        j = 0
        topo_dirty = True
        dev_state = None        # cached (ma, schedules...) per topology
        f_dev = None            # device positions matching dev_state
        spec_pending = None     # (n_it, issued block) from speculation
        while j < n_iter:
            n_it = n_iter - j
            if r:
                n_it = min(n_it, self.remesh_frequency
                           - (j % self.remesh_frequency))
            if dr:
                n_it = min(n_it, self.delaunay_remesh_frequency
                           - (j % self.delaunay_remesh_frequency))
            n_it = int(n_it)

            t0 = _time.time()
            _ft = os.environ.get('CSW_FINE_TIMERS') and _time.time
            if not topo_dirty and dev_state is not None:
                # topology unchanged since the last block: reuse the
                # padded arrays and every host schedule; positions
                # continue from the previous block's device output
                (ma, positions, faces, f_mask, v_mask, nbr_v,
                 face_nbrs, fold_starts, fold_uncov, ring_tri,
                 ring_ncc, ring_fold, ring_cb) = dev_state
                positions = f_dev
                if _ft:
                    _t_sort = _t_build = 0.0
            else:
                # index locality for the device gathers/scatters
                _ts = _ft and _ft()
                self.spatial_sort()
                if r and cap_mode == 'bucketed':
                    # 15% headroom inside the bucket; monotone so a
                    # block never re-pads smaller.  Policy lives in
                    # meshdata.fit_buckets — the compile prewarmer
                    # predicts these shapes and must match exactly.
                    vb, fb = meshdata.fit_buckets(
                        self.vertices.shape[0], self.faces.shape[0],
                        self.pad_quantum)
                    v_cap = max(v_cap or 0, vb)
                    f_cap = max(f_cap or 0, fb)
                elif (r and cap_mode == 'two'
                        and getattr(self, '_cap_rungs', None)
                        and (self.vertices.shape[0] > v_cap
                             or self.faces.shape[0] > f_cap)):
                    # the mesh outgrew the mid rung: advance to the
                    # (background-prewarmed) final program
                    vb, fb = self._cap_rungs.pop(0)
                    v_cap = max(v_cap, vb)
                    f_cap = max(f_cap, fb)
                if v_cap is not None and (self.vertices.shape[0] > v_cap
                                          or self.faces.shape[0] > f_cap):
                    # remesh overshot the prediction; grow the bucket
                    v_cap = meshdata.round_up_bucket(
                        int(1.3 * self.vertices.shape[0]),
                        self.pad_quantum)
                    f_cap = meshdata.round_up_bucket(
                        int(1.3 * self.faces.shape[0]), self.pad_quantum)
                if _ft:
                    _t_sort = _ft() - _ts
                    _ts = _ft()
                # spatial_sort already hilbert-ordered the faces.
                # With the ring-gather path on and the boundary K
                # native, the device nbr_v/nbr_f/face_nbrs content is
                # dead (compute_ncc streams its own schedule, polish
                # off) — skip their ~35 MB/boundary tunnel upload;
                # materialized below if the schedules fall back.
                _want_ring = (getattr(self, 'use_ring_gather', True)
                              and (dmesh is None
                                   or method == 'windowed_pallas')
                              and (jax.default_backend() == 'tpu'
                                   or pallas_interp))
                _lazy = (_want_ring and not want_K
                         and (v_cap or self.vertices.shape[0])
                         > int(getattr(self, 'ring_gather_min_verts',
                                       32768)))
                # reuse the capacity-sized pad buffers across
                # boundaries; the diag cache may still hold the
                # PREVIOUS boundary's meshdata whose host tables these
                # buffers back — drop it (stale topology anyway).
                # TPU-only: on the CPU backend jnp.asarray may ALIAS
                # the numpy buffer (zero-copy), and a reused scratch
                # would silently corrupt the previous device arrays.
                scratch = None
                if jax.default_backend() == 'tpu':
                    scratch = getattr(self, '_build_scratch', None)
                    if scratch is None:
                        scratch = self._build_scratch = {}
                    elif getattr(self, '_diag_ma_cache', None) is not None:
                        self._diag_ma_cache = None
                ma = meshdata.from_mesh(self, v_cap=v_cap, f_cap=f_cap,
                                        quantum=self.pad_quantum,
                                        hilbert_faces=False,
                                        lazy_tables=_lazy,
                                        scratch=scratch)
                if _ft:
                    _t_build = _ft() - _ts
                fold_starts = fold_uncov = None
                ring_tri = ring_ncc = ring_fold = ring_cb = None
                if ma.positions.shape[0] > int(getattr(
                        self, 'ring_gather_min_verts', 32768)):
                    # the sliding-ring Mosaic gather kernel
                    # (ops.pallas_gather) wins well below the original
                    # >300k XLA scatter/gather cliff: measured per-iter
                    # 206 -> 90 ms at the fit capacity (231k padded
                    # verts) and 13.1 vs 10.6 iters/s at the 164k
                    # bench, still ahead at 41k (14.8 vs 14.0) —
                    # scripts/probe_block_cost.py, 2026-08-18.  Routes
                    # the faces-index / ncc gathers AND — inverted
                    # through a static incidence table — the
                    # faces->verts fold.  The pure-XLA banded variant
                    # (use_windowed_gather) is kept for reference but
                    # measured SLOWER than both.
                    use_ring = _want_ring
                    if use_ring:
                        # capacity-constant schedule layout: the
                        # compiled block is IDENTICAL across remesh
                        # boundaries within a bucket (fixed_layout
                        # schedules + fixed incidence-overflow pad);
                        # all three schedules engage atomically or not
                        # at all (mixed combinations would each be a
                        # separate compile)
                        _tr = _ft and _ft()
                        ring_tri, ring_ncc, ring_fold, ring_cb = \
                            meshdata.fit_ring_schedules(
                                ma, scratch=scratch)
                        if _ft:
                            _t_build += _ft() - _tr
                        if ring_tri is None:
                            logger.warning(
                                'ring schedules over budget at Vp=%d; '
                                'falling back to the XLA gather path '
                                'for this topology (recompile likely)',
                                ma.positions.shape[0])
                            dump = os.environ.get('CSW_DUMP_OVERBUDGET')
                            if dump:
                                h = ma.host or {}
                                np.savez_compressed(
                                    '%s_Vp%d_j%d.npz' % (
                                        dump, ma.positions.shape[0], j),
                                    faces=np.asarray(
                                        h.get('faces', ma.faces)),
                                    f_mask=np.asarray(
                                        h.get('f_mask', ma.f_mask)),
                                    nbr_v=np.asarray(
                                        h.get('nbr_v', ma.nbr_v)),
                                    positions=np.asarray(ma.positions))
                    if ring_fold is None and method == 'windowed_pallas':
                        sched = meshdata.fold_schedule(
                            np.asarray(ma.faces), self.faces.shape[0],
                            ma.positions.shape[0])
                        if sched is not None:
                            fold_starts, fold_uncov = sched
                if (ma.host or {}).get('lazy_tables') \
                        and ring_ncc is None:
                    # the lazy guess was wrong (schedules over budget
                    # or ring path not engaged): the XLA ncc fallback
                    # reads the device nbr_v for real — upload it now
                    ma = meshdata.materialize_tables(ma)
                positions, faces, f_mask, v_mask, nbr_v, face_nbrs = (
                    ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
                    ma.face_nbrs)
                if dmesh is not None:
                    from ..parallel.sharding import replicate
                    positions, faces, f_mask, v_mask, nbr_v, face_nbrs = \
                        replicate(dmesh, positions, faces, f_mask, v_mask,
                                  nbr_v, face_nbrs)
                    if fold_starts is not None:
                        fold_starts, fold_uncov = replicate(
                            dmesh, fold_starts, fold_uncov)
                dev_state = (ma, positions, faces, f_mask, v_mask,
                             nbr_v, face_nbrs, fold_starts, fold_uncov,
                             ring_tri, ring_ncc, ring_fold, ring_cb)
            _ts = _ft and _ft()

            def _issue_block(pos_in, n_act):
                """Dispatch one CG block and enqueue the async host
                fetch of its live-prefix result, returning WITHOUT
                waiting: the device-to-host copy then rides the tail of
                the device computation instead of paying a separate
                post-compute tunnel round trip (~0.12 s/block measured,
                ~3 s per 99-iter fit)."""
                fn, dg = block_call(
                    pos_in, faces, f_mask, v_mask, nbr_v,
                    pts_j, sig_j, w_j, pmask,
                    lam0, shrink_lam, num_iters=ni_static,
                    active_iters=n_act,
                    use_shrink=use_shrink, face_chunk=self.face_chunk,
                    corr_method=method,
                    # consumed only by the 'grid' search; for the
                    # production windowed paths it's a dead traced
                    # scalar, and computing it forced a mean-edge pass
                    # per block
                    cell_size=(float(2.0 * self._mean_edge_length)
                               if method == 'grid' else 1.0),
                    face_nbrs=face_nbrs,
                    fold_starts=fold_starts, fold_uncov=fold_uncov,
                    ring_tri=ring_tri, ring_ncc=ring_ncc,
                    ring_fold=ring_fold, ring_tri_cb=ring_cb,
                    spmd_mesh=spmd_mesh,
                    pallas_interpret=pallas_interp,
                    nbr_f=ma.nbr_f if want_K else None,
                    want_curv_K=want_K,
                    # pays off only once the (N, 9s) AS gather is on
                    # the >300k cliff; below it the extra w2 kernel
                    # pass costs more than the gather it replaces
                    # (measured neutral at 231k with ring gathers on —
                    # probe_block_cost.py)
                    face_hcgc=(method == 'windowed_pallas'
                               and ring_tri is not None
                               and positions.shape[0] > meshdata.HCGC_MIN_VP
                               and uniform_weights))
                # fetch only the live prefix — the pad tail (often 10x
                # the live count early in the fit) is dead host-side;
                # slice lengths come from the capacity-keyed fetch
                # ladder so the tiny slice programs are trajectory-
                # independent and prewarmed (meshdata.fetch_ladder)
                V_live = self.vertices.shape[0]
                Vq = next((q for q in meshdata.fetch_ladder(fn.shape[0])
                           if q >= V_live), fn.shape[0])
                ff = fn if Vq >= fn.shape[0] else fn[:Vq]
                if dmesh is None \
                        and not os.environ.get('CSW_NO_ASYNC_FETCH'):
                    try:
                        ff.copy_to_host_async()
                        # the tiny per-iteration history vectors are
                        # read by trace.record right after the block;
                        # without the prefetch each pays its own
                        # synchronous tunnel round trip
                        dg.tests.copy_to_host_async()
                        dg.ress.copy_to_host_async()
                    except Exception:
                        pass        # backend without async host copy
                return fn, dg, ff

            if (spec_pending is not None and not topo_dirty
                    and spec_pending[0] == n_it):
                # the block speculatively dispatched at the previous
                # (surgery-free) boundary is exactly this one — its
                # device time overlapped the punch analysis
                f_new, diag, f_fetch = spec_pending[1]
            else:
                f_new, diag, f_fetch = _issue_block(positions, n_it)
            spec_pending = None
            if _ft:
                _t_disp = _ft() - _ts
                _ts = _ft()
                f_new.block_until_ready()
                _t_dev = _ft() - _ts
                _ts = _ft()
            f_dev = f_new
            topo_dirty = False
            self._last_diag = diag
            V = self.vertices.shape[0]
            new_pos = np.asarray(f_fetch)[:V]
            if not np.isfinite(new_pos).all():
                # counterpart of the reference's scattered NaN asserts
                # (mesh_conj_grad.py:548,580,613)
                raise FloatingPointError(
                    'non-finite vertex positions after CG block at '
                    f'iteration {j + n_it}; check sigma/weights inputs')
            self.set_positions(new_pos)
            self._initialize_curvature_vectors()
            if dmesh is None:
                self._donate_diag_meshdata(ma, f_new)
            if diag.K is not None:
                # seed the curvature cache with the in-block K (same
                # positions, same tables as a standalone recompute);
                # other fields repopulate on demand (_curv fallback)
                self._curv_state = {'_dev': _curv.CurvatureState(
                    k_0=None, k_1=None, e_0=None, e_1=None, H=None,
                    K=diag.K, dH=None, dK=None, E=None, pE=None,
                    dE_neighbors=None, dEdN=None)}
            j += n_it
            self.trace.record('cg_block', j, _time.time() - t0, self,
                              diag=diag, n_iters=n_it,
                              v_cap=int(positions.shape[0]))
            logger.info('cg_block done j=%d/%d (%.1fs, V=%d, cap=%s)',
                        j, n_iter, _time.time() - t0,
                        self.vertices.shape[0], v_cap)
            if _ft:
                logger.info(
                    'cg_block fine: sort %.2fs build %.2fs dispatch '
                    '%.2fs device %.2fs fetch+set %.2fs',
                    _t_sort, _t_build, _t_disp, _t_dev, _ft() - _ts)

            # Speculative dispatch at punch-only boundaries: the punch
            # analysis is host-side and overwhelmingly a no-op on an
            # already-correct topology, so the next block — whose
            # inputs are valid iff the punch no-ops — is dispatched
            # BEFORE the analysis and runs on the otherwise-idle
            # device while the host analyses.  If the punch DID punch,
            # the speculative result is simply dropped (no donation —
            # the inputs stay live; the wasted block overlaps the
            # punch surgery + rebuild that follow).  Remesh boundaries
            # never speculate: the scheduled remesh always changes
            # topology.
            if (dr and ((j % self.delaunay_remesh_frequency) == 0)
                    and not (r and ((j % self.remesh_frequency) == 0))
                    and j < n_iter and dmesh is None
                    and getattr(self, 'speculative_blocks', True)
                    and not os.environ.get('CSW_NO_SPEC')):
                n_next = n_iter - j
                if r:
                    n_next = min(n_next, self.remesh_frequency
                                 - (j % self.remesh_frequency))
                if dr:
                    n_next = min(n_next, self.delaunay_remesh_frequency
                                 - (j % self.delaunay_remesh_frequency))
                spec_pending = (int(n_next),
                                _issue_block(f_new, int(n_next)))

            if dr and ((j % self.delaunay_remesh_frequency) == 0):
                t0 = _time.time()
                n_punched = self.punch_holes(points, self.delaunay_eps)
                self.trace.record('punch_holes', j, _time.time() - t0,
                                  self, n_punched=n_punched)
                if n_punched:
                    topo_dirty = True

            if r and ((j % self.remesh_frequency) == 0):
                t0 = _time.time()
                defer = bool(getattr(self, 'defer_boundary_remesh',
                                     True))
                if (neck_first_iter > 0) and (j > neck_first_iter):
                    self.remove_necks(
                        getattr(self, 'neck_threshold_low', -1e-4),
                        getattr(self, 'neck_threshold_high', 1e-2),
                        defer_remesh=defer)
                    self.trace.record('remove_necks', j,
                                      _time.time() - t0, self)
                    t0 = _time.time()
                self.remove_extra_short_edges(defer_remesh=defer)
                self.trace.record('short_edges', j, _time.time() - t0,
                                  self)
                t0 = _time.time()
                # clamped to the schedule endpoints: at j = n_iter
                # divisible by rf the unclamped line evaluates past
                # final_length (negative for steep schedules) — the
                # reference ships that overshoot (pyx:1541-1546);
                # fixed here, see the capacity-prediction note above
                target_length = float(np.clip(
                    initial_length + m * (j + 1),
                    min(initial_length, final_length),
                    max(initial_length, final_length)))
                self.remesh(5, target_length, 0.5, n_relax=0)
                self.trace.record('remesh', j, _time.time() - t0, self,
                                  target_length=float(target_length))
                topo_dirty = True
                logger.info(
                    'Shrinkwrapping iteration %d of %d - Remesh: target '
                    'mean length: %.2f resulting: %.2f (V=%d)',
                    j, n_iter, target_length, self._mean_edge_length,
                    self.vertices.shape[0])

            # (the reference computes an area-change statistic here but
            # its convergence check is disabled, pyx:1551-1558 — the
            # per-block recompute is dropped; ``last_area`` stays as
            # the pre-fit value for parity)

        if prewarm_cancel is not None:
            # stop compiling buckets the finished fit will never reach
            # (exception paths leak only a daemon that drains its
            # remaining ladder and exits)
            prewarm_cancel.set()
        logger.info('Shrinkwrapping complete in %d iterations (%s)',
                    j, self.trace.summary())

    def shrink_wrap(self, points=None, sigma=None,
                    method='conjugate_gradient', max_iter=None, **kwargs):
        """Main entry (pyx:1641-1669); caches points/sigma so repeated
        calls continue the fit."""
        if method not in DESCENT_METHODS:
            logger.warning('Unknown descent method %r; using %s', method,
                           DEFAULT_DESCENT_METHOD)
            method = DEFAULT_DESCENT_METHOD

        if max_iter is None:
            max_iter = self.max_iter
        if points is None:
            points = self._points
        if sigma is None:
            sigma = self._sigma

        self._points = np.asarray(points)
        self._sigma = sigma

        opts = dict(points=points, sigma=sigma, max_iter=max_iter,
                    step_size=self.step_size, **kwargs)
        return getattr(self, 'opt_{}'.format(method))(**opts)

    def opt_skeleton(self, points, sigma, max_iter=10, step_size=None,
                     **kwargs):
        """Skeletonize via a SkeletonMesh view of this mesh, writing
        the collapsed topology back (shrink_wrap(method='skeleton') on
        a plain MembraneMesh, parity with SkeletonMesh.shrink_wrap)."""
        from .skeleton_mesh import SkeletonMesh
        sk = SkeletonMesh(self.vertices.copy(), self.faces.copy())
        sk.opt_skeleton(points=points, sigma=sigma, max_iter=max_iter,
                        **kwargs)
        self.set_topology(sk.vertices, sk.faces)
        self._initialize_curvature_vectors()
        return self

    def residual_histogram(self, points=None, sigma=None, bins=None):
        """Signed distance-to-surface histogram with the chi-
        distribution overlay (util.py:49-76).  Returns (counts, bin
        edges, predicted density); plotting is left to the caller."""
        if points is None:
            points = self._points
        if sigma is None:
            sigma = self._sigma
        d = self.distance_to_surface(points)
        if bins is None:
            bins = np.linspace(-100, 100, 500)
        counts, edges = np.histogram(d, bins, density=True)
        try:
            from scipy import stats
            me = float(np.median(sigma))
            x = 0.5 * (edges[:-1] + edges[1:])
            pred = 0.5 * stats.chi(3).pdf(np.abs(x) / me) / me
        except Exception:
            pred = None
        return counts, edges, pred

    def distance_to_surface(self, points):
        """Signed distance of points to the mesh (negative inside),
        via nearest-face plane distance."""
        ma = self._padded_meshdata()
        pts = jnp.asarray(np.asarray(points, dtype=np.float32))
        dmean, fi, centers = self._nearest_for_diagnostics(ma, pts)
        fn, _ = _norm.face_geometry(ma.positions, ma.faces, ma.f_mask)
        n = np.asarray(fn)[np.asarray(fi)]
        c = np.asarray(centers)[np.asarray(fi)]
        signed = ((np.asarray(points) - c) * n).sum(1)
        return np.sign(signed) * np.asarray(dmean)
