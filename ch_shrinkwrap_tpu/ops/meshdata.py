"""Padded SoA mesh arrays for device-side compute.

The host mesh (`ch_shrinkwrap_tpu.mesh.core.TriangleMesh`) is compact;
device kernels need static shapes.  `MeshArrays` is a pytree of padded
arrays with validity masks, bucketed to coarse capacity steps so the
XLA cache is reused across remesh blocks (the reference instead
tolerates full reallocation per block — _membrane_mesh.pyx:1510-1517).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

NEIGHBORSIZE = 20


def round_up_bucket(n: int, quantum: int = 1024) -> int:
    """Round n up to the next capacity bucket (quantum multiple)."""
    return max(quantum, int(np.ceil(n / quantum)) * quantum)


def pow2_bucket(n: int, quantum: int = 1024) -> int:
    """Round n up to the next power-of-two multiple of ``quantum``."""
    b = quantum
    while b < n:
        b *= 2
    return b


def _prefix_mask_jit(n, cap):
    return jnp.arange(cap, dtype=jnp.int32) < n


_prefix_mask_cache: dict = {}


def _prefix_mask(n: int, cap: int) -> jax.Array:
    """Device bool mask [True]*n + [False]*(cap-n) without shipping cap
    bytes through the tunnel: one tiny program per capacity bucket, n a
    traced scalar."""
    fn = _prefix_mask_cache.get(cap)
    if fn is None:
        fn = _prefix_mask_cache[cap] = jax.jit(
            lambda m, c=cap: _prefix_mask_jit(m, c))
    return fn(np.int32(n))


def fit_buckets(n_vertices: int, n_faces: int, quantum: int = 1024):
    """THE fit driver's capacity-bucket policy: the (v_cap, f_cap) a
    CG block pads a mesh of this size to (15% headroom, +8 vertex
    slack, power-of-two buckets).  The compile prewarmer
    (solver.prewarm) must predict these EXACTLY — shapes are the jit
    cache key, and an off-by-one bucket (measured: the +8 slack
    crossing a pow2 boundary) turns every prewarmed program into a
    cache miss.  Single source of truth for both."""
    return (pow2_bucket(int(1.15 * n_vertices) + 8, quantum),
            pow2_bucket(int(1.15 * n_faces), quantum))


class MeshArrays(NamedTuple):
    """Static-shape device view of a triangle mesh.

    positions : (Vp, 3) f32 — padded vertex positions
    v_mask    : (Vp,)  bool — True for real vertices
    faces     : (Fp, 3) i32 — padded faces (padding rows point at 0)
    f_mask    : (Fp,)  bool
    nbr_v     : (Vp, K) i32 — one-ring neighbor vertex ids, -1 padded
    nbr_f     : (Vp, K) i32 — face left of the halfedge v->nbr, -1 padded
    face_nbrs : (Fp, 3) i32 — edge-adjacent faces, -1 on boundary
    host      : host-side (numpy) copies of {faces, f_mask, nbr_v} kept
                by from_mesh so per-boundary schedule builders
                (fit_ring_schedules) never fetch tables back from the
                device — a ~25 MB device->host round trip per remesh
                boundary through the TPU tunnel, measured ~1.2-1.8 s of
                the warm e2e's per-boundary gap (2026-08-18)
    """
    positions: jax.Array
    v_mask: jax.Array
    faces: jax.Array
    f_mask: jax.Array
    nbr_v: jax.Array
    nbr_f: jax.Array
    face_nbrs: jax.Array
    host: Optional[dict] = None

    @property
    def n_vertices_padded(self):
        return self.positions.shape[0]

    @property
    def n_faces_padded(self):
        return self.faces.shape[0]


def neighbor_tables(faces: np.ndarray, n_vertices: int, K: int = NEIGHBORSIZE):
    """(V, K) neighbor-vertex and neighbor-face tables from (F, 3) faces.

    Slot k of vertex v holds the head of one outgoing halfedge v->u and
    the face on that halfedge's left — the same information as the
    reference's ``_vertices['neighbors']`` halfedge list
    (_membrane_mesh.pyx:50-54) without the extra indirection.
    """
    src = faces.ravel()
    dst = faces[:, [1, 2, 0]].ravel()
    fidx = np.repeat(np.arange(faces.shape[0], dtype=np.int64), 3)
    order = np.argsort(src, kind='stable')
    ssrc = src[order]
    starts = np.searchsorted(ssrc, np.arange(n_vertices))
    rank = np.arange(len(ssrc)) - starts[ssrc]
    nbr_v = np.full((n_vertices, K), -1, np.int32)
    nbr_f = np.full((n_vertices, K), -1, np.int32)
    ok = rank < K
    nbr_v[ssrc[ok], rank[ok]] = dst[order[ok]]
    nbr_f[ssrc[ok], rank[ok]] = fidx[order[ok]]
    return nbr_v, nbr_f


def from_mesh(mesh, v_cap: Optional[int] = None, f_cap: Optional[int] = None,
              quantum: int = 1024, K: int = NEIGHBORSIZE,
              hilbert_faces: bool = True,
              lazy_tables: bool = False,
              scratch: Optional[dict] = None) -> MeshArrays:
    """Pad a host TriangleMesh into device MeshArrays.

    ``hilbert_faces`` reorders the face list by the Hilbert code of the
    face centroids so spatially close faces are index-contiguous — the
    invariant the windowed correspondence kernel
    (correspondence.nearest_face_windowed) relies on.  Face order
    carries no semantics, so this is free.

    ``lazy_tables`` skips the device UPLOAD of nbr_v / nbr_f /
    face_nbrs (device-side -1 fills of the right shape instead,
    host copies kept): in the production fit configuration their
    device content is dead — compute_ncc's k-major ring stream
    carries its own index schedule, the boundary neck K is computed
    natively on the host, and correspondence polish is off — but the
    upload is ~35 MB per remesh boundary through the TPU tunnel
    (nbr_v+nbr_f (Vp,20) i32 + face_nbrs (Fp,3)), a measured chunk of
    the warm e2e's per-boundary 'build' phase.  Callers that do need
    device content (XLA-gather fallback, device curvature) call
    :func:`materialize_tables` first.

    ``scratch``: an opaque caller-held dict reusing the capacity-sized
    host pad buffers across calls AT THE SAME CAPACITY (the fit driver
    rebuilds these every remesh boundary; the ~50 MB of fresh
    np.zeros/np.full allocations cost ~0.1 s per boundary on a 1-core
    host).  Only the rows a previous call wrote are re-padded.  The
    caller must treat earlier returned MeshArrays' ``host`` tables as
    INVALIDATED once a newer call reuses the scratch (the fit driver's
    dev_state does: it drops the previous boundary's meshdata whenever
    topology changes).
    """
    v = np.asarray(mesh.vertices, dtype=np.float32)
    f = np.asarray(mesh.faces, dtype=np.int32)
    if hilbert_faces and len(f) > 64:
        from .correspondence import hilbert_order
        fc = v[f].mean(1)
        f = np.ascontiguousarray(f[hilbert_order(fc)])
    V, F = v.shape[0], f.shape[0]
    Vp = v_cap or round_up_bucket(V, quantum)
    Fp = f_cap or round_up_bucket(F, quantum)
    if Vp < V or Fp < F:
        raise ValueError('capacity below current size')

    def _buf(name, shape, dtype, fill, n_valid):
        """Capacity-keyed reusable pad buffer; rows [n_valid:prev]
        are re-padded with ``fill``, rows [:n_valid] are left for the
        caller to overwrite."""
        if scratch is None:
            a = np.full(shape, fill, dtype) if fill else \
                np.zeros(shape, dtype)
            return a
        key = (name, shape)
        ent = scratch.get(key)
        if ent is None:
            a = np.full(shape, fill, dtype) if fill else \
                np.zeros(shape, dtype)
            scratch[key] = [a, n_valid]
            return a
        a, prev = ent
        if prev > n_valid:
            a[n_valid:prev] = fill
        ent[1] = n_valid
        return a

    pos = _buf('pos', (Vp, 3), np.float32, 0, V)
    pos[:V] = v
    v_mask = _buf('v_mask', (Vp,), bool, False, V)
    v_mask[:V] = True
    faces = _buf('faces', (Fp, 3), np.int32, 0, F)
    faces[:F] = f
    f_mask = _buf('f_mask', (Fp,), bool, False, F)
    f_mask[:F] = True

    # live entries are prefix-packed, so the device masks are pure
    # functions of (live count, capacity): build them on device from a
    # scalar instead of shipping (Vp+Fp) bool bytes per remesh boundary
    # through the tunnel (the numpy buffers above stay host-side for
    # the native schedule builders)
    v_mask_dev = _prefix_mask(V, Vp)
    f_mask_dev = _prefix_mask(F, Fp)

    from .. import native
    # face_nbrs content is dead in the lazy (production fit) path —
    # correspondence polish is off and curvature reads nbr_v/nbr_f —
    # so skip the native twin-matching scan there; materialize_tables
    # recomputes it on the rare fallback
    want_adj = not lazy_tables
    nbr_v = _buf('nbr_v', (Vp, K), np.int32, -1, V)
    nbr_f = _buf('nbr_f', (Vp, K), np.int32, -1, V)
    fn = _buf('face_nbrs', (Fp, 3), np.int32, -1, F) if want_adj \
        else None
    tables = native.build_tables(
        f, V, K, out=(nbr_v, nbr_f, fn), want_face_adj=want_adj)
    if tables is None:
        nv, nf = neighbor_tables(f, V, K)
        nbr_v[:V] = nv
        nbr_f[:V] = nf
        if want_adj:
            fn[:F] = face_adjacency(f)

    host = {'faces': faces, 'f_mask': f_mask, 'nbr_v': nbr_v,
            'nbr_f': nbr_f, 'face_nbrs': fn, 'V': V, 'F': F,
            'lazy_tables': bool(lazy_tables)}
    if lazy_tables:
        # device-side fills: no tunnel transfer, shape-only stand-ins
        nbr_dev = jnp.full((Vp, K), -1, jnp.int32)
        fn_dev = jnp.full((Fp, 3), -1, jnp.int32)
        return MeshArrays(jnp.asarray(pos), v_mask_dev,
                          jnp.asarray(faces), f_mask_dev,
                          nbr_dev, nbr_dev, fn_dev, host=host)
    return MeshArrays(jnp.asarray(pos), v_mask_dev,
                      jnp.asarray(faces), f_mask_dev,
                      jnp.asarray(nbr_v), jnp.asarray(nbr_f),
                      jnp.asarray(fn), host=host)


def materialize_tables(ma: MeshArrays) -> MeshArrays:
    """Upload the real nbr_v / nbr_f / face_nbrs of a
    ``lazy_tables`` MeshArrays (no-op otherwise)."""
    h = ma.host or {}
    if not h.get('lazy_tables'):
        return ma
    h = dict(h)
    h['lazy_tables'] = False
    if h.get('face_nbrs') is None:
        # the lazy build skipped the twin-matching scan; recompute
        # into a fresh padded buffer (rare fallback path)
        F = h['F']
        faces_live = np.asarray(h['faces'][:F])
        from .. import native
        tables = native.build_tables(faces_live, h['V'],
                                     K=h['nbr_v'].shape[1])
        fadj = tables[2] if tables is not None \
            else face_adjacency(faces_live)
        fn = np.full(h['faces'].shape, -1, np.int32)
        fn[:F] = fadj
        h['face_nbrs'] = fn
    return ma._replace(nbr_v=jnp.asarray(h['nbr_v']),
                       nbr_f=jnp.asarray(h['nbr_f']),
                       face_nbrs=jnp.asarray(h['face_nbrs']),
                       host=h)


def face_adjacency(faces: np.ndarray) -> np.ndarray:
    """(F, 3) edge-adjacent face ids (-1 on boundary/non-manifold)."""
    F = faces.shape[0]
    if F == 0:
        return np.zeros((0, 3), np.int32)
    src = faces.ravel().astype(np.int64)
    dst = faces[:, [1, 2, 0]].ravel().astype(np.int64)
    V = int(faces.max()) + 1
    key = src * V + dst
    tkey = dst * V + src
    order = np.argsort(key, kind='stable')
    skey = key[order]
    pos = np.searchsorted(skey, tkey)
    pos_c = np.clip(pos, 0, len(skey) - 1)
    cand = order[pos_c]
    ok = (pos < len(skey)) & (skey[pos_c] == tkey)
    twin_face = np.where(ok, cand // 3, -1)
    return twin_face.reshape(F, 3).astype(np.int32)


def fold_schedule(faces_padded: np.ndarray, n_faces: int, n_vertices: int,
                  block_size: int = 512, window: int = 2048,
                  n_bands: int = 3):
    """Host-side static window schedule for the faces -> vertices fold
    (solver A^T second stage): splits each ``block_size``-row slice of
    ``faces_padded.reshape(-1)`` at its ``n_bands - 1`` largest target
    gaps into 128-aligned ``window``-wide bands.  Returns
    (starts (nb, n_bands) i32, uncovered_idx (U_pad,) i32, -1 padded)
    for the sliding-ring kernel plus a tiny exact side-scatter, or
    None when the uncovered tail exceeds the capacity-stable pad (the
    solver then falls back to a plain segment_sum).

    Only worth it on big meshes: XLA's segment_sum is competitive
    while its output table stays cache-resident (~12.7 ms at 164k
    padded vertices) but falls off a cliff beyond (235 ms at 656k,
    measured round 1); the kernel scales linearly.
    """
    Fp = faces_padded.shape[0]
    t = faces_padded.reshape(-1).astype(np.int64)
    n_rows = 3 * n_faces
    nb = -(-t.shape[0] // block_size)
    Vp_al = -(-n_vertices // 128) * 128
    W = min(window, Vp_al)

    tb = t.reshape(nb, block_size)
    ts = np.sort(tb, axis=1)
    gaps = np.diff(ts, axis=1)
    splits = np.sort(
        np.argsort(gaps, axis=1)[:, ::-1][:, :n_bands - 1], axis=1)
    rows = np.arange(nb)
    starts = np.zeros((nb, n_bands), np.int64)
    starts[:, 0] = ts[:, 0]
    for i in range(1, n_bands):
        starts[:, i] = ts[rows, np.minimum(splits[:, i - 1] + 1,
                                           block_size - 1)]
    starts = np.clip((starts // 128) * 128, 0, max(Vp_al - W, 0))

    cov = np.zeros((nb, block_size), bool)
    for a in range(n_bands):
        off = tb - starts[:, a:a + 1]
        cov |= (off >= 0) & (off < W)
    flat_cov = cov.reshape(-1)
    flat_cov[n_rows:] = True    # padded rows carry zero values
    uncov = np.flatnonzero(~flat_cov)

    u_pad = max(1024, -(-(3 * Fp // 64) // 1024) * 1024)
    if len(uncov) > u_pad:
        return None
    uidx = np.full(u_pad, -1, np.int32)
    uidx[:len(uncov)] = uncov
    return (jnp.asarray(starts.astype(np.int32)), jnp.asarray(uidx))


def incidence_table(faces: np.ndarray, f_mask: np.ndarray,
                    n_vertices: int, K: int = 8):
    """(Vp, K) table of flat row ids r (into faces.reshape(-1)) with
    ``faces.reshape(-1)[r] == v`` — the gather-side INVERSE of the
    faces -> vertices fold, so the solver's A^T second stage can run
    as a (ring) gather + masked sum instead of a scatter.

    Returns (inc (Vp, K) i32 -1-padded, ov_rows (O,) i32,
    ov_verts (O,) i32) where the overflow lists carry the incident
    rows of vertices with valence > K (rare transients after remesh;
    added by one tiny exact scatter-add).
    """
    from .. import native
    nat = native.incidence(faces, f_mask, n_vertices, K=K)
    if nat is not None:
        return nat
    flat = faces.reshape(-1).astype(np.int64)
    valid = np.repeat(np.asarray(f_mask, bool), 3)
    rows = np.flatnonzero(valid)
    src = flat[rows]
    order = np.argsort(src, kind='stable')
    ssrc = src[order]
    starts = np.searchsorted(ssrc, np.arange(n_vertices))
    rank = np.arange(len(ssrc)) - starts[ssrc]
    inc = np.full((n_vertices, K), -1, np.int32)
    ok = rank < K
    inc[ssrc[ok], rank[ok]] = rows[order[ok]]
    ov = ~ok
    return (inc, rows[order[ov]].astype(np.int32),
            ssrc[ov].astype(np.int32))


# face_hcgc (face-side subspace normal equations) only wins once the
# (N, 9s) AS gather is on the >300k XLA gather cliff; shared by the
# fit driver, the prewarmer and the schedule builder so the compiled
# program and its schedules cannot disagree
HCGC_MIN_VP = 300_000


def fetch_ladder(v_cap: int):
    """Slice lengths the fit driver fetches block results at: a fixed
    4-rung geometric ladder keyed to the CAPACITY alone, so the set of
    tiny device-slice programs is trajectory-independent (the
    prewarmer compiles all four up front).  A per-boundary quantized
    live count would mint a fresh slice shape at every growth step —
    measured ~0.5 s compile+load EACH through the remote service on a
    degraded day (8 shapes per north-star fit)."""
    return sorted({max(128, -(-(v_cap // d) // 128) * 128)
                   for d in (8, 4, 2, 1)})


def fit_ring_schedules(ma: 'MeshArrays', ov_cap: int = 16384,
                       scratch: Optional[dict] = None):
    """The fit driver's (ring_tri, ring_ncc, ring_fold, ring_tri_cb)
    schedule tuple for one padded topology, with CAPACITY-CONSTANT
    static layout (``fixed_layout=True`` schedules, a fixed-width
    incidence overflow pad): the compiled solver program is then
    identical across remesh boundaries within a capacity bucket —
    schedule statics are part of the jit cache key, and data-sized
    layouts would recompile cg_block (~60-90 s through the remote
    service) at every topology change.

    ``ring_tri_cb`` is the CORNER-BLOCKED variant of the faces-index
    stream — a tuple of THREE per-corner schedules (faces[:,0],
    faces[:,1], faces[:,2]) — built only above ``HCGC_MIN_VP``: the
    face_hcgc subspace path gathers S through each with
    ``transposed_out=True`` so every corner's (3s, Fp) block comes
    out lane-major directly (no (R, C) retile, lane-major Gc/Hc
    contractions).  Three SEPARATE schedules because the ring window
    only slides FORWARD: a single concatenated j-major stream restarts
    at vertex ~0 at each corner-block boundary while the ring head is
    at Vp, so ~40% of its rows fall off the residency window and the
    schedule blows its patch budget (measured 43% at 41k).  None
    below the threshold or over budget.

    Returns (None, None, None, None) when any budget is exceeded (the
    caller falls back to the XLA gather path atomically — mixed
    ring/XLA combinations would each be their own compiled program).

    ``scratch`` (TPU-backend callers only — on CPU jnp.asarray may
    alias numpy buffers) reuses the stream staging buffers across
    boundaries; the fused native stream prep (clip + care + k-major
    interleave in one pass, native.kmaj_stream_clip et al.) replaces
    ~0.1 s/boundary of numpy copies (2026-08-20 cProfile).
    """
    from .pallas_gather import ring_gather_schedule
    from .. import native
    import os as _os

    def _sbuf(name, n, dtype):
        if scratch is None:
            return np.empty(n, dtype)
        a = scratch.get(name)
        if a is None or a.shape != (n,) or a.dtype != dtype:
            a = scratch[name] = np.empty(n, dtype)
        return a
    # grid-step width (128-row chunks per Pallas step): fewer steps =
    # less per-step DMA wait/start overhead; 32 measured best at the
    # 656k tri/ncc/fold streams (scripts/probe_ring_cost.py)
    cps = int(_os.environ.get('CSW_RING_CPS', 32))
    Vp = ma.positions.shape[0]
    h = ma.host or {}
    faces_np = h.get('faces')
    if faces_np is None:
        faces_np = np.asarray(ma.faces)
    f_mask_np = h.get('f_mask')
    if f_mask_np is None:
        f_mask_np = np.asarray(ma.f_mask)
    # Per-stream spans (narrower span = fewer take_along_axis segment
    # scans per chunk in the kernel; the limit is the patch-tail
    # budget, and the patch-values gather pays for the BUDGET capacity
    # every call, so each stream gets the tightest span/budget pair
    # that holds its measured Hilbert-sorted patch fraction with ~30%
    # headroom: tri 4.2% @ span 384, ncc 2.9% @ 256 (1/16 budget),
    # fold 11% @ 256 (1/8 budget) — sweep 2026-08-18, icosphere 7/8).
    tri_care = native.repeat3_mask(
        f_mask_np, out=_sbuf('st_tri_care', 3 * f_mask_np.shape[0],
                             np.uint8))
    if tri_care is None:
        tri_care = np.repeat(f_mask_np, 3)
    ring_tri = ring_gather_schedule(
        faces_np.reshape(-1), tri_care, Vp,
        span=384, fixed_layout=True, cps=cps)
    nbr_np = h.get('nbr_v')
    if nbr_np is None:
        nbr_np = np.asarray(ma.nbr_v)
    # ncc rides the block-interleaved k-major stream: compute_ncc then
    # reduces over K with the vertex axis on lanes (2.5% patch @ span
    # 384 measured on sorted fit meshes, vs 40 ms of ~6%-lane math in
    # the row-major layout at 656k).  The stream carries only the
    # first NCC_K=8 neighbor slots — remeshed fit meshes max out at
    # valence 7 (measured histogram: 5/6/7 only, icosphere after a
    # growth remesh; the table's K=20 is the reference's struct
    # padding, membrane_mesh_utils.h:26) — so the kernel scans 60%
    # fewer rows than K=20 and 33% fewer than the earlier K=12; the
    # rare valence>8 neighbors (unremeshed seeds) ride a fixed-width
    # overflow pair list handled exactly by compute_ncc, and a mesh
    # with MANY of them falls back atomically to the XLA path.
    NCC_K = 8
    n_ncc = nbr_np.shape[0] * NCC_K
    nat = native.kmaj_stream_clip(
        nbr_np, NCC_K, 1024,
        idx_out=_sbuf('st_ncc_idx', n_ncc, np.int32),
        care_out=_sbuf('st_ncc_care', n_ncc, np.uint8))
    if nat is not None:
        ncc_idx, ncc_care = nat
    else:
        from .pallas_gather import blocked_kmajor_stream
        nbr12 = nbr_np[:, :NCC_K]
        ncc_idx, ncc_care = blocked_kmajor_stream(
            np.clip(nbr12, 0, None), nbr12 >= 0, block=1024)
    # span 512 (not the tri/fold 384): the K=8 stream has fewer
    # padding rows diluting the patch budget — at 656k, span 384
    # measured 6.3% patch (over the 1/16 budget) while 512 holds
    # 328k patch rows, SMALLER than the old K=12/384 pair's 492k
    ring_ncc = ring_gather_schedule(
        ncc_idx, ncc_care, Vp, span=512, fixed_layout=True,
        kmaj_block=1024, care_out=True, cps=cps)
    if ring_ncc is not None:
        ov_extra = nbr_np[:, NCC_K:]
        ev, ek = np.nonzero(ov_extra >= 0)
        if len(ev) > ov_cap:
            ring_ncc = None     # absurd topology; atomic fallback
        else:
            nv = np.full(ov_cap, -1, np.int32)
            nu = np.zeros(ov_cap, np.int32)
            nv[:len(ev)] = ev
            nu[:len(ev)] = ov_extra[ev, ek]
            ring_ncc = (ring_ncc, jnp.asarray(nv), jnp.asarray(nu))
    inc, ov_r, ov_v = incidence_table(faces_np, f_mask_np, Vp)
    nat = native.flat_stream_clip(
        inc,
        idx_out=_sbuf('st_fold_idx', int(inc.size), np.int32),
        care_out=_sbuf('st_fold_care', int(inc.size), np.uint8))
    if nat is not None:
        fold_idx, fold_care = nat
    else:
        fold_idx = np.clip(inc, 0, None).reshape(-1)
        fold_care = (inc >= 0).reshape(-1)
    f_sched = ring_gather_schedule(
        fold_idx, fold_care, 3 * faces_np.shape[0],
        span=256, fixed_layout=True, fixed_patch_frac=1 / 8,
        care_out=True, cps=cps)
    if (ring_tri is None or ring_ncc is None or f_sched is None
            or len(ov_r) > ov_cap):
        return None, None, None, None
    ov_rows = np.full(ov_cap, -1, np.int32)
    ov_rows[:len(ov_r)] = ov_r
    ov_verts = np.zeros(ov_cap, np.int32)
    ov_verts[:len(ov_v)] = ov_v
    ring_fold = (f_sched,
                 jnp.asarray(fold_care.reshape(inc.shape)
                             .view(np.bool_)),
                 jnp.asarray(ov_rows), jnp.asarray(ov_verts))
    ring_cb = None
    if Vp > HCGC_MIN_VP:
        # per-corner streams: faces[:, j] in face order has the same
        # Hilbert locality as the interleaved stream and stays
        # monotone for the forward-sliding ring (see docstring)
        # span knob for the round-5 656k A/B sweep (CSW_CB_SPAN);
        # 384 is the production value
        cb_span = int(_os.environ.get('CSW_CB_SPAN', 384))

        def _corner(j):
            col = native.strided_col(
                faces_np, j,
                out=_sbuf('st_cb%d' % j, faces_np.shape[0], np.int32))
            if col is None:
                col = np.ascontiguousarray(faces_np[:, j])
            return ring_gather_schedule(
                col, f_mask_np, Vp,
                span=cb_span, fixed_layout=True, cps=cps)
        cb = [_corner(j) for j in range(3)]
        # optional: the fit falls back to the row-major S_tri path
        # for this topology if any corner stream is over budget (the
        # other three schedules stay engaged)
        if all(s is not None for s in cb):
            ring_cb = tuple(cb)
    return ring_tri, ring_ncc, ring_fold, ring_cb
