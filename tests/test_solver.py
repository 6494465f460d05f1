"""Tests for the device-resident shrinkwrap CG solver (fixed topology)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.ops import meshdata
from ch_shrinkwrap_tpu.ops import correspondence as corr
from ch_shrinkwrap_tpu.solver.shrinkwrap import cg_block, compute_ncc


def sphere_cloud(R=50.0, n=3000, sigma=5.0, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1)[:, None]
    pts = v * R + rng.normal(scale=sigma, size=(n, 3))
    return pts.astype(np.float32), np.full((n, 3), sigma, np.float32)


def test_nearest_face_exact():
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(500, 3)).astype(np.float32) * 10
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 10
    mask = np.ones(500, bool)
    mask[100:120] = False
    d, i = corr.nearest_face(jnp.asarray(pts), jnp.asarray(centers),
                             jnp.asarray(mask), face_chunk=128)
    d, i = np.asarray(d), np.asarray(i)
    # brute force reference
    dist = np.linalg.norm(pts[:, None, :] - centers[None, :, :], axis=-1)
    dist[:, ~mask] = np.inf
    np.testing.assert_array_equal(i, dist.argmin(1))
    np.testing.assert_allclose(d, dist.min(1), rtol=1e-4, atol=1e-3)


def test_nearest_face_grid_matches_bruteforce():
    """Grid-hash correspondence agrees with exact brute force for
    points near the surface (the fit regime)."""
    rng = np.random.default_rng(3)
    v, f = icosphere(4, radius=50.0)
    mesh = TriangleMesh(v, f)
    from ch_shrinkwrap_tpu.ops import meshdata as md
    ma = md.from_mesh(mesh, quantum=256)
    centers = np.asarray(ma.positions)[np.asarray(ma.faces)].mean(1)
    centers_j = jnp.asarray(centers)

    # points scattered within a few nm of the sphere
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 50.0 + rng.normal(scale=3.0, size=d.shape)).astype(np.float32)

    cell = 2.0 * mesh._mean_edge_length
    d_b, i_b = corr.nearest_face_bruteforce(jnp.asarray(pts), centers_j,
                                            ma.f_mask)
    d_g, i_g = corr.nearest_face_grid(jnp.asarray(pts), centers_j,
                                      ma.f_mask, cell)
    match = np.mean(np.asarray(i_b) == np.asarray(i_g))
    assert match > 0.98
    # distance error bounded by the cell size (the reference documents
    # the same bound for its octree mode, mesh_conj_grad.py:459-465)
    assert np.abs(np.asarray(d_g) - np.asarray(d_b)).max() < cell

    # far points still get a bounded-error match via the subsample
    far = (d[:100] * 200.0).astype(np.float32)
    d_g2, i_g2 = corr.nearest_face_grid(jnp.asarray(far), centers_j,
                                        ma.f_mask, cell)
    d_b2, _ = corr.nearest_face_bruteforce(jnp.asarray(far), centers_j,
                                           ma.f_mask)
    assert np.all(np.asarray(d_g2) >= np.asarray(d_b2) - 1e-3)
    assert np.all(np.asarray(d_g2) <= np.asarray(d_b2) + 5.0)


def test_a_ah_adjoint():
    """<A f, r>_points == <f, A^T r>_vertices (true adjoint pair)."""
    rng = np.random.default_rng(2)
    v, f = icosphere(2, radius=10.0)
    mesh = TriangleMesh(v, f)
    ma = meshdata.from_mesh(mesh, quantum=256)
    N = 100
    pts = rng.normal(size=(N, 3)).astype(np.float32) * 10
    d, fi = corr.nearest_face(jnp.asarray(pts),
                              jnp.asarray(np.asarray(ma.positions)[np.asarray(ma.faces)].mean(1)),
                              ma.f_mask)
    v_idx, w = corr.correspondence_weights(ma.positions, ma.faces,
                                           jnp.asarray(pts), fi)
    x = rng.normal(size=(ma.positions.shape[0], 3)).astype(np.float32)
    r = rng.normal(size=(N, 3)).astype(np.float32)
    Ax = corr.a_apply(jnp.asarray(x), v_idx, w)
    Ahr = corr.ah_apply(jnp.asarray(r), v_idx, w, ma.positions.shape[0])
    lhs = float((np.asarray(Ax) * r).sum())
    rhs = float((x * np.asarray(Ahr)).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_ncc_sphere_prior_points_inward():
    """On a sphere with zero point influence, the ncc prior is the plain
    neighbor centroid (alpha gated to 0), which lies inside the sphere."""
    v, f = icosphere(3, radius=10.0)
    mesh = TriangleMesh(v, f)
    ma = meshdata.from_mesh(mesh, quantum=256)
    from ch_shrinkwrap_tpu.ops import normals as nrm
    vn = nrm.vertex_normals(ma.positions, ma.faces, ma.f_mask,
                            ma.positions.shape[0])
    ncc = compute_ncc(ma.positions, ma.nbr_v, vn,
                      jnp.zeros(ma.positions.shape[0]), ma.v_mask)
    m = np.asarray(ma.v_mask)
    r = np.linalg.norm(np.asarray(ncc)[m], axis=1)
    assert (r < 10.0).all()
    assert (r > 9.0).all()


def run_block(mesh, pts, sigma, lam0=10.0, num_iters=5):
    ma = meshdata.from_mesh(mesh, quantum=256)
    N = pts.shape[0]
    sigma_inv = (1.0 / sigma).astype(np.float32)
    weights = sigma_inv / sigma_inv.mean()
    f_new, diag = cg_block(
        ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
        jnp.asarray(pts), jnp.asarray(sigma_inv), jnp.asarray(weights),
        jnp.ones(N, bool), lam0, num_iters=num_iters, face_chunk=512)
    return ma, np.asarray(f_new), diag


def test_cg_block_converges_to_sphere():
    """From a nearby start (the production pipeline seeds from a
    density surface), repeated CG blocks settle onto the point cloud.

    NB: the lam^2 ||S c||^2 Tikhonov term with the frozen _ncc prior
    acts as an implicit per-iteration step limiter — matching the
    reference's behavior, which also relies on a close dual-marching-
    cubes initial surface (SURVEY §3.1)."""
    pts, sigma = sphere_cloud(R=50.0, n=3000, sigma=3.0)
    v, f = icosphere(3, radius=60.0)
    mesh = TriangleMesh(v, f)

    ma = meshdata.from_mesh(mesh, quantum=256)
    fcur = ma.positions
    sigma_inv = (1.0 / sigma).astype(np.float32)
    weights = sigma_inv / sigma_inv.mean()
    first_res = None
    for _ in range(8):
        fcur, diag = cg_block(
            fcur, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            jnp.asarray(pts), jnp.asarray(sigma_inv), jnp.asarray(weights),
            jnp.ones(pts.shape[0], bool), 2.0, num_iters=5, face_chunk=512)
        if first_res is None:
            first_res = float(np.asarray(diag.ress)[0])

    m = np.asarray(ma.v_mask)
    r1 = np.linalg.norm(np.asarray(fcur)[m], axis=1)
    assert abs(r1.mean() - 50.0) < 1.0
    assert r1.std() < 1.5
    assert float(np.asarray(diag.ress)[-1]) < first_res
    assert np.asarray(diag.point_influence)[m].max() > 0
    assert int(diag.n_done) == 5


def test_hilbert_order_native_matches_numpy(monkeypatch):
    """The native hilbert_codes path must produce the identical
    permutation to the pure-numpy Skilling loops (the fallback)."""
    from ch_shrinkwrap_tpu import native
    from ch_shrinkwrap_tpu.ops import correspondence as c

    if native.get_lib() is None:
        pytest.skip('native lib unavailable')
    rng = np.random.default_rng(11)
    pts = (rng.normal(size=(8192, 3)) * 50).astype(np.float32)
    o_native = c.hilbert_order(pts)
    monkeypatch.setattr(native, 'hilbert_codes', lambda X, bits: None)
    o_numpy = c.hilbert_order(pts)
    np.testing.assert_array_equal(o_native, o_numpy)


def test_cg_block_respects_padding():
    pts, sigma = sphere_cloud(R=50.0, n=500, sigma=3.0)
    v, f = icosphere(2, radius=75.0)
    mesh = TriangleMesh(v, f)
    ma, f1, diag = run_block(mesh, pts, sigma, num_iters=3)
    pad = ~np.asarray(ma.v_mask)
    # padded vertices never move
    np.testing.assert_array_equal(f1[pad], np.zeros((pad.sum(), 3)))
    assert not np.isnan(f1).any()


def test_nearest_face_windowed_pallas_interpret():
    """The Pallas windowed kernel (interpret mode on CPU) matches the
    XLA windowed path and stays close to exact brute force, including
    the in-kernel hashed-subsample fallback for far points."""
    rng = np.random.default_rng(7)
    v, f = icosphere(4, radius=50.0)
    from ch_shrinkwrap_tpu.ops import meshdata as md
    ma = md.from_mesh(TriangleMesh(v, f), quantum=256)
    centers = jnp.asarray(
        np.asarray(ma.positions)[np.asarray(ma.faces)].mean(1))

    d = rng.normal(size=(4000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 50.0 + rng.normal(scale=3.0, size=d.shape))
    far = rng.uniform(-150, 150, (200, 3))
    allp = np.vstack([pts, far]).astype(np.float32)
    allp = allp[corr.fit_point_order(allp)]
    jp = jnp.asarray(allp)

    d_b, i_b = corr.nearest_face_bruteforce(jp, centers, ma.f_mask)
    d_p, i_p = corr.nearest_face_windowed(
        jp, centers, ma.f_mask, window=1024, use_pallas=True,
        pallas_interpret=True)
    i_b, i_p = np.asarray(i_b), np.asarray(i_p)
    d_b, d_p = np.asarray(d_b), np.asarray(d_p)
    # high id agreement; windowed distances can only overestimate up
    # to the kernel's bf16 compare rounding (~0.4% relative), and the
    # misses land on near-equidistant neighbor faces (the fit is
    # insensitive to these ties — see BASELINE.md accuracy study)
    assert (i_p == i_b).mean() > 0.85
    assert np.all(d_p >= d_b * 0.99 - 0.05)
    assert np.abs(d_p - d_b).mean() < 1.0
    assert np.abs(d_p - d_b).max() < 10.0


@pytest.mark.slow
def test_windowed_id_agreement_production_shape():
    """BASELINE.md claims >= 99% nearest-face agreement for the
    production windowed search; assert it on a production-shaped
    fixture (1e5-point Hilbert-sorted noisy cloud with background,
    20k-face mesh) so a quality regression cannot hide behind the
    small-fixture threshold above."""
    rng = np.random.default_rng(11)
    v, f = icosphere(5, radius=50.0)
    from ch_shrinkwrap_tpu.ops import meshdata as md
    ma = md.from_mesh(TriangleMesh(v, f), quantum=256)
    centers = jnp.asarray(
        np.asarray(ma.positions)[np.asarray(ma.faces)].mean(1))

    d = rng.normal(size=(100_000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 50.0 + rng.normal(scale=3.0, size=d.shape))
    far = rng.uniform(-150, 150, (2_000, 3))          # 2% background
    allp = np.vstack([pts, far]).astype(np.float32)
    allp = allp[corr.fit_point_order(allp)]
    jp = jnp.asarray(allp)

    d_b, i_b = corr.nearest_face_bruteforce(jp, centers, ma.f_mask)
    d_w, i_w = corr.nearest_face_windowed(jp, centers, ma.f_mask,
                                          window=2048)
    agree = (np.asarray(i_w) == np.asarray(i_b)).mean()
    # 0.978 at this 20k-face fixture with the stratified subsample
    # (the round-4 fix for the capacity-dependent hash-equidistribution
    # collapse: 0.92 agreement at the 263168-face capacity).  Misses
    # are near-ties (mean |d| error 0.6 nm at sigma = 3) — the fit is
    # insensitive to them (BASELINE.md accuracy study); production
    # capacities measure 0.984-0.990.
    assert agree > 0.97, f'windowed id agreement {agree:.4f} < 0.97'
    db, dw = np.asarray(d_b), np.asarray(d_w)
    assert np.abs(dw - db).mean() < 0.05      # misses are near-ties
    assert np.all(dw >= db - 1e-3)            # never underestimates

    # adjacency polish quality points (BASELINE.md: 99.8% with the
    # 6-iteration polish at 1M/327k; measured here 99.1% @ 2 iters,
    # 99.95% @ 6 iters)
    _, i_p2 = corr.refine_correspondence(jp, centers, ma.face_nbrs,
                                         i_w, n_iter=2)
    agree_p2 = (np.asarray(i_p2) == np.asarray(i_b)).mean()
    assert agree_p2 > 0.99, f'polish-2 agreement {agree_p2:.4f} < 0.99'
    _, i_p6 = corr.refine_correspondence(jp, centers, ma.face_nbrs,
                                         i_w, n_iter=6)
    agree_p6 = (np.asarray(i_p6) == np.asarray(i_b)).mean()
    assert agree_p6 > 0.995, f'polish-6 agreement {agree_p6:.4f} < 0.995'


@pytest.mark.slow
def test_cg_block_windowed_matches_brute_torus_noise():
    """End-state equivalence of the windowed correspondence on a
    NON-sphere: a noisy torus cloud with 10% uniform background
    converges to the same surface under windowed and brute search."""
    from ch_shrinkwrap_tpu.models.membrane_mesh import MembraneMesh

    rng = np.random.default_rng(7)
    R, r, n = 40.0, 10.0, 20_000
    u = rng.uniform(0, 2 * np.pi, n)
    vv = rng.uniform(0, 2 * np.pi, n)
    tor = np.stack([(R + r * np.cos(vv)) * np.cos(u), r * np.sin(vv),
                    (R + r * np.cos(vv)) * np.sin(u)], 1)
    tor += rng.normal(scale=2.0, size=tor.shape)
    bg = rng.uniform(-60, 60, (2000, 3))
    pts = np.vstack([tor, bg]).astype(np.float32)

    finals = {}
    for method in ('brute', 'windowed'):
        v, f = icosphere(3, radius=1.0)
        v = v * np.array([55.0, 14.0, 55.0], np.float32)
        m = MembraneMesh(v, f, kc=1.0, step_size=4.0,
                         remesh_frequency=0, delaunay_remesh_frequency=0,
                         neck_first_iter=-1)
        m.corr_method = method
        m.shrink_wrap(pts, 2.0, max_iter=20)
        finals[method] = m.vertices.copy()

    # same topology (no remesh) -> same vertex count; compare surfaces
    # via nearest-neighbor distance (windowed may visit vertices in a
    # different order after fit_point_order)
    from scipy.spatial import cKDTree
    d01 = cKDTree(finals['brute']).query(finals['windowed'], k=1,
                                         workers=-1)[0]
    assert np.median(d01) < 0.5
    assert d01.mean() < 1.0


def test_windowed_segment_sum_matches_segment_sum():
    """The scatter-free windowed A^T accumulator reproduces
    jax.ops.segment_sum exactly on real correspondence routing data
    (window winners AND subsample-fallback winners)."""
    import jax
    rng = np.random.default_rng(5)
    v, f = icosphere(4, radius=50.0)
    from ch_shrinkwrap_tpu.ops import meshdata as md
    ma = md.from_mesh(TriangleMesh(v, f), quantum=256)
    centers = jnp.asarray(
        np.asarray(ma.positions)[np.asarray(ma.faces)].mean(1))
    Fp = centers.shape[0]

    d = rng.normal(size=(6000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 50.0 + rng.normal(scale=3.0, size=d.shape))
    far = rng.uniform(-150, 150, (400, 3))
    allp = np.vstack([pts, far]).astype(np.float32)
    allp = allp[corr.fit_point_order(allp)]

    _, fid, meta = corr.nearest_face_windowed(
        jnp.asarray(allp), centers, ma.f_mask, window=1024,
        use_pallas=True, pallas_interpret=True, return_meta=True)
    vals = jnp.asarray(
        rng.normal(size=(allp.shape[0], 12)).astype(np.float32))
    ref = jax.ops.segment_sum(vals, fid, num_segments=Fp)
    out = jax.jit(lambda v_, f_: corr.windowed_segment_sum(
        v_, f_, meta, Fp, window=1024))(vals, fid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4 * float(jnp.abs(ref).max()))


def test_windowed_ahw2_fused_matches_separate_passes():
    """The one-sweep AH+W2 kernel (c_cols=24, 18 live columns) must
    reproduce the two separate kernel passes exactly — same routing
    data, same packed inputs, products formed in-kernel."""
    import jax
    from ch_shrinkwrap_tpu.ops.pallas_scatter import (
        windowed_ah_pallas, windowed_w2_pallas, windowed_ahw2_pallas)
    rng = np.random.default_rng(9)
    v, f = icosphere(4, radius=50.0)
    from ch_shrinkwrap_tpu.ops import meshdata as md
    ma = md.from_mesh(TriangleMesh(v, f), quantum=256)
    centers = jnp.asarray(
        np.asarray(ma.positions)[np.asarray(ma.faces)].mean(1))
    Fp = centers.shape[0]

    d = rng.normal(size=(6000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 50.0 + rng.normal(scale=3.0, size=d.shape))
    allp = pts.astype(np.float32)[corr.fit_point_order(pts)]
    _, fid, meta = corr.nearest_face_windowed(
        jnp.asarray(allp), centers, ma.f_mask, window=1024,
        use_pallas=True, pallas_interpret=True, return_meta=True)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (allp.shape[0], 3))
                    .astype(np.float32))
    res = jnp.asarray(rng.normal(size=(allp.shape[0], 3))
                      .astype(np.float32))
    kw = dict(num_segments=Fp, window=1024, interpret=True)
    ah = windowed_ah_pallas(w, res, fid, meta.js, meta.starts,
                            meta.sub_ids, **kw)
    w2 = windowed_w2_pallas(w, fid, meta.js, meta.starts,
                            meta.sub_ids, **kw)
    ahf, w2f = windowed_ahw2_pallas(w, res, fid, meta.js, meta.starts,
                                    meta.sub_ids, **kw)
    np.testing.assert_array_equal(np.asarray(ahf), np.asarray(ah))
    np.testing.assert_array_equal(np.asarray(w2f), np.asarray(w2))
    aht, w2t = windowed_ahw2_pallas(w, res, fid, meta.js, meta.starts,
                                    meta.sub_ids, transposed_out=True,
                                    **kw)
    np.testing.assert_array_equal(np.asarray(aht.T), np.asarray(ah))
    np.testing.assert_array_equal(np.asarray(w2t.T), np.asarray(w2))


def test_cg_block_windowed_pallas_matches_brute():
    """Full solver block through the Pallas correspondence + windowed
    A^T accumulator (interpret mode) converges identically to the
    exact brute-force path."""
    pts, sig = sphere_cloud(n=8000, seed=3)
    pts = pts[corr.fit_point_order(pts)]
    v, f = icosphere(3, radius=60.0)
    ma = meshdata.from_mesh(TriangleMesh(v, f), quantum=256)
    sigma_inv = jnp.asarray(1.0 / sig)
    weights = sigma_inv / jnp.sqrt((sigma_inv ** 2).sum())
    pmask = jnp.ones((len(pts),), bool)
    args = (ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            jnp.asarray(pts), sigma_inv, weights, pmask, 10.0)
    fb, _ = cg_block(*args, num_iters=6, corr_method='brute')
    fw, _ = cg_block(*args, num_iters=6, corr_method='windowed_pallas',
                     pallas_interpret=True)
    vm = np.asarray(ma.v_mask)
    rb = np.linalg.norm(np.asarray(fb)[vm], axis=1)
    rw = np.linalg.norm(np.asarray(fw)[vm], axis=1)
    assert abs(rb.mean() - rw.mean()) < 0.05
    assert np.abs(np.asarray(fb) - np.asarray(fw))[vm].max() < 0.5



def test_cg_block_face_hcgc_matches_pointside():
    """Face-side normal equations (W2/E contraction, the path that
    eliminates the (N, 9s) AS gather) must reproduce the point-side
    subspace solve."""
    pts, sig = sphere_cloud(n=8000, seed=5)
    pts = pts[corr.fit_point_order(pts)]
    v, f = icosphere(3, radius=60.0)
    ma = meshdata.from_mesh(TriangleMesh(v, f), quantum=256)
    sigma_inv = jnp.asarray(1.0 / sig)
    weights = sigma_inv / jnp.sqrt((sigma_inv ** 2).sum())
    pmask = jnp.ones((len(pts),), bool)
    args = (ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            jnp.asarray(pts), sigma_inv, weights, pmask, 10.0)
    fp, dp = cg_block(*args, num_iters=6,
                      corr_method='windowed_pallas',
                      pallas_interpret=True)
    ff, df = cg_block(*args, num_iters=6,
                      corr_method='windowed_pallas',
                      pallas_interpret=True, face_hcgc=True)
    vm = np.asarray(ma.v_mask)
    # same correspondence, same residuals — only the normal-equation
    # contraction order differs; trajectories must agree tightly
    assert np.abs(np.asarray(fp) - np.asarray(ff))[vm].max() < 0.05
    rp = np.linalg.norm(np.asarray(fp)[vm], axis=1)
    rf = np.linalg.norm(np.asarray(ff)[vm], axis=1)
    assert abs(rp.mean() - rf.mean()) < 0.01


def test_cg_block_active_iters_matches_shorter_block():
    """active_iters=k under a longer compiled block must equal a
    num_iters=k block exactly (the driver's variable-length blocks)."""
    pts, sig = sphere_cloud(n=6000, seed=7)
    v, f = icosphere(3, radius=60.0)
    ma = meshdata.from_mesh(TriangleMesh(v, f), quantum=256)
    sigma_inv = jnp.asarray(1.0 / sig)
    weights = sigma_inv / jnp.sqrt((sigma_inv ** 2).sum())
    pmask = jnp.ones((len(pts),), bool)
    args = (ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            jnp.asarray(pts), sigma_inv, weights, pmask, 10.0)
    f3, d3 = cg_block(*args, num_iters=3, corr_method='brute')
    f63, d63 = cg_block(*args, num_iters=6, corr_method='brute',
                        active_iters=3)
    np.testing.assert_allclose(np.asarray(f3), np.asarray(f63),
                               rtol=0, atol=1e-6)
    assert int(d63.n_done) == 3


def test_cg_block_want_curv_K_matches_standalone():
    """diag.K (in-block Gaussian curvature at the final positions,
    consumed by the boundary neck diagnostic) must equal the standalone
    curvature program on the same padded arrays, and must not perturb
    the positions themselves."""
    from ch_shrinkwrap_tpu.ops.curvature import curvature_grad
    pts, sig = sphere_cloud(n=4000, seed=11)
    v, f = icosphere(3, radius=55.0)
    ma = meshdata.from_mesh(TriangleMesh(v, f), quantum=256)
    sigma_inv = jnp.asarray(1.0 / sig)
    weights = sigma_inv / jnp.sqrt((sigma_inv ** 2).sum())
    pmask = jnp.ones((len(pts),), bool)
    args = (ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            jnp.asarray(pts), sigma_inv, weights, pmask, 10.0)
    f_plain, d_plain = cg_block(*args, num_iters=3, corr_method='brute')
    assert d_plain.K is None
    f_k, d_k = cg_block(*args, num_iters=3, corr_method='brute',
                        nbr_f=ma.nbr_f, want_curv_K=True)
    np.testing.assert_array_equal(np.asarray(f_plain), np.asarray(f_k))
    K_ref = curvature_grad(f_k, ma.faces, ma.f_mask, ma.v_mask,
                           ma.nbr_v, ma.nbr_f).K
    np.testing.assert_array_equal(np.asarray(d_k.K), np.asarray(K_ref))


def test_cb_lane_major_subspace_contraction_identity():
    """The corner-blocked lane-major Gc/Hc construction (matmul over
    faces + tiny diagonal extraction) must equal the row-major
    face-side einsums it replaces (cg_block use_cb branch)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    Fp, s_size = 512, 4
    ks = 3 * s_size
    S_tri = rng.normal(size=(Fp, 9 * s_size)).astype(np.float32)
    E = rng.normal(size=(Fp, 9)).astype(np.float32)
    W2 = rng.normal(size=(Fp, 6)).astype(np.float32)

    # row-major reference (solver shrinkwrap.py W2 branch)
    Sc = [S_tri[:, ks * a:ks * (a + 1)].reshape(Fp, 3, s_size)
          for a in range(3)]
    Gc_ref = sum(np.einsum('fik,fi->k', Sc[j], E[:, 3 * j:3 * j + 3])
                 for j in range(3))
    pair_col = {(0, 0): 0, (1, 1): 1, (2, 2): 2,
                (0, 1): 3, (0, 2): 4, (1, 2): 5}
    Hc_ref = 0.0
    for (a, b), col in pair_col.items():
        Za = Sc[a] * W2[:, col][:, None, None]
        Hab = np.einsum('fik,fil->kl', Za, Sc[b])
        Hc_ref = Hc_ref + (Hab if a == b else Hab + Hab.T)

    # lane-major construction: Sc_t[a] = (3s, Fp) corner blocks (what
    # the corner-blocked transposed ring gather yields)
    Sc_t = [jnp.asarray(S_tri[:, ks * a:ks * (a + 1)].T)
            for a in range(3)]
    Ej = jnp.asarray(E)
    Gc = 0.0
    for j in range(3):
        Mj = jnp.einsum('af,fi->ai', Sc_t[j], Ej[:, 3 * j:3 * j + 3],
                        precision='highest')
        Gc = Gc + jnp.einsum('iki->k', Mj.reshape(3, s_size, 3))
    Hc = 0.0
    for (a, b), col in pair_col.items():
        Za_t = Sc_t[a] * jnp.asarray(W2[:, col])[None, :]
        Mab = jnp.einsum('af,bf->ab', Za_t, Sc_t[b],
                         precision='highest')
        Hab = jnp.einsum('ikil->kl',
                         Mab.reshape(3, s_size, 3, s_size))
        Hc = Hc + (Hab if a == b else Hab + Hab.T)

    np.testing.assert_allclose(np.asarray(Gc), Gc_ref, rtol=2e-4,
                               atol=2e-4 * np.abs(Gc_ref).max())
    np.testing.assert_allclose(np.asarray(Hc), Hc_ref, rtol=2e-4,
                               atol=2e-4 * np.abs(Hc_ref).max())


def test_corner_blocked_schedule_stream_order():
    """fit_ring_schedules' ring_tri_cb is a triple of per-corner
    schedules: schedule a's row f gathers vertex faces[f, a].  Three
    SEPARATE schedules because a single concatenated j-major stream
    restarts at vertex ~0 at each corner boundary, off the
    forward-sliding ring's residency window (meshdata docstring)."""
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    from ch_shrinkwrap_tpu.ops import meshdata

    v, f = icosphere(4, radius=100.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False)
    faces = np.asarray(ma.faces)
    fmask = np.asarray(ma.f_mask)
    Vp = ma.positions.shape[0]

    # below HCGC_MIN_VP the builder skips it; build directly with the
    # same parameters to validate the per-corner stream construction
    from ch_shrinkwrap_tpu.ops.pallas_gather import ring_gather_schedule
    from test_ring_gather import emulate_ring_gather
    src = np.random.default_rng(0).normal(
        size=(Vp, 12)).astype(np.float32)
    for a in range(3):
        sched = ring_gather_schedule(
            np.ascontiguousarray(faces[:, a]), fmask, Vp,
            span=384, fixed_layout=True)
        assert sched is not None
        out = emulate_ring_gather(src, sched)
        exp = src[faces[:, a]] * fmask[:, None]
        np.testing.assert_array_equal(
            out[:faces.shape[0]] * fmask[:, None], exp)


def test_subsample_ids_equidistribute_at_all_capacities():
    """The hashed face subsample must never leave large holes in the
    live index range: pure multiplicative hashing mod n_total measured
    gaps of ~1500 consecutive faces at the 263168-face capacity
    (~5.7x the mean spacing), which collapsed the windowed search's
    fallback (0.92 vs 0.98 nearest-face agreement) and wrinkled a
    full fit into neck-pass shredding.  The stratified construction
    bounds the gap below two strata for every capacity."""
    from ch_shrinkwrap_tpu.ops.correspondence import _subsample_ids

    for n_total in (20480, 65536, 131072, 187392, 262144, 263168,
                    264192, 372736, 999424):
        ids = np.asarray(_subsample_ids(n_total, 1024))
        gaps = np.diff(np.concatenate([[0], ids, [n_total]]))
        strat = n_total // min(1024, n_total)
        assert gaps.max() <= 2 * strat + 1, (n_total, gaps.max())
        assert len(ids) >= 1000     # near-zero dedup loss
