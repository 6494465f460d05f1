"""Integration tests for the MembraneMesh driver (full shrink_wrap)."""

import numpy as np
import pytest

from ch_shrinkwrap_tpu.models.membrane_mesh import MembraneMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.mesh.marching import surface_from_function


def sphere_cloud(R=50.0, n=5000, sigma=3.0, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1)[:, None]
    pts = v * R + rng.normal(scale=sigma, size=(n, 3))
    return pts.astype(np.float32), np.full((n, 3), sigma, np.float32)


def test_full_shrink_wrap_sphere():
    """End-to-end: noisy sphere cloud + nearby start -> converged wrap
    with remeshing on the edge-length schedule."""
    pts, sigma = sphere_cloud()
    v, f = icosphere(3, radius=60.0)
    mesh = MembraneMesh(
        v, f, kc=1.0, step_size=4.0, remesh_frequency=5,
        delaunay_remesh_frequency=0, neck_first_iter=-1)
    mesh.shrink_wrap(pts, sigma, method='conjugate_gradient', max_iter=20,
                     minimum_edge_length=4.0)

    r = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(r.mean() - 50.0) < 1.5
    assert np.abs(r - 50.0).std() < 2.0
    assert mesh.euler_characteristic == 2
    assert mesh.is_manifold
    # refinement schedule drove edge length toward the minimum
    assert mesh._mean_edge_length < 8.0
    # diagnostics accessible
    assert mesh.point_influence.shape[0] == mesh.vertices.shape[0]
    assert mesh.S0.shape == mesh.vertices.shape
    assert mesh.point_dis.min() >= 0


def test_shrink_wrap_continues_with_cached_points():
    pts, sigma = sphere_cloud(n=1000)
    v, f = icosphere(2, radius=60.0)
    mesh = MembraneMesh(v, f, kc=1.0, step_size=4.0, remesh_frequency=0,
                        delaunay_remesh_frequency=0)
    mesh.shrink_wrap(pts, sigma, max_iter=5)
    r1 = np.linalg.norm(mesh.vertices, axis=1).mean()
    # continue without re-passing points (pyx:1650-1667 caching)
    mesh.shrink_wrap(max_iter=5)
    r2 = np.linalg.norm(mesh.vertices, axis=1).mean()
    assert r2 < r1


def dumbbell_mesh():
    """Two spheres bridged by a short thin neck (smooth union)."""
    def f(p):
        d1 = np.linalg.norm(p - np.array([-22.0, 0, 0]), axis=1) - 20.0
        d2 = np.linalg.norm(p - np.array([22.0, 0, 0]), axis=1) - 20.0
        q = p.copy()
        x = np.clip(p[:, 0], -22, 22)
        dc = np.sqrt((p[:, 0] - x) ** 2 + p[:, 1] ** 2 + p[:, 2] ** 2) - 5.0
        d = np.minimum(np.minimum(d1, d2), dc)
        return d

    v, fc = surface_from_function(f, (-48, -26, -26, 48, 26, 26), 1.3)
    mesh = MembraneMesh(v, fc, smooth_curvature=True)
    # marched output has sliver triangles whose curvature estimates are
    # noisy; remesh to isotropic quality first (the fit pipeline always
    # does this between CG blocks)
    mesh.remesh(3, 2.2, 0.5, n_relax=5)
    return mesh


def test_short_edges_defer_remesh():
    """``defer_remesh=True`` removes the flagged vertices and repairs
    without the internal full remesh (the driver's scheduled remesh
    follows at the same boundary); the mesh stays closed and manifold
    either way."""
    rng = np.random.default_rng(5)
    v, f = icosphere(3, radius=50.0)
    results = {}
    for defer in (False, True):
        m = MembraneMesh(v.copy(), f.copy())
        nb = m.vertex_neighbors
        idx = rng.choice(len(v), size=12, replace=False)
        tgt = nb[idx, 0]
        ok = tgt >= 0
        pos = m.vertices.copy()
        pos[idx[ok]] = pos[tgt[ok]] + 1e-4
        m.set_positions(pos)
        el = m.halfedges.length
        assert (el < 0.05 * np.median(el)).any()
        m.remove_extra_short_edges(defer_remesh=defer)
        el2 = m.halfedges.length
        assert not (el2 < 0.05 * np.median(el2)).any()
        assert m.is_manifold
        assert m.euler_characteristic == 2
        results[defer] = m.vertices.shape[0]


def test_remove_necks_severs_dumbbell():
    mesh = dumbbell_mesh()
    _, n0 = mesh.connected_components()
    assert n0 == 1
    assert mesh.is_manifold

    # the neck saddle has strongly negative Gaussian curvature; the
    # spheres have K = 1/400 = 2.5e-3 (inside the thresholds)
    mesh.remove_necks(neck_curvature_threshold_low=-1e-3,
                      neck_curvature_threshold_high=1e-1)
    labels, n1 = mesh.connected_components()
    sizes = np.bincount(labels, minlength=n1)
    # the two spheres survive as separate closed components
    assert (sizes > 100).sum() == 2
    # and the mesh is a disjoint union of closed surfaces again
    he = mesh.halfedges
    assert (he.twin >= 0).all()


def test_distance_to_surface_sign():
    v, f = icosphere(3, radius=20.0)
    mesh = MembraneMesh(v, f)
    pts = np.array([[0.0, 0, 0], [25.0, 0, 0], [0, 19.0, 0]], np.float32)
    d = mesh.distance_to_surface(pts)
    assert d[0] < 0       # inside
    assert d[1] > 4.0     # outside
    # nearest-face-center distance is accurate to ~edge length
    assert abs(d[2]) < 3.0


def test_residual_histogram():
    pts, sigma = sphere_cloud(n=1000)
    v, f = icosphere(3, radius=50.0)
    mesh = MembraneMesh(v, f)
    mesh._points = pts
    mesh._sigma = sigma
    counts, edges, pred = mesh.residual_histogram()
    assert counts.sum() > 0
    assert pred is not None and np.isfinite(pred).all()


def test_fit_donated_partial_curvature_state_repopulates():
    """A fit with necks enabled donates a K-only curvature state
    (in-block diag.K).  Reading K must use it as-is; reading any other
    field (H) must transparently repopulate the full state."""
    from ch_shrinkwrap_tpu.ops import curvature as _curv

    v, f = icosphere(2, radius=50.0)
    mesh = MembraneMesh(v, f)
    # exercise the device-donation machinery (the fallback when the
    # native host K is unavailable), not the native K fast path
    mesh.use_native_neck_k = False
    K_full = mesh.curvature_gaussian.copy()   # ground truth, full state
    # simulate the driver's donation: same positions, K-only state
    st = mesh._curv_state['_dev']
    mesh._curv_state = {'_dev': _curv.CurvatureState(
        k_0=None, k_1=None, e_0=None, e_1=None, H=None,
        K=st.K, dH=None, dK=None, E=None, pE=None,
        dE_neighbors=None, dEdN=None)}
    np.testing.assert_allclose(mesh.curvature_gaussian, K_full,
                               rtol=0, atol=1e-6)
    H = mesh.curvature_mean          # None in the donated state
    assert np.isfinite(H).all() and H.shape == (len(mesh.vertices),)


def test_diag_meshdata_keeps_capacity_across_topology_change():
    """After the fit donates its (v_cap, f_cap)-shaped meshdata, a
    topology change (punch/neck surgery shrinks the mesh) must rebuild
    the diagnostic meshdata AT THE SAME capacities — a new pow2 shape
    would cost a cold curvature-program compile mid-fit."""
    from ch_shrinkwrap_tpu.ops import meshdata

    v, f = icosphere(3, radius=50.0)
    mesh = MembraneMesh(v, f)
    v_cap = meshdata.round_up_bucket(3 * len(v), mesh.pad_quantum)
    f_cap = meshdata.round_up_bucket(3 * len(f), mesh.pad_quantum)
    ma = meshdata.from_mesh(mesh, v_cap=v_cap, f_cap=f_cap,
                            quantum=mesh.pad_quantum)
    mesh._donate_diag_meshdata(ma, ma.positions)
    assert mesh._padded_meshdata().positions.shape[0] == v_cap

    mesh.unsafe_remove_vertices(np.arange(10))   # bump topo rev
    mesh.repair()
    ma2 = mesh._padded_meshdata()
    assert ma2.positions.shape[0] == v_cap
    assert ma2.faces.shape[0] == f_cap
    # and the rebuilt tables are correct for the new topology
    K = mesh.curvature_gaussian
    assert K.shape == (len(mesh.vertices),) and np.isfinite(K).all()


def test_native_k_fast_path_seeds_curvature_state():
    """With no cached curvature state, reading K takes the native host
    path (no device program); reading another field afterwards
    repopulates the full device state transparently."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('native toolchain unavailable')
    v, f = icosphere(2, radius=50.0)
    mesh = MembraneMesh(v, f)
    assert mesh._curv_state is None
    K = mesh.curvature_gaussian
    assert '_native_K' in mesh._curv_state
    np.testing.assert_almost_equal(
        np.median(K) * 50.0 ** 2, 1.0, decimal=1)
    H = mesh.curvature_mean           # forces full repopulation
    assert np.isfinite(H).all() and H.shape == (len(mesh.vertices),)


def test_schedule_clamped_when_max_iter_multiple_of_rf():
    """With max_iter an exact multiple of remesh_frequency, the linear
    edge-length schedule evaluates PAST final_length at the last
    boundary (the reference ships the overshoot unclamped,
    pyx:1541-1546 — a steep schedule goes NEGATIVE, exploding the
    final-capacity prediction into TiB allocations).  The rebuild
    clamps to the schedule endpoints in both the capacity predictor
    and the loop."""
    pts, sigma = sphere_cloud(R=100.0, n=4000, sigma=3.0)
    v, f = icosphere(3, radius=110.0)
    # steep schedule: initial ~38 nm -> final min(sigma)/2.5 = 1.2 nm,
    # max_iter=10 divisible by rf=5 -> unclamped target at j=10 < 0
    mesh = MembraneMesh(
        v, f, kc=1.0, step_size=4.0, remesh_frequency=5,
        delaunay_remesh_frequency=0, neck_first_iter=-1)
    mesh.shrink_wrap(pts, sigma, method='conjugate_gradient',
                     max_iter=10)
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(r.mean() - 100.0) < 3.0
    assert mesh.is_manifold
    # the final remesh targeted final_length (1.2), not a negative
    # length; the resulting mean edge stays a sane positive value
    assert mesh._mean_edge_length > 0.5
    # final target recorded in the trace is the clamped value
    remesh_recs = [r for r in mesh.trace.records if r.kind == 'remesh']
    assert remesh_recs, 'remesh must have run'
    assert all(r.extra['target_length'] >= 1.0 for r in remesh_recs)


def test_capacity_mode_two_advances_rung_and_converges():
    """capacity_mode='two' runs the growth phase at a mid-size rung and
    advances to the predicted final capacity when the mesh outgrows it;
    the fit converges like capacity_mode='final' (the device program
    differs only in padding).  Driver policy in
    models/membrane_mesh.py (cap_mode == 'two')."""
    pts, sigma = sphere_cloud(R=50.0, n=4000, sigma=2.0)
    radii = {}
    for mode in ('final', 'two'):
        v, f = icosphere(2, radius=60.0)
        mesh = MembraneMesh(v, f, kc=1.0, step_size=4.0,
                            remesh_frequency=5,
                            delaunay_remesh_frequency=0,
                            neck_first_iter=-1)
        mesh.capacity_mode = mode
        mesh.pad_quantum = 256
        mesh.shrink_wrap(pts, sigma, method='conjugate_gradient',
                         max_iter=12, minimum_edge_length=3.5)
        r = np.linalg.norm(mesh.vertices, axis=1)
        radii[mode] = r.mean()
        assert abs(r.mean() - 50.0) < 3.0, mode
        assert mesh.is_manifold, mode
        if mode == 'two':
            # the growing sphere must have crossed the mid rung and
            # consumed the final rung — assert the rung-advance path
            # actually ran, not just that the rung list ended empty
            # (it starts empty in the degenerate seed-past-half case)
            caps = [r.extra.get('v_cap') for r in mesh.trace.records
                    if r.kind == 'cg_block' and r.extra.get('v_cap')]
            assert caps, 'no cg blocks recorded'
            assert caps[-1] > caps[0], \
                'mid rung never created/advanced - test mesh too small'
            assert mesh._cap_rungs == [], \
                'final rung never consumed'
    assert abs(radii['two'] - radii['final']) < 1.0


def test_speculative_punch_boundary_blocks_match_serial():
    """Punch-only boundaries (delaunay cadence not a multiple of the
    remesh cadence) dispatch the next CG block speculatively while the
    host runs the punch analysis; when the punch no-ops the result is
    adopted.  The fit trajectory must be identical to the serial path
    (driver policy in models/membrane_mesh.py, spec_pending)."""
    pts, sigma = sphere_cloud(R=50.0, n=4000, sigma=2.0)
    out = {}
    for spec in (True, False):
        v, f = icosphere(2, radius=60.0)
        mesh = MembraneMesh(v, f, kc=1.0, step_size=4.0,
                            remesh_frequency=5,
                            delaunay_remesh_frequency=3,
                            delaunay_eps=25.0,
                            neck_first_iter=-1)
        mesh.speculative_blocks = spec
        mesh.shrink_wrap(pts, sigma, method='conjugate_gradient',
                         max_iter=12, minimum_edge_length=4.0)
        out[spec] = mesh.vertices.copy()
        assert mesh.is_manifold
    assert out[True].shape == out[False].shape
    np.testing.assert_allclose(out[True], out[False], atol=1e-5)


def test_separator_neck_detector_severs_dumbbell():
    """The separator detector (neck_detector='separator') severs the
    dumbbell neck exactly like the threshold criterion: the waist ring
    is a connected negative-K patch whose removal disconnects the
    surface."""
    mesh = dumbbell_mesh()
    _, n0 = mesh.connected_components()
    assert n0 == 1
    mesh.neck_detector = 'separator'
    mesh.neck_separator_threshold = -1e-3
    mesh.remove_necks(neck_curvature_threshold_low=-1e-3,
                      neck_curvature_threshold_high=1e-1)
    labels, n1 = mesh.connected_components()
    sizes = np.bincount(labels, minlength=n1)
    assert (sizes > 100).sum() == 2
    he = mesh.halfedges
    assert (he.twin >= 0).all()


def test_separator_neck_detector_spares_noisy_sphere():
    """On a wrinkled sphere the pure threshold flags scattered noise
    saddles (the shred/safety-valve regime); the separator detector
    must remove NOTHING — no noise patch disconnects the surface."""
    rng = np.random.default_rng(7)
    v, f = icosphere(4, radius=50.0)
    mesh = MembraneMesh(v, f, smooth_curvature=True)
    # wrinkle the surface so noise saddles produce negative K well
    # below the candidate bound
    mesh.set_positions(mesh.vertices
                       + rng.normal(scale=0.6, size=v.shape))
    K = mesh.curvature_gaussian
    t_cand = -1e-4
    assert (K < t_cand).sum() > 20      # threshold WOULD flag these
    v0 = mesh.vertices.shape[0]
    mesh.neck_detector = 'separator'
    mesh.neck_separator_threshold = t_cand
    mesh.remove_necks(neck_curvature_threshold_low=t_cand,
                      neck_curvature_threshold_high=1e6)
    assert mesh.vertices.shape[0] == v0          # nothing removed
    _, n = mesh.connected_components()
    assert n == 1


def test_short_edges_rollback_preserves_topology():
    """remove_extra_short_edges is a HYGIENE pass: when the removal +
    repair would disconnect the surface (the thinning-junction failure
    that split TwoToruses low-cw fits, BASELINE.md round 5) it must
    roll back to the exact pre-pass state."""
    from ch_shrinkwrap_tpu.mesh.marching import marching_tetrahedra
    from ch_shrinkwrap_tpu.sim import sdf as S

    # dumbbell: two spheres joined by a barely-resolved thin tube —
    # the tube's sliver edges are the short-edge candidates and their
    # removal severs the surface
    xs = np.linspace(-60, 60, 90)
    ys = np.linspace(-25, 25, 40)
    zs = np.linspace(-25, 25, 40)
    G = np.stack(np.meshgrid(xs, ys, zs, indexing='ij'), 0).reshape(3, -1)
    a = S.sphere(G - np.array([[-30], [0], [0]]), 20.0)
    b = S.sphere(G - np.array([[30], [0], [0]]), 20.0)
    c = S.capsule(G, np.array([-30, 0, 0.]), np.array([30, 0, 0.]), 1.6)
    vals = np.minimum(np.minimum(a, b), c).reshape(90, 40, 40)
    v, f = marching_tetrahedra(vals, origin=(-60, -25, -25),
                               spacing=(xs[1] - xs[0], ys[1] - ys[0],
                                        zs[1] - zs[0]))
    m = MembraneMesh(np.asarray(v, np.float32), np.asarray(f, np.int32))
    assert m.connected_components()[1] == 1
    v0, f0 = m.vertices.copy(), m.faces.copy()

    m.remove_extra_short_edges(threshold=0.2)   # would disconnect
    assert m.connected_components()[1] == 1
    assert m.euler_characteristic == 2
    # exact restore
    np.testing.assert_array_equal(m.vertices, v0)
    np.testing.assert_array_equal(m.faces, f0)
