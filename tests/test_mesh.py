"""Tests for the halfedge mesh core, remeshing and I/O."""

import numpy as np
import pytest

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh, zig_zag_triangulate
from ch_shrinkwrap_tpu.mesh import remesh as rm
from ch_shrinkwrap_tpu.mesh.primitives import (
    icosphere, planar_grid, bounding_icosphere)
from ch_shrinkwrap_tpu.mesh import io as mesh_io


def sphere_mesh(R=10.0, n=3):
    v, f = icosphere(n, radius=R)
    return TriangleMesh(v, f)


def test_build_halfedges_sphere():
    mesh = sphere_mesh()
    he = mesh.halfedges
    # closed manifold: every halfedge has a twin
    assert (he.twin >= 0).all()
    # twin of twin is identity
    np.testing.assert_array_equal(he.twin[he.twin], np.arange(len(he.twin)))
    # next^3 = id
    np.testing.assert_array_equal(he.next[he.next[he.next]],
                                  np.arange(len(he.next)))
    # twin reverses direction
    np.testing.assert_array_equal(he.src[he.twin], he.vertex)


def test_native_halfedge_twins_match_numpy():
    """The C++ twin builder must agree with the numpy fallback exactly,
    including dup (non-manifold) severing and vertex_halfedge choice."""
    from ch_shrinkwrap_tpu import native
    from ch_shrinkwrap_tpu.mesh.core import HalfedgeTables
    if native.get_lib() is None:
        pytest.skip('no native toolchain')

    def numpy_tables(v, f):
        import unittest.mock as mock
        with mock.patch('ch_shrinkwrap_tpu.native.halfedge_twins',
                        lambda *a: None):
            return HalfedgeTables(v, f)

    cases = []
    v, f = icosphere(4, radius=5.0)          # closed manifold, >8192 he
    cases.append((v, f))
    # boundary: chop the top half of the sphere's faces off
    zc = v[f].mean(1)[:, 2]
    cases.append((v, f[zc < 0]))
    # non-manifold: three faces sharing one edge + a duplicate face
    v2 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                   [0, -1, 0]], np.float32)
    f2 = np.array([[0, 1, 2], [0, 1, 3], [1, 0, 4], [0, 1, 2]], np.int32)
    cases.append((v2, f2))
    for v, f in cases:
        nat = native.halfedge_twins(np.asarray(f, np.int32), len(v))
        assert nat is not None
        ref = numpy_tables(np.asarray(v, np.float32),
                           np.asarray(f, np.int32))
        np.testing.assert_array_equal(nat[0], ref.twin)
        np.testing.assert_array_equal(nat[1], ref.nonmanifold_edges)
        np.testing.assert_array_equal(nat[2], ref.vertex_halfedge)


def test_native_face_hygiene_matches_numpy():
    """face_hygiene must flag the same faces as the numpy unique-key
    chain in repair(): degenerate, duplicate triple (keep first), and
    faces on >2-incidence edges."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('no native toolchain')
    v, f = icosphere(3, radius=5.0)
    f = np.asarray(f, np.int32)
    # append: an exact duplicate, a rotated duplicate, a degenerate
    # face, and a third face over an existing edge (over-shared)
    extra = np.array([f[0], f[1][[1, 2, 0]], [3, 3, 7],
                      [f[2][0], f[2][1], len(v) - 1]], np.int32)
    ff = np.vstack([f, extra])
    bad = native.face_hygiene(ff, len(v))
    assert bad is not None

    degen = ((ff[:, 0] == ff[:, 1]) | (ff[:, 1] == ff[:, 2])
             | (ff[:, 0] == ff[:, 2]))
    key = np.sort(ff, axis=1)
    pkey = ((key[:, 0].astype(np.int64) << 42)
            | (key[:, 1].astype(np.int64) << 21)
            | key[:, 2].astype(np.int64))
    _, first_idx = np.unique(pkey, return_index=True)
    dup = np.ones(len(ff), dtype=bool)
    dup[first_idx] = False
    a, b = ff, ff[:, [1, 2, 0]]
    ekey = (np.minimum(a, b).astype(np.int64) << 32
            | np.maximum(a, b).astype(np.int64)).ravel()
    _, inv, counts = np.unique(ekey, return_inverse=True,
                               return_counts=True)
    over = (counts[inv] > 2).reshape(ff.shape).any(1)
    np.testing.assert_array_equal(bad, degen | dup | over)


def test_native_vertex_components_matches_scipy():
    """Native union-find components must agree with the scipy path:
    same count, same grouping (up to label permutation), singleton
    components for isolated vertices."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('no native toolchain')
    v1, f1 = icosphere(2, radius=5.0)
    v2, f2 = icosphere(1, radius=2.0)
    v = np.vstack([v1, v2 + 20.0, [[99.0, 99.0, 99.0]]])
    f = np.vstack([f1, np.asarray(f2, np.int64) + len(v1)]).astype(np.int32)
    nat = native.vertex_components(f, len(v))
    assert nat is not None
    labels, n = nat

    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    a, b = f.ravel(), f[:, [1, 2, 0]].ravel()
    g = coo_matrix((np.ones(len(a), np.int8), (a, b)),
                   shape=(len(v), len(v)))
    n_ref, lab_ref = connected_components(g, directed=False)
    assert n == n_ref == 3
    # grouping equivalence up to permutation of label values
    pairs = set(zip(labels.tolist(), lab_ref.tolist()))
    assert len(pairs) == n


def test_euler_characteristic_sphere():
    mesh = sphere_mesh()
    assert mesh.euler_characteristic == 2
    assert mesh.genus == 0
    assert mesh.is_manifold


def test_euler_characteristic_plane():
    v, f = planar_grid(1.0, 4)
    mesh = TriangleMesh(v, f)
    assert mesh.euler_characteristic == 1  # disk
    assert not mesh.is_manifold  # has boundary


def test_area_volume_sphere():
    R = 10.0
    mesh = sphere_mesh(R, 4)
    np.testing.assert_allclose(mesh.area(), 4 * np.pi * R * R, rtol=0.01)
    np.testing.assert_allclose(mesh.volume(), 4 / 3 * np.pi * R ** 3,
                               rtol=0.01)


def test_vertex_normals_outward():
    mesh = sphere_mesh(5.0, 3)
    n = mesh.vertex_normals
    r_hat = mesh.vertices / np.linalg.norm(mesh.vertices, axis=1)[:, None]
    dots = (n * r_hat).sum(1)
    assert (dots > 0.99).all()


def test_vertex_neighbors_table():
    mesh = sphere_mesh()
    nbrs = mesh.vertex_neighbors
    val = (nbrs >= 0).sum(1)
    # icosphere: 12 valence-5 vertices, rest valence 6
    assert (val == 5).sum() == 12
    assert ((val == 5) | (val == 6)).all()
    # neighbor relation is symmetric
    for v in [0, 7, 100]:
        for n in nbrs[v][nbrs[v] >= 0]:
            assert v in nbrs[n]


def test_connected_components():
    v1, f1 = icosphere(2, radius=1.0)
    v2, f2 = icosphere(2, radius=1.0, centre=(10, 0, 0))
    v = np.vstack([v1, v2])
    f = np.vstack([f1, f2 + len(v1)])
    mesh = TriangleMesh(v, f)
    _, n = mesh.connected_components()
    assert n == 2


def test_remove_inner_surfaces():
    vo, fo = icosphere(3, radius=10.0)
    vi, fi = icosphere(2, radius=3.0)
    v = np.vstack([vo, vi])
    f = np.vstack([fo, fi + len(vo)])
    mesh = TriangleMesh(v, f)
    mesh.remove_inner_surfaces()
    _, n = mesh.connected_components()
    assert n == 1
    # outer sphere retained
    assert np.max(np.linalg.norm(mesh.vertices, axis=1)) > 9.0


def test_unsafe_remove_vertices_and_repair():
    mesh = sphere_mesh(10.0, 3)
    v0 = mesh.vertices.shape[0]
    # remove a small cap of vertices
    top = np.flatnonzero(mesh.vertices[:, 2] > 9.7)
    assert len(top) > 0
    mesh.unsafe_remove_vertices(top)
    assert mesh.vertices.shape[0] < v0
    assert mesh.n_boundary_loops >= 1
    mesh.repair()
    assert mesh.n_boundary_loops == 0
    assert mesh.euler_characteristic == 2


def test_zig_zag_triangulation():
    ring = np.arange(7)
    tris = zig_zag_triangulate(ring)
    assert tris.shape == (5, 3)
    # all ring vertices used
    assert set(tris.ravel()) == set(range(7))


def test_split_pass_preserves_surface():
    mesh = sphere_mesh(10.0, 2)
    v, f, n = rm.split_pass(mesh.vertices, mesh.faces,
                            0.5 * mesh._mean_edge_length)
    assert n > 0
    m2 = TriangleMesh(v, f)
    assert m2.euler_characteristic == 2
    assert m2.is_manifold
    np.testing.assert_allclose(m2.area(), mesh.area(), rtol=0.02)


def test_collapse_pass_preserves_topology():
    mesh = sphere_mesh(10.0, 3)
    v, f, n = rm.collapse_pass(mesh.vertices, mesh.faces,
                               1.2 * mesh._mean_edge_length)
    assert n > 0
    v, f = rm.compact(v, f)
    m2 = TriangleMesh(v, f)
    assert m2.euler_characteristic == 2
    assert m2.is_manifold
    assert m2.vertices.shape[0] < mesh.vertices.shape[0]


def test_flip_pass_improves_valence():
    mesh = sphere_mesh(10.0, 3)
    # collapse creates irregular valences; flips should reduce deviation
    v, f, _ = rm.collapse_pass(mesh.vertices, mesh.faces,
                               1.1 * mesh._mean_edge_length)
    v, f = rm.compact(v, f)
    val0 = np.bincount(f.ravel())
    dev0 = ((val0 - 6) ** 2).sum()
    v2, f2, nf = rm.flip_pass(v, f)
    m2 = TriangleMesh(v2, f2)
    assert m2.euler_characteristic == 2
    val1 = np.bincount(f2.ravel())
    assert ((val1 - 6) ** 2).sum() <= dev0


def test_remesh_hits_target_length():
    mesh = sphere_mesh(10.0, 3)
    target = 0.5 * mesh._mean_edge_length
    rm.remesh(mesh, n=5, target_edge_length=target, l=0.5, n_relax=2)
    assert mesh.euler_characteristic == 2
    assert mesh.is_manifold
    assert abs(mesh._mean_edge_length - target) / target < 0.35
    # surface stays a sphere
    r = np.linalg.norm(mesh.vertices, axis=1)
    np.testing.assert_allclose(r, 10.0, atol=0.5)


def test_remesh_coarsen():
    mesh = sphere_mesh(10.0, 4)
    target = 2.5 * mesh._mean_edge_length
    rm.remesh(mesh, n=5, target_edge_length=target, l=0.5, n_relax=2)
    assert mesh.euler_characteristic == 2
    assert mesh.is_manifold
    assert abs(mesh._mean_edge_length - target) / target < 0.35


def test_native_remesh_growth_calibration():
    """The native engine's growth remesh lands ON the nominal target
    (collapse result-guard; the historical 0.70 fudge compensated a
    split/collapse churn that no longer exists) and needs no
    overflow-retry (capacity pre-sized from the edge-length ratio)."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('no native toolchain')
    mesh = sphere_mesh(50.0, 4)
    v, f = mesh.vertices, mesh.faces
    target = mesh._mean_edge_length / 2.2
    out = native.remesh(v, f, target=target, n_passes=5, l=0.5, n_relax=0)
    assert out is not None
    m2 = TriangleMesh(*out)
    assert m2.is_manifold
    assert m2.euler_characteristic == 2
    assert abs(m2._mean_edge_length - target) / target < 0.15
    # growth factor ~ (edge ratio)^2
    assert len(out[0]) > 3.5 * len(v)


def test_stl_roundtrip(tmp_path):
    mesh = sphere_mesh(10.0, 2)
    path = str(tmp_path / "sphere.stl")
    mesh.to_stl(path)
    v, f = mesh_io.load_stl(path)
    m2 = TriangleMesh(v, f)
    assert m2.faces.shape[0] == mesh.faces.shape[0]
    np.testing.assert_allclose(m2.area(), mesh.area(), rtol=1e-4)
    assert m2.euler_characteristic == 2


def test_ply_write(tmp_path):
    mesh = sphere_mesh(5.0, 1)
    path = str(tmp_path / "m.ply")
    mesh.to_ply(path)
    text = open(path).read()
    assert 'element vertex 42' in text


def test_bounding_icosphere():
    pts = np.random.default_rng(0).normal(size=(100, 3)) * 5 + 3
    v, f = bounding_icosphere(pts, 2)
    mesh = TriangleMesh(v, f)
    c = pts.mean(0)
    r = np.linalg.norm(v - c[None, :], axis=1)
    assert (np.linalg.norm(pts - c[None, :], axis=1).max() <= r.max() + 1e-5)


def test_smooth_per_vertex_data():
    mesh = sphere_mesh(10.0, 2)
    data = np.zeros(mesh.vertices.shape[0], dtype=np.float32)
    data[0] = 1.0
    sm = mesh.smooth_per_vertex_data(data)
    assert sm[0] < 1.0
    nbr = mesh.vertex_neighbors[0]
    assert (sm[nbr[nbr >= 0]] > 0).all()


def test_native_knn_field_matches_scipy():
    """The grid-bucketed bounded k-th-NN field (native.knn_field, the
    wrap_start density engine) must be EXACT vs the kd-tree on both a
    hollow shell (the production workload: interior early-outs through
    the chessboard distance transform) and a uniform cloud, with
    scipy's distance_upper_bound -> miss semantics.  Counterpart of the
    reference's cKDTree query (holepunch.py:88-112)."""
    from scipy.spatial import cKDTree
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip('native engine unavailable')
    rng = np.random.default_rng(2)

    # hollow shell + off-grid queries inside, on, and far outside
    d = rng.normal(size=(50_000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    shell = (d * 50 + rng.normal(scale=2, size=d.shape)).astype(np.float32)
    uniform = rng.uniform(-60, 60, size=(30_000, 3)).astype(np.float32)
    for pts, bound in ((shell, 12.0), (uniform, 7.0)):
        qs = rng.uniform(-80, 80, size=(4_000, 3)).astype(np.float32)
        for k in (1, 10, 50):
            out = native.knn_field(pts, qs, k, bound)
            dd, _ = cKDTree(pts).query(qs, k=[k],
                                       distance_upper_bound=bound)
            ref = dd[:, -1]
            miss_n = out > bound
            miss_r = ~np.isfinite(ref)
            assert (miss_n == miss_r).all()
            ok = ~miss_r
            if ok.any():
                assert np.abs(out[ok] - ref[ok]).max() < 1e-4


def test_native_knn_field_fewer_points_than_k():
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip('native engine unavailable')
    pts = np.zeros((3, 3), np.float32)
    qs = np.zeros((5, 3), np.float32)
    out = native.knn_field(pts, qs, 10, 4.0)
    assert (out > 4.0).all()   # all misses, clamped by the caller


def test_remove_degenerate_components():
    # main surface + a 2-face pillow fragment (the degenerate result of
    # collapsing a tetrahedron component; observed after growth remesh)
    v, f = icosphere(2, radius=5.0)
    nv = v.shape[0]
    pillow_v = np.array([[20.0, 0, 0], [21.0, 0, 0], [20.0, 1.0, 0]],
                        np.float32)
    pillow_f = np.array([[nv, nv + 1, nv + 2], [nv, nv + 2, nv + 1]],
                        np.int32)
    mesh = TriangleMesh(np.vstack([v, pillow_v]),
                        np.vstack([f, pillow_f]))
    assert mesh.connected_components()[1] == 2
    n = mesh.remove_degenerate_components()
    assert n == 1
    assert mesh.connected_components()[1] == 1
    assert mesh.euler_characteristic == 2
    # a real tetrahedron component (4 faces) is NOT degenerate
    tet_v = np.array([[20, 0, 0], [21, 0, 0], [20, 1, 0], [20, 0, 1]],
                     np.float32)
    nv = mesh.vertices.shape[0]
    tet_f = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]],
                     np.int32) + nv
    mesh2 = TriangleMesh(np.vstack([mesh.vertices, tet_v]),
                         np.vstack([mesh.faces, tet_f]))
    assert mesh2.remove_degenerate_components() == 0
    assert mesh2.connected_components()[1] == 2


def test_remesh_drops_pillow_fragment():
    v, f = icosphere(3, radius=5.0)
    nv = v.shape[0]
    pillow_v = np.array([[20.0, 0, 0], [21.0, 0, 0], [20.0, 1.0, 0]],
                        np.float32)
    pillow_f = np.array([[nv, nv + 1, nv + 2], [nv, nv + 2, nv + 1]],
                        np.int32)
    mesh = TriangleMesh(np.vstack([v, pillow_v]),
                        np.vstack([f, pillow_f]))
    rm.remesh(mesh, n=1, target_edge_length=1.5, n_relax=1)
    assert mesh.connected_components()[1] == 1
    assert mesh.euler_characteristic == 2


def test_native_smooth_vertex_data_matches_numpy():
    """native.smooth_vertex_data is the bit-exact twin of the numpy
    smooth_per_vertex_data path (float64 accumulation, slot order)."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip('native library unavailable')
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    v, f = icosphere(4, radius=10.0)     # 2562 verts < 4096 gate
    mesh = TriangleMesh(v, f)
    rng = np.random.default_rng(3)
    data = rng.normal(size=len(v)).astype(np.float32)
    for n_iter in (1, 2):
        ref = mesh.smooth_per_vertex_data(data, n_iter=n_iter)
        nat = native.smooth_vertex_data(data, mesh.vertex_neighbors,
                                        n_iter=n_iter)
        np.testing.assert_array_equal(ref, nat)


def test_native_nonmanifold_vertices_matches_union_find():
    """Fan-count orbit walk agrees with the union-find construction on
    manifold meshes, pinched (bowtie-vertex) meshes, and open chains."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip('native library unavailable')
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere

    # closed manifold sphere: no nonmanifold vertices
    v, f = icosphere(3, radius=10.0)
    m = TriangleMesh(v, f)
    he = m.halfedges
    assert native.has_nonmanifold_vertices(
        he.src, he.vertex, he.twin, he.next, len(v)) is False

    # bowtie: two triangle fans sharing ONE vertex (vertex 0)
    v2 = np.array([[0, 0, 0],
                   [1, 0, 0], [1, 1, 0], [0, 1, 0],
                   [-1, 0, 0], [-1, -1, 0], [0, -1, 0]], np.float32)
    f2 = np.array([[0, 1, 2], [0, 2, 3],
                   [0, 4, 5], [0, 5, 6]], np.int32)
    m2 = TriangleMesh(v2, f2)
    he2 = m2.halfedges
    assert native.has_nonmanifold_vertices(
        he2.src, he2.vertex, he2.twin, he2.next, len(v2)) is True

    # open fan (disk boundary): manifold despite missing twins
    v3 = np.array([[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [-0.5, 1, 0],
                   [-1, 0, 0]], np.float32)
    f3 = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 4]], np.int32)
    m3 = TriangleMesh(v3, f3)
    he3 = m3.halfedges
    assert native.has_nonmanifold_vertices(
        he3.src, he3.vertex, he3.twin, he3.next, len(v3)) is False


def test_remesh_dirty_set_identical(monkeypatch):
    """The native remesh's split-scan dirty-set (and the reordered
    high2 early-reject in collapse) must be BIT-IDENTICAL to the full
    scans — the skip removes provable no-ops only.  Covers the two
    regimes that caught real bugs: a collapse-heavy coarsening call
    (rebuild_compact renumbering flips the a<b scan dedup) and a
    split-heavy growth call, plus a noisy n_relax>0 call (dirty-set
    neutralized by the relax invalidation)."""
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    from ch_shrinkwrap_tpu.mesh import remesh as rm
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('no native toolchain')

    rng = np.random.default_rng(3)
    v0, f0 = icosphere(5, radius=100.0)
    vn = (v0 + rng.normal(scale=0.6, size=v0.shape)).astype(np.float32)

    def run(no_dirty, calls):
        if no_dirty:
            monkeypatch.setenv('CSW_REMESH_NO_DIRTY', '1')
        else:
            monkeypatch.delenv('CSW_REMESH_NO_DIRTY', raising=False)
        m = TriangleMesh(vn.copy(), f0.copy())
        for kw in calls:
            rm.remesh(m, **kw)
        return m.vertices.copy(), m.faces.copy()

    for calls in (
        # coarsen (compact path) then grow (split-heavy)
        [dict(n=5, target_edge_length=5.0, l=0.5, n_relax=0),
         dict(n=5, target_edge_length=4.4, l=0.5, n_relax=0)],
        # relax-active call
        [dict(n=3, target_edge_length=6.0, l=0.5, n_relax=2)],
    ):
        va, fa = run(True, calls)
        vb, fb = run(False, calls)
        np.testing.assert_array_equal(va, vb)
        np.testing.assert_array_equal(fa, fb)


def test_collapse_veto_blocks_divergent_normals():
    """The opt-in thin-tube pinch veto (remesh_collapse_veto): a
    candidate edge whose endpoint normals diverge beyond acos(veto_cos)
    is not collapsed; with no veto it is.  Grid-level evidence
    (TwoToruses low-cw regime) lives in eval_out_r5/."""
    from ch_shrinkwrap_tpu.mesh import remesh as rm
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere

    v, f = icosphere(1, radius=1.0)
    _, _, n0 = rm.collapse_pass(v.copy(), f.copy(), threshold=2.0)
    _, _, n1 = rm.collapse_pass(v.copy(), f.copy(), threshold=2.0,
                                veto_cos=0.99, veto_min_len=0.0)
    assert n0 > 0
    assert n1 == 0

    # native path: veto keeps more of a thin ellipsoid's circumference
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('no native toolchain')
    v4, f4 = icosphere(4, radius=1.0)
    v4 = v4.copy()
    v4[:, 2] *= 25
    v4[:, 0] *= 4
    v4[:, 1] *= 4
    base = TriangleMesh(v4.astype(np.float32), f4)
    rm.remesh(base, n=4, target_edge_length=1.0, l=0.5, n_relax=0)
    out_plain = native.remesh(base.vertices, base.faces, 6.0,
                              n_passes=4, l=0.5, n_relax=0)
    out_veto = native.remesh(base.vertices, base.faces, 6.0,
                             n_passes=4, l=0.5, n_relax=0,
                             veto_cos=0.5, veto_min_len=1.5)
    assert out_veto[0].shape[0] > out_plain[0].shape[0]
