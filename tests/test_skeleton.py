"""Skeletonization + delaunay utility tests."""

import numpy as np
import pytest

from ch_shrinkwrap_tpu.models.skeleton_mesh import SkeletonMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.eval import delaunay_utils as du
from ch_shrinkwrap_tpu.mesh.core import TriangleMesh


def capsule_mesh():
    """Elongated ellipsoid: its skeleton is a line along x."""
    v, f = icosphere(3, radius=1.0)
    v = v * np.array([40.0, 10.0, 10.0], np.float32)
    return SkeletonMesh(v, f)


def test_skeleton_collapses_to_axis():
    mesh = capsule_mesh()
    mesh.opt_skeleton(max_iter=12, lam=[40.0], target_edge_length=4.0,
                      area_variation_factor=1e-5)
    v = mesh.vertices
    # collapsed toward the x axis: radial extent shrinks strongly
    r_perp = np.sqrt(v[:, 1] ** 2 + v[:, 2] ** 2)
    assert np.median(r_perp) < 4.0
    # but the long axis is preserved
    assert v[:, 0].max() - v[:, 0].min() > 40.0


def test_skeleton_remesh_method_centerline():
    """Skeleton-specific remesher (projection split + guarded
    collapse): the capsule collapses to a tight centerline segment."""
    mesh = capsule_mesh()
    mesh.opt_skeleton(max_iter=14, lam=[40.0], target_edge_length=4.0,
                      area_variation_factor=1e-6,
                      remesh_method='skeleton')
    v = mesh.vertices
    r_perp = np.sqrt(v[:, 1] ** 2 + v[:, 2] ** 2)
    # centerline contract: tighter than the generic-remesh test above
    assert np.median(r_perp) < 2.5
    assert np.percentile(r_perp, 90) < 5.0
    assert v[:, 0].max() - v[:, 0].min() > 40.0


def test_skeleton_torus_collapses_to_ring():
    """A torus skeletonizes to its core circle (ring radius R, y ~ 0)
    under the skeleton remesher; also covers the inward-winding repair
    (the fixture is built inward-wound on purpose)."""
    R, r = 40.0, 10.0
    nu, nv = 48, 24
    rng = np.random.default_rng(1)
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vg = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, vg, indexing='ij')
    uu = uu + rng.uniform(-0.02, 0.02, uu.shape)
    vv = vv + rng.uniform(-0.05, 0.05, vv.shape)
    X = (R + r * np.cos(vv)) * np.cos(uu)
    Y = r * np.sin(vv)
    Z = (R + r * np.cos(vv)) * np.sin(uu)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d2 = i * nv + (j + 1) % nv
            faces += [[a, b, c], [a, c, d2]]
    mesh = SkeletonMesh(
        np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1).astype(np.float32),
        np.array(faces, np.int32))            # inward-wound as built
    assert mesh.volume() < 0
    mesh.opt_skeleton(max_iter=20, lam=[40.0], target_edge_length=5.0,
                      area_variation_factor=1e-6,
                      remesh_method='skeleton')
    rad = np.sqrt(mesh.vertices[:, 0] ** 2 + mesh.vertices[:, 2] ** 2)
    assert abs(np.median(rad) - R) < 1.0
    assert np.median(np.abs(mesh.vertices[:, 1])) < 1.0


def test_skeleton_split_pass_projection():
    """The angle-driven split places new vertices at the perpendicular
    foot of the obtuse apex (skeleton_edge_split, pyx:82-96)."""
    from ch_shrinkwrap_tpu.mesh.remesh import skeleton_split_pass
    # two very obtuse triangles sharing the long edge (0,0,0)-(10,0,0)
    v = np.array([[0, 0, 0], [10, 0, 0], [6.0, 0.5, 0],
                  [4.0, -0.5, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 0, 3]], np.int32)
    v2, f2, n = skeleton_split_pass(v, f, max_triangle_angle=1.9198622)
    assert n == 1
    assert len(v2) == 5
    assert len(f2) == 4
    # the split vertex is the projection of one apex onto the edge:
    # x = 6 (apex 2, the larger angle) and y = z = 0
    new = v2[4]
    assert abs(new[1]) < 1e-6 and abs(new[2]) < 1e-6
    assert abs(new[0] - 6.0) < 1e-5 or abs(new[0] - 4.0) < 1e-5
    # orientation preserved: all faces wind the same way
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    de = np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]])
    key = de[:, 0].astype(np.int64) << 32 | de[:, 1]
    assert len(np.unique(key)) == len(key)   # no duplicated directed edge


def test_skeleton_via_membrane_mesh_entry():
    """shrink_wrap(method='skeleton') on a plain MembraneMesh works
    (regression: the delegation imported a nonexistent symbol)."""
    from ch_shrinkwrap_tpu.models.membrane_mesh import MembraneMesh
    v, f = icosphere(2, radius=1.0)
    v = v * np.array([30.0, 8.0, 8.0], np.float32)
    mesh = MembraneMesh(v, f)
    mesh.shrink_wrap(None, None, method='skeleton', max_iter=6,
                     lam=[40.0], target_edge_length=4.0,
                     area_variation_factor=1e-6)
    r_perp = np.sqrt(mesh.vertices[:, 1] ** 2 + mesh.vertices[:, 2] ** 2)
    assert np.median(r_perp) < 4.0


def test_orient_simps_and_surface():
    import scipy.spatial
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3))
    d = scipy.spatial.Delaunay(pts)
    tri = du.orient_simps(d, pts)
    surf = du.surf_from_delaunay(tri)
    # boundary of the Delaunay complex is the convex hull: closed
    from ch_shrinkwrap_tpu.mesh.remesh import compact
    v2, f2 = compact(pts.astype(np.float32), surf.astype(np.int32))
    mesh = TriangleMesh(v2, f2)
    assert mesh.euler_characteristic == 2
    # oriented outward: positive volume
    assert mesh.volume() > 0


def test_distance_to_mesh_sign():
    v, f = icosphere(3, radius=10.0)
    mesh = TriangleMesh(v, f)
    d = du.distance_to_mesh(np.array([[0.0, 0, 0], [15.0, 0, 0]]), mesh)
    assert d[0] < 0 and d[1] > 0


def test_voronoi_poles_inside_sphere():
    import scipy.spatial
    v, f = icosphere(3, radius=10.0)
    mesh = TriangleMesh(v, f)
    vor = scipy.spatial.Voronoi(mesh.vertices.astype(np.float64))
    _, pneg = du.voronoi_poles(vor, mesh.vertex_normals)
    poles = vor.vertices[pneg[pneg != -1]]
    poles = du.clean_neg_voronoi_poles(mesh, poles)
    # negative poles of a sphere concentrate at its centre
    assert len(poles) > 0
    assert np.linalg.norm(poles, axis=1).max() < 10.0
    assert np.median(np.linalg.norm(poles, axis=1)) < 3.0


def _voronoi_poles_loop(vor, point_normals, dot_threshold=1.0):
    """Per-cell loop oracle for the vectorized voronoi_poles (same
    semantics: infinite vertex detected at any region position)."""
    sz = len(vor.point_region)
    p_pos = np.full(sz, -1, dtype=int)
    p_neg = np.full(sz, -1, dtype=int)
    for i, reg in enumerate(vor.point_region):
        cell = np.asarray(vor.regions[reg], dtype=int)
        if len(cell) == 0:
            continue
        fin = cell != -1
        unbounded = not fin.all()
        cell = cell[fin]
        if len(cell) == 0:
            continue
        dn = vor.vertices[cell] - vor.points[i][None, :]
        dist = np.linalg.norm(dn, axis=1)
        if unbounded:
            pn = point_normals[i]
        else:
            di = np.argmax(dist)
            p_pos[i] = cell[di]
            pn = dn[di]
        s = (pn * dn).sum(1) < dot_threshold
        p_neg[i] = cell[np.argmax(s * dist)]
    return p_pos, p_neg


@pytest.mark.parametrize('thresh', [1.0, 0.0])
def test_voronoi_poles_matches_loop_oracle(thresh):
    import scipy.spatial
    rng = np.random.default_rng(3)
    pts = np.vstack([rng.normal(size=(200, 3)) * 5.0,
                     rng.uniform(-1, 1, size=(50, 3))])
    vor = scipy.spatial.Voronoi(pts)
    normals = rng.normal(size=(len(pts), 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pp_v, pn_v = du.voronoi_poles(vor, normals, dot_threshold=thresh)
    pp_l, pn_l = _voronoi_poles_loop(vor, normals,
                                     dot_threshold=thresh)
    np.testing.assert_array_equal(pp_v, pp_l)
    np.testing.assert_array_equal(pn_v, pn_l)


def test_voronoi_poles_capsule_medial_axis_strict():
    """With the strict Amenta-Bern threshold (dot < 0) the negative
    poles of a capsule surface lie near its medial-axis segment
    (the x axis between the cap centres)."""
    import scipy.spatial
    v, f = icosphere(3, radius=1.0)
    v = v * np.array([40.0, 10.0, 10.0], np.float32)
    mesh = TriangleMesh(v, f)
    vor = scipy.spatial.Voronoi(mesh.vertices.astype(np.float64))
    _, pneg = du.voronoi_poles(vor, mesh.vertex_normals,
                               dot_threshold=0.0)
    poles = vor.vertices[pneg[pneg != -1]]
    poles = du.clean_neg_voronoi_poles(mesh, poles)
    assert len(poles) > 0
    r_perp = np.sqrt(poles[:, 1] ** 2 + poles[:, 2] ** 2)
    # interior poles hug the axis relative to the 10 nm tube radius
    assert np.median(r_perp) < 2.5
    assert np.abs(poles[:, 0]).max() <= 40.0
