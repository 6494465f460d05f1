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
