"""Analytic curvature tests at the reference's tolerances.

Mirrors /root/reference/tests/test_membrane_mesh.py:43-88: mean
curvature ~0 on a plane and ~1/R on a sphere (decimal=2), Gaussian
curvature ~0 on a plane and ~1/R^2 on a sphere (decimal=4).
"""

import numpy as np
import pytest

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere, planar_grid
from ch_shrinkwrap_tpu.ops import meshdata
from ch_shrinkwrap_tpu.ops.curvature import curvature_grad

EPS = 1e-6


def compute_state(mesh):
    ma = meshdata.from_mesh(mesh, quantum=256)
    return ma, curvature_grad(ma.positions, ma.faces, ma.f_mask,
                              ma.v_mask, ma.nbr_v, ma.nbr_f)


def interior_mask(mesh, ma):
    """Mask of valid, non-boundary vertices (padded length)."""
    he = mesh.halfedges
    V = mesh.vertices.shape[0]
    boundary = np.zeros(V, dtype=bool)
    b = he.twin < 0
    boundary[he.src[b]] = True
    boundary[he.vertex[b]] = True
    out = np.zeros(ma.positions.shape[0], dtype=bool)
    out[:V] = ~boundary
    return out


def test_mean_curvature_plane():
    rng = np.random.default_rng(5)
    a = int(100 * rng.random() + 1)
    n_sub = int(5 * rng.random() + 2)
    v, f = planar_grid(a, n_sub)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    m = interior_mask(mesh, ma)
    H = np.asarray(st.H)[m]
    assert np.abs(np.nanmean(H)) < EPS


def test_gaussian_curvature_plane():
    v, f = planar_grid(50.0, 5)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    m = interior_mask(mesh, ma)
    K = np.asarray(st.K)[m]
    assert np.abs(np.nanmedian(K)) < EPS


@pytest.mark.parametrize('R,n_sub', [(10.0, 3), (50.0, 4), (100.0, 4)])
def test_mean_curvature_sphere(R, n_sub):
    v, f = icosphere(n_sub, radius=R)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    H = np.asarray(st.H)[np.asarray(ma.v_mask)]
    np.testing.assert_almost_equal(H, 1.0 / R, decimal=2)


@pytest.mark.parametrize('R,n_sub', [(10.0, 3), (50.0, 4), (100.0, 4)])
def test_gaussian_curvature_sphere(R, n_sub):
    v, f = icosphere(n_sub, radius=R)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    K = np.asarray(st.K)[np.asarray(ma.v_mask)]
    np.testing.assert_almost_equal(K, 1.0 / (R * R), decimal=4)


def test_principal_curvatures_sphere():
    R = 20.0
    v, f = icosphere(4, radius=R)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    m = np.asarray(ma.v_mask)
    np.testing.assert_allclose(np.asarray(st.k_0)[m], 1.0 / R, atol=0.02)
    np.testing.assert_allclose(np.asarray(st.k_1)[m], 1.0 / R, atol=0.02)


def test_energy_positive_on_sphere():
    R = 20.0
    v, f = icosphere(3, radius=R)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    m = np.asarray(ma.v_mask)
    E = np.asarray(st.E)[m]
    # CH energy with kg = -kc on a sphere: 0.5*kc*(2H)^2 + kg*K per area
    kc = 20.0 * 0.0257
    kg = -kc
    per_area = 0.5 * kc * (2.0 / R) ** 2 + kg / R ** 2
    total_expected = per_area * 4 * np.pi * R * R
    # each face counted at its 3 vertices -> sum(E) ~ 3x total
    np.testing.assert_allclose(E.sum() / 3.0, total_expected, rtol=0.1)


def test_curvature_padded_rows_zero():
    v, f = icosphere(2, radius=5.0)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    pad = ~np.asarray(ma.v_mask)
    assert np.all(np.asarray(st.H)[pad] == 0)
    assert np.all(np.asarray(st.E)[pad] == 0)
    assert np.all(np.asarray(st.dEdN)[pad] == 0)


def test_taubin_method_compat():
    """The reference's Taubin 3l1-l2 eigen mapping is kept as
    method='taubin'; looser tolerance (its known anisotropy splits)."""
    from ch_shrinkwrap_tpu.ops.curvature import curvature_grad
    v, f = icosphere(3, radius=20.0)
    mesh = TriangleMesh(v, f)
    ma = meshdata.from_mesh(mesh, quantum=256)
    st = curvature_grad(ma.positions, ma.faces, ma.f_mask, ma.v_mask,
                        ma.nbr_v, ma.nbr_f, method='taubin')
    H = np.asarray(st.H)[np.asarray(ma.v_mask)]
    np.testing.assert_allclose(H, 1 / 20.0, atol=5e-3)
    K = np.asarray(st.K)[np.asarray(ma.v_mask)]
    np.testing.assert_allclose(K, 1 / 400.0, atol=3e-4)


def cylinder_mesh(R=10.0, L=60.0, n_theta=48, n_z=30):
    """Open cylinder along z (the reference stubbed this fixture,
    tests/test_membrane_mesh.py:90-92)."""
    theta = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    z = np.linspace(0, L, n_z)
    T, Z = np.meshgrid(theta, z, indexing='ij')
    v = np.stack([R * np.cos(T).ravel(), R * np.sin(T).ravel(),
                  Z.ravel()], axis=1).astype(np.float32)

    def vid(i, j):
        return (i % n_theta) * n_z + j

    faces = []
    for i in range(n_theta):
        for j in range(n_z - 1):
            faces.append((vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)))
            faces.append((vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)))
    return TriangleMesh(v, np.array(faces, np.int32))


def test_curvature_cylinder():
    """Cylinder: H = 1/(2R), K = 0 (interior vertices)."""
    R = 10.0
    mesh = cylinder_mesh(R)
    ma, st = compute_state(mesh)
    m = interior_mask(mesh, ma)
    H = np.asarray(st.H)[m]
    K = np.asarray(st.K)[m]
    np.testing.assert_allclose(H, 1.0 / (2 * R), atol=2e-3)
    np.testing.assert_allclose(K, 0.0, atol=2e-4)
    # principal curvatures: one ~1/R, one ~0
    k0 = np.asarray(st.k_0)[m]
    k1 = np.asarray(st.k_1)[m]
    hi = np.maximum(k0, k1)
    lo = np.minimum(k0, k1)
    np.testing.assert_allclose(hi, 1.0 / R, atol=5e-3)
    np.testing.assert_allclose(lo, 0.0, atol=5e-3)


def test_native_gaussian_k_matches_device_kernel():
    """The host C++ K (native.gaussian_k — the boundary neck
    diagnostic's fast path) must agree with the JAX kernel's K on both
    a curved and a deformed surface, and with the analytic sphere
    value.  Counterpart of the reference's single C implementation
    (membrane_mesh_utils.c:915-1250) consumed by remove_necks
    (pyx:1212-1213)."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('native toolchain unavailable')
    rng = np.random.default_rng(11)
    R = 50.0
    v, f = icosphere(3, radius=R)
    # break the symmetry so the test sees irregular rings too
    v = (v + rng.normal(scale=0.02 * R, size=v.shape)).astype(np.float32)
    mesh = TriangleMesh(v, f)
    ma, st = compute_state(mesh)
    K_dev = np.asarray(st.K)[:len(v)]
    K_nat = native.gaussian_k(v, f)
    scale = np.abs(K_dev).max()
    np.testing.assert_allclose(K_nat, K_dev, atol=2e-3 * scale)
    # explicit nbr_v reuse path (the fit driver passes the cached
    # padded table sliced to the real rows)
    K_nat2 = native.gaussian_k(v, f, nbr_v=np.asarray(ma.nbr_v)[:len(v)])
    np.testing.assert_allclose(K_nat2, K_dev, atol=2e-3 * scale)

    # analytic: clean sphere K ~ 1/R^2 at the reference tolerance
    v, f = icosphere(4, radius=R)
    K_nat = native.gaussian_k(v, f)
    np.testing.assert_almost_equal(K_nat * R * R, 1.0, decimal=2)
