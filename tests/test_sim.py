"""Tests for the simulation layer: SDF primitives, shapes, point clouds."""

import numpy as np
import pytest

from ch_shrinkwrap_tpu.sim import sdf, shape
from ch_shrinkwrap_tpu.sim.pointcloud import (
    points_from_sdf, generate_smlm_pointcloud_from_shape)


def test_sphere_sdf():
    p = np.array([[3.0, 0.0], [0.0, 4.0], [0.0, 0.0]])
    d = sdf.sphere(p, 2.0)
    np.testing.assert_allclose(d, [1.0, 2.0])


def test_torus_sdf():
    # point on the ring circle (x-z plane), distance -R (tube radius)
    p = np.array([[5.0], [0.0], [0.0]])
    d = sdf.torus(p, 5.0, 1.0)
    np.testing.assert_allclose(d, [-1.0])
    # point on the tube surface
    p = np.array([[7.0], [0.0], [0.0]])
    np.testing.assert_allclose(sdf.torus(p, 5.0, 1.0), [1.0])


def test_capsule_sdf():
    a, b = np.array([0.0, 0, 0]), np.array([10.0, 0, 0])
    p = np.array([[5.0, -3.0], [2.0, 0.0], [0.0, 0.0]])
    d = sdf.capsule(p, a, b, 1.0)
    np.testing.assert_allclose(d, [1.0, 2.0])


def test_round_box_sdf():
    p = np.array([[3.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    d = sdf.round_box(p, [1.0, 1.0, 1.0], 0.0)
    np.testing.assert_allclose(d, [2.0, -1.0])


def test_sdf_normals_sphere():
    p = np.array([[2.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
    n = sdf.sdf_normals(p, lambda q: sdf.sphere(q, 2.0))
    np.testing.assert_allclose(n[:, 0], [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(n[:, 1], [0, 1, 0], atol=1e-3)


def test_ellipse_sdf_circle_case():
    # ellipse with equal radii behaves like a circle
    theta = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    p = np.stack([3.0 * np.cos(theta), 3.0 * np.sin(theta)])
    d = sdf.ellipse(p, 2.0, 2.0001)
    np.testing.assert_allclose(d, 1.0, atol=2e-3)


def test_ellipse_sdf_on_axes():
    p = np.array([[5.0, 0.0], [0.0, 4.0]])
    d = sdf.ellipse(p, 3.0, 2.0)
    np.testing.assert_allclose(d, [2.0, 2.0], atol=1e-5)


def test_points_from_sdf_on_surface():
    R = 50.0
    f = lambda p: sdf.sphere(p, R)
    pts = points_from_sdf(f, r_max=R * 1.2, dx_min=5.0, p=1.0, rng=42)
    assert pts.shape[0] == 3
    assert pts.shape[1] > 100
    r = np.linalg.norm(pts, axis=0)
    # all sampled points lie on the sphere
    np.testing.assert_allclose(r, R, atol=0.5)
    # count roughly matches area / dx^2
    expected = 4 * np.pi * R * R / 25.0
    assert 0.3 * expected < pts.shape[1] < 3 * expected


def test_points_from_sdf_detection_probability():
    R = 50.0
    f = lambda p: sdf.sphere(p, R)
    n_full = points_from_sdf(f, r_max=R * 1.2, dx_min=5.0, p=1.0, rng=0).shape[1]
    n_half = points_from_sdf(f, r_max=R * 1.2, dx_min=5.0, p=0.5, rng=0).shape[1]
    assert 0.3 * n_full < n_half < 0.7 * n_full


def test_shape_sphere_points():
    s = shape.Sphere(radius=50.0)
    pts = s.points(density=0.01, p=1.0, psf_width=None, rng=1)
    assert pts.shape[1] == 3
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 50.0, atol=1.0)


def test_shape_sphere_points_noisy_sigma():
    s = shape.Sphere(radius=50.0)
    pts = s.points(density=0.01, p=1.0, psf_width=250.0,
                   mean_photon_count=600, rng=1)
    assert s._sigma.shape == pts.shape
    assert np.all(s._sigma > 0)
    # sigma should be on the scale of (psf/2.355)/sqrt(photons)
    assert np.median(s._sigma) < 20.0


def test_union_shape():
    s = shape.TwoToruses(10.0, 50.0)
    d_left = s.sdf(np.array([[-50.0], [0.0], [50.0]]))
    assert abs(d_left[0] - (-10.0)) < 1e-6  # on left torus ring circle


def test_rotation_shape():
    box = shape.Box(np.array([2.0, 1.0, 1.0]))
    rot = shape.RotationShape(box, rz=np.pi / 2)
    # box's long axis now along y
    assert rot.sdf(np.array([[0.0], [1.9], [0.0]]))[0] < 0
    assert rot.sdf(np.array([[1.9], [0.0], [0.0]]))[0] > 0


def test_generate_smlm_pointcloud():
    points, normals, sigma = generate_smlm_pointcloud_from_shape(
        'Sphere', {'radius': 50.0}, density=0.01, p=1.0, psf_width=250.0,
        mean_photon_count=600, noise_fraction=0.1, rng=7)
    assert points.shape == normals.shape
    assert sigma.shape == points.shape
    # most points should be near the sphere surface
    r = np.linalg.norm(points, axis=1)
    frac_near = np.mean(np.abs(r - 50.0) < 25.0)
    assert frac_near > 0.6
    # normals are unit length
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-3)


def test_generate_smlm_pointcloud_no_jitter():
    points, normals, sigma = generate_smlm_pointcloud_from_shape(
        'Sphere', {'radius': 50.0}, density=0.01, p=1.0, psf_width=None,
        noise_fraction=0.0, rng=7)
    r = np.linalg.norm(points, axis=1)
    np.testing.assert_allclose(r, 50.0, atol=1.0)


def test_torus_accepts_sweep_config_spelling():
    """Torus(r=, R=) — the sweep-config parameter names — must give
    the same shape as Torus(radius=, r=)."""
    import numpy as np
    from ch_shrinkwrap_tpu.sim.shape import Torus
    a = Torus(r=30, R=100)
    b = Torus(radius=100, r=30)
    p = np.array([[130.0, 0.0], [0.0, 100.0], [0.0, 30.0]])
    np.testing.assert_allclose(np.asarray(a.sdf(p)), np.asarray(b.sdf(p)))
    assert abs(float(np.asarray(a.sdf(p)).ravel()[0])) < 1e-9


def test_collinear_capsules_geometry():
    """CollinearCapsules' gap is between SURFACES: the gap center is
    outside at gap/2 from each tip; segment interiors are at -r."""
    from ch_shrinkwrap_tpu.sim import shape
    s = shape.CollinearCapsules(250, 40, 40)
    p = np.array([[0.0, 0, 0],      # gap center: outside by gap/2
                  [60.0, 0, 0],     # right segment start: depth -r
                  [-60.0, 0, 0],    # left segment end: depth -r
                  [360.0, 0, 0]],   # past the right cap (surface 350)
                 ).T
    d = s.sdf(p)
    np.testing.assert_allclose(d[0], 20.0, atol=1e-6)
    np.testing.assert_allclose(d[1], -40.0, atol=1e-6)
    np.testing.assert_allclose(d[2], -40.0, atol=1e-6)
    np.testing.assert_allclose(d[3], 10.0, atol=1e-6)
