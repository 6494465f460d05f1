"""End-to-end recipe pipeline + eval metric tests."""

import numpy as np
import pytest

from ch_shrinkwrap_tpu.recipes import Recipe, MODULE_REGISTRY
from ch_shrinkwrap_tpu.eval.metrics import (
    points_from_mesh, average_squared_distance,
    mean_and_hausdorff_distance)
from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere


RECIPE_YAML = """
- simulation.PointcloudFromShape:
    shape_name: Sphere
    shape_params: "{'radius': 50.0}"
    density: 0.05
    p: 1.0
    psf_width_x: 100.0
    psf_width_y: 100.0
    psf_width_z: 200.0
    noise_fraction: 0.05
    random_seed: 4
    output: pts
- surface_fitting.InitialSurface:
    input: pts
    output: surf
    grid_n: 32
- surface_fitting.ShrinkwrapMembrane:
    input: surf
    points: pts
    output: membrane
    max_iters: 10
    curvature_weight: 4.0
    remesh_frequency: 5
    minimum_edge_length: 5.0
    neck_first_iter: -1
- surface_feature_extraction.PointsFromMesh:
    input: membrane
    output: membrane_pts
    dx_min: 5.0
- surface_feature_extraction.AverageSquaredDistance:
    input: pts
    input2: membrane_pts
    output: asd
- surface_feature_extraction.MeshProperties:
    inputMesh: membrane
    output: props
"""


def test_registry_has_reference_module_names():
    # the reference's registered module names (SURVEY §2 components
    # 17-19) must all resolve
    for name in ['ShrinkwrapMembrane', 'ScreenedPoissonMesh', 'AlphaWrap',
                 'ImageShrinkwrapMembrane', 'PointcloudFromShape',
                 'AddAllMetadataToPipeline', 'SkeletonizeMembrane',
                 'PointsFromMesh', 'AverageSquaredDistance',
                 'MeshProperties']:
        assert name in MODULE_REGISTRY


def test_full_recipe_pipeline():
    """Sphere cloud -> density seed -> shrinkwrap -> metrics, from a
    YAML document (the reference's test_evaluation_recipe.yaml path)."""
    r = Recipe.from_yaml(RECIPE_YAML)
    ns = r.execute()
    mesh = ns['membrane']

    radii = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(radii.mean() - 50.0) < 3.0
    # accuracy: rms bidirectional distance within a few sigma
    assert float(ns['asd']['mse_rms'][0]) < 12.0
    # topology: single closed component
    props = ns['props']
    assert int(props['components'][0]) == 1
    assert int(props['euler'][0]) == 2
    assert int(props['manifold'][0]) == 1
    # runtime recorded like the reference
    assert 'Processing.ShrinkwrapMembrane.Runtime' in mesh.mdh


def test_points_from_mesh_density():
    v, f = icosphere(3, radius=20.0)
    mesh = TriangleMesh(v, f)
    pts, normals = points_from_mesh(mesh, dx_min=2.0, p=1.0,
                                    return_normals=True, rng=0)
    area = mesh.area()
    expected = area / 4.0
    assert 0.7 * expected < len(pts) < 1.3 * expected
    # all points on the sphere
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 20.0, atol=0.5)
    # normals outward
    r_hat = pts / np.linalg.norm(pts, axis=1)[:, None]
    assert ((normals * r_hat).sum(1) > 0.9).all()


def test_average_squared_distance_identical():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3))
    m0, m1 = average_squared_distance(pts, pts)
    assert m0 == 0.0 and m1 == 0.0


def test_hausdorff_shifted_cloud():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)) * 10
    shifted = pts + np.array([1.0, 0, 0])
    mean, haus = mean_and_hausdorff_distance(pts, shifted)
    assert mean <= 1.0 + 1e-6
    assert haus <= 1.0 + 1e-6


def test_compute_mesh_metrics_panel():
    from ch_shrinkwrap_tpu.eval.metrics import compute_mesh_metrics
    from ch_shrinkwrap_tpu.sim import sdf as sdf_mod
    v, f = icosphere(3, radius=20.0)
    mesh = TriangleMesh(v, f)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    truth = d * 20.0
    m = compute_mesh_metrics(mesh, truth, truth_normals=d, dx_min=2.0,
                             rng=0)
    # Hausdorff includes max sampling gap of the 5000-pt random truth cloud
    assert m['hausdorff_distance'] < 5.0
    assert m['mse_rms'] < 1.0
    assert m['euler'] == 2 and m['manifold']
    assert abs(m['volume'] - 4 / 3 * np.pi * 8000) / (4 / 3 * np.pi * 8000) < 0.05
    assert m['smoothness_mean'] < 0.2
