"""Evaluation-harness tests: sweep expansion, restart, image recipe."""

import json
import os

import numpy as np
import pytest

from ch_shrinkwrap_tpu.eval.harness import evaluate
from ch_shrinkwrap_tpu.eval.harness import testing_parameters as expand_parameters


MICRO_SWEEP = {
    'system': {'psf_width_x': [100.0], 'psf_width_y': [100.0],
               'psf_width_z': [200.0], 'mean_photon_count': [600],
               'bg_photon_count': [20]},
    'shape': {'type': ['Sphere'], 'parameters': [{'radius': 50.0}]},
    'point_cloud': {'density': [0.05], 'p': [1.0],
                    'noise_fraction': [0.02]},
    'dual_marching_cubes': {'threshold_density': [-1.0],
                            'n_points_min': [50]},
    'shrinkwrapping': {'max_iters': [6], 'curvature_weight': [4.0],
                       'remesh_frequency': [3], 'punch_frequency': [0],
                       'min_hole_radius': [100.0], 'neck_first_iter': [-1],
                       'neck_threshold_low': [-1e-3],
                       'neck_threshold_high': [1e-2]},
    'screened_poisson': {'samplespernode': [1.5], 'pointweight': [4.0],
                         'iters': [8], 'k': [10]},
}


def test_testing_parameters_grid_product():
    d = dict(MICRO_SWEEP)
    d['shrinkwrapping'] = dict(d['shrinkwrapping'],
                               max_iters=[6, 9],
                               curvature_weight=[4.0, 8.0])
    sw, spr = expand_parameters(d)
    assert len(sw) == 4
    assert len(spr) == 1
    assert sw[0]['shape_name'] == 'Sphere'
    assert sw[0]['psf_width'] == (100.0, 100.0, 200.0)


def test_evaluate_runs_and_restarts(tmp_path):
    out = str(tmp_path / 'sweep')
    results = evaluate(MICRO_SWEEP, out_dir=out, seed=3)
    assert len(results) == 1
    assert results[0]['mse_rms'] < 20.0
    assert results[0]['ntriangles'] > 100

    # restart: the completed entry is skipped
    results2 = evaluate(MICRO_SWEEP, out_dir=out, seed=3)
    assert len(results2) == 0
    lines = open(os.path.join(out, 'metrics.jsonl')).read().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec['kind'] == 'shrinkwrap'


def test_evaluate_device_round_robin(tmp_path):
    """Sweep DP over jax devices: 2 entries on 2 device threads produce
    the same metrics set as the serial sweep."""
    d = dict(MICRO_SWEEP)
    d['shrinkwrapping'] = dict(d['shrinkwrapping'],
                               curvature_weight=[4.0, 8.0])

    serial = evaluate(d, out_dir=str(tmp_path / 'serial'), seed=3)
    par = evaluate(d, out_dir=str(tmp_path / 'par'), seed=3, devices=2)
    assert len(par) == len(serial) == 2
    key = lambda r: r['params']['curvature_weight']
    for a, b in zip(sorted(serial, key=key), sorted(par, key=key)):
        assert a['param_hash'] == b['param_hash']
        assert abs(a['mse_rms'] - b['mse_rms']) < 2.0


def test_evaluate_entry_timeout_kills_hung_entry(tmp_path):
    """Per-entry isolation: a timeout terminates the worker process and
    the sweep records a failure instead of hanging (round-1 weak #8)."""
    out = str(tmp_path / 'sweep')
    results = evaluate(MICRO_SWEEP, out_dir=out, seed=3, n_workers=1,
                       entry_timeout=0.5)
    assert results == []                  # killed before completing
    assert not os.path.exists(os.path.join(out, 'metrics.jsonl')) or \
        open(os.path.join(out, 'metrics.jsonl')).read() == ''


@pytest.mark.slow
def test_evaluate_process_workers(tmp_path):
    """Spawned-process sweep DP completes the micro grid.  The entry
    timeout is generous: a spawned worker pays a cold jax import +
    compile (~7 min alone on this 1-core host, more under suite load);
    the timeout KILL path has its own dedicated test above."""
    results = evaluate(MICRO_SWEEP, out_dir=str(tmp_path / 'sweep'),
                       seed=3, n_workers=2, entry_timeout=1800)
    assert len(results) == 1
    assert results[0]['mse_rms'] < 20.0


def test_points_from_mesh_rasterized():
    """The deterministic per-triangle lattice sampler (reference
    evaluation_utils.py:35-151) matches the MC sampler statistically
    and is exactly reproducible."""
    from ch_shrinkwrap_tpu.eval.metrics import points_from_mesh
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere

    v, f = icosphere(4, radius=50.0)
    mesh = TriangleMesh(v, f)
    pts, nrm = points_from_mesh(mesh, dx_min=2.0, sampler='raster',
                                return_normals=True)
    pts2 = points_from_mesh(mesh, dx_min=2.0, sampler='raster')
    assert np.array_equal(pts, pts2)           # no sampler noise
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 50.0) < 0.2          # on the faceted sphere
    assert r.std() < 0.1
    # density ~ 1/dx^2 (lattice edge effects allow ~20% excess)
    dens = len(pts) / mesh.area()
    assert 0.8 / 4.0 < dens < 1.4 / 4.0
    # normals are the generating faces': outward on a sphere
    assert ((pts * nrm).sum(1) > 0).all()
    # subsampling draws the only randomness
    pts_p = points_from_mesh(mesh, dx_min=2.0, p=0.5, sampler='raster',
                             rng=0)
    assert abs(len(pts_p) - 0.5 * len(pts)) <= 1


def test_berger_ordered_pairs_sphere():
    """The faithful Berger Phi/Psi construction agrees with the
    simplified NN metrics on a clean fixture and pairs every point on
    the normal line; the special case rescues off-line points."""
    from ch_shrinkwrap_tpu.eval.metrics import (
        construct_ordered_pairs_berger, berger_mean_and_hausdorff,
        mean_and_hausdorff_distance)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(4000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    o = (d * 50.0)                       # truth sphere
    no = d.copy()
    d2 = rng.normal(size=(4000, 3))
    d2 /= np.linalg.norm(d2, axis=1)[:, None]
    m = d2 * 51.0                        # offset sphere (1 nm off)
    nm = d2.copy()

    ox, oa, mx, ma = construct_ordered_pairs_berger(o, m, no, nm,
                                                    dx_max=3.0)
    assert len(ox) == len(oa) and len(mx) == len(ma)
    assert len(ox) > 1000 and len(mx) > 1000
    mean_b, haus_b = berger_mean_and_hausdorff(o, m, ox, oa, mx, ma)
    mean_nn, haus_nn = mean_and_hausdorff_distance(m, o)
    # both see the ~1 nm shell offset
    assert abs(mean_b - mean_nn) < 1.0
    assert 0.5 < mean_b < 3.5
    assert haus_b < 4 * max(haus_nn, 1.0)


def test_image_shrinkwrap_recipe():
    """ImageShrinkwrapMembrane: voxel image -> weighted pseudo-points."""
    from ch_shrinkwrap_tpu.recipes.surface_fitting import \
        ImageShrinkwrapMembrane
    from ch_shrinkwrap_tpu.models.membrane_mesh import MembraneMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere

    class Image:
        pass

    # a solid ball of weight in a 24^3 voxel grid, 4 nm voxels
    n = 24
    x, y, z = np.mgrid[0:n, 0:n, 0:n]
    c = (n - 1) / 2.0
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) * 4.0
    im = Image()
    im.data = ((r > 30) & (r < 38)).astype(np.float32)
    im.voxelsize_nm = (4.0, 4.0, 4.0)
    im.origin = (0.0, 0.0, 0.0)

    v, f = icosphere(2, radius=55.0, centre=(c * 4, c * 4, c * 4))
    surf = MembraneMesh(v, f)

    mod = ImageShrinkwrapMembrane(input='surf', input_image='im',
                                  output='out', max_iters=6,
                                  curvature_weight=4.0, shrink_weight=0.0,
                                  remesh_frequency=3, neck_first_iter=-1,
                                  minimum_edge_length=8.0)
    ns = {'surf': surf, 'im': im}
    mod.execute(ns)
    mesh = ns['out']
    rr = np.linalg.norm(mesh.vertices - np.array([c * 4, c * 4, c * 4]),
                        axis=1)
    # pulled from 55 toward the 30-38 nm shell
    assert rr.mean() < 48.0


def test_berger_ordered_pairs_torus_with_background():
    """Non-sphere Berger fixture: torus surface + 5% uniform
    background outliers in the mesh-sample set.  The Berger panel
    must agree with the simplified NN metrics on the mean to the
    sampling tolerance, and the signed smoothness must see the
    orientation-clean surface as smooth (mean angle well below the
    ~pi/2 an orientation scramble would give)."""
    from ch_shrinkwrap_tpu.eval.metrics import (
        construct_ordered_pairs_berger, berger_mean_and_hausdorff,
        berger_smoothness, mean_and_hausdorff_distance)
    from ch_shrinkwrap_tpu.sim.shape import Torus
    from ch_shrinkwrap_tpu.sim import sdf as _sdf

    shp = Torus(radius=100.0, r=30.0)
    rng = np.random.default_rng(1)
    o = shp.points(density=0.002, p=1.0, psf_width=None,
                   rng=rng).astype(np.float64)
    no = _sdf.sdf_normals(o.T, shp.sdf).T.astype(np.float64)

    # mesh sample: same surface jittered 1 nm along the normal, plus
    # 5% uniform background (exercises the Fig.-10 rescue path)
    m_surf = o + 1.0 * no
    n_bg = len(o) // 20
    bg = rng.uniform(-160, 160, size=(n_bg, 3))
    m = np.vstack([m_surf, bg])
    nm = np.vstack([no, rng.normal(size=(n_bg, 3))])
    nm /= np.linalg.norm(nm, axis=1)[:, None]

    ox, oa, mx, ma = construct_ordered_pairs_berger(o, m, no, nm,
                                                    dx_max=5.0)
    mean_b, haus_b = berger_mean_and_hausdorff(o, m, ox, oa, mx, ma)
    mean_nn, _ = mean_and_hausdorff_distance(m, o)
    # documented tolerance: the Berger mean tracks the NN mean within
    # the sampling pitch (background inflates both the same way)
    assert abs(mean_b - mean_nn) < 5.0
    sm, sh = berger_smoothness(no, nm, ox, oa, mx, ma)
    assert sm < 0.6          # radians; aligned normals read smooth
    assert sh <= np.pi + 1e-6


def test_entry_topology_and_berger_columns():
    """A harness entry must emit expected-topology scoring and the
    Berger columns (VERDICT round-2 items 4/6)."""
    from ch_shrinkwrap_tpu.eval.harness import run_shrinkwrap_entry

    params = dict(shape_name='Sphere',
                  shape_params={'radius': 60.0},
                  density=0.01, p=1.0, psf_width=10.0,
                  mean_photon_count=5000, bg_photon_count=20.0,
                  noise_fraction=0.0, threshold_density=None,
                  n_points_min=50, max_iter=6, curvature_weight=10.0,
                  remesh_frequency=3, punch_frequency=0,
                  min_hole_radius=100.0, neck_first_iter=-1,
                  neck_threshold_low=-1e-3, neck_threshold_high=1e-2,
                  grid_n=24)
    metrics, mesh = run_shrinkwrap_entry(params, rng=0)
    assert metrics['expected_euler'] == 2
    assert metrics['expected_components'] == 1
    assert 'topology_correct' in metrics
    assert metrics['components'] >= 1
    assert 'berger_mean_distance' in metrics
    assert 'berger_smoothness_mean' in metrics
    if metrics['topology_correct']:
        assert metrics['euler'] == 2
