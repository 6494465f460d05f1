"""Mesh <-> ground-truth comparison metrics.

Capability parity with /root/reference/ch_shrinkwrap/evaluation_utils.py
(points_from_mesh :35, average_squared_distance :153) and the legacy
suite's ordered-pair Hausdorff metrics
(/root/reference/ch_shrinkwrap/evaluation_utils_old.py:266-463, after
Berger et al., "An End-to-End Framework for Evaluating Surface
Reconstruction", SCI Institute, 2011).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def points_from_mesh(mesh, dx_min: float = 5, p: float = 1.0,
                     return_normals: bool = False, rng=None):
    """Uniform point sampling of a mesh surface at pitch ``dx_min``.

    The reference rasterizes an in-plane grid per triangle
    (evaluation_utils.py:35-151, a Python loop over faces); here we
    draw the statistically equivalent area-weighted uniform sample:
    n = area * p / dx_min^2 points, barycentric-uniform per face.
    """
    from ..utils.math import _rng
    rng = _rng(rng)

    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.faces)
    tri = v[f]
    n_vec = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = np.linalg.norm(n_vec, axis=1)
    ok = nn > 0
    tri = tri[ok]
    n_vec = n_vec[ok] / nn[ok, None]
    areas = 0.5 * nn[ok]

    total = areas.sum()
    n_samples = max(1, int(round(total * p / (dx_min * dx_min))))
    face_idx = rng.choice(len(areas), size=n_samples, p=areas / total)

    r1 = np.sqrt(rng.uniform(size=n_samples))
    r2 = rng.uniform(size=n_samples)
    a = 1.0 - r1
    b = r1 * (1.0 - r2)
    c = r1 * r2
    pts = (a[:, None] * tri[face_idx, 0] + b[:, None] * tri[face_idx, 1]
           + c[:, None] * tri[face_idx, 2])

    if return_normals:
        return pts, n_vec[face_idx]
    return pts


def average_squared_distance(points0, points1) -> Tuple[float, float]:
    """Bidirectional nearest-neighbor mean squared distances
    (evaluation_utils.py:153-180)."""
    from scipy.spatial import cKDTree
    t0 = cKDTree(points0)
    t1 = cKDTree(points1)
    e0, _ = t0.query(points1, k=1, workers=-1)
    e1, _ = t1.query(points0, k=1, workers=-1)
    return (float(np.nansum(e0 ** 2) / len(e0)),
            float(np.nansum(e1 ** 2) / len(e1)))


def construct_ordered_pairs(points0, points1, normals0=None, normals1=None):
    """Berger-style bidirectional correspondences (Phi: 0->1, Psi: 1->0)
    (evaluation_utils_old.py:266-388 simplified to NN correspondences)."""
    from scipy.spatial import cKDTree
    t0 = cKDTree(points0)
    t1 = cKDTree(points1)
    d01, phi = t1.query(points0, k=1, workers=-1)
    d10, psi = t0.query(points1, k=1, workers=-1)
    return phi, psi, d01, d10


def mean_and_hausdorff_distance(points0, points1):
    """(mean distance, Hausdorff distance) over bidirectional NN pairs
    (evaluation_utils_old.py:390-397)."""
    _, _, d01, d10 = construct_ordered_pairs(points0, points1)
    mean = 0.5 * (d01.mean() + d10.mean())
    hausdorff = max(d01.max(), d10.max())
    return float(mean), float(hausdorff)


def hausdorff_smoothness(points0, points1, normals0, normals1):
    """Normal-angle mean / Hausdorff over NN correspondences
    (evaluation_utils_old.py:399-406)."""
    phi, psi, _, _ = construct_ordered_pairs(points0, points1)

    def angles(na, nb):
        d = np.clip(np.abs((na * nb).sum(1)), -1.0, 1.0)
        return np.arccos(d)

    a01 = angles(normals0, normals1[phi])
    a10 = angles(normals1, normals0[psi])
    return (0.5 * (a01.mean() + a10.mean()),
            max(a01.max(), a10.max()))


def mesh_metrics_vs_shape(mesh, shape, dx_min=5.0, p=1.0, rng=None):
    """Full metric panel of a fitted mesh against an SDF shape oracle."""
    pts, nrm = points_from_mesh(mesh, dx_min=dx_min, p=p,
                                return_normals=True, rng=rng)
    sdf_d = shape.sdf(pts.T)
    mse0, mse1 = None, None
    out = {
        'sdf_rms': float(np.sqrt((sdf_d ** 2).mean())),
        'sdf_mean_abs': float(np.abs(sdf_d).mean()),
        'sdf_hausdorff': float(np.abs(sdf_d).max()),
    }
    return out


def compute_mesh_metrics(mesh, truth_points, truth_normals=None,
                         dx_min=5.0, p=1.0, rng=None):
    """Aggregate metric panel of a fitted mesh vs a ground-truth cloud
    (counterpart of the legacy suite's compute_mesh_metrics,
    evaluation_utils_old.py:738-801)."""
    pts, nrm = points_from_mesh(mesh, dx_min=dx_min, p=p,
                                return_normals=True, rng=rng)
    mse01, mse10 = average_squared_distance(truth_points, pts)
    mean_d, hausdorff = mean_and_hausdorff_distance(pts, truth_points)
    out = {
        'mse01': mse01,
        'mse10': mse10,
        'mse_rms': float(np.sqrt((mse01 + mse10) / 2)),
        'mean_distance': mean_d,
        'hausdorff_distance': hausdorff,
        'ntriangles': int(mesh.faces.shape[0]),
        'nvertices': int(mesh.vertices.shape[0]),
        'euler': int(mesh.euler_characteristic),
        'genus': float(mesh.genus),
        'manifold': bool(mesh.is_manifold),
        'components': int(mesh.connected_components()[1]),
        'area': float(mesh.area()),
        'volume': float(mesh.volume()),
    }
    if truth_normals is not None:
        smooth_mean, smooth_haus = hausdorff_smoothness(
            pts, truth_points, nrm, truth_normals)
        out['smoothness_mean'] = float(smooth_mean)
        out['smoothness_hausdorff'] = float(smooth_haus)
    return out
