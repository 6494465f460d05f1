"""Hole-punching integration test: oblate surface over a torus cloud."""

import numpy as np
import pytest

from ch_shrinkwrap_tpu.models.membrane_mesh import MembraneMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere


def torus_cloud(R=40.0, r=10.0, n=8000, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    x = (R + r * np.cos(v)) * np.cos(u)
    z = (R + r * np.cos(v)) * np.sin(u)
    y = r * np.sin(v)
    return np.stack([x, y, z], axis=1).astype(np.float32)


def oblate_mesh(rx=55.0, ry=14.0, n_sub=3):
    v, f = icosphere(n_sub, radius=1.0)
    v = v * np.array([rx, ry, rx], np.float32)
    return MembraneMesh(v, f)


def test_punch_opens_tunnel():
    pts = torus_cloud()
    mesh = oblate_mesh()
    assert mesh.euler_characteristic == 2

    # pull the surface onto the torus a bit so the central faces
    # of both sheets oppose each other with no points in between
    mesh.remesh_frequency = 0
    mesh.delaunay_remesh_frequency = 0
    mesh.step_size = 4.0
    mesh.kc = 1.0
    mesh.max_iter = 20
    mesh.shrink_wrap(pts, 3.0, max_iter=20)

    n = mesh.punch_holes(pts, eps=15.0)
    assert n >= 1
    # tunnel through both sheets: sphere (chi 2) -> torus (chi 0)
    assert mesh.euler_characteristic == 2 - 2 * n
    assert mesh.is_manifold


def test_pair_candidate_faces_remaps_into_kept_space():
    """Unpaired candidates must not leave stale pre-filter indices in
    the pair array (regression: IndexError / silently-wrong pairing when
    any candidate has no opposing partner)."""
    from ch_shrinkwrap_tpu.models import holepunch

    v, f = icosphere(2, radius=50.0)
    mesh = MembraneMesh(v, f)
    nrm = mesh.face_normals
    # candidate subset biased upward: most downward faces are excluded,
    # so many upward candidates keep a partner while equatorial ones
    # (normal_z near 0.6: partner would need normal dot < -0.5 among the
    # surviving few) lose theirs -> min_mask has False entries
    cand = np.flatnonzero(nrm[:, 2] > -0.25).astype(np.int32)
    cands, pairs = holepunch.pair_candidate_faces(mesh, cand)
    assert len(cands) < len(cand)          # some candidates were dropped
    assert len(pairs) == len(cands)
    assert pairs.max() < len(cands)        # indices live in kept space
    assert pairs.min() >= 0
    # and the pairing is genuinely opposing in that space
    nd = (mesh.face_normals[cands] * mesh.face_normals[cands[pairs]]).sum(1)
    assert (nd < -0.5).all()


def test_punch_many_holes_grid():
    """Many-holes hardening: a fitted flat spheroid over a double sheet
    with 4 carved hole pairs punches several tunnels in ONE analysis
    pass (chunked pairing + batched prism + post-surgery index remap).
    Single-pass semantics also guard against the tunnel-wall cascade:
    re-analysing after surgery would flag the fresh tunnel walls and
    over-punch without bound."""
    rng = np.random.default_rng(5)
    rx, ry = 60.0, 10.0
    d = rng.normal(size=(60000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    surf = d * np.array([rx, ry, rx])
    hole_centers = [(-30.0, 0.0), (30.0, 0.0), (0.0, -30.0), (0.0, 30.0)]
    keep = np.ones(len(surf), bool)
    for cx, cz in hole_centers:
        keep &= ((surf[:, 0] - cx) ** 2
                 + (surf[:, 2] - cz) ** 2) > 16.0 ** 2
    pts = surf[keep].astype(np.float32)

    v, f = icosphere(3, radius=1.0)
    v = v * np.array([70.0, 16.0, 70.0], np.float32)
    mesh = MembraneMesh(v, f, step_size=4.0, kc=1.0, remesh_frequency=5,
                        delaunay_remesh_frequency=0, neck_first_iter=-1)
    mesh.shrink_wrap(pts, 3.0, max_iter=15, minimum_edge_length=6.0)

    n = mesh.punch_holes(pts, eps=8.0)
    assert n >= 3          # most of the grid opens
    # single-pass semantics bound the punch count by the component
    # pairing of ONE analysis (a re-analysis cascade measured 40+ and
    # grows per round); a few extra small tunnels per hole are fine
    assert n <= 16
    assert mesh.euler_characteristic == 2 - 2 * n
    assert mesh.is_manifold


def test_punch_noop_on_supported_mesh():
    """A mesh well covered by points must not be punched."""
    rng = np.random.default_rng(1)
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 50).astype(np.float32)
    v, f = icosphere(3, radius=50.0)
    mesh = MembraneMesh(v, f)
    n = mesh.punch_holes(pts, eps=10.0)
    assert n == 0
    assert mesh.euler_characteristic == 2


def test_punch_holes_sdf_variant():
    """SDF-based hole punching (the reference's alternative path,
    holepunch.py:57-85): carve unsupported regions of a fitted mesh."""
    from ch_shrinkwrap_tpu.models.holepunch_sdf import punch_holes_sdf

    pts = torus_cloud()
    mesh = oblate_mesh()
    mesh.remesh_frequency = 0
    mesh.delaunay_remesh_frequency = 0
    mesh.step_size = 4.0
    mesh.kc = 1.0
    mesh.shrink_wrap(pts, 3.0, max_iter=20)

    out = punch_holes_sdf(mesh, offset=12.0, pi_threshold=0.05, grid_n=48)
    # carving opened the unsupported center: genus increased
    assert out.euler_characteristic < 2
    assert out.vertices.shape[0] > 100
    # the supported torus body survives
    r = np.sqrt(out.vertices[:, 0] ** 2 + out.vertices[:, 2] ** 2)
    assert (np.abs(r - 40.0) < 25.0).mean() > 0.8


def test_wrap_start_initial_surface():
    from ch_shrinkwrap_tpu.mesh.marching import wrap_start
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = d * 50 + rng.normal(scale=3, size=(20000, 3))
    surf = wrap_start(pts, offset=10.0, neighbourhood=50, grid_n=40)
    assert surf.euler_characteristic == 2
    assert surf.is_manifold
    r = np.linalg.norm(surf.vertices, axis=1)
    assert 50.0 < r.mean() < 70.0
