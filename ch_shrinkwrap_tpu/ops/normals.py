"""Device-side face/vertex normals and areas via segment ops.

Counterpart of PYME's native ``update_face_normal`` /
``update_single_vertex_neighbours`` kernels (cdef extern at
/root/reference/ch_shrinkwrap/_membrane_mesh.pyx:39-46), re-expressed
as fused gather + segment_sum XLA ops over the padded face table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def face_geometry(positions, faces, f_mask, tri=None):
    """(unit normals (Fp,3), areas (Fp,)) with padding rows zeroed.
    Pass ``tri = positions[faces]`` to reuse an existing gather."""
    if tri is None:
        tri = positions[faces]                   # (Fp, 3, 3)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = jnp.sqrt((n * n).sum(-1))
    areas = 0.5 * nn * f_mask
    normals = n / jnp.maximum(nn, 1e-12)[:, None] * f_mask[:, None]
    return normals, areas


def vertex_normal_corners(positions, faces, f_mask, tri=None):
    """Pre-scatter corner contributions for angle-weighted vertex
    normals: (Fp, 3, 3) values to be segment-summed by
    ``faces.reshape(-1)``.  Exposed separately so callers can batch
    this scatter with others sharing the same index (scatters are
    row-count bound on TPU; see solver/shrinkwrap.py)."""
    if tri is None:
        tri = positions[faces]                   # (Fp, 3, 3)
    fn, _ = face_geometry(positions, faces, f_mask, tri=tri)
    # corner angle at vertex k: between edges to the other two corners
    e_next = tri[:, [1, 2, 0]] - tri             # (Fp, 3, 3)
    e_prev = tri[:, [2, 0, 1]] - tri
    dot = (e_next * e_prev).sum(-1)
    crs = jnp.cross(e_next, e_prev)
    sin = jnp.sqrt((crs * crs).sum(-1))
    ang = jnp.arctan2(sin, dot) * f_mask[:, None]        # (Fp, 3)
    return fn[:, None, :] * ang[:, :, None]              # (Fp, 3, 3)


def normalize_vertex_normals(vn):
    """Unit-normalize summed corner contributions."""
    norm = jnp.sqrt((vn * vn).sum(-1))
    return vn / jnp.maximum(norm, 1e-12)[:, None]


def vertex_normals(positions, faces, f_mask, n_vertices, tri=None):
    """Angle-weighted vertex normals (unit), via segment_sum scatter.

    Each incident face contributes its normal weighted by its corner
    angle at the vertex — substantially more accurate than area
    weighting on irregular rings, which matters for the curvature
    kernel's Gaussian-curvature tolerance (see tests/test_curvature.py).
    Pass ``tri = positions[faces]`` to reuse an existing gather.
    """
    corners = vertex_normal_corners(positions, faces, f_mask, tri=tri)
    idx = faces.reshape(-1)                      # (3 Fp,)
    vn = jax.ops.segment_sum(corners.reshape(-1, 3), idx,
                             num_segments=n_vertices)
    return normalize_vertex_normals(vn)


def vertex_areas(positions, faces, f_mask, n_vertices):
    """Sum of incident face areas per vertex (the reference's
    ``areas[iv]`` accumulator, membrane_mesh_utils.c:1099)."""
    _, areas = face_geometry(positions, faces, f_mask)
    idx = faces.reshape(-1)
    vals = jnp.broadcast_to(areas[:, None], (faces.shape[0], 3)).reshape(-1)
    return jax.ops.segment_sum(vals, idx, num_segments=n_vertices)
