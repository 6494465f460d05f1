"""Point -> nearest-face correspondence on device.

TPU-native replacement for the reference's per-iteration cKDTree query
over face centers (``_compute_weight_matrix4``,
/root/reference/ch_shrinkwrap/mesh_conj_grad.py:433-516) and its
"~10x faster but inexact" octree variant (mesh_conj_grad.py:459-481).

Design: the squared distance ``|p - c|^2 = |p|^2 + |c|^2 - 2 p.c`` turns
nearest-neighbor search into a matmul — the ``-2 P C^T`` term runs on
the MXU — streamed over face chunks with a running (min, argmin) merge
so the full N x F distance matrix never materializes.  Exact (unlike
the reference's octree path), and O(N F) flops that the MXU eats at
hundreds of TFLOP/s; a grid-hash pruned variant can swap in behind the
same interface.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.4e38)


@partial(jax.jit, static_argnames=('face_chunk',))
def nearest_face(points, centers, f_mask, face_chunk=2048):
    """For each point, the index of the nearest (valid) face center.

    Parameters
    ----------
    points : (N, 3) f32
    centers : (Fp, 3) f32 — padded face centers
    f_mask : (Fp,) bool — False rows are excluded
    face_chunk : int — faces per streamed chunk (static)

    Returns
    -------
    dist : (N,) f32 — distance to the nearest face center
    idx : (N,) i32 — index of the nearest face
    """
    N = points.shape[0]
    Fp = centers.shape[0]
    n_chunks = -(-Fp // face_chunk)
    Fpad = n_chunks * face_chunk

    c = jnp.zeros((Fpad, 3), jnp.float32).at[:Fp].set(centers)
    m = jnp.zeros((Fpad,), bool).at[:Fp].set(f_mask)
    c2 = (c * c).sum(-1)
    c2 = jnp.where(m, c2, BIG)                      # invalid -> far away

    c = c.reshape(n_chunks, face_chunk, 3)
    c2 = c2.reshape(n_chunks, face_chunk)
    p2 = (points * points).sum(-1)                   # (N,)

    def body(carry, chunk):
        best_d2, best_i = carry
        cc, cc2, base = chunk
        # (N, face_chunk) distance via MXU matmul
        d2 = p2[:, None] + cc2[None, :] - 2.0 * jnp.dot(
            points, cc.T, preferred_element_type=jnp.float32)
        j = jnp.argmin(d2, axis=1)
        dmin = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
        upd = dmin < best_d2
        best_d2 = jnp.where(upd, dmin, best_d2)
        best_i = jnp.where(upd, base + j.astype(jnp.int32), best_i)
        return (best_d2, best_i), None

    init = (jnp.full((N,), BIG, jnp.float32), jnp.zeros((N,), jnp.int32))
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * face_chunk)
    (best_d2, best_i), _ = jax.lax.scan(body, init, (c, c2, bases))
    return jnp.sqrt(jnp.maximum(best_d2, 0.0)), best_i


def correspondence_weights(positions, faces, point_xyz, nearest_idx):
    """Inverse-distance weights of each point over its nearest face's
    three vertices (mesh_conj_grad.py:488-516).

    Returns
    -------
    v_idx : (N, 3) i32 — vertex indices of the nearest face
    w : (N, 3) f32 — row-normalized 1/max(dist, 1e-6) weights
    """
    v_idx = faces[nearest_idx]                       # (N, 3)
    fv = positions[v_idx]                            # (N, 3, 3)
    d = jnp.sqrt(((fv - point_xyz[:, None, :]) ** 2).sum(-1))
    w = 1.0 / jnp.maximum(d, 1e-6)
    w = w / w.sum(-1, keepdims=True)
    return v_idx, w


def a_apply(f, v_idx, w):
    """Forward operator: predicted surface point per localization,
    ``A f = sum_i w_i f[v_idx_i]`` (mesh_conj_grad.py:518-551)."""
    return (f[v_idx] * w[..., None]).sum(axis=1)     # (N, 3)


def ah_apply(r, v_idx, w, n_vertices):
    """Adjoint operator: scatter-add point residuals onto the three
    vertices of each point's face, ``A^T r`` — the TPU counterpart of
    ``c_shrinkwrap_ah_helper`` (conj_grad_utils.c:123-167)."""
    vals = (w[..., None] * r[:, None, :]).reshape(-1, 3)   # (3N, 3)
    idx = v_idx.reshape(-1)
    return jax.ops.segment_sum(vals, idx, num_segments=n_vertices)
