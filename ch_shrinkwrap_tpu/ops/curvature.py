"""One-ring curvature tensor + Canham-Helfrich energy, on device.

TPU-native rebuild of the reference's C kernel ``c_curvature_grad``
(/root/reference/ch_shrinkwrap/membrane_mesh_utils.c:915-1250) and its
readable Python twin (``MembraneMesh.curvature_grad``,
/root/reference/ch_shrinkwrap/_membrane_mesh.pyx:349-496):

pass 1  gather the <=20-vertex one-ring over the padded neighbor table,
        compute radial weights and edge tangents;
pass 2  accumulate the Taubin (1995) curvature tensor
        ``M = sum_j w_j k_j T_j T_j^T`` and the per-edge bending-energy
        finite difference ``dE_j``;
eig     robust Householder-projected 2x2 closed-form eigendecomposition
        (counterpart of ``compute_curvature_tensor_eig_givens``,
        membrane_mesh_utils.c:618-720) giving principal curvatures
        ``k0 = 3 l1 - l2``, ``k1 = 3 l2 - l1``;
pass 3  least-squares quadric in the principal frame for the
        normal-displaced curvatures (``moore_penrose_2x2`` counterpart)
        giving dH, dK and the energy gradient dE/dN.

Everything is a fused batch of gathers + VPU elementwise ops over all
vertices at once — no per-vertex loop, no data-dependent control flow —
so XLA maps it onto the TPU directly.  Randomized centroid jitter and
Monte-Carlo vertex skipping use explicit PRNG keys (the C code used
unseeded ``rand()``, SURVEY §5 quirks).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import normals as _normals

KBT = 0.0257  # eV, matches DEF KBT (_membrane_mesh.pyx:22)


class CurvatureState(NamedTuple):
    """Per-vertex curvature quantities (padded length Vp)."""
    k_0: jax.Array       # principal curvature 0 (1/nm)
    k_1: jax.Array       # principal curvature 1 (1/nm)
    e_0: jax.Array       # (Vp, 3) principal direction 0
    e_1: jax.Array       # (Vp, 3) principal direction 1
    H: jax.Array         # mean curvature (1/nm)
    K: jax.Array         # Gaussian curvature (1/nm^2)
    dH: jax.Array        # dH/dN (1/nm^2)
    dK: jax.Array        # dK/dN (1/nm)
    E: jax.Array         # Canham-Helfrich energy per vertex (eV)
    pE: jax.Array        # exp(-E/kBT)
    dE_neighbors: jax.Array
    dEdN: jax.Array      # (Vp, 3) energy gradient along vertex normal


def householder_tangent_basis(n):
    """Two orthonormal tangent vectors per unit normal n (V, 3).

    Columns 1 and 2 of the Householder reflection that maps e_x onto
    -sign(n_x) * n — the same construction as the reference's Givens
    eigensolver setup (membrane_mesh_utils.c:618-660).
    """
    sign = jnp.where(n[..., 0] >= 0, 1.0, -1.0)
    u = jnp.stack([n[..., 0] + sign, n[..., 1], n[..., 2]], axis=-1)
    uu = (u * u).sum(-1, keepdims=True)
    # H = I - 2 u u^T / (u^T u); extract columns 1 and 2
    e1 = jnp.stack([-2 * u[..., 0] * u[..., 1] / uu[..., 0],
                    1 - 2 * u[..., 1] * u[..., 1] / uu[..., 0],
                    -2 * u[..., 2] * u[..., 1] / uu[..., 0]], axis=-1)
    e2 = jnp.stack([-2 * u[..., 0] * u[..., 2] / uu[..., 0],
                    -2 * u[..., 1] * u[..., 2] / uu[..., 0],
                    1 - 2 * u[..., 2] * u[..., 2] / uu[..., 0]], axis=-1)
    return e1, e2


def eig_2x2_symmetric(a, b, c):
    """Eigenvalues (ascending) + rotation (cos, sin) of [[a, b], [b, c]]."""
    tr = a + c
    disc = jnp.sqrt((a - c) ** 2 + 4 * b * b)
    l1 = 0.5 * (tr - disc)
    l2 = 0.5 * (tr + disc)
    theta = 0.5 * jnp.arctan2(2 * b, a - c)
    return l1, l2, jnp.cos(theta), jnp.sin(theta)


@partial(jax.jit, static_argnames=('method',))
def curvature_grad(positions, faces, f_mask, v_mask, nbr_v, nbr_f,
                   kc=20.0 * KBT, kg=-20.0 * KBT, c0=0.0, dN=0.1,
                   skip_key=None, skip_prob=0.0, method='lsq'):
    """Compute CurvatureState for every vertex in one fused batch.

    Mirrors c_curvature_grad's 3-pass loop (membrane_mesh_utils.c:915):
    same formulas, computed for all vertices simultaneously.

    ``method='taubin'`` reproduces the reference's ``k0 = 3 l1 - l2``
    eigen mapping (membrane_mesh_utils.c:1137-1152), which assumes the
    ring's tangent directions are uniformly distributed and develops
    percent-level principal-curvature splits on anisotropic rings (the
    reference's own test comments acknowledge intermittent failures,
    tests/test_membrane_mesh.py:84-88).  The default ``method='lsq'``
    fixes this quirk (SURVEY §5: "default fix, note in docs") by
    fitting the second fundamental form k(phi) = a cos^2 + 2b cos sin
    + c sin^2 to the ring's signed edge curvatures by weighted least
    squares — exact on spheres for any ring shape.
    """
    Vp = positions.shape[0]
    f32 = jnp.float32

    vnormals = _normals.vertex_normals(positions, faces, f_mask, Vp)
    _, face_areas = _normals.face_geometry(positions, faces, f_mask)

    nmask = (nbr_v >= 0) & v_mask[:, None]          # (Vp, K)
    safe_nbr = jnp.clip(nbr_v, 0, Vp - 1)
    safe_nbr_f = jnp.clip(nbr_f, 0, faces.shape[0] - 1)

    vi = positions                                   # (Vp, 3)
    Nvi = vnormals
    vjs = positions[safe_nbr]                        # (Vp, K, 3)
    Nvjs = vnormals[safe_nbr]

    dvs = jnp.where(nmask[..., None], vjs - vi[:, None, :], 0.0)
    dvs_norm = jnp.sqrt((dvs * dvs).sum(-1))
    inv_dv = jnp.where(nmask, 1.0 / jnp.maximum(dvs_norm, 1e-12), 0.0)
    r_sum = inv_dv.sum(-1)                           # (Vp,)

    dvs_1 = dvs - (Nvi * dN)[:, None, :] * nmask[..., None]
    dvs_1_norm = jnp.sqrt((dvs_1 * dvs_1).sum(-1))

    dvs_hat = dvs * jnp.where(nmask, 1.0 / jnp.maximum(dvs_norm, 1e-12),
                              0.0)[..., None]
    dvs_1_hat = dvs_1 * jnp.where(nmask, 1.0 / jnp.maximum(dvs_1_norm, 1e-12),
                                  0.0)[..., None]

    # tangent directions: projection of -dv out of the normal
    ndotdv = (Nvi[:, None, :] * dvs).sum(-1)         # (Vp, K)
    T = -(dvs - ndotdv[..., None] * Nvi[:, None, :])
    T_norm = jnp.sqrt((T * T).sum(-1))
    Tij = T * jnp.where(T_norm > 1e-12, 1.0 / jnp.maximum(T_norm, 1e-12),
                        0.0)[..., None]

    def normal_diff(nv, hat):
        # sqrt(2 - 2 sqrt(1 - (n . e)^2)): chord length between the
        # normal and its reflection across the edge (pyx:431-433)
        d = (nv * hat).sum(-1)
        inner = jnp.sqrt(jnp.clip(1.0 - d * d, 0.0, 1.0))
        return jnp.sqrt(jnp.clip(2.0 - 2.0 * inner, 0.0, None))

    Ni_diffs = normal_diff(Nvi[:, None, :], dvs_hat)
    Nj_diffs = normal_diff(Nvjs, dvs_hat)
    Nj_1_diffs = normal_diff(Nvjs, dvs_1_hat)

    kjs = 2.0 * Nj_diffs * inv_dv
    kjs_1 = jnp.where(nmask, 2.0 * Nj_1_diffs
                      / jnp.maximum(dvs_1_norm, 1e-12), 0.0)

    k_edge = 2.0 * jnp.sign(-ndotdv) * Ni_diffs * inv_dv
    w = inv_dv / jnp.maximum(r_sum, 1e-12)[:, None]

    Aj = jnp.where(nmask, face_areas[safe_nbr_f], 0.0)
    areas = Aj.sum(-1)                               # (Vp,)

    dEj = Aj * w * kc * (2.0 * kjs - c0) * (kjs_1 - kjs) / dN
    dE_neighbors = dEj.sum(-1)

    # Tangent frame and per-edge direction components
    e1, e2 = householder_tangent_basis(Nvi)
    t1 = (Tij * e1[:, None, :]).sum(-1)              # (Vp, K)
    t2 = (Tij * e2[:, None, :]).sum(-1)

    if method == 'taubin':
        # Taubin tensor M = sum_j w_j k_j T_j T_j^T in the tangent 2x2
        wk = w * k_edge
        m00 = (wk * t1 * t1).sum(-1)
        m01 = (wk * t1 * t2).sum(-1)
        m11 = (wk * t2 * t2).sum(-1)
        l1, l2, ct, st = eig_2x2_symmetric(m00, m01, m11)
        k_0 = 3.0 * l1 - l2
        k_1 = 3.0 * l2 - l1
    else:
        # Weighted LSQ fit of the second fundamental form to the signed
        # edge curvatures: design rows X_j = [t1^2, 2 t1 t2, t2^2].
        X0 = jnp.where(nmask, t1 * t1, 0.0)
        X1 = jnp.where(nmask, 2.0 * t1 * t2, 0.0)
        X2 = jnp.where(nmask, t2 * t2, 0.0)
        kw = w
        y = k_edge

        def dotk(a_, b_):
            return (kw * a_ * b_).sum(-1)

        # normal equations G beta = r, G symmetric 3x3
        g00, g01, g02 = dotk(X0, X0), dotk(X0, X1), dotk(X0, X2)
        g11, g12, g22 = dotk(X1, X1), dotk(X1, X2), dotk(X2, X2)
        r0, r1, r2 = dotk(X0, y), dotk(X1, y), dotk(X2, y)

        # closed-form 3x3 solve via adjugate with singularity guard
        c00 = g11 * g22 - g12 * g12
        c01 = g02 * g12 - g01 * g22
        c02 = g01 * g12 - g02 * g11
        c11 = g00 * g22 - g02 * g02
        c12 = g01 * g02 - g00 * g12
        c22 = g00 * g11 - g01 * g01
        det = g00 * c00 + g01 * c01 + g02 * c02
        okd = jnp.abs(det) > 1e-10
        invd = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
        a_ = (c00 * r0 + c01 * r1 + c02 * r2) * invd
        b_ = (c01 * r0 + c11 * r1 + c12 * r2) * invd
        c_ = (c02 * r0 + c12 * r1 + c22 * r2) * invd

        # Taubin fallback on singular rings
        wk = w * k_edge
        m00 = (wk * t1 * t1).sum(-1)
        m01 = (wk * t1 * t2).sum(-1)
        m11 = (wk * t2 * t2).sum(-1)
        tl1, tl2, _, _ = eig_2x2_symmetric(m00, m01, m11)
        a_ = jnp.where(okd, a_, 3.0 * tl1 - tl2)
        b_ = jnp.where(okd, b_, 0.0)
        c_ = jnp.where(okd, c_, 3.0 * tl2 - tl1)

        k_0, k_1, ct, st = eig_2x2_symmetric(a_, b_, c_)

    # principal directions in 3D: larger-curvature direction
    # = ct e1 + st e2 (from the 2x2 rotation)
    v2 = ct[:, None] * e1 + st[:, None] * e2
    v1 = -st[:, None] * e1 + ct[:, None] * e2
    H = 0.5 * (k_0 + k_1)
    K = k_0 * k_1

    # pass 3: displaced-curvature quadric b = A [k0, k1] - dN in the
    # principal frame (pyx:465-478); zero rows for masked neighbors
    # drop out of the normal equations automatically.
    s1 = (dvs * v1[:, None, :]).sum(-1)
    s2 = (dvs * v2[:, None, :]).sum(-1)
    A1 = jnp.where(nmask, s1 * s1, 0.0)
    A2 = jnp.where(nmask, s2 * s2, 0.0)
    b = A1 * k_0[:, None] + A2 * k_1[:, None] - dN

    ata00 = (A1 * A1).sum(-1)
    ata01 = (A1 * A2).sum(-1)
    ata11 = (A2 * A2).sum(-1)
    atb0 = (A1 * b).sum(-1)
    atb1 = (A2 * b).sum(-1)
    det = ata00 * ata11 - ata01 * ata01
    # Moore-Penrose style guard (membrane_mesh_utils.c:841): fall back
    # to zero displacement when the normal equations are singular.
    ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    kp0 = (ata11 * atb0 - ata01 * atb1) * inv_det
    kp1 = (-ata01 * atb0 + ata00 * atb1) * inv_det
    kp0 = jnp.where(ok, kp0, k_0)
    kp1 = jnp.where(ok, kp1, k_1)

    dH = (0.5 * (kp0 + kp1) - H) / dN
    dK = ((kp0 - k_0) * k_1 + k_0 * (kp1 - k_1)) / dN

    E = areas * (0.5 * kc * (2.0 * H - c0) ** 2 + kg * K)
    pE = jnp.exp(-E / KBT)

    dEdN_H = areas * kc * (2.0 * H - c0) * dH
    dEdN_K = areas * kg * dK
    dEdN_sum = dEdN_H + dEdN_K + dE_neighbors
    dEdN = -dEdN_sum[:, None] * Nvi

    # Monte-Carlo vertex skipping with an explicit key (replaces the
    # C rand() — SURVEY §5 'Randomness' quirk)
    valid = v_mask & (nmask.any(-1))
    if skip_key is not None and skip_prob > 0.0:
        keep = jax.random.uniform(skip_key, (Vp,)) >= skip_prob
        valid = valid & keep

    def z(x):
        return jnp.where(valid, x, 0.0).astype(f32)

    def zv(x):
        return jnp.where(valid[:, None], x, 0.0).astype(f32)

    return CurvatureState(
        k_0=z(k_0), k_1=z(k_1), e_0=zv(v1), e_1=zv(v2), H=z(H), K=z(K),
        dH=z(dH), dK=z(dK), E=z(E), pE=jnp.where(valid, pE, 0.0).astype(f32),
        dE_neighbors=z(dE_neighbors), dEdN=zv(dEdN))
