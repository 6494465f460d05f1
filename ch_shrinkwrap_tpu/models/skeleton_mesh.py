"""SkeletonMesh — mean-curvature-flow skeletonization.

Rebuild of /root/reference/ch_shrinkwrap/_skeleton_mesh.pyx (SkeletonMesh
:24, opt_skeleton :673-725) and the SkeletonConjGrad solver
(/root/reference/ch_shrinkwrap/conj_grad.py:1045-1231, after
Tagliasacchi et al., "Mean Curvature Skeletons", CGF 2012):

minimize  || Lw f ||^2 + lam_med^2 || f - nearest_negative_pole(f) ||^2

where ``Lw`` is the umbrella Laplacian scaled by 1/sqrt(sum of squared
one-ring edge lengths) (the reference's ``c_shrinkwrap_lw_func``,
conj_grad_utils.c:370-487) and the medial prior attracts each vertex to
its nearest negative Voronoi pole (Amenta-Bern), computed once from the
initial surface.

The working set during skeletonization is a few thousand vertices with
a remesh every iteration (rf = 1, _skeleton_mesh.pyx:676), so the
solver runs host-side in vectorized numpy: device round-trips per
iteration would dominate.  One deliberate deviation from the reference,
noted per SURVEY §5 "default fix": in the subspace solve the nonlinear
medial term is linearized as the identity on search directions (the
reference applies the nearest-pole map to the direction vectors
themselves, conj_grad.py:183-229 + Mfunc, which treats displacement
vectors as positions).
"""

from __future__ import annotations

import logging

import numpy as np

from .membrane_mesh import MembraneMesh

logger = logging.getLogger(__name__)


def _lw_apply(f, nbrs, ref_pos):
    """Edge-weighted umbrella Laplacian: sum_n (f_n - f_i) / sqrt(w_i)
    with w_i = sum of squared one-ring edge lengths on ``ref_pos``."""
    mask = nbrs >= 0
    safe = np.clip(nbrs, 0, None)
    edge = (ref_pos[safe] - ref_pos[:, None, :]) * mask[..., None]
    w = (edge ** 2).sum(axis=(1, 2))
    scale = np.where(w > 0, 1.0 / np.sqrt(np.maximum(w, 1e-30)), 0.0)
    diff = (f[safe] - f[:, None, :]) * mask[..., None]
    return diff.sum(1) * scale[:, None]


def _lw_adjoint(r, nbrs, ref_pos):
    """Adjoint of _lw_apply (scatter form of c_shrinkwrap_lhw_func)."""
    mask = nbrs >= 0
    safe = np.clip(nbrs, 0, None)
    edge = (ref_pos[safe] - ref_pos[:, None, :]) * mask[..., None]
    w = (edge ** 2).sum(axis=(1, 2))
    scale = np.where(w > 0, 1.0 / np.sqrt(np.maximum(w, 1e-30)), 0.0)
    rs = r * scale[:, None]
    out = -rs * mask.sum(1)[:, None]
    np.add.at(out, safe.ravel(),
              np.repeat(rs, nbrs.shape[1], axis=0)
              * mask.ravel()[:, None])
    return out


class SkeletonMesh(MembraneMesh):
    """Mesh that collapses onto its medial skeleton under MCF."""

    def __init__(self, vertices=None, faces=None, mesh=None, **kwargs):
        MembraneMesh.__init__(self, vertices, faces, mesh, **kwargs)
        self._neg_poles = None

    def _compute_negative_poles(self):
        import scipy.spatial
        from ..eval.delaunay_utils import voronoi_poles, \
            clean_neg_voronoi_poles

        v = self.vertices.astype(np.float64)
        vor = scipy.spatial.Voronoi(v)
        _, pn = voronoi_poles(vor, self.vertex_normals)
        poles = vor.vertices[pn[pn != -1]]
        poles = clean_neg_voronoi_poles(self, poles)
        if len(poles) == 0:
            poles = v.mean(0)[None, :]
        self._neg_poles = poles
        import scipy.spatial as sp
        self._pole_tree = sp.cKDTree(poles)

    def opt_skeleton(self, points=None, sigma=None, max_iter=10, lam=None,
                     target_edge_length=-1.0, **kwargs):
        """Mean-curvature-flow skeleton driver (opt_skeleton,
        _skeleton_mesh.pyx:673-725): one CG iteration per remesh."""
        lam = list(lam) if lam is not None else [40.0]
        area_variation_factor = kwargs.get('area_variation_factor', 1e-4)

        original_area = self.area()
        last_area = original_area

        # Voronoi poles from the INITIAL surface (conj_grad.py:1196-1202)
        self._compute_negative_poles()

        prev_pos = None
        for j in range(max_iter):
            pos = self.vertices.astype(np.float64)
            nbrs = self.vertex_neighbors

            # residual of the contraction term (data = zeros)
            Af = _lw_apply(pos, nbrs, pos)
            res = -Af
            S0 = _lw_adjoint(res, nbrs, pos)

            # medial prior: pull toward nearest negative pole
            _, pole_idx = self._pole_tree.query(pos, k=1, workers=-1)
            pole_idx = np.clip(pole_idx, 0, len(self._neg_poles) - 1)
            pref = pos - self._neg_poles[pole_idx]
            S1 = -pref

            # subspace solve over [S0, S1] (last_step=False for
            # skeletonization, conj_grad.py:1047-1049)
            S = [S0, S1]
            AS = [_lw_apply(s, nbrs, pos) for s in S]
            n_s = len(S)
            H = np.zeros((n_s, n_s))
            G = np.zeros(n_s)
            lam2 = lam[0] ** 2
            for a in range(n_s):
                G[a] = (AS[a] * res).sum() - lam2 * (S[a] * pref).sum()
                for b in range(n_s):
                    H[a, b] = ((AS[a] * AS[b]).sum()
                               + lam2 * (S[a] * S[b]).sum())
            H += 1e-12 * np.eye(n_s)
            try:
                c = np.linalg.solve(H, G)
            except np.linalg.LinAlgError:
                break
            new_pos = pos + sum(ci * si for ci, si in zip(c, S))
            self.set_positions(new_pos.astype(np.float32))

            # remesh every iteration (rf = 1)
            self.remesh(1, target_edge_length, 0.5, n_relax=0)

            area = self.area()
            area_ratio = abs(last_area - area) / original_area
            logger.info('skeleton iter %d: V=%d area ratio %.5f',
                        j, self.vertices.shape[0], area_ratio)
            if area_ratio < area_variation_factor:
                break
            last_area = area
        return self
