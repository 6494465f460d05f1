"""Per-op attribution microbenchmark for the solver hot path.

Times each hot op of one cg_block iteration in isolation at bench
scale (1e6 points, icosphere-7 mesh) on the real TPU.  Not run by the
driver — a working tool for optimization rounds (BASELINE.md records
its output).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/attr_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.ops import meshdata, correspondence as corr
from ch_shrinkwrap_tpu.ops import normals as _normals


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # concrete fetch to defeat async queue mis-timing
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:55s} {dt:8.1f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    R, sigma, N = 500.0, 5.0, 1_000_000
    n_sub = int(os.environ.get('ATTR_ICO_SUB', 7))
    print("building problem...", flush=True)
    v, f = icosphere(n_sub, radius=R)
    v_cap = os.environ.get('ATTR_V_CAP')
    f_cap = os.environ.get('ATTR_F_CAP')
    mesh = TriangleMesh(v, f)
    # the fit driver hilbert-sorts before every from_mesh; the ring
    # schedules' fixed patch budget assumes that locality
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False,
                            v_cap=int(v_cap) if v_cap else None,
                            f_cap=int(f_cap) if f_cap else None)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * R + rng.normal(scale=sigma, size=d.shape)).astype(np.float32)
    pts = pts[corr.fit_point_order(pts)]
    points = jnp.asarray(pts)

    fpos = ma.positions
    faces = ma.faces
    f_mask = ma.f_mask
    v_mask = ma.v_mask
    nbr_v = ma.nbr_v
    Vp = fpos.shape[0]
    Fp = faces.shape[0]
    s_size = 3
    print(f"Vp={Vp} Fp={Fp} N={N}", flush=True)

    tri = timeit("tri = f[faces]  (3Fp-row gather)",
                 jax.jit(lambda p: p[faces]), fpos)
    centers = jnp.asarray(tri).mean(1)

    dmean, fi = timeit(
        "pallas windowed correspondence (incl. anchors)",
        jax.jit(lambda p, c: corr.nearest_face_windowed(
            p, c, f_mask, use_pallas=True)), points, centers)

    fv = timeit("fv = tri[fi]  (N-row, 9-col gather)",
                jax.jit(lambda t: t[fi]), tri)
    w = jnp.ones((N, 3), jnp.float32) / 3.0
    res = jnp.asarray(fv).mean(1) - points

    def percorner_scatter(res_):
        ah_in = jnp.concatenate([res_, jnp.ones_like(res_)], axis=1)
        pc = (w[..., None] * ah_in[:, None, :]).reshape(N, 18)
        return jax.ops.segment_sum(pc, fi, num_segments=Fp)
    face_acc = timeit("per-corner segsum N->Fp (18-col)",
                      jax.jit(percorner_scatter), res)

    vnc = _normals.vertex_normal_corners(fpos, faces, f_mask, tri=tri)

    def fused_scatter(fa):
        fused = jnp.concatenate([jnp.asarray(vnc).reshape(Fp * 3, 3),
                                 fa.reshape(Fp * 3, 6)], axis=1)
        return jax.ops.segment_sum(fused, faces.reshape(-1),
                                   num_segments=Vp)
    timeit("fused vn+A^T segsum 3Fp->Vp (9-col)",
           jax.jit(fused_scatter), face_acc)

    S = jnp.broadcast_to(fpos[:, :, None], (Vp, 3, s_size)) + 0.0

    S_tri = timeit("S_tri = S[faces]  (3Fp-row, s*3-col gather)",
                   jax.jit(lambda s: s[faces]), S)
    timeit("AS = (S_tri[fi]*w).sum(1)  (N-row, 9s-col gather)",
           jax.jit(lambda st: (st[fi] * w[..., None, None]).sum(1)),
           S_tri)

    vn = jnp.asarray(tri)[:, 0] * 0.0  # placeholder shape (Fp,3)
    vn = _normals.vertex_normals(fpos, faces, f_mask, Vp, tri=tri)

    from ch_shrinkwrap_tpu.solver.shrinkwrap import compute_ncc
    pi = jnp.ones((Vp,), jnp.float32)
    timeit("compute_ncc (fused K=20 neighbor gather)",
           jax.jit(lambda p: compute_ncc(p, nbr_v, vn, pi, v_mask)), fpos)

    ASm = jnp.zeros((N, 3, s_size), jnp.float32) + 0.1
    timeit("Hc/Gc einsums (N,3,s)",
           jax.jit(lambda a: (jnp.einsum('nik,nil->kl', a, a),
                              jnp.einsum('nik,ni->k', a, res))), ASm)

    if os.environ.get('ATTR_RING', '1') == '1' and Vp > 32768:
        # ---- the production ring-path pieces (what the >32k fit
        # actually runs per iteration) ----
        from ch_shrinkwrap_tpu.ops.pallas_gather import ring_gather
        from ch_shrinkwrap_tpu.solver.shrinkwrap import compute_ncc
        print('building ring schedules...', flush=True)
        ring_tri, ring_ncc, ring_fold, ring_cb = meshdata.fit_ring_schedules(ma)
        assert ring_tri is not None

        timeit("ring: tri = f[faces] gather (3Fp rows)",
               jax.jit(lambda p: ring_gather(p, ring_tri)
                       .reshape(Fp, 3, 3)), fpos)
        fn8 = jnp.concatenate([fpos, vn, jnp.zeros((Vp, 2), fpos.dtype)],
                              axis=1)
        ncc_sched = ring_ncc[0] if isinstance(ring_ncc, tuple) \
            else ring_ncc
        timeit("ring: ncc gather (blocked k-major stream)",
               jax.jit(lambda x: ring_gather(x, ncc_sched,
                                             transposed_out=True)), fn8)
        timeit("ring: compute_ncc full (gather + alpha math)",
               jax.jit(lambda p: compute_ncc(p, nbr_v, vn, pi, v_mask,
                                             ring_sched=ring_ncc)), fpos)
        f_sched, inc_mask, ov_rows, ov_verts = ring_fold
        face_rows = jnp.zeros((Fp * 3, 9), jnp.float32) + 0.1

        def ring_fold_fn(fr):
            g = ring_gather(fr, f_sched).reshape(Vp, 8, 9)
            out = (g * inc_mask[..., None]).sum(1)
            ov = fr[ov_rows] * (ov_rows >= 0)[:, None]
            return out.at[ov_verts].add(
                jnp.where((ov_rows >= 0)[:, None], ov, 0.0))
        timeit("ring: A^T fold gather+sum (Vp x 8 x 9)",
               jax.jit(ring_fold_fn), face_rows)
        timeit("vertex_normals (fold path as in block)",
               jax.jit(lambda p: _normals.vertex_normals(
                   p, faces, f_mask, Vp, tri=None)), fpos)


if __name__ == '__main__':
    main()
