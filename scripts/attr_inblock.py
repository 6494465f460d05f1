"""Standalone timing of EVERY per-iteration op of the production
cg_block at a given scale (default 656k padded verts, hcgc+ring
config) — the honest in-block attribution (the older attr_bench.py
timed some ops in layouts the solver does not use, e.g. the 3-D
tri[fi] gather form, and missed the kernel passes entirely).

Usage: ATTR_ICO_SUB=8 python scripts/attr_inblock.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))

import jax
import jax.numpy as jnp

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.ops import meshdata, correspondence as corr
from ch_shrinkwrap_tpu.ops import normals as _normals
from ch_shrinkwrap_tpu.ops.pallas_gather import ring_gather
from ch_shrinkwrap_tpu.solver.shrinkwrap import compute_ncc


def _sync(out):
    # jax.block_until_ready is a no-op under some axon relay builds
    # (measured: an 8k bf16 matmul "ran" at 9132 TFLOPs); force real
    # completion by reducing one leaf on device and fetching the scalar.
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, 'dtype')]
    x = leaves[0]
    if x.dtype == jnp.bool_ or not jnp.issubdtype(x.dtype, jnp.inexact):
        np.asarray(_sync_count(x))
    else:
        np.asarray(_sync_sum(x))


@jax.jit
def _sync_sum(x):
    return jnp.sum(jnp.ravel(x)[:1024].astype(jnp.float32))


@jax.jit
def _sync_count(x):
    return jnp.sum(jnp.ravel(x)[:1024].astype(jnp.int32))


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    N = int(os.environ.get('ATTR_N', 1_000_000))
    n_sub = int(os.environ.get('ATTR_ICO_SUB', 8))
    v, f = icosphere(n_sub, radius=500.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    v_cap = os.environ.get('ATTR_V_CAP')
    f_cap = os.environ.get('ATTR_F_CAP')
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False,
                            v_cap=int(v_cap) if v_cap else None,
                            f_cap=int(f_cap) if f_cap else None)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 500 + rng.normal(scale=5.0, size=d.shape)).astype(np.float32)
    pts = pts[corr.fit_point_order(pts)]
    points = jnp.asarray(pts)

    fpos, faces, f_mask, v_mask, nbr_v = (
        ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v)
    Vp, Fp = fpos.shape[0], faces.shape[0]
    s_size = 3
    print(f"Vp={Vp} Fp={Fp} N={N}", flush=True)
    ring_tri, ring_ncc, ring_fold, ring_cb = meshdata.fit_ring_schedules(ma)
    assert ring_tri is not None

    tri = timeit("tri ring_gather (3Fp, 3)",
                 jax.jit(lambda p: ring_gather(p, ring_tri)
                         .reshape(-1, 3, 3)), fpos)
    centers = timeit("centers = tri.mean(1)",
                     jax.jit(lambda t: t.mean(1)), tri)
    timeit("vn_corners", jax.jit(
        lambda p, t: _normals.vertex_normal_corners(p, faces, f_mask,
                                                    tri=t)), fpos, tri)
    starts = timeit("anchor starts (once per BLOCK, not per iter)",
                    jax.jit(lambda p, c: corr.windowed_anchor_starts(
                        p, c, f_mask)), points, centers)
    dmean, fi, meta = timeit(
        "corr kernel (hoisted starts)",
        jax.jit(lambda p, c, s: corr.nearest_face_windowed(
            p, c, f_mask, use_pallas=True, return_meta=True,
            starts=s)), points, centers, starts)
    fv9 = timeit("fv9 = tri2d[fi] gather (N, 9)",
                 jax.jit(lambda t: t.reshape(-1, 9)[fi]), tri)

    def wmath(fv9_, pts_):
        fvj = [fv9_[:, 3 * j:3 * j + 3] for j in range(3)]
        dvert = jnp.stack(
            [jnp.sqrt(((fj - pts_) ** 2).sum(-1)) for fj in fvj],
            axis=-1)
        w = 1.0 / jnp.maximum(dvert, 1e-6)
        w = w / w.sum(-1, keepdims=True)
        Af = sum(fvj[j] * w[:, j:j + 1] for j in range(3))
        return w, Af
    w, Af = timeit("dvert/w/Af math (N, 3)", jax.jit(wmath), fv9, points)
    sig = jnp.full((N, 3), 0.2, jnp.float32)

    def resmath(Af_, pts_, dm):
        res = 1.0 * (pts_ - Af_)
        w_dist = 1.0 / (dm[:, None] * sig / 2.0 + 1.0)
        return res * w_dist
    res = timeit("res math (N, 3)", jax.jit(resmath), Af, points, dmean)

    from ch_shrinkwrap_tpu.ops.pallas_scatter import (
        windowed_ah_pallas, windowed_w2_pallas)
    acc = timeit("windowed_ah_pallas (Fp, 12)",
                 jax.jit(lambda w_, r_: windowed_ah_pallas(
                     w_, r_, fi, meta.js, meta.starts, meta.sub_ids,
                     num_segments=Fp)), w, res)
    W2 = timeit("windowed_w2_pallas (Fp, 6)",
                jax.jit(lambda w_: windowed_w2_pallas(
                    w_, fi, meta.js, meta.starts, meta.sub_ids,
                    num_segments=Fp)), w)

    vnc = _normals.vertex_normal_corners(fpos, faces, f_mask, tri=tri)

    def fuse(acc_, vnc_):
        # kernel emits the interleaved (j, [res, 1]) layout directly
        return jnp.concatenate([vnc_.reshape(Fp * 3, 3),
                                acc_.reshape(Fp * 3, 4)], axis=1)
    fused = timeit("concat fused (3Fp, 7)", jax.jit(fuse), acc, vnc)

    f_sched, inc_mask, ov_rows, ov_verts = ring_fold
    KI = inc_mask.shape[1]
    Rf = f_sched.n_rows

    def fold(fr):
        gt = ring_gather(fr, f_sched._replace(uncov=None),
                         transposed_out=True)
        cm = f_sched.care.astype(fr.dtype)
        gt = (gt * cm[None, :]).reshape(8, Rf // 128, 128)
        gm = (jax.lax.broadcasted_iota(jnp.int32, (128, 16), 0) // KI
              == jax.lax.broadcasted_iota(jnp.int32, (128, 16), 1)
              ).astype(fr.dtype)
        out7t = jax.lax.dot_general(gt, gm, (((2,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST)
        return (out7t.reshape(8, Vp)[:7]).T
    out7 = timeit("ring fold gather + MXU group-sum (Vp, 7)",
                  jax.jit(fold), fused)
    vn = timeit("normalize_vertex_normals",
                jax.jit(lambda o: _normals.normalize_vertex_normals(
                    o[:, :3])), out7)
    pi = jnp.sqrt(3.0) * jnp.abs(out7[:, 6])
    timeit("compute_ncc (ring k-major)",
           jax.jit(lambda p, vn_, pi_: compute_ncc(
               p, nbr_v, vn_, pi_, v_mask, ring_sched=ring_ncc)),
           fpos, vn, pi)

    S = jnp.broadcast_to(fpos[:, :, None], (Vp, 3, s_size)) + 0.0

    def costests(S_):
        test = 1.0
        n_dirs0 = 2
        pairs = [(i, j) for i in range(n_dirs0)
                 for j in range(1, n_dirs0) if i != j]
        for (i, j) in pairs:
            num = (S_[..., i] * S_[..., j]).sum()
            den = (jnp.linalg.norm(S_[..., i].ravel())
                   * jnp.linalg.norm(S_[..., j].ravel()))
            test = test - jnp.abs(num) / jnp.maximum(den, 1e-30) / max(
                len(pairs), 1)
        return test
    timeit("S stack + orthogonality tests", jax.jit(costests), S)

    S_tri = timeit("S_tri ring_gather (Fp, 9s)",
                   jax.jit(lambda S_: ring_gather(
                       S_.reshape(Vp, 3 * s_size), ring_tri)
                       .reshape(Fp, 9 * s_size)), S)

    def hcgc(S_tri_, acc_, W2_):
        ks = 3 * s_size
        Sc = [S_tri_[:, ks * a:ks * (a + 1)].reshape(Fp, 3, s_size)
              for a in range(3)]
        E = acc_[:, :9]
        Gc = sum(jnp.einsum('fik,fi->k', Sc[j], E[:, 3 * j:3 * j + 3])
                 for j in range(3))
        pair_col = {(0, 0): 0, (1, 1): 1, (2, 2): 2,
                    (0, 1): 3, (0, 2): 4, (1, 2): 5}
        Hc = 0.0
        for (a, b), col in pair_col.items():
            Za = Sc[a] * W2_[:, col][:, None, None]
            Hab = jnp.einsum('fik,fil->kl', Za, Sc[b])
            Hc = Hc + (Hab if a == b else Hab + Hab.T)
        return Hc, Gc
    timeit("face-side Hc/Gc einsums (hcgc)", jax.jit(hcgc),
           S_tri, acc, W2)

    def hwgw(S_, pref):
        Sv = S_ * v_mask[:, None, None]
        Hw = jnp.einsum('vik,vil->kl', Sv, Sv)
        Gw = -jnp.einsum('vik,vi->k', Sv, pref)
        return Hw, Gw
    timeit("prior Hw/Gw einsums (Vp)", jax.jit(hwgw), S, fpos)
    timeit("step einsum + update (Vp)",
           jax.jit(lambda S_, c: fpos + jnp.einsum('vik,k->vi', S_, c)),
           S, jnp.ones((s_size,), jnp.float32))


if __name__ == '__main__':
    main()
