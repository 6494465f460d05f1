"""Corner-blocked lane-major subspace path (ring_tri_cb): full-block
parity at small scale + isolated S_tri/hcgc timing A/B at 656k.

Usage:
  python scripts/probe_cb.py           # parity at 41k + timing at 656k
  PROBE_CB_PARITY_ONLY=1 python scripts/probe_cb.py
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
from ch_shrinkwrap_tpu.ops.pallas_gather import (ring_gather,
                                                 ring_gather_schedule)
from ch_shrinkwrap_tpu.solver.shrinkwrap import block_call


def build(n_sub, n_points):
    rng = np.random.default_rng(0)
    R = 500.0
    v, f = icosphere(n_sub, radius=R * 1.1)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False)
    d = rng.normal(size=(n_points, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * R + rng.normal(scale=5.0, size=d.shape)).astype(np.float32)
    pts = pts[corr.fit_point_order(pts)]
    return ma, jnp.asarray(pts)


def cb_schedule(ma, cps=32):
    """Per-corner schedule triple (what fit_ring_schedules builds
    above HCGC_MIN_VP; rebuilt here so parity() can run below it)."""
    h = ma.host or {}
    faces_np = h.get('faces')
    if faces_np is None:
        faces_np = np.asarray(ma.faces)
    f_mask_np = h.get('f_mask')
    if f_mask_np is None:
        f_mask_np = np.asarray(ma.f_mask)
    cb = [ring_gather_schedule(np.ascontiguousarray(faces_np[:, j]),
                               f_mask_np, ma.positions.shape[0],
                               span=384, fixed_layout=True, cps=cps)
          for j in range(3)]
    assert all(s is not None for s in cb), 'cb stream over budget'
    return tuple(cb)


def parity():
    ma, pts = build(6, 200_000)
    N = pts.shape[0]
    sig = jnp.ones((N, 3), jnp.float32)
    w = jnp.ones((N, 3), jnp.float32)
    pm = jnp.ones((N,), bool)
    rt, rn, rf, _ = meshdata.fit_ring_schedules(ma)
    rcb = cb_schedule(ma)
    kw = dict(num_iters=5, active_iters=5, use_shrink=False,
              face_chunk=2048, corr_method='windowed_pallas',
              cell_size=2.0, face_nbrs=ma.face_nbrs,
              ring_tri=rt, ring_ncc=rn, ring_fold=rf,
              face_hcgc=True)
    f0, d0 = block_call(ma.positions, ma.faces, ma.f_mask, ma.v_mask,
                        ma.nbr_v, pts, sig, w, pm, 2.0, 0.0, **kw)
    f1, d1 = block_call(ma.positions, ma.faces, ma.f_mask, ma.v_mask,
                        ma.nbr_v, pts, sig, w, pm, 2.0, 0.0,
                        ring_tri_cb=rcb, **kw)
    # chaos control: the SAME row-major program on positions perturbed
    # at float32 ulp scale.  The block's argmin correspondences are
    # discontinuous — a winner flip moves individual vertices visibly
    # — so pointwise parity is only meaningful relative to this
    # intrinsic sensitivity; fit-level statistics must match tightly.
    peps = 1e-4
    f2, d2 = block_call(ma.positions + peps, ma.faces, ma.f_mask,
                        ma.v_mask, ma.nbr_v, pts, sig, w, pm, 2.0,
                        0.0, **kw)
    a, b, c = np.asarray(f0), np.asarray(f1), np.asarray(f2)
    vm = np.asarray(ma.v_mask)
    scale = np.abs(a[vm]).max()

    def stats(x, y, tag):
        d = np.linalg.norm(x[vm] - y[vm], axis=1)
        print(f"  {tag}: max {d.max():.3e}  mean {d.mean():.3e}  "
              f"p99 {np.percentile(d, 99):.3e}", flush=True)
        return d

    print(f"parity (41k, 5 iters, hcgc; pos scale {scale:.0f}):",
          flush=True)
    d_cb = stats(a, b, "row vs cb        ")
    d_ct = stats(a, c, f"row vs row+{peps:.0e}")
    r0 = np.linalg.norm(a[vm], axis=1)
    r1 = np.linalg.norm(b[vm], axis=1)
    print(f"  R: row {r0.mean():.4f}+/-{r0.std():.4f}  "
          f"cb {r1.mean():.4f}+/-{r1.std():.4f}", flush=True)
    # fit-level agreement: mean deviation within 3x the perturbation
    # control's, and the radius statistic essentially identical
    assert d_cb.mean() < max(3.0 * d_ct.mean(), 1e-3 * scale)
    assert abs(r0.mean() - r1.mean()) < 5e-4 * r0.mean()
    assert abs(r0.std() - r1.std()) < 0.05 * max(r0.std(), 1e-6)
    print("OK", flush=True)


def timing():
    ma, pts = build(8, 1_000_000)
    Vp = ma.positions.shape[0]
    Fp = ma.faces.shape[0]
    s_size = 4
    ks = 3 * s_size
    rng = np.random.default_rng(1)
    S = jnp.asarray(rng.normal(size=(Vp, ks)).astype(np.float32))
    E = jnp.asarray(rng.normal(size=(Fp, 9)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(Fp, 6)).astype(np.float32))
    rt, _, _, rcb = meshdata.fit_ring_schedules(ma)
    pair_col = {(0, 0): 0, (1, 1): 1, (2, 2): 2,
                (0, 1): 3, (0, 2): 4, (1, 2): 5}

    def row_major(S, E, W2):
        S_tri = ring_gather(S, rt).reshape(Fp, 3 * ks)
        Sc = [S_tri[:, ks * a:ks * (a + 1)].reshape(Fp, 3, s_size)
              for a in range(3)]
        Gc = sum(jnp.einsum('fik,fi->k', Sc[j], E[:, 3 * j:3 * j + 3])
                 for j in range(3))
        Hc = 0.0
        for (a, b), col in pair_col.items():
            Za = Sc[a] * W2[:, col][:, None, None]
            Hab = jnp.einsum('fik,fil->kl', Za, Sc[b])
            Hc = Hc + (Hab if a == b else Hab + Hab.T)
        return Gc, Hc

    def lane_major(S, E, W2):
        # precision='highest' matches the solver's cb branch (bf16
        # multiplies over the 10^6-long face axis lose ~1e-3 on Gc)
        Sc_t = [ring_gather(S, rcb[a], transposed_out=True)[:ks, :Fp]
                for a in range(3)]
        Gc = 0.0
        for j in range(3):
            Mj = jnp.einsum('af,fi->ai', Sc_t[j], E[:, 3 * j:3 * j + 3],
                            precision='highest')
            Gc = Gc + jnp.einsum('iki->k', Mj.reshape(3, s_size, 3))
        Hc = 0.0
        for (a, b), col in pair_col.items():
            Za_t = Sc_t[a] * W2[:, col][None, :]
            Mab = jnp.einsum('af,bf->ab', Za_t, Sc_t[b],
                             precision='highest')
            Hab = jnp.einsum('ikil->kl',
                             Mab.reshape(3, s_size, 3, s_size))
            Hc = Hc + (Hab if a == b else Hab + Hab.T)
        return Gc, Hc

    def timeit(name, fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"{name:46s} {dt:8.2f} ms", flush=True)
        return out

    g0, h0 = timeit("row-major: S_tri gather + hcgc einsums",
                    jax.jit(row_major), S, E, W2)
    g1, h1 = timeit("lane-major: cb transposed gather + matmuls",
                    jax.jit(lane_major), S, E, W2)
    print(f"Gc rel dev {np.abs(np.asarray(g0 - g1)).max() / np.abs(np.asarray(g0)).max():.2e}  "
          f"Hc rel dev {np.abs(np.asarray(h0 - h1)).max() / np.abs(np.asarray(h0)).max():.2e}",
          flush=True)


if __name__ == '__main__':
    # timing first: two small standalone jits (cheap compiles) decide
    # whether the path is worth engaging; parity needs two full-block
    # compiles (minutes each through the remote service)
    if not os.environ.get('PROBE_CB_PARITY_ONLY'):
        timing()
    if not os.environ.get('PROBE_CB_TIMING_ONLY'):
        parity()
