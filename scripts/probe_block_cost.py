"""Probe: decompose the in-fit cg_block cost at the north-star fit's
exact padded shapes.

The warm 99-iter e2e spends ~55 s of device time across 94 active
iterations (~0.25-0.5 s per active iteration), while bench.py measures
0.094 s/iter at 164k padded verts.  Candidate explanations: the fit's
larger padded capacity (231424 verts / 462848 faces), the per-block
curvature-K diagnostic (want_curv_K=True on every block), per-block
fixed costs (anchor selection, frozen-branch scan overhead), or relay
noise.  This script times the EXACT in-fit program (same call shapes,
same cache dir) at active_iters in {5, 1} and want_curv_K in
{True, False} to attribute the gap.

Usage: python scripts/probe_block_cost.py
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
from ch_shrinkwrap_tpu.solver.shrinkwrap import block_call

V_CAP = int(os.environ.get('PROBE_V_CAP', 231424))
F_CAP = int(os.environ.get('PROBE_F_CAP', 462848))
N = int(os.environ.get('PROBE_N', 1_000_000))


def build():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 500.0 + rng.normal(scale=5.0, size=(N, 3))).astype(np.float32)
    order = corr.fit_point_order(pts)
    pts = pts[order]
    sig = np.full((N, 3), 5.0, np.float32)
    sigma_inv = 1.0 / sig
    weights = sigma_inv / sigma_inv.mean()

    v, f = icosphere(7, radius=550.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, v_cap=V_CAP, f_cap=F_CAP,
                            quantum=1024, hilbert_faces=False)
    print(f'padded: Vp={ma.positions.shape[0]} Fp={ma.faces.shape[0]}',
          flush=True)
    return ma, jnp.asarray(pts), jnp.asarray(sigma_inv), \
        jnp.asarray(weights), jnp.ones(N, bool)


def timeit(tag, fn, n=4):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out[0])
    print(f'{tag}: first call {time.time()-t0:7.2f}s '
          f'(compile/load if cold)', flush=True)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out[0]))
    dt = (time.time() - t0) / n
    print(f'{tag}: steady {dt:7.3f} s/call', flush=True)
    return dt


def ring_scheds(ma):
    # the production (capacity-constant) schedule triple
    return meshdata.fit_ring_schedules(ma)


def main():
    ma, pts_j, sig_j, w_j, pm = build()
    rt, rn, rf, rcb = (None, None, None, None)
    if os.environ.get('PROBE_VARIANTS', '1') == '1':
        rt, rn, rf, rcb = ring_scheds(ma)

    def block(active, want_K, ring=False, hcgc=False):
        return block_call(
            ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            pts_j, sig_j, w_j, pm, 2.0, 0.0,
            num_iters=5, active_iters=active,
            use_shrink=False, face_chunk=2048,
            corr_method='windowed_pallas', cell_size=2.0,
            face_nbrs=ma.face_nbrs,
            ring_tri=rt if ring else None,
            ring_ncc=rn if ring else None,
            ring_fold=rf if ring else None,
            ring_tri_cb=rcb if (ring and hcgc) else None,
            nbr_f=ma.nbr_f if want_K else None,
            want_curv_K=want_K, face_hcgc=hcgc)

    if rt is not None:
        # the e2e's exact program (ring schedules active above 32k
        # verts, hcgc off below 300k, want_K on): time it FIRST —
        # cache-warm if the e2e ran at these caps
        t5r = timeit('FIT active=5 ring want_K', lambda: block(5, True, ring=True))
        t1r = timeit('FIT active=1 ring want_K', lambda: block(1, True, ring=True))
        print(f'FIT per-iteration (marginal): {(t5r-t1r)/4*1000:8.1f} ms',
              flush=True)
        t5rn = timeit('    active=5 ring no-K  ', lambda: block(5, False, ring=True))
        t1rn = timeit('    active=1 ring no-K  ', lambda: block(1, False, ring=True))
        print(f'    per-iteration (no K):     {(t5rn-t1rn)/4*1000:8.1f} ms')
        print(f'    fixed per block:          '
              f'{(t1rn-(t5rn-t1rn)/4)*1000:8.1f} ms')
        print(f'    curvature-K per block:    '
              f'{((t5r-t5rn)+(t1r-t1rn))/2*1000:8.1f} ms', flush=True)
        if os.environ.get('PROBE_FIT_ONLY'):
            return

    t5k = timeit('active=5 want_K=True ', lambda: block(5, True))
    t1k = timeit('active=1 want_K=True ', lambda: block(1, True))
    t5 = timeit('active=5 want_K=False', lambda: block(5, False))
    t1 = timeit('active=1 want_K=False', lambda: block(1, False))

    per_iter = (t5 - t1) / 4.0
    fixed = t1 - per_iter
    curv = ((t5k - t5) + (t1k - t1)) / 2.0
    print(f'\nper-iteration (marginal): {per_iter*1000:8.1f} ms')
    print(f'fixed per block (anchors, scan setup, 1st iter extra): '
          f'{fixed*1000:8.1f} ms')
    print(f'curvature-K per block:    {curv*1000:8.1f} ms', flush=True)

    if os.environ.get('PROBE_VARIANTS', '1') == '1':
        # variants: ring kernels below their 300k gate; face-side
        # normal equations (weights here are uniform, so valid)
        for tag, kw in (('ring       ', dict(ring=True)),
                        ('ring+hcgc  ', dict(ring=True, hcgc=True)),
                        ('hcgc       ', dict(hcgc=True))):
            t5v = timeit(f'{tag} active=5', lambda: block(5, True, **kw))
            t1v = timeit(f'{tag} active=1', lambda: block(1, True, **kw))
            print(f'{tag}: per-iter {(t5v-t1v)/4*1000:8.1f} ms',
                  flush=True)


if __name__ == '__main__':
    main()
