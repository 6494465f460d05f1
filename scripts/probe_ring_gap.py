"""Isolate the production-vs-standalone ring-gather gap at 656k:
{hilbert_faces order} x {fixed_layout} x {src staging form}.

Usage: python scripts/probe_ring_gap.py
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
from ch_shrinkwrap_tpu.ops import meshdata
from ch_shrinkwrap_tpu.ops.pallas_gather import (
    ring_gather, ring_gather_schedule)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:58s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n_sub = int(os.environ.get('ATTR_ICO_SUB', 8))
    v, f = icosphere(n_sub, radius=500.0)
    for hil in (False, True):
        mesh = TriangleMesh(v.copy(), f.copy())
        mesh.spatial_sort()
        ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=hil)
        fpos = ma.positions
        Vp = fpos.shape[0]
        faces_h = np.asarray(ma.host['faces']
                             if ma.host and 'faces' in ma.host
                             else ma.faces)
        fm = np.asarray(ma.host['f_mask']
                        if ma.host and 'f_mask' in ma.host
                        else ma.f_mask).astype(bool)
        idx = faces_h.reshape(-1).astype(np.int32)
        care = np.repeat(fm, 3)
        for fixed in (False, True):
            sched = ring_gather_schedule(
                idx, care, Vp, span=384, fixed_layout=fixed, cps=16)
            if sched is None:
                print(f"hil={hil} fixed={fixed}: over budget")
                continue
            npatch = int((np.asarray(sched.idx).reshape(-1)
                          >= -(-Vp // 128) * 128).sum())
            timeit(f"hil={int(hil)} fixed={int(fixed)} "
                   f"n_patch_cap={sched.n_patch} used={npatch}",
                   jax.jit(lambda p, s=sched: ring_gather(p, s)), fpos)


if __name__ == '__main__':
    main()
