"""Empirical cost model of the sliding-ring gather kernel: sweep
window span and CHUNKS_PER_STEP at the 656k-vert tri stream to find
whether the ~13 ms/call is segment-sweep (VPU), per-chunk scalar, or
per-step overhead bound.

Usage: python scripts/probe_ring_cost.py
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
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n_sub = int(os.environ.get('ATTR_ICO_SUB', 8))
    v, f = icosphere(n_sub, radius=500.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False)
    fpos = ma.positions
    Vp = fpos.shape[0]
    faces_h = np.asarray(ma.faces)
    fm = np.asarray(ma.f_mask).astype(bool)
    idx = faces_h.reshape(-1).astype(np.int32)
    care = np.repeat(fm, 3)
    print(f"Vp={Vp} rows={idx.shape[0]}", flush=True)

    for span in (256, 384, 512, 768):
        for cps in (8, 16, 32, 64):
            t0 = time.perf_counter()
            sched = ring_gather_schedule(idx, care, Vp, span=span,
                                         cps=cps)
            bt = time.perf_counter() - t0
            if sched is None:
                print(f"span={span} cps={cps}: schedule over budget")
                continue
            npatch = int((np.asarray(sched.idx).reshape(-1) >=
                          -(-Vp // 128) * 128).sum())
            frac = npatch / idx.shape[0] * 100
            timeit(f"span={span} cps={cps} patch={frac:.1f}% "
                   f"(host build {bt:.1f}s)",
                   jax.jit(lambda p, s=sched: ring_gather(p, s)), fpos)


if __name__ == '__main__':
    main()
