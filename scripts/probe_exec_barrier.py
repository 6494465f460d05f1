"""Probe: does an optimization_barrier before segment_sum stop XLA
from emitting megabytes of fused scatter code?

probe_exec_bisect.py: plain segment_sum = 0.48 MB, but vertex_normals
(corner math fused into the scatter) = 3.2 MB / 19 s compile.  If a
barrier between producer and scatter restores the small emission
without hurting runtime, every scatter/gather producer in the hot path
can be fenced, shrinking the 18.8 MB cg_block executable that costs
31 s to load per fit.

Usage: python scripts/probe_exec_barrier.py
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_barrier')
os.environ['JAX_COMPILATION_CACHE_DIR'] = CACHE

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

from ch_shrinkwrap_tpu.ops import normals as _normals


def entries():
    return {p: os.path.getsize(p) for p in glob.glob(
        os.path.join(CACHE, '*'))}


def probe(tag, thunk, time_it=False):
    before = set(entries())
    t0 = time.time()
    out = thunk()
    jax.block_until_ready(out)
    dt = time.time() - t0
    new = {p: s for p, s in entries().items() if p not in before}
    msg = f'{tag:46s} {sum(new.values())/1e6:9.3f} MB  ({dt:6.1f}s)'
    if time_it:
        t0 = time.time()
        for _ in range(5):
            out = thunk()
        jax.block_until_ready(out)
        msg += f'  steady {(time.time()-t0)/5*1000:7.1f} ms'
    print(msg, flush=True)


def vn_plain(p, f, m, Vp):
    return _normals.vertex_normals(p, f, m, Vp)


def vn_barrier(p, f, m, Vp):
    corners = _normals.vertex_normal_corners(p, f, m)
    corners = jax.lax.optimization_barrier(corners)
    vn = jax.ops.segment_sum(corners.reshape(-1, 3), f.reshape(-1),
                             num_segments=Vp)
    return _normals.normalize_vertex_normals(vn)


def main():
    for Vp, Fp in ((16384, 32768), (65536, 131072), (231424, 462848)):
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.normal(size=(Vp, 3)).astype(np.float32))
        faces = jnp.asarray(rng.integers(0, Vp, size=(Fp, 3),
                                         dtype=np.int32))
        fm = jnp.ones((Fp,), bool)
        probe(f'vertex_normals plain Vp={Vp}',
              lambda: jax.jit(vn_plain, static_argnums=3)(
                  pos, faces, fm, Vp), time_it=True)
        probe(f'vertex_normals barrier Vp={Vp}',
              lambda: jax.jit(vn_barrier, static_argnums=3)(
                  pos, faces, fm, Vp), time_it=True)
    print('cache dir:', CACHE)


if __name__ == '__main__':
    main()
