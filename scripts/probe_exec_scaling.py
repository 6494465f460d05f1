"""Probe: which op makes TPU executable size scale with capacity?

probe_hlo_constants.py showed the optimized HLO has NO large literals,
yet cache entries grow ~linearly with the capacity bucket
(curvature_grad 4.9 -> 17.3 MB; cg_block 18.8 MB at the fit bucket)
and the service loads at ~0.5 MB/s.  Hypothesis: some op's TPU
backend-emitted CODE scales with row count (per-tile unrolling).
Compile curvature_grad and isolated candidate ops at several sizes
into a fresh cache and print entry sizes.

Usage: python scripts/probe_exec_scaling.py
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_scaling')
os.environ['JAX_COMPILATION_CACHE_DIR'] = CACHE

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.ops import meshdata


def entries():
    return {p: os.path.getsize(p) for p in glob.glob(
        os.path.join(CACHE, '*'))}


def probe(tag, thunk):
    before = set(entries())
    t0 = time.time()
    out = thunk()
    jax.block_until_ready(out)
    dt = time.time() - t0
    new = {p: s for p, s in entries().items() if p not in before}
    tot = sum(new.values())
    print(f'{tag:42s} {tot/1e6:9.3f} MB  ({dt:6.1f}s, '
          f'{len(new)} entries)', flush=True)


def mesh_at(sub, v_cap, f_cap):
    v, f = icosphere(sub, radius=550.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    return meshdata.from_mesh(mesh, v_cap=v_cap, f_cap=f_cap,
                              quantum=1024, hilbert_faces=False)


def main():
    from ch_shrinkwrap_tpu.ops.curvature import curvature_grad

    for sub, vc, fc in ((4, 16384, 32768), (5, 65536, 131072),
                        (6, 131072, 262144)):
        ma = mesh_at(sub, vc, fc)
        probe(f'curvature_grad Vp={vc}',
              lambda m=ma: jax.jit(curvature_grad)(
                  m.positions, m.faces, m.f_mask, m.v_mask,
                  m.nbr_v, m.nbr_f).H)

    # isolated candidates at 1M-ish rows
    rng = np.random.default_rng(0)
    for n in (131072, 1048576):
        idx = jnp.asarray(rng.integers(0, n, size=(n,), dtype=np.int32))
        src = jnp.ones((n, 8), jnp.float32)
        probe(f'segment_sum rows={n}',
              lambda s=src, i=idx, m=n: jax.jit(
                  lambda a, b: jax.ops.segment_sum(a, b, num_segments=m)
              )(s, i))
        probe(f'gather rows={n}',
              lambda s=src, i=idx: jax.jit(lambda a, b: a[b])(s, i))
        probe(f'scatter-add .at[].add rows={n}',
              lambda s=src, i=idx, m=n: jax.jit(
                  lambda a, b: jnp.zeros((m, 8), jnp.float32
                                         ).at[b].add(a))(s, i))
        probe(f'sort rows={n}',
              lambda i=idx: jax.jit(jnp.sort)(i))
        probe(f'argsort rows={n}',
              lambda i=idx: jax.jit(jnp.argsort)(i))
        probe(f'top_k k=16 rows={n}',
              lambda i=idx: jax.jit(
                  lambda a: jax.lax.top_k(a.astype(jnp.float32), 16))(i))
        probe(f'median over (n/2048,2048,3) rows={n}',
              lambda i=idx, m=n: jax.jit(
                  lambda a: jnp.median(
                      a.astype(jnp.float32).reshape(m // 2048, 2048)[
                          :, :, None] * jnp.ones(3), axis=1))(i))
        probe(f'searchsorted rows={n}',
              lambda i=idx: jax.jit(
                  lambda a: jnp.searchsorted(jnp.sort(a), a))(i))
    print('cache dir:', CACHE)


if __name__ == '__main__':
    main()
