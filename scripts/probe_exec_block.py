"""Probe: does cg_block executable size scale with scan length?

If XLA-TPU unrolls the 5-iteration lax.scan, the whole solver body's
code is emitted 5x and the ~18.8 MB fit executable (31 s to load at
the service's ~0.6 MB/s) could shrink ~5x by running 1-iteration
programs driven from the host.

Usage: python scripts/probe_exec_block.py
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_blockprobe')
os.environ['JAX_COMPILATION_CACHE_DIR'] = CACHE

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.ops import meshdata, correspondence as corr
from ch_shrinkwrap_tpu.solver.shrinkwrap import cg_block


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
    print(f'{tag:36s} {sum(new.values())/1e6:9.3f} MB  ({dt:6.1f}s, '
          f'{len(new)} entries)', flush=True)


def main():
    N = 65536
    rng = np.random.default_rng(0)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 500.0 + rng.normal(scale=5.0, size=(N, 3))
           ).astype(np.float32)
    pts = pts[corr.fit_point_order(pts)]
    sig = np.full((N, 3), 5.0, np.float32)

    v, f = icosphere(4, radius=550.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, v_cap=16384, f_cap=32768,
                            quantum=1024, hilbert_faces=False)
    args = (ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            jnp.asarray(pts), jnp.asarray(1.0 / sig),
            jnp.asarray(1.0 / sig / (1.0 / sig).mean()),
            jnp.ones(N, bool), 2.0, 0.0)

    for ni in (1, 2, 5, 10):
        probe(f'cg_block ni={ni} Vp=16k', lambda ni=ni: cg_block(
            *args, num_iters=ni, active_iters=ni, use_shrink=False,
            face_chunk=2048, corr_method='windowed_pallas',
            cell_size=2.0, face_nbrs=ma.face_nbrs, nbr_f=ma.nbr_f,
            want_curv_K=True, face_hcgc=False)[0])
    print('cache dir:', CACHE)


if __name__ == '__main__':
    main()
