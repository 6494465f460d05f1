"""Bisect the 9.2 MB want_K=False cg_block executable by feature.

probe_exec_ops.py cleared the individual op shapes (all <= 0.84 MB;
sort 1.35 MB) — the block's megabytes must come from fused
producer+scatter clusters, the scan structure, or the Mosaic kernels'
XLA alternatives.  Compile the production block at the north-star
bucket with features toggled and size each cache entry.

Usage: python scripts/probe_exec_blockparts.py
"""
import glob
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_blockparts')
if os.environ.get('CENSUS_FRESH'):
    shutil.rmtree(CACHE, ignore_errors=True)
os.environ['JAX_COMPILATION_CACHE_DIR'] = CACHE

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

from ch_shrinkwrap_tpu.ops import correspondence as corr, meshdata
from ch_shrinkwrap_tpu.solver import prewarm
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
    print(f'{tag:56s} {sum(new.values())/1e6:9.3f} MB  ({dt:6.1f}s)',
          flush=True)


def main():
    N = 1_000_000
    v_cap, f_cap = 231424, 462848
    rng = np.random.default_rng(0)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 500.0 + rng.normal(scale=5.0, size=(N, 3))
           ).astype(np.float32)
    pts = pts[corr.fit_point_order(pts)]
    sig_inv = np.full((N, 3), 1.0 / 5.0, np.float32)
    pts_j = jnp.asarray(pts)
    sig_j = jnp.asarray(sig_inv)
    w_j = jnp.asarray(sig_inv / sig_inv.mean())
    pmask = jnp.ones(N, bool)

    (positions, faces, f_mask, v_mask, nbr_v, nbr_f,
     face_nbrs) = prewarm._dummy_block_args(v_cap, f_cap)
    ma = meshdata.MeshArrays(
        positions, v_mask, faces, f_mask, nbr_v, nbr_f, face_nbrs,
        host={'faces': np.zeros((f_cap, 3), np.int32),
              'f_mask': np.zeros(f_cap, bool),
              'nbr_v': np.full((v_cap, meshdata.NEIGHBORSIZE), -1,
                               np.int32)})
    ring_tri, ring_ncc, ring_fold, _rcb = meshdata.fit_ring_schedules(ma)

    def run(tag, **kw):
        args = dict(num_iters=5, active_iters=0, use_shrink=False,
                    face_chunk=2048, corr_method='windowed_pallas',
                    cell_size=1.0, face_nbrs=face_nbrs,
                    ring_tri=ring_tri, ring_ncc=ring_ncc,
                    ring_fold=ring_fold, nbr_f=None, want_curv_K=False,
                    face_hcgc=False)
        args.update(kw)
        probe(tag, lambda: cg_block(
            positions, faces, f_mask, v_mask, nbr_v, pts_j, sig_j,
            w_j, pmask, 2.0, 0.0, **args)[0])

    run('prod (ring on, ni=5)')
    run('ni=1', num_iters=1, active_iters=1)
    run('ring OFF (XLA gathers+segsum)', ring_tri=None, ring_ncc=None,
        ring_fold=None)
    run('corr windowed (XLA, no Mosaic corr)', corr_method='windowed')
    run('face_hcgc on', face_hcgc=True)
    print('cache dir:', CACHE)


if __name__ == '__main__':
    main()
