"""Census TPU executable sizes for the production cg_block program.

The warm north-star e2e pays ~31 s loading the first cg_block
executable through the remote compile service (~0.6 MB/s effective,
BASELINE.md).  This probe compiles the EXACT production programs
(via solver.prewarm, the same call site the fit driver uses) into a
fresh persistent-cache dir and attributes blob bytes to: the block
with/without the folded curvature diagnostic, the standalone
curvature program, and the smaller ladder rungs (to cost a bucketed
fit's total load bill).

Usage: python scripts/probe_exec_census.py
"""
import glob
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_census')
if os.environ.get('CENSUS_FRESH'):
    shutil.rmtree(CACHE, ignore_errors=True)
os.environ['JAX_COMPILATION_CACHE_DIR'] = CACHE

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

from ch_shrinkwrap_tpu.solver import prewarm
from ch_shrinkwrap_tpu.ops import correspondence as corr


def entries():
    return {p: os.path.getsize(p) for p in glob.glob(
        os.path.join(CACHE, '*'))}


def probe(tag, thunk):
    before = entries()
    t0 = time.time()
    thunk()
    dt = time.time() - t0
    new = {p: s for p, s in entries().items() if p not in before}
    for p, s in sorted(new.items(), key=lambda kv: -kv[1]):
        print(f'    {s/1e6:8.2f} MB  {os.path.basename(p)[:56]}')
    print(f'{tag:52s} {sum(new.values())/1e6:9.2f} MB  ({dt:6.1f}s, '
          f'{len(new)} entries)', flush=True)


def main():
    N = 1_000_000
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

    def run(v_cap, f_cap, want_K):
        prewarm.prewarm_buckets(
            [(v_cap, f_cap)], pts_j, sig_j, w_j, pmask,
            10.0, 0.0, 5, False, 2048, 'windowed_pallas',
            1.0, 0.0, 0.0, skip_first_block=False,
            want_curv_K=want_K, uniform_weights=True)

    # production north-star bucket first (the 31 s load)
    probe('block+curv (231424,462848) want_K=True',
          lambda: run(231424, 462848, True))
    probe('block+curv (231424,462848) want_K=False',
          lambda: run(231424, 462848, False))
    # ladder rungs a bucketed fit would load
    for v_cap, f_cap in ((16384, 32768), (32768, 65536),
                         (65536, 131072), (131072, 262144)):
        probe(f'block+curv ({v_cap},{f_cap}) want_K=True',
              lambda v=v_cap, f=f_cap: run(v, f, True))
    print('cache dir:', CACHE)


if __name__ == '__main__':
    main()
