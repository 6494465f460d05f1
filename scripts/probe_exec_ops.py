"""Per-op TPU executable-size census at the cg_block's exact shapes.

probe_exec_census.py measured the want_K=False production block at
9.18 MB (231424/462848 bucket) — ~15 s of remote-service load.  This
probe compiles each scatter/gather/einsum family standalone at the
block's shapes and sizes the cache entries, to find which op emits the
megabytes (XLA-TPU's scatter emission is strongly and non-monotonically
shape-dependent: 13.3 MB at 65k segments vs 2.7 MB at 231k —
probe_exec_barrier.py).

Usage: python scripts/probe_exec_ops.py
"""
import glob
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_ops')
if os.environ.get('CENSUS_FRESH'):
    shutil.rmtree(CACHE, ignore_errors=True)
os.environ['JAX_COMPILATION_CACHE_DIR'] = CACHE

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)


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
    Vp, Fp = 231424, 462848
    s = 3                      # n_dirs (subspace directions + 1)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(Vp, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, Vp, size=(Fp, 3), dtype=np.int32))
    fi = jnp.asarray(rng.integers(0, Fp, size=(N,), dtype=np.int32))
    w = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    res = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    S = jnp.asarray(rng.normal(size=(Vp, 3, s)).astype(np.float32))

    # 1. per-corner segsum N -> Fp (the A^T first stage, 18-col rows)
    vals18 = jnp.concatenate([res * w[:, [0]], res * w[:, [1]],
                              res * w[:, [2]],
                              res, res, res], axis=1)
    probe('segsum N->Fp 18-col',
          lambda: jax.jit(lambda v, i: jax.ops.segment_sum(
              v, i, num_segments=Fp))(vals18, fi))
    # 2. same at 7 cols (the fused vn+A^T row width)
    probe('segsum 3Fp->Vp 7-col',
          lambda: jax.jit(lambda v, i: jax.ops.segment_sum(
              v, i, num_segments=Vp))(
                  jnp.tile(res[:Fp * 3 // 2], (1, 3))[:, :7]
                  if False else jnp.zeros((3 * Fp, 7), jnp.float32),
                  faces.reshape(-1)))
    # 3. fv gather: N rows from an (Fp, 9) table
    tbl9 = jnp.zeros((Fp, 9), jnp.float32)
    probe('gather N rows from (Fp,9)',
          lambda: jax.jit(lambda t, i: t[i])(tbl9, fi))
    # 4. AS gather: N rows from (Fp, 9s)
    tbl9s = jnp.zeros((Fp, 9 * s), jnp.float32)
    probe(f'gather N rows from (Fp,{9*s})',
          lambda: jax.jit(lambda t, i: t[i])(tbl9s, fi))
    # 5. tri gather 3Fp rows from (Vp, 3)
    probe('gather 3Fp rows from (Vp,3)',
          lambda: jax.jit(lambda t, i: t[i])(pos, faces.reshape(-1)))
    # 6. Hc/Gc einsums at (N, 3, s)
    AS = jnp.zeros((N, 3, s), jnp.float32)
    probe('einsum Hc (N,3,s)x(N,3,s)',
          lambda: jax.jit(lambda a: jnp.einsum('nci,ncj->ij', a, a))(AS))
    # 7. top_k / anchor-selection pipeline scale check
    d = jnp.zeros((N,), jnp.float32)
    probe('sort N f32',
          lambda: jax.jit(jnp.sort)(d))
    print('cache dir:', CACHE)


if __name__ == '__main__':
    main()
