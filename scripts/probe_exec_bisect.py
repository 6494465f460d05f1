"""Bisect which op class inflates TPU executable size.

curvature_grad compiles to 5.5 MB at Vp=16k (and 17 MB at 65k); the
HLO has no big literals and size is flat in scan length.  Compile its
structural pieces in isolation and census cache-entry sizes.

Usage: python scripts/probe_exec_bisect.py
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_bisect')
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
    print(f'{tag:44s} {sum(new.values())/1e6:9.3f} MB  ({dt:6.1f}s)',
          flush=True)


def main():
    Vp, K, Fp = 16384, 20, 32768
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(Vp, 3)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, Vp, size=(Vp, K), dtype=np.int32))
    faces = jnp.asarray(rng.integers(0, Vp, size=(Fp, 3), dtype=np.int32))
    nmask = jnp.asarray(rng.random((Vp, K)) < 0.3)

    # 1. the 3-D neighbor gather alone
    probe('gather (Vp,K,3) = pos[nbr]',
          lambda: jax.jit(lambda p, n: p[n])(pos, nbr))
    # 2. same, flattened 2-D
    probe('gather 2-D flat (Vp*K,3)',
          lambda: jax.jit(lambda p, n: p[n.reshape(-1)])(pos, nbr))
    # 3. gather + masked reduce over K (the pass-1 shape)
    probe('gather+masked sum over K',
          lambda: jax.jit(
              lambda p, n, m: (p[n] * m[..., None]).sum(1))(
              pos, nbr, nmask))
    # 4. segment_sum 3Fp->Vp (vertex_normals shape)
    vals = jnp.ones((3 * Fp, 3), jnp.float32)
    probe('segment_sum 3Fp->Vp',
          lambda: jax.jit(lambda v, f: jax.ops.segment_sum(
              v, f.reshape(-1), num_segments=Vp))(vals, faces))
    # 5. elementwise transcendental chain at (Vp, K)
    x = jnp.asarray(rng.random((Vp, K)).astype(np.float32))
    probe('elementwise sqrt/arctan2/exp (Vp,K)',
          lambda: jax.jit(lambda a: jnp.exp(
              -jnp.sqrt(jnp.clip(1 - a * a, 0, 1))
              * jnp.arctan2(a, 1 + a)))(x))
    # 6. big where chains at (Vp, K, 3)
    y = jnp.asarray(rng.random((Vp, K, 3)).astype(np.float32))
    probe('where chains (Vp,K,3)',
          lambda: jax.jit(lambda a, m: jnp.where(
              m[..., None], a, 0.0) * jnp.where(
              m[..., None], 2.0, 1.0))(y, nmask))
    # 7. the real vertex_normals
    from ch_shrinkwrap_tpu.ops import normals as _normals
    fm = jnp.ones((Fp,), bool)
    probe('vertex_normals (real)',
          lambda: jax.jit(lambda p, f, m: _normals.vertex_normals(
              p, f, m, Vp))(pos, faces, fm))
    # 8. real curvature pass-1+2 only (no pass 3): approximate by
    #    calling curvature_grad but taking .H (dead-code prunes pass 3?)
    from ch_shrinkwrap_tpu.ops.curvature import curvature_grad
    vm = jnp.ones((Vp,), bool)
    nbrf = jnp.asarray(rng.integers(0, Fp, size=(Vp, K), dtype=np.int32))
    probe('curvature_grad .H only',
          lambda: jax.jit(lambda *a: curvature_grad(*a).H)(
              pos, faces, fm, vm, nbr, nbrf))
    probe('curvature_grad .K only',
          lambda: jax.jit(lambda *a: curvature_grad(*a).K)(
              pos, faces, fm, vm, nbr, nbrf))
    print('cache dir:', CACHE)


if __name__ == '__main__':
    main()
