"""Probe: gather/scatter layout experiments at bench scale.

Times each variant with in-jit repetition (lax.scan over the op, carry
threads the output) so remote-dispatch overhead amortizes away.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
from jax import lax

REPS = 20


def timeit(name, build):
    fn = jax.jit(build)
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:58s} {dt:8.2f} ms/op", flush=True)


def main():
    rng = np.random.default_rng(0)
    N, Fp, Vp, s = 1_000_000, 327_680, 164_864, 3
    # roughly-sorted indices like the Hilbert fit (noisy monotone)
    base = np.linspace(0, Fp - 1, N)
    fi_np = np.clip(base + rng.normal(scale=300, size=N), 0,
                    Fp - 1).astype(np.int32)
    fi = jnp.asarray(fi_np)
    S_tri = jnp.asarray(rng.normal(size=(Fp, 3, 3, s)).astype(np.float32))
    tri = jnp.asarray(rng.normal(size=(Fp, 3, 3)).astype(np.float32))
    vals18 = jnp.asarray(rng.normal(size=(N, 18)).astype(np.float32))

    def rep(f, x0):
        def body(c, _):
            y = f(c)
            return c * 0.999, y
        _, ys = lax.scan(body, x0, None, length=REPS)
        return ys[-1]

    # --- gathers
    timeit("gather S_tri[fi] (Fp,3,3,s) 4-D",
           lambda: rep(lambda st: st[fi].sum(), S_tri * 1.0))
    S2 = S_tri.reshape(Fp, 9 * s)
    timeit("gather S2[fi] (Fp,27) 2-D",
           lambda: rep(lambda st: st[fi].sum(), S2 * 1.0))
    timeit("gather tri[fi] (Fp,3,3) 3-D",
           lambda: rep(lambda t: t[fi].sum(), tri * 1.0))
    t2 = tri.reshape(Fp, 9)
    timeit("gather tri2[fi] (Fp,9) 2-D",
           lambda: rep(lambda t: t[fi].sum(), t2 * 1.0))

    # --- scatters
    timeit("segment_sum (N,18) by fi -> (Fp,18)",
           lambda: rep(lambda v: jax.ops.segment_sum(
               v, fi, num_segments=Fp).sum(), vals18 * 1.0))
    timeit("segment_sum (N,18) by sorted fi (indices_are_sorted)",
           lambda: rep(lambda v: jax.ops.segment_sum(
               v, jnp.sort(fi), num_segments=Fp,
               indices_are_sorted=True).sum(), vals18 * 1.0))
    v6 = vals18[:, :6]
    timeit("segment_sum (N,6) by fi -> (Fp,6)",
           lambda: rep(lambda v: jax.ops.segment_sum(
               v, fi, num_segments=Fp).sum(), v6 * 1.0))
    # direct 3N-row scatter to Vp (the pre-restructure form)
    vidx = jnp.asarray(
        rng.integers(0, Vp, size=(N * 3,)).astype(np.int32))
    v6b = jnp.asarray(rng.normal(size=(N * 3, 6)).astype(np.float32))
    timeit("segment_sum (3N,6) random idx -> (Vp,6)",
           lambda: rep(lambda v: jax.ops.segment_sum(
               v, vidx, num_segments=Vp).sum(), v6b * 1.0))


if __name__ == '__main__':
    main()
