"""Probe: how much do in-flight device dispatches slow HOST work on
this 1-core machine?

Motivation: clean-process timings of the per-boundary host phases are
far below their in-fit measurements (from_mesh 0.054 s clean vs ~0.4 s
in-fit at the same scale; native gaussian_k 0.07 s clean vs 0.3-1.0 s
in-fit).  Hypothesis: the axon relay's transfer/dispatch machinery
burns CPU on background threads while device work is in flight,
halving(+) every host second of the fit driver.  This measures the
same host workload (a) idle, (b) with a long device program in flight,
(c) while streaming uploads.

Usage: python scripts/probe_contention.py
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
from ch_shrinkwrap_tpu import native


def host_workload(mesh, scratch):
    """A representative per-boundary host phase: spatial sort key +
    from_mesh + native K."""
    t0 = time.perf_counter()
    ma = meshdata.from_mesh(mesh, v_cap=186368, f_cap=371712,
                            quantum=1024, hilbert_faces=False,
                            lazy_tables=True, scratch=scratch)
    meshdata.fit_ring_schedules(ma)
    native.gaussian_k(np.asarray(mesh.vertices, np.float32),
                      np.asarray(mesh.faces, np.int32))
    return time.perf_counter() - t0


def main():
    v, f = icosphere(7, radius=500.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    scratch = {}
    host_workload(mesh, scratch)   # warm buffers / lib

    idle = min(host_workload(mesh, scratch) for _ in range(3))
    print(f'host phase, idle device:        {idle:6.3f} s', flush=True)

    # long-running device program (a big scanned matmul chain)
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def burn(a, n):
        def step(x, _):
            return x @ a * (1.0 / 4096.0), None
        x, _ = jax.lax.scan(step, a, None, length=n)
        return x

    # calibrate ~5+ s of device time
    t0 = time.perf_counter()
    np.asarray(burn(a, 2000)[0, :1])
    per = (time.perf_counter() - t0) / 2000
    n = max(200, int(8.0 / max(per, 1e-6)))
    print(f'burn step {per*1e3:.3f} ms -> n={n}', flush=True)

    out = burn(a, n)              # in flight
    t0 = time.perf_counter()
    busy = host_workload(mesh, scratch)
    np.asarray(out[0, :1])
    total = time.perf_counter() - t0
    print(f'host phase, device in flight:   {busy:6.3f} s '
          f'({busy/idle:.2f}x idle; burn drained at {total:.1f}s)',
          flush=True)

    # streaming uploads concurrent with host work
    bufs = [np.random.default_rng(i).integers(
        0, 1 << 20, size=(371712, 3)).astype(np.int32) for i in range(8)]
    devs = [jnp.asarray(b) for b in bufs]   # enqueue 8 x 4.5 MB
    t0 = time.perf_counter()
    busy_up = host_workload(mesh, scratch)
    for d in devs:
        np.asarray(d[:1])
    total = time.perf_counter() - t0
    print(f'host phase, uploads in flight:  {busy_up:6.3f} s '
          f'({busy_up/idle:.2f}x idle; drained at {total:.1f}s)',
          flush=True)


if __name__ == '__main__':
    main()
