"""Fused AH+W2 scatter kernel vs the two separate passes: parity +
timing at the attr_inblock 656k config.

Usage: ATTR_ICO_SUB=8 python scripts/probe_ahw2.py
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
from ch_shrinkwrap_tpu.ops import meshdata, correspondence as corr
from ch_shrinkwrap_tpu.ops.pallas_gather import ring_gather
from ch_shrinkwrap_tpu.ops.pallas_scatter import (
    windowed_ah_pallas, windowed_w2_pallas, windowed_ahw2_pallas)


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
    rng = np.random.default_rng(0)
    N = int(os.environ.get('ATTR_N', 1_000_000))
    n_sub = int(os.environ.get('ATTR_ICO_SUB', 8))
    v, f = icosphere(n_sub, radius=500.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 500 + rng.normal(scale=5.0, size=d.shape)).astype(
        np.float32)
    pts = pts[corr.fit_point_order(pts)]
    points = jnp.asarray(pts)

    fpos, faces, f_mask = ma.positions, ma.faces, ma.f_mask
    Vp, Fp = fpos.shape[0], faces.shape[0]
    print(f"Vp={Vp} Fp={Fp} N={N}", flush=True)
    ring_tri = meshdata.fit_ring_schedules(ma)[0]
    tri = ring_gather(fpos, ring_tri).reshape(-1, 3, 3)
    centers = tri.mean(1)
    starts = corr.windowed_anchor_starts(points, centers, f_mask)
    dmean, fi, meta = corr.nearest_face_windowed(
        points, centers, f_mask, use_pallas=True, return_meta=True,
        starts=starts)
    fv9 = tri.reshape(-1, 9)[fi]
    fvj = [fv9[:, 3 * j:3 * j + 3] for j in range(3)]
    dvert = jnp.stack(
        [jnp.sqrt(((fj - points) ** 2).sum(-1)) for fj in fvj],
        axis=-1)
    w = 1.0 / jnp.maximum(dvert, 1e-6)
    w = w / w.sum(-1, keepdims=True)
    res = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

    ah = timeit("windowed_ah_pallas (Fp, 12)",
                jax.jit(lambda w_, r_: windowed_ah_pallas(
                    w_, r_, fi, meta.js, meta.starts, meta.sub_ids,
                    num_segments=Fp)), w, res)
    w2 = timeit("windowed_w2_pallas (Fp, 6)",
                jax.jit(lambda w_: windowed_w2_pallas(
                    w_, fi, meta.js, meta.starts, meta.sub_ids,
                    num_segments=Fp)), w)
    ahf, w2f = timeit("windowed_ahw2_pallas fused (Fp, 18)",
                      jax.jit(lambda w_, r_: windowed_ahw2_pallas(
                          w_, r_, fi, meta.js, meta.starts,
                          meta.sub_ids, num_segments=Fp)), w, res)
    ah_err = float(jnp.abs(ahf - ah).max())
    w2_err = float(jnp.abs(w2f - w2).max())
    ah_scale = float(jnp.abs(ah).max())
    w2_scale = float(jnp.abs(w2).max())
    print(f"parity: ah max|d|={ah_err:.3e} (scale {ah_scale:.1f}) "
          f"w2 max|d|={w2_err:.3e} (scale {w2_scale:.1f})")
    assert ah_err <= 1e-5 * max(ah_scale, 1.0), 'AH parity FAIL'
    assert w2_err <= 1e-5 * max(w2_scale, 1.0), 'W2 parity FAIL'
    # transposed forms
    aht, w2t = timeit("fused transposed_out",
                      jax.jit(lambda w_, r_: windowed_ahw2_pallas(
                          w_, r_, fi, meta.js, meta.starts,
                          meta.sub_ids, num_segments=Fp,
                          transposed_out=True)), w, res)
    err_t = float(jnp.abs(aht.T - ah).max()) + float(
        jnp.abs(w2t.T - w2).max())
    print(f"transposed parity max|d|={err_t:.3e}")
    print("OK")


if __name__ == '__main__':
    main()
