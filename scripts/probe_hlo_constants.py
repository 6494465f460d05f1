"""Census large constants in the compiled production programs.

Cache-entry sizes scale ~linearly with the capacity bucket
(curvature_grad ~75 B/vertex; cg_block 18.8 MB at the fit bucket), and
the compile service loads executables at ~0.5 MB/s — so whatever XLA
bakes into the executable per-vertex is directly wall-clock in every
fit.  This compiles cg_block and curvature_grad at a small capacity
and prints every constant instruction in the optimized HLO above 1 KB,
aggregated by shape.

Usage: python scripts/probe_hlo_constants.py
"""
import os
import re
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.ops import meshdata, correspondence as corr
from ch_shrinkwrap_tpu.solver.shrinkwrap import cg_block

DTYPE_BYTES = {'f32': 4, 's32': 4, 'u32': 4, 'pred': 1, 'bf16': 2,
               'f16': 2, 's16': 2, 'u16': 2, 's8': 1, 'u8': 1,
               'f64': 8, 's64': 8, 'u64': 8, 'u see': 0}


def census(tag, text):
    # constant instructions look like:  %constant.5 = s32[1234,20]{...} constant(
    pat = re.compile(r'= *([a-z0-9]+)\[([0-9,]*)\][^ ]* constant\(')
    sizes = Counter()
    for m in pat.finditer(text):
        dt, shape = m.group(1), m.group(2)
        n = 1
        for d in shape.split(','):
            if d:
                n *= int(d)
        b = n * DTYPE_BYTES.get(dt, 4)
        if b >= 1024:
            sizes[f'{dt}[{shape}]'] += b
    total = sum(sizes.values())
    print(f'\n{tag}: total constant bytes >=1KB: {total/1e6:.2f} MB '
          f'(HLO text {len(text)/1e6:.1f} MB)')
    for k, v in sizes.most_common(12):
        print(f'  {v/1e6:10.3f} MB  {k}')


def main():
    N = 65536
    rng = np.random.default_rng(0)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 500.0 + rng.normal(scale=5.0, size=(N, 3))).astype(np.float32)
    pts = pts[corr.fit_point_order(pts)]
    sig = np.full((N, 3), 5.0, np.float32)

    v, f = icosphere(4, radius=550.0)      # 2562 verts
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, v_cap=16384, f_cap=32768,
                            quantum=1024, hilbert_faces=False)
    print(f'Vp={ma.positions.shape[0]} Fp={ma.faces.shape[0]} N={N}')

    args = (ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v,
            jnp.asarray(pts), jnp.asarray(1.0 / sig),
            jnp.asarray(1.0 / sig / (1.0 / sig).mean()),
            jnp.ones(N, bool), 2.0, 0.0)
    lowered = cg_block.lower(
        *args, num_iters=5, active_iters=5, use_shrink=False,
        face_chunk=2048, corr_method='windowed_pallas', cell_size=2.0,
        face_nbrs=ma.face_nbrs, nbr_f=ma.nbr_f, want_curv_K=True,
        face_hcgc=False)
    compiled = lowered.compile()
    census('cg_block@16k/32k/65k', compiled.as_text())

    from ch_shrinkwrap_tpu.ops.curvature import curvature_grad
    lowered = jax.jit(curvature_grad).lower(
        ma.positions, ma.faces, ma.f_mask, ma.v_mask, ma.nbr_v, ma.nbr_f)
    census('curvature_grad@16k/32k', lowered.compile().as_text())


if __name__ == '__main__':
    main()
