import os, time
import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
import numpy as np
import jax.numpy as jnp
from ch_shrinkwrap_tpu.models import MembraneMesh
from ch_shrinkwrap_tpu.mesh.marching import wrap_start

rng = np.random.default_rng(0)
R, sigma, N = 500.0, 5.0, 1_000_000
d = rng.normal(size=(N, 3)); d /= np.linalg.norm(d, axis=1)[:, None]
pts = (d * R + rng.normal(scale=sigma, size=(N, 3))).astype(np.float32)
sig = np.full((N, 3), sigma, np.float32)

t0 = time.time()
surf = wrap_start(pts, offset=25.0, grid_n=48)
t1 = time.time()
print(f"wrap_start: {t1-t0:.1f}s  V={surf.vertices.shape[0]}", flush=True)

mesh = MembraneMesh(mesh=surf, kc=1.0, step_size=20.0,
                    max_iter=20, remesh_frequency=5,
                    delaunay_remesh_frequency=0, neck_first_iter=-1)
t0 = time.time()
mesh.shrink_wrap(pts, sig, method='conjugate_gradient',
                 minimum_edge_length=5.0)
t1 = time.time()
r = np.linalg.norm(mesh.vertices, axis=1)
print(f"fit: {t1-t0:.1f}s  V={mesh.vertices.shape[0]} "
      f"R={r.mean():.2f}+/-{r.std():.2f}  "
      f"euler={mesh.euler_characteristic} manifold={mesh.is_manifold}",
      flush=True)
for rec in mesh.trace.records:
    print(rec.kind, rec.iteration, f"{rec.wall_time:.1f}s",
          f"V={rec.n_vertices}")
