"""Steady-state SPMD-wrapping overhead of the production
windowed-Pallas cg_block under shard_map on a REAL-chip 1-device
mesh (VERDICT r4 next #3): reused jitted callable, warm best-of-5
vs the plain (non-SPMD) block on the same chip.  Run on TPU.
"""
import os, time, sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache'))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', os.environ['JAX_COMPILATION_CACHE_DIR'])
from functools import partial
from jax.sharding import NamedSharding, PartitionSpec as P
from ch_shrinkwrap_tpu.parallel.sharding import make_device_mesh, shard_points, replicate
from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
from ch_shrinkwrap_tpu.mesh.primitives import icosphere
from ch_shrinkwrap_tpu.ops import meshdata
from ch_shrinkwrap_tpu.solver.shrinkwrap import cg_block
from ch_shrinkwrap_tpu.ops.correspondence import fit_point_order

rng = np.random.default_rng(7)
n = 65536
d = rng.normal(size=(n,3)); d /= np.linalg.norm(d,axis=1)[:,None]
pts = (d*50 + rng.normal(scale=3, size=(n,3))).astype(np.float32)
sigma_inv = np.full((n,3), 1/3, np.float32); weights = sigma_inv / sigma_inv.mean()
v,f = icosphere(2, radius=60.0)
ma = meshdata.from_mesh(TriangleMesh(v,f), quantum=256)
order = fit_point_order(pts)
pts, sigma_inv, weights = pts[order], sigma_inv[order], weights[order]
mesh = make_device_mesh(1)
p,s,w,m = shard_points(mesh, pts, sigma_inv, weights)
positions, v_mask, faces, f_mask, nbr_v = replicate(mesh, ma.positions, ma.v_mask, ma.faces, ma.f_mask, ma.nbr_v)
rep = NamedSharding(mesh, P())
fn = jax.jit(partial(cg_block, num_iters=3, use_shrink=False, face_chunk=256,
                     corr_method='windowed_pallas', pallas_interpret=False,
                     spmd_mesh=mesh, face_nbrs=ma.face_nbrs), out_shardings=rep)
for tag, callee in [('sharded', lambda: fn(positions, faces, f_mask, v_mask, nbr_v, p, s, w, m, jnp.float32(2.0), jnp.float32(0.0))),
                    ('plain', None)]:
    if tag == 'plain':
        n_pad = p.shape[0]
        pp = np.zeros((n_pad,3),np.float32); pp[:n]=pts
        sp = np.ones((n_pad,3),np.float32); sp[:n]=sigma_inv
        wp = np.zeros((n_pad,3),np.float32); wp[:n]=weights
        mk = np.zeros(n_pad,bool); mk[:n]=True
        pp,sp,wp,mk = map(jnp.asarray,(pp,sp,wp,mk))
        callee = lambda: cg_block(positions, faces, f_mask, v_mask, nbr_v, pp, sp, wp, mk, jnp.float32(2.0), jnp.float32(0.0), num_iters=3, face_chunk=256, corr_method='windowed_pallas', face_nbrs=ma.face_nbrs)
    out = callee(); out[0].block_until_ready()  # compile
    ts = []
    for _ in range(5):
        t0=time.time(); o = callee(); o[0].block_until_ready(); ts.append(time.time()-t0)
    print(f"{tag}: warm best {min(ts)*1e3:.1f} ms, med {sorted(ts)[2]*1e3:.1f} ms")
os._exit(0)
