"""Compile cg_block at candidate capacities; report executable sizes.

Maps the XLA-TPU emission pathology band (BASELINE.md round 4):
v_cap 93184-114688 emit 38-44 MB executables vs ~8 MB at >= 131072,
and the 131072 program also RUNS 19% slower than 186368 (see
NOTES_ROUND4.md fact 11).  The 'two'-mode mid-rung clamp in
models/membrane_mesh.py is derived from this probe."""
import os, sys, glob, time
sys.path.insert(0, '/root/repo')
_CACHE = '/root/repo/.jax_cache_probe'
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', _CACHE)
import jax
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
import numpy as np
from ch_shrinkwrap_tpu.solver import prewarm
from ch_shrinkwrap_tpu.ops import meshdata

N = 1_000_000
for v_cap in [93184, 102400, 114688, 131072, 147456, 163840]:
    f_cap = meshdata.round_up_bucket(2 * v_cap - 4, 1024)
    before = set(glob.glob(_CACHE + '/*'))
    t0 = time.time()
    prewarm.prewarm_buckets([(v_cap, f_cap)], N, 2.0, 0.0, 5, False,
                            2048, 'windowed_pallas', 1.0, -1.0, 0.0,
                            skip_first_block=False, initial_wait=0.0,
                            warm_curvature=False)
    new = set(glob.glob(_CACHE + '/*')) - before
    sizes = {os.path.basename(f)[:20]: os.path.getsize(f) for f in new}
    tot = sum(sizes.values())
    print(f'v_cap {v_cap}: {tot/1e6:.1f} MB new cache, {time.time()-t0:.0f}s',
          flush=True)
