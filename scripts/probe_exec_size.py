"""Probe: what sets the axon-cached TPU executable size?

The warm north-star e2e pays ~130 s loading ONE cached cg_block
executable (61 MB blob, ~0.5 MB/s effective through the relay), so blob
size is wall-clock. The .jax_cache census suggests blob size scales
with the program's ARGUMENT/BUFFER bytes, not its code (a trivial
probe scatter cached 192 MB; curvature_grad entries scale ~linearly
with the capacity bucket). This script compiles trivial programs over
a range of input sizes and prints the resulting cache-entry sizes.

Run on the TPU (axon) backend only.
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_probe')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', CACHE)
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)


def entries():
    return {p: os.path.getsize(p)
            for p in glob.glob(os.path.join(CACHE, '*'))}


def probe(tag, fn, *args):
    before = set(entries())
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    new = {p: s for p, s in entries().items() if p not in before}
    for p, s in new.items():
        print(f'{tag}: {s/1e6:8.2f} MB  ({dt:6.1f}s)  '
              f'{os.path.basename(p)[:40]}', flush=True)
    if not new:
        print(f'{tag}: no new cache entry ({dt:6.1f}s — cached?)',
              flush=True)


for n in (1_000, 100_000, 1_000_000, 10_000_000):
    x = jnp.ones((n,), jnp.float32)
    probe(f'add1_n{n}', lambda v: v + 1.0, x)

# gather: index-driven, 1M rows
import numpy as np
for n in (100_000, 1_000_000):
    src = jnp.ones((n, 8), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, n, size=(n,), dtype=np.int32))
    probe(f'gather_n{n}', lambda s, i: s[i], src, idx)

# segment_sum: scatter-shaped
for n in (100_000, 1_000_000):
    vals = jnp.ones((n, 8), jnp.float32)
    seg = jnp.asarray(np.random.default_rng(1).integers(
        0, n // 3, size=(n,), dtype=np.int32))
    probe(f'segsum_n{n}',
          lambda v, s, ns=n // 3: jax.ops.segment_sum(v, s,
                                                      num_segments=ns),
          vals, seg)

# AOT vs traced-with-data: if the service snapshots concrete argument
# buffers into the blob, compiling from abstract avals should produce a
# much smaller entry for the same program
n = 4_000_000
before = set(entries())
t0 = time.time()
aot = jax.jit(lambda v: v * 2.0 + 1.0).lower(
    jax.ShapeDtypeStruct((n,), jnp.float32)).compile()
dt = time.time() - t0
new = {p: s for p, s in entries().items() if p not in before}
for p, s in new.items():
    print(f'aot_mul_n{n}: {s/1e6:8.2f} MB  ({dt:6.1f}s)  '
          f'{os.path.basename(p)[:40]}', flush=True)
x = jnp.ones((n,), jnp.float32)
probe(f'traced_mul_n{n}', lambda v: v * 2.0 + 1.0, x)

print('cache dir:', CACHE)
print('total:', sum(entries().values()) / 1e6, 'MB')
