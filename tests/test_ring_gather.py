"""Sliding-ring Mosaic gather kernel: schedule correctness tests.

The Mosaic kernel uses dynamic-length DMA descriptors, which Pallas
interpret mode cannot discharge — so on the CPU test image the kernel
semantics are checked against a numpy EMULATOR that replays exactly
what the kernel does (ring fills from the host descriptors, per-chunk
segment selects, patch ring, prefetch-overwrite hazard included).  The
real-TPU path of the same schedule was verified bit-exact at 656k
vertices (BASELINE.md) and is exercised by every bench run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ch_shrinkwrap_tpu.ops import pallas_gather as pg
from ch_shrinkwrap_tpu.ops.pallas_gather import (
    ring_gather_schedule, RingGatherSchedule)


def emulate_ring_gather(src, sched):
    """Numpy replay of _gather_kernel + the wrapper's fixup: returns
    the exact array the kernel would produce."""
    R = sched.n_rows
    Vp, C = src.shape
    Vp_al = -(-Vp // 128) * 128
    Rp = sched.n_steps * pg.STEP_ROWS

    src_t = np.zeros((Vp_al + sched.n_patch, C), np.float32)
    src_t[:Vp] = src
    targets = np.asarray(sched.targets)
    src_t[Vp_al:Vp_al + len(targets)] = src[targets]

    bases = np.asarray(sched.bases)
    pbases = np.asarray(sched.pbases)
    dmas = np.asarray(sched.dmas).reshape(sched.n_steps, 8)
    idx = np.asarray(sched.idx).reshape(-1)

    ring = np.zeros((pg.RING_LANES, C), np.float32)
    pring = np.zeros((pg.PATCH_LANES, C), np.float32)
    out = np.zeros((Rp, C), np.float32)

    def fill(dst, dsegs, s, ln, sbase):
        for k in range(ln):
            seg = s + k
            dst[((seg % dsegs) * 128):((seg % dsegs) + 1) * 128] = \
                src_t[(sbase + seg) * 128:(sbase + seg + 1) * 128]

    def apply_dmas(t):
        d = dmas[t]
        fill(ring, pg.RING_SEGS, d[0], d[1], 0)
        fill(ring, pg.RING_SEGS, d[2], d[3], 0)
        fill(pring, pg.PATCH_SEGS, d[4], d[5], Vp_al // 128)
        fill(pring, pg.PATCH_SEGS, d[6], d[7], Vp_al // 128)

    apply_dmas(0)
    for i in range(sched.n_steps):
        # the kernel prefetches step i+1's fills DURING step i's
        # compute; emulate the hazard by applying them BEFORE compute
        if i + 1 < sched.n_steps:
            apply_dmas(i + 1)
        for c in range(pg.CHUNKS_PER_STEP):
            gc = i * pg.CHUNKS_PER_STEP + c
            base = bases[gc]
            pbase = pbases[gc]
            rows = idx[gc * 128:(gc + 1) * 128]
            acc = np.zeros((128, C), np.float32)
            off = rows - base
            for s in range(sched.span // 128):
                seg = (base // 128 + s) % pg.RING_SEGS
                xs = ring[seg * 128:(seg + 1) * 128]
                loc = np.clip(off - s * 128, 0, 127)
                sel = (off >= s * 128) & (off < (s + 1) * 128)
                acc[sel] = xs[loc[sel]]
            poff = rows - (Vp_al + pbase)
            for s in range(pg.PATCH_CHUNK_SEGS):
                seg = (pbase // 128 + s) % pg.PATCH_SEGS
                xs = pring[seg * 128:(seg + 1) * 128]
                loc = np.clip(poff - s * 128, 0, 127)
                sel = (poff >= s * 128) & (poff < (s + 1) * 128)
                acc[sel] = xs[loc[sel]]
            out[gc * 128:(gc + 1) * 128] = acc

    res = out[:R]
    if sched.uncov is not None:
        uncov = np.asarray(sched.uncov)
        ok = uncov >= 0
        res[uncov[ok]] = src[idx[uncov[ok]]]
    return res


def hilbertish_indices(rng, n_src, n_rows, jump_p=0.03, noise=150):
    """Monotone walk + local noise + occasional far jumps — the shape
    of Hilbert-sorted mesh index arrays."""
    walk = np.sort(rng.integers(0, n_src, size=n_rows))
    idx = np.clip(walk + rng.integers(-noise, noise, size=n_rows),
                  0, n_src - 1)
    jumps = rng.random(n_rows) < jump_p
    idx[jumps] = rng.integers(0, n_src, size=int(jumps.sum()))
    return idx


@pytest.mark.parametrize('n_src,n_rows,cols,jump_p', [
    (20_000, 120_000, 8, 0.03),
    (20_000, 120_000, 12, 0.03),
    (9_001, 40_000, 3, 0.1),       # unaligned table size, heavy jumps
])
def test_ring_gather_schedule_exact(n_src, n_rows, cols, jump_p):
    rng = np.random.default_rng(42)
    src = rng.normal(size=(n_src, cols)).astype(np.float32)
    idx = hilbertish_indices(rng, n_src, n_rows, jump_p=jump_p)
    care = rng.random(n_rows) < 0.9

    sched = ring_gather_schedule(idx, care, n_src)
    assert isinstance(sched, RingGatherSchedule)
    out = emulate_ring_gather(src, sched)
    ref = src[idx]
    np.testing.assert_array_equal(out[care], ref[care])


def test_ring_gather_patch_region_routing():
    """Far jumps must flow through the patch region, not the (slow)
    XLA fixup scatter."""
    rng = np.random.default_rng(0)
    n_src, n_rows = 30_000, 90_000
    idx = hilbertish_indices(rng, n_src, n_rows, jump_p=0.05)
    care = np.ones(n_rows, bool)
    sched = ring_gather_schedule(idx, care, n_src)
    assert sched is not None
    Vp_al = -(-n_src // 128) * 128
    n_patched = int((np.asarray(sched.idx).reshape(-1)[:n_rows]
                     >= Vp_al).sum())
    assert n_patched > 0
    assert sched.uncov is None        # no XLA-scatter fallback needed

    src = rng.normal(size=(n_src, 8)).astype(np.float32)
    out = emulate_ring_gather(src, sched)
    np.testing.assert_array_equal(out, src[idx])


def test_ring_gather_schedule_refuses_random():
    """Uniform-random indices can't be banded — the schedule must
    refuse (caller falls back to the XLA gather) rather than stage a
    giant patch region."""
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 500_000, size=200_000)
    care = np.ones(len(idx), bool)
    assert ring_gather_schedule(idx, care, 500_000) is None


def test_ring_gather_real_mesh_pattern():
    """The exact faces-table pattern the solver routes through the
    kernel, on a real (small) spatially-sorted mesh."""
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    from ch_shrinkwrap_tpu.ops import meshdata

    v, f = icosphere(4, radius=100.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False)
    faces = np.asarray(ma.faces)
    fmask = np.asarray(ma.f_mask)
    Vp = ma.positions.shape[0]

    sched = ring_gather_schedule(faces.reshape(-1),
                                 np.repeat(fmask, 3), Vp)
    assert sched is not None
    src = np.asarray(ma.positions)
    out = emulate_ring_gather(src, sched)
    ref = src[faces.reshape(-1)]
    care = np.repeat(fmask, 3)
    np.testing.assert_array_equal(out[care], ref[care])


@pytest.mark.skipif(
    jnp.zeros(1).devices().pop().platform not in ('tpu', 'axon'),
    reason='Mosaic kernel needs real TPU (dynamic-length DMA has no '
           'interpret-mode lowering); schedule logic covered above')
def test_ring_gather_kernel_on_tpu():
    rng = np.random.default_rng(42)
    src = rng.normal(size=(20_000, 8)).astype(np.float32)
    idx = hilbertish_indices(rng, 20_000, 120_000)
    care = rng.random(120_000) < 0.9
    sched = ring_gather_schedule(idx, care, 20_000)
    from ch_shrinkwrap_tpu.ops.pallas_gather import ring_gather
    out = np.asarray(ring_gather(jnp.asarray(src), sched))
    np.testing.assert_array_equal(out[care], src[idx][care])


def test_incidence_fold_equivalence():
    """faces->verts fold via incidence ring-gather + masked sum must
    equal the plain segment_sum (the solver's ring_fold path)."""
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    from ch_shrinkwrap_tpu.ops import meshdata

    v, f = icosphere(4, radius=100.0)
    mesh = TriangleMesh(v, f)
    mesh.spatial_sort()
    ma = meshdata.from_mesh(mesh, quantum=1024, hilbert_faces=False)
    faces = np.asarray(ma.faces)
    fmask = np.asarray(ma.f_mask)
    Vp = ma.positions.shape[0]
    Fp = faces.shape[0]

    rng = np.random.default_rng(0)
    fused = (rng.normal(size=(Fp * 3, 7)).astype(np.float32)
             * np.repeat(fmask, 3)[:, None])

    inc, ov_r, ov_v = meshdata.incidence_table(faces, fmask, Vp, K=8)
    # force some overflow coverage too
    inc5, ov_r5, ov_v5 = meshdata.incidence_table(faces, fmask, Vp, K=5)
    assert len(ov_r5) > 0

    for K, (i_, orow, over) in [(8, (inc, ov_r, ov_v)),
                                (5, (inc5, ov_r5, ov_v5))]:
        sched = ring_gather_schedule(np.clip(i_, 0, None).reshape(-1),
                                     (i_ >= 0).reshape(-1), Fp * 3)
        assert sched is not None
        vg = emulate_ring_gather(fused, sched).reshape(Vp, K, 7)
        out = (vg * (i_ >= 0)[..., None]).sum(1)
        if len(orow):
            np.add.at(out, over, fused[orow])
        ref = np.zeros((Vp, 7), np.float32)
        np.add.at(ref, faces.reshape(-1), fused)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
