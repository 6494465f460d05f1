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


def test_fixed_layout_statics_capacity_constant():
    """fixed_layout=True: every static field of the schedule (the jit
    cache key) must depend on the CAPACITY alone, not the data — the
    fit driver relies on this to keep ONE compiled solver program
    across remesh boundaries (membrane_mesh.py ring gating)."""
    rng = np.random.default_rng(7)
    n_src, n_rows = 30_000, 90_000
    scheds = []
    for seed, jp in ((1, 0.01), (2, 0.05), (3, 0.0)):
        r = np.random.default_rng(seed)
        idx = hilbertish_indices(r, n_src, n_rows, jump_p=jp)
        care = r.random(n_rows) < 0.9
        s = ring_gather_schedule(idx, care, n_src, fixed_layout=True)
        assert s is not None
        scheds.append(s)
    key0 = (scheds[0].n_steps, scheds[0].n_patch, scheds[0].span,
            scheds[0].n_rows)
    for s in scheds[1:]:
        key = (s.n_steps, s.n_patch, s.span, s.n_rows)
        assert key == key0
    # uncov: None when the data has no uncovered rows (the program
    # then carries no fixup op — the transposed-output fixup costs a
    # full-buffer copy), else the fixed 2048-wide -1-padded array
    for s in scheds:
        assert s.uncov is None or s.uncov.shape == (2048,)

    # and the gather stays exact through the fixed-size patch region
    src = rng.normal(size=(n_src, 8)).astype(np.float32)
    idx = hilbertish_indices(rng, n_src, n_rows, jump_p=0.05)
    care = np.ones(n_rows, bool)
    s = ring_gather_schedule(idx, care, n_src, fixed_layout=True)
    out = emulate_ring_gather(src, s)
    np.testing.assert_array_equal(out, src[idx])


def test_fit_ring_schedules_topology_invariant_statics():
    """meshdata.fit_ring_schedules: two different topologies padded to
    the same capacity must produce schedule triples with identical
    static layout (so cg_block compiles once per capacity bucket)."""
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    from ch_shrinkwrap_tpu.ops import meshdata

    def statics(ma):
        rt, rn, rf, _rcb = meshdata.fit_ring_schedules(ma)
        assert rt is not None
        rn, ncc_ov_v, ncc_ov_u = rn     # ncc: (schedule, overflow pair lists)
        f_sched, inc_mask, ov_rows, ov_verts = rf

        def ush(s):
            return None if s.uncov is None else s.uncov.shape
        return ((rt.n_steps, rt.n_patch, rt.n_rows, ush(rt)),
                (rn.n_steps, rn.n_patch, rn.n_rows, ush(rn),
                 rn.kmaj_block, ncc_ov_v.shape, ncc_ov_u.shape),
                (f_sched.n_steps, f_sched.n_patch, f_sched.n_rows,
                 ush(f_sched)),
                inc_mask.shape, ov_rows.shape, ov_verts.shape)

    v1, f1 = icosphere(3, radius=100.0)
    m1 = TriangleMesh(v1, f1)
    m1.spatial_sort()
    # a different topology: remesh to a coarser target
    from ch_shrinkwrap_tpu.mesh.remesh import remesh
    v2, f2 = icosphere(3, radius=100.0)
    m2 = TriangleMesh(v2, f2)
    remesh(m2, n=2, target_edge_length=25.0)
    m2.spatial_sort()
    a = statics(meshdata.from_mesh(m1, v_cap=4096, f_cap=8192,
                                   quantum=1024, hilbert_faces=False))
    b = statics(meshdata.from_mesh(m2, v_cap=4096, f_cap=8192,
                                   quantum=1024, hilbert_faces=False))
    assert a == b


def test_fixed_layout_fold_with_padded_overflow():
    """The solver's ring_fold overflow path with fixed-width -1-padded
    lists must reproduce the exact segment_sum fold."""
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

    # K=5 forces real overflow rows; pad them fixed-width like
    # fit_ring_schedules does
    inc, ov_r, ov_v = meshdata.incidence_table(faces, fmask, Vp, K=5)
    assert len(ov_r) > 0
    ov_cap = -(-len(ov_r) // 1024) * 1024 + 1024   # real + padding tail
    ov_rows = np.full(ov_cap, -1, np.int32)
    ov_rows[:len(ov_r)] = ov_r
    ov_verts = np.zeros(ov_cap, np.int32)
    ov_verts[:len(ov_v)] = ov_v

    sched = ring_gather_schedule(np.clip(inc, 0, None).reshape(-1),
                                 (inc >= 0).reshape(-1), Fp * 3,
                                 fixed_layout=True)
    vg = emulate_ring_gather(fused, sched).reshape(Vp, 5, 7)
    out = (vg * (inc >= 0)[..., None]).sum(1)
    # the solver's masked overflow add (solver/shrinkwrap.py ring_fold)
    ovm = ov_rows >= 0
    vals = fused[np.clip(ov_rows, 0, fused.shape[0] - 1)] * ovm[:, None]
    np.add.at(out, np.where(ovm, ov_verts, 0),
              np.where(ovm[:, None], vals, 0.0))
    ref = np.zeros((Vp, 7), np.float32)
    np.add.at(ref, faces.reshape(-1), fused)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def _outlier_kmajor_stream(seed=7, n_src=50_000, n_rows=200_000):
    """Monotone walk with injected care-sparse outlier chunks: every
    40th chunk keeps only 3 care rows whose targets sit ~30k rows
    ahead — the shape of high-k neighbor slots on surgered fit meshes
    (the j=65 north-star topology, debug_out/ob_Vp186368_j65.npz) that
    used to blow the fixed patch budget through prefetch-head drag."""
    rng = np.random.default_rng(seed)
    walk = np.sort(rng.integers(0, n_src, size=n_rows))
    idx = np.clip(walk + rng.integers(-150, 150, size=n_rows),
                  0, n_src - 1)
    care = np.ones(n_rows, bool)
    for c in range(0, n_rows // 128, 40):
        care[c * 128:(c + 1) * 128] = False
        pick = rng.integers(c * 128, (c + 1) * 128, size=3)
        care[pick] = True
        idx[pick] = np.clip(idx[pick] + 30_000, 0, n_src - 1)
    return idx, care


def test_ring_schedule_outlier_chunks_stay_in_budget():
    """Care-sparse far-ahead chunks must cost only their own patch
    rows (anchor-clamped bases), not strip ring residency from every
    trailing chunk — pre-clamp this stream lost 131k of 200k rows to
    residency and the fixed-layout schedule refused."""
    idx, care = _outlier_kmajor_stream()
    sched = ring_gather_schedule(idx, care, 50_000, fixed_layout=True)
    assert sched is not None
    rng = np.random.default_rng(3)
    src = rng.normal(size=(50_000, 8)).astype(np.float32)
    out = emulate_ring_gather(src, sched)
    np.testing.assert_array_equal(out[care], src[idx][care])


def test_ring_schedule_native_matches_numpy():
    """The native one-pass schedule builder must reproduce the numpy
    formulation field-for-field (both fixed-layout)."""
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('native engine unavailable')
    import ch_shrinkwrap_tpu.ops.pallas_gather as pg

    cases = []
    for seed, n_src, n_rows, jp in ((0, 30_000, 90_000, 0.03),
                                    (1, 9_001, 40_000, 0.1),
                                    (2, 50_000, 200_000, 0.0)):
        rng = np.random.default_rng(seed)
        idx = hilbertish_indices(rng, n_src, n_rows, jump_p=jp)
        care = rng.random(n_rows) < 0.9
        cases.append((idx, care, n_src))
    # anchor-clamp path: outlier chunks exercise pass 1b in both
    idx, care = _outlier_kmajor_stream()
    cases.append((idx, care, 50_000))
    for idx, care, n_src in cases:
        s_nat = ring_gather_schedule(idx, care, n_src,
                                     fixed_layout=True)
        # force the numpy path by hiding the native lib
        lib_save = native._lib
        native._lib = False
        try:
            s_np = ring_gather_schedule(idx, care, n_src,
                                        fixed_layout=True)
        finally:
            native._lib = lib_save
        assert (s_nat is None) == (s_np is None)
        if s_nat is None:
            continue
        assert (s_nat.n_steps, s_nat.n_patch, s_nat.span,
                s_nat.n_rows) == (s_np.n_steps, s_np.n_patch,
                                  s_np.span, s_np.n_rows)
        for field in ('bases', 'pbases', 'dmas', 'idx', 'targets',
                      'uncov'):
            a = np.asarray(getattr(s_nat, field))
            b = np.asarray(getattr(s_np, field))
            np.testing.assert_array_equal(a, b, err_msg=field)


def test_incidence_native_matches_numpy():
    from ch_shrinkwrap_tpu import native
    if native.get_lib() is None:
        pytest.skip('native engine unavailable')
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

    for K in (8, 5):
        a = native.incidence(faces, fmask, Vp, K=K)
        lib_save = native._lib
        native._lib = False
        try:
            b = meshdata.incidence_table(faces, fmask, Vp, K=K)
        finally:
            native._lib = lib_save
        for x, y, name in zip(a, b, ('inc', 'ov_rows', 'ov_verts')):
            np.testing.assert_array_equal(x, y, err_msg=f'K={K} {name}')


def test_blocked_kmajor_stream_order_and_care():
    rng = np.random.default_rng(3)
    V, K, B = 4096, 20, 1024
    tbl = rng.integers(0, V, size=(V, K)).astype(np.int32)
    care_t = rng.random((V, K)) < 0.8
    idx, care = pg.blocked_kmajor_stream(tbl, care_t, block=B)
    nb = V // B
    # row r = blk*K*B + k*B + off  ->  tbl[blk*B + off, k]
    r = rng.integers(0, V * K, size=500)
    blk, rem = r // (K * B), r % (K * B)
    k, off = rem // B, rem % B
    assert (idx[r] == tbl[blk * B + off, k]).all()
    assert (care[r] == care_t[blk * B + off, k]).all()


def test_compute_ncc_blocked_matches_plain():
    """The blocked k-major compute_ncc path (vertex axis on lanes)
    must agree with the plain (Vp, K, C) formulation.  The ring kernel
    itself can't run on CPU; route the gather through a stub that
    reproduces transposed kernel output from the schedule's stream."""
    from unittest import mock
    from ch_shrinkwrap_tpu.solver import shrinkwrap as sw

    rng = np.random.default_rng(7)
    Vp, K, B = 2048, 20, 1024
    f = rng.normal(size=(Vp, 3)).astype(np.float32)
    vn = rng.normal(size=(Vp, 3)).astype(np.float32)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    pi = rng.random(Vp).astype(np.float32)
    v_mask = np.ones(Vp, bool)
    v_mask[-37:] = False
    nbr = rng.integers(0, Vp, size=(Vp, K)).astype(np.int32)
    nbr[rng.random((Vp, K)) < 0.3] = -1
    nbr[5] = -1                                  # an isolated vertex

    import jax.numpy as jnp
    plain = np.asarray(sw.compute_ncc(
        jnp.asarray(f), jnp.asarray(nbr), jnp.asarray(vn),
        jnp.asarray(pi), jnp.asarray(v_mask)))

    idx, care = pg.blocked_kmajor_stream(
        np.clip(nbr, 0, None), nbr >= 0, block=B)
    sched = pg.RingGatherSchedule(
        bases=None, pbases=None, dmas=None,
        idx=jnp.asarray(idx), targets=None, uncov=None,
        n_steps=-(-idx.shape[0] // (16 * 128)), n_patch=128,
        span=384, n_rows=idx.shape[0], cps=16, kmaj_block=B,
        care=jnp.asarray(care))

    def fake_ring_gather(src, s, interpret=False, transposed_out=False):
        assert transposed_out
        vals = np.asarray(src)[np.asarray(s.idx)]      # (R, C)
        csub = 8
        Rp = s.n_steps * 16 * 128
        out = np.zeros((csub, Rp), np.float32)
        out[:vals.shape[1], :vals.shape[0]] = vals.T
        return jnp.asarray(out)

    with mock.patch('ch_shrinkwrap_tpu.ops.pallas_gather.ring_gather',
                    fake_ring_gather):
        blocked = np.asarray(sw.compute_ncc(
            jnp.asarray(f), jnp.asarray(nbr), jnp.asarray(vn),
            jnp.asarray(pi), jnp.asarray(v_mask), ring_sched=sched))

    np.testing.assert_allclose(blocked, plain, rtol=2e-5, atol=2e-5)


def test_compute_ncc_blocked_overflow_matches_plain():
    """Kn=12-slot blocked stream + fixed-width overflow pair lists
    (valence > Kn) must reproduce the full K=20 plain computation."""
    from unittest import mock
    from ch_shrinkwrap_tpu.solver import shrinkwrap as sw
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    Vp, K, Kn, B = 2048, 20, 12, 1024
    f = rng.normal(size=(Vp, 3)).astype(np.float32)
    vn = rng.normal(size=(Vp, 3)).astype(np.float32)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    pi = rng.random(Vp).astype(np.float32)
    v_mask = np.ones(Vp, bool)
    v_mask[-10:] = False
    nbr = rng.integers(0, Vp, size=(Vp, K)).astype(np.int32)
    nbr[rng.random((Vp, K)) < 0.4] = -1     # many rows exceed Kn=12

    plain = np.asarray(sw.compute_ncc(
        jnp.asarray(f), jnp.asarray(nbr), jnp.asarray(vn),
        jnp.asarray(pi), jnp.asarray(v_mask)))

    nbr12 = nbr[:, :Kn]
    idx, care = pg.blocked_kmajor_stream(
        np.clip(nbr12, 0, None), nbr12 >= 0, block=B)
    sched = pg.RingGatherSchedule(
        bases=None, pbases=None, dmas=None,
        idx=jnp.asarray(idx), targets=None, uncov=None,
        n_steps=-(-idx.shape[0] // (16 * 128)), n_patch=128,
        span=384, n_rows=idx.shape[0], cps=16, kmaj_block=B,
        care=jnp.asarray(care))
    ev, ek = np.nonzero(nbr[:, Kn:] >= 0)
    cap = 16384
    nv = np.full(cap, -1, np.int32)
    nu = np.zeros(cap, np.int32)
    nv[:len(ev)] = ev
    nu[:len(ev)] = nbr[:, Kn:][ev, ek]

    def fake_ring_gather(src, s, interpret=False, transposed_out=False):
        vals = np.asarray(src)[np.asarray(s.idx)]
        Rp = s.n_steps * 16 * 128
        out = np.zeros((8, Rp), np.float32)
        out[:vals.shape[1], :vals.shape[0]] = vals.T
        return jnp.asarray(out)

    with mock.patch('ch_shrinkwrap_tpu.ops.pallas_gather.ring_gather',
                    fake_ring_gather):
        blocked = np.asarray(sw.compute_ncc(
            jnp.asarray(f), jnp.asarray(nbr), jnp.asarray(vn),
            jnp.asarray(pi), jnp.asarray(v_mask),
            ring_sched=(sched, jnp.asarray(nv), jnp.asarray(nu))))

    np.testing.assert_allclose(blocked, plain, rtol=3e-5, atol=3e-5)


def test_native_stream_prep_matches_numpy():
    """The fused native stream-prep helpers (clip + care + k-major
    interleave in one pass, native/topology.cpp) must match the numpy
    formulations they replace in ops.meshdata.fit_ring_schedules."""
    from ch_shrinkwrap_tpu import native
    from ch_shrinkwrap_tpu.ops.pallas_gather import blocked_kmajor_stream
    if native.get_lib() is None:
        import pytest
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(7)
    tbl = rng.integers(-1, 5000, size=(4096, 20)).astype(np.int32)
    got = native.kmaj_stream_clip(tbl, 12, 1024)
    want = blocked_kmajor_stream(np.clip(tbl[:, :12], 0, None),
                                 tbl[:, :12] >= 0, block=1024)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1].astype(bool), want[1].astype(bool))
    flat = native.flat_stream_clip(tbl)
    assert np.array_equal(flat[0], np.clip(tbl, 0, None).ravel())
    assert np.array_equal(flat[1].astype(bool), (tbl >= 0).ravel())
    mask = rng.random(4096) > 0.3
    assert np.array_equal(native.repeat3_mask(mask).astype(bool),
                          np.repeat(mask, 3))
    assert np.array_equal(native.strided_col(tbl, 2), tbl[:, 2])
    # guard rails: misaligned inputs fall back (None), never garbage
    assert native.kmaj_stream_clip(tbl[:1000], 12, 1024) is None
    assert native.kmaj_stream_clip(tbl[:, ::2], 8, 1024) is None
