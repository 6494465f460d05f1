"""Compile-prewarm ladder: the background bucket warmer must predict
exactly the capacity buckets the growing fit driver will climb
(membrane_mesh.opt_conjugate_gradient's pow2_bucket policy) and its
dummy calls must populate the jit cache the real blocks hit.

Counterpart: none in the reference (its CPU loop compiles nothing);
driver loop /root/reference/ch_shrinkwrap/_membrane_mesh.pyx:1427-1560.
"""
import numpy as np
import jax.numpy as jnp

from ch_shrinkwrap_tpu.solver import prewarm
from ch_shrinkwrap_tpu.models.membrane_mesh import MembraneMesh


def test_bucket_ladder_monotone_and_complete():
    ladder = prewarm.bucket_ladder(800, 1600, 50_000, 100_000,
                                   quantum=1024)
    # starts at the current bucket, ends at (or past) the final bucket
    v0, f0 = ladder[0]
    assert v0 == 1024 and f0 == 2048
    vl, fl = ladder[-1]
    assert vl >= int(1.15 * 50_000) and fl >= int(1.15 * 100_000)
    # strictly growing powers-of-two, no duplicates
    for (va, fa), (vb, fb) in zip(ladder, ladder[1:]):
        assert vb >= va and fb >= fa and (vb > va or fb > fa)
        assert vb % va == 0 and fb % fa == 0


def test_bucket_ladder_no_growth():
    ladder = prewarm.bucket_ladder(500, 800, 500, 800, quantum=1024)
    assert ladder == [(1024, 1024)]


def test_ladder_matches_driver_buckets():
    """Every bucket the driver's policy (meshdata.fit_buckets — the
    single source of truth) produces along the growth path must have a
    covering rung, and the EXACT start/end buckets must be rungs (an
    off-by-one bucket, e.g. the +8 vertex slack crossing a pow2
    boundary at V=1780, was measured turning the prewarm into a
    total cache miss)."""
    from ch_shrinkwrap_tpu.ops import meshdata
    ladder = prewarm.bucket_ladder(2_000, 4_000, 300_000, 600_000,
                                   quantum=1024)
    rungs = set(ladder)
    assert meshdata.fit_buckets(2_000, 4_000) in rungs
    assert meshdata.fit_buckets(300_000, 600_000) in rungs
    v = 2_000
    while v <= 300_000:
        vb, fb = meshdata.fit_buckets(v, 2 * v)
        assert any(vr >= vb and fr >= fb for vr, fr in rungs), \
            (v, vb, fb, ladder)
        v = int(v * 1.7) + 1
    # the measured miss case: V=1780 (1.15*1780+8 = 2055 > 2048)
    assert meshdata.fit_buckets(1780, 3560) == (4096, 4096)


def test_prewarm_buckets_populates_jit_cache():
    """A dummy prewarm call at (v_cap, f_cap) must make the real
    cg_block call at that bucket a cache hit (no new trace)."""
    from ch_shrinkwrap_tpu.solver import shrinkwrap as sw

    N = 64
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    sig = jnp.ones((N, 3), jnp.float32)
    w = jnp.ones((N, 3), jnp.float32)
    pmask = jnp.ones((N,), bool)

    ladder = [(64, 128)]
    # the prewarmer builds its own dummy point arrays from n_points —
    # the REAL arrays below must still be a trace-cache hit (pjit keys
    # on shape/dtype, not buffer identity)
    prewarm.prewarm_buckets(
        ladder, N, 0.1, 0.0, 2, False,
        64, 'dense', 0.0, 0.0, 0.0, quantum=64,
        skip_first_block=False, initial_wait=0.0)

    n_traces = sw.cg_block._cache_size()
    # identical shapes + statics through the SHARED call site: must
    # NOT retrace.  The pjit trace cache keys on the call signature
    # (an explicitly-passed default and an omitted one are different
    # entries — measured: a retrace), which is why both the driver and
    # the prewarmer route through sw.block_call; mimic the driver's
    # call here, including kwargs the prewarmer leaves defaulted.
    args = prewarm._dummy_block_args(64, 128)
    positions, faces, f_mask, v_mask, nbr_v, nbr_f, face_nbrs = args
    out = sw.block_call(positions, faces, f_mask, v_mask, nbr_v,
                        pts, sig, w, pmask, 0.1, 0.0, num_iters=2,
                        active_iters=1, use_shrink=False, face_chunk=64,
                        corr_method='dense', cell_size=2.5,
                        face_nbrs=face_nbrs,
                        fold_starts=None, fold_uncov=None,
                        ring_tri=None, ring_ncc=None, ring_fold=None,
                        nbr_f=None, want_curv_K=False, face_hcgc=False,
                        ring_tri_cb=None)
    out[0].block_until_ready()
    assert sw.cg_block._cache_size() == n_traces


def test_predict_final_sizes_tracks_edge_schedule():
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    v, f = icosphere(2, radius=60.0)
    mesh = MembraneMesh(v, f)
    vf, ff = prewarm.predict_final_sizes(mesh, 10.0)
    # sphere area 4*pi*60^2 ~ 45239 nm^2; equilateral tris at edge 10
    # have area ~43.3 -> ~1045 faces, x2 in the estimator's convention
    assert 200 < ff < 50_000
    assert vf == ff // 2 + 8


def _shell_cloud(N=200_000, R=300.0, s=5.0, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(N, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * R + rng.normal(scale=s, size=(N, 3))).astype(np.float32)
    return pts, np.full((N, 3), s, np.float32)


def test_estimate_cloud_area_sphere():
    """The cloud-only area estimator must land within the driver's
    adoption slack of the true surface area (sphere oracle)."""
    pts, sig = _shell_cloud()
    a = prewarm.estimate_cloud_area(pts, 5.0)
    truth = 4 * np.pi * 300.0 ** 2
    assert 0.8 * truth < a < 1.6 * truth


def test_early_prewarm_adoption_contract():
    """A handle whose statics/caps come from the driver's own
    prediction must be ADOPTED (caps kept, thread not canceled); a
    handle with undersized caps must be canceled (VERDICT r4 next #2:
    prewarm before wrap_start)."""
    import threading
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere

    rng = np.random.default_rng(2)
    d = rng.normal(size=(500, 3))
    d /= np.linalg.norm(d, axis=1)[:, None]
    pts = (d * 50 + rng.normal(scale=3, size=(500, 3))).astype(np.float32)
    sig = np.full((500, 3), 3.0, np.float32)

    def make_mesh():
        v, f = icosphere(2, radius=60.0)
        m = MembraneMesh(v, f, kc=1.0, step_size=4.0,
                         remesh_frequency=2,
                         delaunay_remesh_frequency=0)
        m.capacity_mode = 'final'
        return m

    # probe fit: capture the driver's predicted caps + statics
    m1 = make_mesh()
    m1.shrink_wrap(pts, sig, max_iter=2, minimum_edge_length=8.0)
    caps = m1._final_caps_pred
    statics = m1._prewarm_statics
    assert caps is not None

    # matching handle -> adopted
    ev = threading.Event()
    m2 = make_mesh()
    m2.early_prewarm = prewarm.EarlyPrewarm(None, ev, caps[0], caps[1],
                                            statics)
    m2.shrink_wrap(pts, sig, max_iter=2, minimum_edge_length=8.0)
    assert m2._adopted_early_prewarm
    # the driver owns the adopted thread now: canceled at fit END
    # (normal prewarm lifecycle), not at adoption time
    assert ev.is_set()
    assert m2.early_prewarm is None

    # slightly larger caps (within the 1.35x slack band; one quantum
    # step on the face axis — at production capacities the band spans
    # several rungs) -> adopted, fit padded up to the handle's caps
    ev3 = threading.Event()
    m3 = make_mesh()
    big = (caps[0], caps[1] + 1024)
    m3.early_prewarm = prewarm.EarlyPrewarm(None, ev3, big[0], big[1],
                                            statics)
    m3.shrink_wrap(pts, sig, max_iter=2, minimum_edge_length=8.0)
    assert m3._adopted_early_prewarm
    np.testing.assert_allclose(m3.vertices.mean(0), m2.vertices.mean(0),
                               atol=1e-3)

    # undersized caps -> canceled, fit proceeds normally
    ev4 = threading.Event()
    m4 = make_mesh()
    m4.early_prewarm = prewarm.EarlyPrewarm(None, ev4, 8, 16, statics)
    m4.shrink_wrap(pts, sig, max_iter=2, minimum_edge_length=8.0)
    assert not m4._adopted_early_prewarm
    assert ev4.is_set()


def test_prewarm_for_cloud_handle():
    """prewarm_for_cloud (force=True off-TPU) returns a handle whose
    statics carry every key the driver's adoption check compares."""
    pts, sig = _shell_cloud(N=20_000, R=60.0, s=3.0)
    h = prewarm.prewarm_for_cloud(pts, sig, max_iter=4, step_size=4.0,
                                  kc=1.0, remesh_frequency=2,
                                  minimum_edge_length=8.0, force=True)
    assert h is not None
    for k in ('N', 'lam0', 'shrink_lam', 'ni_static', 'use_shrink',
              'face_chunk', 'corr_method', 'uniform_weights',
              'want_curv_K', 'ring_min_verts', 'pad_quantum'):
        assert k in h.statics
    assert h.statics['N'] == 20_000
    assert h.statics['lam0'] == 2.0
    assert h.v_cap > 0 and h.f_cap > 0
    h.cancel()
    if h.thread is not None:
        h.thread.join(timeout=120)


def test_fit_cancels_stale_prewarmer():
    """A second shrink_wrap call must cancel the previous call's
    prewarm thread before starting (single compile service)."""
    import threading
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    v, f = icosphere(1, radius=50.0)
    mesh = MembraneMesh(v, f)
    ev = threading.Event()
    mesh._prewarm_cancel = ev
    pts = np.random.default_rng(1).normal(
        scale=50.0, size=(200, 3)).astype(np.float32)
    mesh.max_iter = 1
    mesh.remesh_frequency = 0
    mesh.delaunay_remesh_frequency = 0
    mesh.shrink_wrap(pts, 5.0 * np.ones_like(pts))
    assert ev.is_set()
