

def test_lazy_tables_materialize():
    """from_mesh(lazy_tables=True) keeps host copies and device -1
    fills; materialize_tables uploads the real tables (identical to a
    non-lazy build).  The fit driver uses this to skip the ~35 MB
    per-boundary upload of tables whose device content is dead."""
    import numpy as np
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    from ch_shrinkwrap_tpu.ops import meshdata

    v, f = icosphere(2, radius=10.0)
    mesh = TriangleMesh(v, f)
    ma_full = meshdata.from_mesh(mesh, quantum=256)
    ma_lazy = meshdata.from_mesh(mesh, quantum=256, lazy_tables=True)
    assert ma_lazy.host['lazy_tables']
    assert (np.asarray(ma_lazy.nbr_v) == -1).all()
    # host copies carry the real tables for schedule builds + native K
    np.testing.assert_array_equal(ma_lazy.host['nbr_v'],
                                  np.asarray(ma_full.nbr_v))
    ma_mat = meshdata.materialize_tables(ma_lazy)
    assert not ma_mat.host['lazy_tables']
    np.testing.assert_array_equal(np.asarray(ma_mat.nbr_v),
                                  np.asarray(ma_full.nbr_v))
    np.testing.assert_array_equal(np.asarray(ma_mat.nbr_f),
                                  np.asarray(ma_full.nbr_f))
    np.testing.assert_array_equal(np.asarray(ma_mat.face_nbrs),
                                  np.asarray(ma_full.face_nbrs))
    # no-op on an already-materialized build
    assert meshdata.materialize_tables(ma_mat) is ma_mat


def test_from_mesh_scratch_reuse_repads():
    """Reused scratch pad buffers must be re-padded exactly: a SMALLER
    second mesh at the same capacity may not see stale rows from the
    first build (fit-driver contract: one scratch dict per fit,
    topology shrinks after neck/punch surgery)."""
    import numpy as np
    from ch_shrinkwrap_tpu.mesh.core import TriangleMesh
    from ch_shrinkwrap_tpu.mesh.primitives import icosphere
    from ch_shrinkwrap_tpu.ops import meshdata

    v1, f1 = icosphere(3, radius=10.0)
    v2, f2 = icosphere(2, radius=7.0)
    cap_v, cap_f = 1024, 2048
    scratch = {}
    ma1 = meshdata.from_mesh(TriangleMesh(v1, f1), v_cap=cap_v,
                             f_cap=cap_f, lazy_tables=True,
                             scratch=scratch)
    ma2 = meshdata.from_mesh(TriangleMesh(v2, f2), v_cap=cap_v,
                             f_cap=cap_f, lazy_tables=True,
                             scratch=scratch)
    ref = meshdata.from_mesh(TriangleMesh(v2, f2), v_cap=cap_v,
                             f_cap=cap_f, lazy_tables=True)
    for key in ('faces', 'f_mask', 'nbr_v', 'nbr_f', 'face_nbrs'):
        np.testing.assert_array_equal(ma2.host[key], ref.host[key],
                                      err_msg=key)
    np.testing.assert_array_equal(np.asarray(ma2.positions),
                                  np.asarray(ref.positions))
    np.testing.assert_array_equal(np.asarray(ma2.v_mask),
                                  np.asarray(ref.v_mask))
    # the second build reused (mutated) the first build's host buffers
    assert ma1.host['faces'] is ma2.host['faces']


def test_fetch_ladder_capacity_keyed():
    """fetch_ladder: 4 fixed rungs keyed to capacity alone (the fit's
    boundary-fetch slice shapes must be trajectory-independent so the
    prewarmer can compile all of them up front), 128-aligned, covering
    every live count up to capacity."""
    from ch_shrinkwrap_tpu.ops.meshdata import fetch_ladder
    for cap in (16384, 186368, 231424, 656384):
        lad = fetch_ladder(cap)
        assert len(lad) <= 4 and lad == sorted(lad)
        assert all(q % 128 == 0 for q in lad)
        assert lad[-1] >= cap          # top rung covers the full pad
        # every live count maps to a rung within 2x of itself past the
        # bottom rung (geometric /8 /4 /2 /1 spacing)
        for v in (1, cap // 10, cap // 3, cap // 2, cap - 1, cap):
            q = next(x for x in lad if x >= v)
            assert q >= v and (q <= 2 * v or q == lad[0])
