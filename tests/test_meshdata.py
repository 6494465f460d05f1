

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
