import numpy as np

from fem_simulation_tpu import mesh as meshlib


def test_beam_counts():
    m = meshlib.beam(2, 3, 4, dx=0.1)
    assert m.n_hexes == 2 * 3 * 4
    assert m.n_verts == 3 * 4 * 5
    # corner convention: local index 4i+2j+k
    h0 = m.hexes[0]
    base = m.ijk[h0[0]]
    for li in range(8):
        off = np.array([(li >> 2) & 1, (li >> 1) & 1, li & 1])
        assert np.array_equal(m.ijk[h0[li]], base + off)


def test_positions_on_lattice():
    m = meshlib.beam(2, 2, 2, dx=0.25, origin=(1.0, 2.0, 3.0))
    expect = np.array([1.0, 2.0, 3.0]) + m.ijk * 0.25
    np.testing.assert_allclose(m.x, expect.astype(np.float32), atol=1e-6)


def test_surface_triangles_count():
    m = meshlib.beam(2, 2, 2, dx=0.1)
    tris = meshlib.surface_triangles(m.hexes)
    # 2x2x2 cube: 6 faces x 4 quads x 2 tris
    assert tris.shape == (48, 3)
    assert tris.min() >= 0 and tris.max() < m.n_verts


def test_voxelize_cube():
    # unit cube surface -> voxelize at dx=0.25 -> 4x4x4 cells
    v = np.array([[x, y, z] for x in (0, 1.0) for y in (0, 1.0) for z in (0, 1.0)])
    # 12 triangles of the cube
    quads = [
        [0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
        [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3],
    ]
    tris = []
    for q in quads:
        tris += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    m = meshlib.voxelize(v, np.array(tris), dx=0.25)
    assert m.n_hexes == 64
    assert m.n_verts == 125


def test_obj_roundtrip(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3 1\n")
    v, t = meshlib.load_obj(str(p))
    assert v.shape == (4, 3)
    assert t.shape == (3, 3)  # one tri + one fan-triangulated quad (2)


def test_obj_slash_forms_and_negative_indices(tmp_path):
    # v/vt/vn token forms and negative (relative) indices parse like the
    # plain form; the vectorized parser must strip past the first '/'
    p = tmp_path / "forms.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvn 0 0 1\n"
        "f 1/1/1 2/1/1 3/1/1\n"
        "f -3//1 -1// -2\n"          # negatives: verts 2, 4, 3
    )
    v, t = meshlib.load_obj(str(p))
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(t[0], [0, 1, 2])
    np.testing.assert_array_equal(t[1], [1, 3, 2])


def test_obj_negative_indices_interleaved(tmp_path):
    # per the OBJ spec, negative indices are relative to the vertices
    # defined SO FAR — faces interleaved between vertex blocks must not
    # resolve against the final count
    p = tmp_path / "inter.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "f -3 -2 -1\n"
        "v 2 0 0\nv 2 1 0\nv 2 2 0\n"
        "f -3 -2 -1\n"
    )
    v, t = meshlib.load_obj(str(p))
    assert v.shape == (6, 3)
    np.testing.assert_array_equal(t, [[0, 1, 2], [3, 4, 5]])


def test_points_inside_native_equals_numpy():
    # blobby multi-component voxel shape -> surface tris -> inside test on a
    # finer probe grid: the native C++ parity test (native/topology.cpp
    # points_inside_parity) must agree bit-for-bit with the numpy fallback
    rng = np.random.default_rng(0)
    cells = np.unique(rng.integers(0, 6, size=(60, 3)), axis=0)
    m = meshlib.hex_mesh_from_cells(cells, 0.2, np.zeros(3))
    tris = meshlib.surface_triangles(m.hexes).astype(np.int64)
    verts = m.x.astype(np.float64)
    lo, hi = verts.min(0) - 0.1, verts.max(0) + 0.1
    g = np.stack(np.meshgrid(*[np.linspace(lo[d], hi[d], 23)
                               for d in range(3)], indexing="ij"),
                 -1).reshape(-1, 3)
    a = meshlib._points_inside(g, verts, tris)
    b = meshlib._points_inside(g, verts, tris, use_native=False)
    from fem_simulation_tpu import native
    if native.available():
        np.testing.assert_array_equal(a, b)
    assert 0 < b.sum() < len(g)
