import numpy as np
import pytest

from fem_simulation_tpu import native
from fem_simulation_tpu import hierarchy as hl
from fem_simulation_tpu import mesh as meshlib


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_hex_pairs_unique_matches_numpy():
    m = meshlib.beam(3, 4, 5, dx=0.1)
    got = native.hex_pairs_unique(m.hexes)
    rows = np.repeat(m.hexes, 8, axis=1).reshape(-1)
    cols = np.tile(m.hexes, (1, 8)).reshape(-1)
    ref = np.unique(np.stack([rows, cols], axis=1), axis=0)
    np.testing.assert_array_equal(got, ref)


def test_full_topology_native_equals_numpy(monkeypatch):
    m = meshlib.beam(4, 4, 8, dx=0.1)
    h_native = hl.build_hierarchy(m, 2)
    # force the numpy fallback
    monkeypatch.setattr(native, "available", lambda: False)
    h_numpy = hl.build_hierarchy(m, 2)

    for ln, lp in zip(h_native.levels, h_numpy.levels):
        np.testing.assert_array_equal(ln.nbr, lp.nbr)
        np.testing.assert_array_equal(ln.nbr_mask, lp.nbr_mask)
        np.testing.assert_array_equal(ln.hex_slot, lp.hex_slot)
        np.testing.assert_array_equal(ln.diag_slot, lp.diag_slot)
    for tn, tp in zip(h_native.transfers, h_numpy.transfers):
        np.testing.assert_array_equal(tn.g_src, tp.g_src)
        np.testing.assert_array_equal(tn.g_dst, tp.g_dst)
        np.testing.assert_allclose(tn.g_w, tp.g_w, atol=1e-7)
        np.testing.assert_allclose(tn.p_w, tp.p_w)
        np.testing.assert_allclose(tn.r_w, tp.r_w)
