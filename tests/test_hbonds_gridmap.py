"""H-bond detection parity + GridMap tests."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.gridmap import GridMap
from groan_rs_tpu.errors import GridMapError, HBondError
from groan_rs_tpu.system import System
from groan_rs_tpu.system.hbonds import HBondChain


@pytest.fixture(scope="module")
def membrane(test_files):
    return System.from_file(os.path.join(test_files, "aa_membrane_peptide.tpr"))


def test_hbonds_water_first_frames(membrane, test_files):
    """reference: hbonds.rs test_hbonds_analyze_simple_water — per-frame
    water-water hydrogen-bond counts."""
    expected = [4675, 4644, 4629]
    s = membrane.copy()
    chains = [HBondChain(
        "resname SOL and name OW",
        "resname SOL and name OW",
        "resname SOL and name HW1 HW2",
    )]
    xtc = os.path.join(test_files, "aa_membrane_peptide.xtc")
    it = s.hbonds_analyze(xtc, chains, [(0, 0)], 0.3, 150.0, fmt="xtc")
    for frame_i, (frame, hmap) in enumerate(it):
        if frame_i >= len(expected):
            break
        bonds = hmap[(0, 0)]
        assert len(bonds) == expected[frame_i]
        for b in bonds[:50]:
            assert b.distance <= 0.3
            assert b.angle >= 150.0


def test_hbonds_known_bond_values(membrane, test_files):
    """Check one exact reference HBond (frame 0):
    HBond(17527, 17528, 21100, 0.262, 157.241)."""
    s = membrane.copy()
    chains = [HBondChain(
        "resname SOL and name OW",
        "resname SOL and name OW",
        "resname SOL and name HW1 HW2",
    )]
    xtc = os.path.join(test_files, "aa_membrane_peptide.xtc")
    it = s.hbonds_analyze(xtc, chains, [(0, 0)], 0.3, 150.0)
    _, hmap = next(iter(it))
    match = [b for b in hmap[(0, 0)]
             if b.donor == 17527 and b.hydrogen == 17528 and b.acceptor == 21100]
    assert len(match) == 1
    assert match[0].distance == pytest.approx(0.262, abs=2e-3)
    assert match[0].angle == pytest.approx(157.241, abs=0.1)


def test_hbonds_pair_validation(membrane):
    chains = [
        HBondChain("resname SOL and name OW", "resname SOL and name OW",
                   "resname SOL and name HW1 HW2"),
        HBondChain("name N", "name N", "name H"),
    ]
    with pytest.raises(HBondError):  # nonexistent chain
        membrane.hbonds_analyze_frame(chains, [(0, 2)])
    with pytest.raises(HBondError):  # unused chain
        membrane.hbonds_analyze_frame(chains, [(0, 0)])
    with pytest.raises(HBondError):  # duplicate pair
        membrane.hbonds_analyze_frame(chains, [(0, 1), (1, 0)])


# ---------------------------------------------------------------- GridMap

def test_gridmap_basic():
    gm = GridMap((0.0, 2.0), (0.0, 1.0), (1.0, 1.0))
    assert gm.n_tiles_x() == 3 and gm.n_tiles_y() == 2
    gm.add_at(0.1, 0.2)  # rounds to tile (0, 0)
    gm.add_at(1.9, 0.9)  # tile (2, 1)
    assert gm.get_at(0.0, 0.0) == 1
    assert gm.get_at(2.0, 1.0) == 1
    gm.accumulate(np.array([[1.0, 0.0], [1.2, 0.1], [5.0, 5.0]]))
    assert gm.get_at(1.0, 0.0) == 2  # out-of-range point dropped


def test_gridmap_invalid():
    with pytest.raises(GridMapError):
        GridMap((2.0, 0.0), (0.0, 1.0), (1.0, 1.0))  # negative span
    with pytest.raises(GridMapError):
        GridMap((0.0, 2.0), (0.0, 1.0), (3.0, 1.0))  # tile > span


def test_gridmap_file_roundtrip(tmp_path):
    gm = GridMap((0.0, 2.0), (0.0, 1.0), (1.0, 1.0))
    gm.values[:] = np.arange(6).reshape(3, 2)
    out = tmp_path / "map.dat"
    gm.save(out)
    gm2 = GridMap.from_file(out, split=(), parser=float)
    np.testing.assert_allclose(gm2.values.astype(float), gm.values)
    assert gm2.span_x == gm.span_x
    assert gm2.tile_dim == gm.tile_dim


def test_gridmap_reference_fixture(test_files):
    """Parse the reference's column-major gridmap fixture."""
    path = os.path.join(test_files, "gridmaps", "map_column_major.dat")
    gm = GridMap.from_file(path, split=("|",), parser=lambda s: s, comments=("#", "@"))
    assert gm.n_tiles_x() == 3 and gm.n_tiles_y() == 2
    assert gm.get_at(0.0, 0.0) == "10"
    assert gm.get_at(2.0, 1.0) in ("", 0, None)


def test_gridmap_reference_invalid(test_files):
    for bad in ["all_coordinates_same.dat", "map_column_major_redefinition.dat"]:
        with pytest.raises(GridMapError):
            GridMap.from_file(
                os.path.join(test_files, "gridmaps", bad),
                split=("|",), parser=lambda s: s, comments=("#", "@"),
            )


def test_hbonds_protein_frame0(membrane, test_files):
    """reference: hbonds.rs test_hbonds_analyze_simple_protein — frame 0's
    exact protein-protein hydrogen bonds (donor, hydrogen, acceptor,
    distance, angle)."""
    expected = [
        (118, 119, 61, 0.277, 158.384),
        (129, 130, 72, 0.299, 155.371),
        (193, 194, 132, 0.286, 164.124),
        (212, 213, 151, 0.287, 168.456),
        (238, 239, 170, 0.282, 158.546),
        (291, 292, 241, 0.297, 162.274),
        (309, 310, 252, 0.279, 170.511),
        (358, 359, 301, 0.263, 172.024),
    ]
    s = membrane.copy()
    chains = [HBondChain(
        "@protein and elsymbol N O",
        "@protein and elsymbol N O",
        "element name hydrogen",
    )]
    it = s.hbonds_analyze(os.path.join(test_files, "aa_membrane_peptide.xtc"),
                          chains, [(0, 0)], 0.3, 150.0)
    _, hmap = next(iter(it))
    bonds = hmap[(0, 0)]
    assert len(bonds) == len(expected)
    for b, (d, h, a, dist, ang) in zip(bonds, expected):
        assert (b.donor, b.hydrogen, b.acceptor) == (d, h, a)
        assert b.distance == pytest.approx(dist, abs=1e-3)
        assert b.angle == pytest.approx(ang, abs=1e-2)


def test_hbonds_protein_water_pairs(membrane, test_files):
    """reference: hbonds.rs test_hbonds_analyze_protein_water — two chains,
    pairs (0,0) and (0,1), exact bonds on the gro frame."""
    expected_pp = [
        (69, 70, 12, 0.289, 151.553),
        (118, 119, 61, 0.278, 162.882),
        (129, 130, 72, 0.286, 164.932),
        (133, 134, 91, 0.293, 161.708),
        (152, 153, 110, 0.280, 173.645),
        (193, 194, 132, 0.296, 156.956),
        (212, 213, 151, 0.281, 161.991),
        (231, 232, 170, 0.288, 150.634),
        (238, 239, 170, 0.267, 178.283),
        (253, 254, 211, 0.295, 162.803),
        (309, 310, 252, 0.287, 174.566),
        (332, 333, 290, 0.300, 155.969),
        (358, 359, 301, 0.255, 150.333),
    ]
    expected_pw = [
        (17725, 17727, 358, 0.287, 161.447),
        (19834, 19835, 350, 0.275, 161.685),
        (21883, 21885, 361, 0.279, 158.936),
        (24292, 24293, 362, 0.274, 165.203),
        (26173, 26174, 309, 0.267, 169.959),
        (29929, 29930, 331, 0.266, 171.977),
        (29929, 29931, 361, 0.267, 152.451),
        (30919, 30921, 361, 0.271, 167.135),
        (32, 33, 24247, 0.297, 166.586),
        (187, 189, 30775, 0.285, 168.139),
    ]
    s = membrane.copy()
    chains = [
        HBondChain("@protein and elsymbol N O", "@protein and elsymbol N O",
                   "element name hydrogen"),
        HBondChain("resname SOL and name OW", "resname SOL and name OW",
                   "element name hydrogen"),
    ]
    it = s.hbonds_analyze(os.path.join(test_files, "aa_membrane_peptide.gro"),
                          chains, [(0, 0), (0, 1)], 0.3, 150.0, fmt="gro")
    _, hmap = next(iter(it))
    for key, expected in [((0, 0), expected_pp), ((0, 1), expected_pw)]:
        bonds = hmap[key]
        assert len(bonds) == len(expected), key
        for b, (d, h, a, dist, ang) in zip(bonds, expected):
            assert (b.donor, b.hydrogen, b.acceptor) == (d, h, a)
            assert b.distance == pytest.approx(dist, abs=1e-3)
            assert b.angle == pytest.approx(ang, abs=1e-2)


def test_gridmap_row_major_fixture(test_files):
    """Row-major fixture parses with auto-detected order."""
    path = os.path.join(test_files, "gridmaps", "map_row_major.dat")
    gm = GridMap.from_file(path, split=("|",), parser=lambda s: s,
                           comments=("#", "@"))
    assert gm.n_tiles_x() == 3 and gm.n_tiles_y() == 2
    assert gm.get_at(0.0, 0.0) == "10"


@pytest.mark.parametrize("bad", [
    "map_column_major_decreasing.dat",
    "map_column_major_not_fully_increasing.dat",
    "map_column_major_x_inconsistency.dat",
    "map_column_major_y_inconsistency.dat",
    "map_row_major_decreasing.dat",
    "map_row_major_redefinition.dat",
    "map_row_major_x_inconsistency.dat",
    "map_row_major_y_inconsistency.dat",
])
def test_gridmap_invalid_fixtures(test_files, bad):
    """All malformed gridmap fixtures are rejected (gridmap.rs file tests)."""
    with pytest.raises(GridMapError):
        GridMap.from_file(
            os.path.join(test_files, "gridmaps", bad),
            split=("|",), parser=lambda s: s, comments=("#", "@"),
        )


def test_gridmap_struct_api():
    """gridmap.rs:492-617 — from_vec, clear, n_tiles, tile queries,
    converted access, raw/column-major writers."""
    import io

    from groan_rs_tpu.core.gridmap import GridMap
    from groan_rs_tpu.errors import GridMapError

    vals = np.arange(12, dtype=np.float64)
    gm = GridMap.from_vec((0.0, 1.5), (0.0, 1.0), (0.5, 0.5), vals,
                          data_order="row", converter=lambda v: 2 * v)
    assert gm.n_tiles_x() == 4 and gm.n_tiles_y() == 3
    assert gm.n_tiles() == 12
    assert gm.get_at(0.5, 0.5) == vals.reshape(4, 3)[1, 1]
    assert gm.get_at_convert(0.5, 0.5) == 2 * vals.reshape(4, 3)[1, 1]
    assert gm.is_inside(1.5, 1.0) and not gm.is_inside(1.8, 0.0)
    assert gm.get_tile(0.6, 0.4) == (0.5, 0.5)
    assert gm.get_tile(9.0, 0.0) is None

    gmc = GridMap.from_vec((0.0, 1.5), (0.0, 1.0), (0.5, 0.5), vals,
                           data_order="column")
    np.testing.assert_array_equal(gmc.values, vals.reshape(3, 4).T)

    with pytest.raises(GridMapError):
        GridMap.from_vec((0.0, 1.5), (0.0, 1.0), (0.5, 0.5), vals[:5])

    buf_raw = io.StringIO()
    gm.write_map_raw(buf_raw)
    first = buf_raw.getvalue().splitlines()[0]
    assert first == f"{0.0:10.6f} {0.0:10.6f} 0.0"
    buf_cm = io.StringIO()
    gm.write_map_raw_column_major(buf_cm)
    assert len(buf_cm.getvalue().splitlines()) == 12

    gm.clear()
    assert gm.n_tiles() == 12 and not gm.values.any()


def test_cellgrid_neighbors_iter(test_files):
    """cellgrid.rs:383 — chainable atom iterator over neighbor cells;
    same atom set as the array-form `neighbors`."""
    from groan_rs_tpu.core.cellgrid import CellGrid

    s = System.from_file(os.path.join(test_files, "example.gro"))
    grid = CellGrid(s, "all", 1.0)
    point = [3.0, 4.0, 5.0]
    arr = np.sort(grid.neighbors(point))
    got = [a.get_index() for a in grid.neighbors_iter(point)]
    np.testing.assert_array_equal(np.asarray(got), arr)
    assert len(got) > 0
    # chainability: these are full AtomIterator objects
    center = grid.neighbors_iter(point).get_center()
    assert np.asarray(center).shape == (3,)
