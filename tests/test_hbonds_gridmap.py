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
