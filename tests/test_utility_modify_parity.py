"""Centering / renumbering parity (reference: utility.rs + modifying.rs
inline tests, exact values)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.system import System


@pytest.fixture()
def ndx_system(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    return s


def test_atoms_center_none(ndx_system):
    """utility.rs:337 — Dimension.NONE is a no-op."""
    s = ndx_system
    s.atoms_center("Protein", Dimension.NONE)
    np.testing.assert_allclose(s.positions[0], [9.497, 1.989, 7.498], atol=1e-5)
    np.testing.assert_allclose(s.positions[-1], [8.829, 11.186, 2.075], atol=1e-5)


def test_atoms_center_x(ndx_system):
    """utility.rs:356 — exact post-centering coordinates."""
    s = ndx_system
    s.atoms_center("Protein", Dimension.X)
    est = np.asarray(s.group_estimate_center("Protein"))
    assert est[0] == pytest.approx(float(s.get_box_center()[0]), abs=1e-4)
    np.testing.assert_allclose(s.positions[0], [6.1465545, 1.989, 7.498], atol=1e-4)
    np.testing.assert_allclose(s.positions[-1], [5.478555, 11.186, 2.075], atol=1e-4)


def test_atoms_center_xyz(ndx_system):
    """utility.rs:500 — exact post-centering coordinates on all axes."""
    s = ndx_system
    s.atoms_center("Protein", Dimension.XYZ)
    est = np.asarray(s.group_estimate_center("Protein"))
    np.testing.assert_allclose(est, np.asarray(s.get_box_center()), atol=1e-4)
    np.testing.assert_allclose(s.positions[0], [6.1465545, 6.033055, 7.6634398], atol=1e-4)
    np.testing.assert_allclose(s.positions[-1], [5.478555, 2.2167444, 2.2404397], atol=1e-4)


def test_atoms_center_fail(ndx_system):
    with pytest.raises(GroupError):
        ndx_system.atoms_center("Nonexistent", Dimension.XYZ)


def test_atoms_renumber(test_files):
    """modifying.rs:633 — renumbering assigns 1..n."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.topology.atomnum[:] = 1
    s.atoms_renumber()
    np.testing.assert_array_equal(
        s.topology.atomnum, np.arange(1, s.get_n_atoms() + 1))


def test_residues_renumber(test_files):
    """modifying.rs:648 — residue renumbering restores consecutive ids."""
    s1 = System.from_file(os.path.join(test_files, "example_novelocities.gro"))
    s2 = System.from_file(os.path.join(test_files, "example_novelocities.gro"))
    s2.topology.resnum[0] = 3
    s2.topology.resnum[1] = 3
    s2.residues_renumber()
    np.testing.assert_array_equal(s1.topology.resnum, s2.topology.resnum)


def test_translate_pbc_wrap(test_files):
    """modifying.rs atoms_translate wraps into the box; exact first atom."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    before = s.positions[0].copy()
    box = np.asarray(s.box_lengths())
    s.atoms_translate([3.5, -1.1, 5.4])
    expected = (before + np.array([3.5, -1.1, 5.4], np.float32))
    # wrap manually (boundary convention: positive multiples stay at L)
    expected = expected - box * np.floor(expected / box)
    np.testing.assert_allclose(s.positions[0], expected, atol=1e-5)


# =====================================================================
# atoms_center / atoms_center_mass across all dimensions
# (utility.rs atoms_center_* / atoms_center_mass_*, exact anchors for
# Y, Z and mass-XY; masked-axis invariants for the rest)
# =====================================================================

def test_atoms_center_y_exact(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    s.atoms_center("Protein", Dimension.Y)
    c = np.asarray(s.group_estimate_center("Protein"))
    assert c[1] == pytest.approx(float(s.get_box_center()[1]), abs=1e-4)
    np.testing.assert_allclose(s.positions[0], [9.497, 6.033055, 7.498], atol=1e-5)
    np.testing.assert_allclose(s.positions[-1], [8.829, 2.2167444, 2.075], atol=1e-5)


def test_atoms_center_z_exact(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    s.atoms_center("Protein", Dimension.Z)
    np.testing.assert_allclose(s.positions[0], [9.497, 1.989, 7.6634398], atol=1e-5)
    np.testing.assert_allclose(s.positions[-1], [8.829, 11.186, 2.2404397], atol=1e-5)


@pytest.mark.parametrize("dim", [Dimension.XY, Dimension.XZ, Dimension.YZ,
                                 Dimension.XYZ])
def test_atoms_center_masked_axes(test_files, dim):
    """Centering moves the reference group's center onto the box center on
    exactly the masked axes; other axes untouched."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    before = s.positions.copy()
    s.atoms_center("Protein", dim)
    c = np.asarray(s.group_estimate_center("Protein"))
    bc = np.asarray(s.get_box_center())
    for ax in range(3):
        if dim.value[ax]:
            assert c[ax] == pytest.approx(bc[ax], abs=1e-3), ax
        else:
            np.testing.assert_allclose(s.positions[:, ax], before[:, ax],
                                       atol=1e-6)


def test_atoms_center_mass_xy_exact(test_files):
    """utility.rs atoms_center_mass_xy exact values."""
    import warnings

    s = System.from_file(os.path.join(test_files, "aa_membrane_peptide.gro"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s.guess_elements()
    s.group_create("Protein", "@protein")
    s.atoms_center_mass("Protein", Dimension.XY)
    com = np.asarray(s.group_estimate_com("Protein"))
    bc = np.asarray(s.get_box_center())
    assert com[0] == pytest.approx(bc[0], abs=1e-4)
    assert com[1] == pytest.approx(bc[1], abs=1e-4)
    np.testing.assert_allclose(s.positions[0], [3.456437, 3.475028, 4.993], atol=1e-5)
    np.testing.assert_allclose(s.positions[-1], [2.0444372, 3.399028, 0.378], atol=1e-5)


def test_atoms_center_failure_modes(test_files):
    from groan_rs_tpu.errors import GroupError, SimBoxError

    s = System.from_file(os.path.join(test_files, "example.gro"))
    with pytest.raises(GroupError):
        s.atoms_center("Nonexistent", Dimension.XYZ)
    s.group_create("Empty", "resname NON")
    with pytest.raises(GroupError):
        s.atoms_center("Empty", Dimension.XYZ)
    s2 = System.from_file(os.path.join(test_files, "example.gro"))
    s2.set_box(None)
    with pytest.raises((SimBoxError, GroupError)):
        s2.atoms_center("all", Dimension.XYZ)


def test_atoms_center_mass_fail_mass(test_files):
    """Centering by mass requires masses (GRO has none)."""
    from groan_rs_tpu.errors import GroupError

    s = System.from_file(os.path.join(test_files, "example.gro"))
    with pytest.raises(GroupError):
        s.atoms_center_mass("all", Dimension.XYZ)


# =====================================================================
# group translate / wrap + bond management (modifying.rs)
# =====================================================================

def test_group_translate_and_wrap(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    idx = s.group_indices("Protein")
    other = np.setdiff1d(np.arange(s.get_n_atoms()), idx)
    before_other = s.positions[other].copy()
    s.group_translate("Protein", [3.5, -1.1, 5.4])
    np.testing.assert_allclose(s.positions[other], before_other, atol=0)
    # group_wrap only touches the group
    s.positions[idx[0]] = [-1.0, 5.0, 5.0]
    s.group_wrap("Protein")
    box = np.asarray(s.box_lengths())
    assert 0 <= s.positions[idx[0], 0] <= box[0]
    from groan_rs_tpu.errors import GroupError

    with pytest.raises(GroupError):
        s.group_translate("Nonexistent", [1, 0, 0])
    with pytest.raises(GroupError):
        s.group_wrap("Nonexistent")


def test_add_bond_failures_and_clear(test_files):
    """modifying.rs:939-978 — out-of-range names the bad index, self-bond
    names the pair; clear_bonds empties the topology."""
    from groan_rs_tpu.errors import AtomError

    s = System.from_file(os.path.join(test_files, "example.gro"))
    with pytest.raises(AtomError, match="102743"):
        s.add_bond(15, 102743)
    with pytest.raises(AtomError, match="102743"):
        s.add_bond(102743, 15)
    with pytest.raises(AtomError, match="15"):
        s.add_bond(15, 15)
    s.add_bond(15, 17)
    assert s.has_bonds()
    assert list(s.topology.bonded[15]) == [17]
    s.clear_bonds()
    assert not s.has_bonds()
