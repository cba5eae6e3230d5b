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
