"""Analysis-kernel parity vs the reference's expected values
(src/system/analysis.rs inline tests, 61 tests)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.errors import GroupError, SimBoxError
from groan_rs_tpu.system import System


@pytest.fixture(scope="module")
def ndx_system(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    return s


@pytest.fixture(scope="module")
def aa_guessed(test_files):
    s = System.from_file(os.path.join(test_files, "aa_membrane_peptide.gro"))
    s.group_create("Peptide", "@protein")
    s.group_create("Membrane", "@membrane")
    s.guess_elements()
    return s


# ------------------------------------------------------------- centers

def test_get_center_naive_real_system(ndx_system):
    mem = np.asarray(ndx_system.group_get_center_naive("Membrane"))
    prot = np.asarray(ndx_system.group_get_center_naive("Protein"))
    np.testing.assert_allclose(mem, [6.47077, 6.52237, 5.77978], atol=1e-4)
    np.testing.assert_allclose(prot, [9.85718, 2.46213, 5.45931], atol=1e-4)


def test_get_center_real_system_matches_naive(ndx_system):
    """The protein is compact, so the refined PBC center equals the naive
    mean (analysis.rs get_center_real_system)."""
    prot = np.asarray(ndx_system.group_get_center("Protein"))
    prot_naive = np.asarray(ndx_system.group_get_center_naive("Protein"))
    np.testing.assert_allclose(prot, prot_naive, atol=1e-4)
    mem = np.asarray(ndx_system.group_get_center("Membrane"))
    mem_naive = np.asarray(ndx_system.group_get_center_naive("Membrane"))
    assert mem[2] == pytest.approx(mem_naive[2], abs=1e-4)


def test_estimate_com_real_system(aa_guessed):
    """analysis.rs estimate_com_real_system exact values."""
    com_prot = np.asarray(aa_guessed.group_estimate_com("Peptide"))
    com_mem = np.asarray(aa_guessed.group_estimate_com("Membrane"))
    np.testing.assert_allclose(com_prot, [4.047723, 3.764632, 3.2633042], atol=1e-4)
    np.testing.assert_allclose(com_mem, [1.44719, 0.45375, 3.74161], atol=1e-4)


def test_get_com_real_system_matches_naive(aa_guessed):
    com_prot = np.asarray(aa_guessed.group_get_com("Peptide"))
    naive = np.asarray(aa_guessed.group_get_com_naive("Peptide"))
    np.testing.assert_allclose(com_prot, naive, atol=1e-4)


def test_com_same_mass_equals_center(ndx_system):
    """Uniform masses make COM == COG (analysis.rs get_com_real_system_same_mass)."""
    s = ndx_system.copy()
    center_prot = np.asarray(s.group_get_center("Protein"))
    s.topology.mass[:] = 12.3
    s.topology.has_mass[:] = True
    com_prot = np.asarray(s.group_get_com("Protein"))
    np.testing.assert_allclose(com_prot, center_prot, atol=1e-4)


def test_center_fail_modes(ndx_system):
    with pytest.raises(GroupError):
        ndx_system.group_get_center("Nonexistent")
    s = ndx_system.copy()
    s.set_box(None)
    with pytest.raises((SimBoxError, GroupError)):
        s.group_get_center("Protein")


# ------------------------------------------------------------- group distances

@pytest.mark.parametrize("dim,expected", [
    (Dimension.X, 6.3029766),
    (Dimension.Y, -5.566175),
    (Dimension.Z, -0.32046986),
    (Dimension.XY, 8.408913),
    (Dimension.XZ, 6.311118),
    (Dimension.YZ, 5.5753927),
    (Dimension.XYZ, 8.415017),
    (Dimension.NONE, 0.0),
])
def test_group_distance_dims(ndx_system, dim, expected):
    """analysis.rs group_distance_* exact values."""
    d = float(ndx_system.group_distance("Protein", "Membrane", dim))
    assert d == pytest.approx(expected, abs=1e-4)


def test_group_distance_fails(ndx_system):
    with pytest.raises(GroupError):
        ndx_system.group_distance("PRotein", "Membrane", Dimension.XYZ)
    with pytest.raises(GroupError):
        ndx_system.group_distance("Protein", "Nonexistent", Dimension.XYZ)


# ------------------------------------------------------------- all distances

def test_group_all_distances_xyz(ndx_system):
    """analysis.rs group_all_distances_xyz exact values."""
    d = np.asarray(ndx_system.group_all_distances("Protein", "Protein", Dimension.XYZ))
    n = d.shape[0]
    assert d.shape == (n, n)
    np.testing.assert_allclose(d, d.T, atol=1e-5)
    assert float(d.max()) == pytest.approx(4.597961, abs=1e-5)
    assert float(d[0, 1]) == pytest.approx(0.31040135, abs=1e-5)
    assert float(d[n - 1, 0]) == pytest.approx(4.266728, abs=1e-5)
    assert float(d[n - 1, n - 2]) == pytest.approx(0.31425142, abs=1e-5)


def test_group_all_distances_z_antisymmetric(ndx_system):
    """Single-axis matrices are oriented (antisymmetric), max 4.383
    (analysis.rs group_all_distances_z)."""
    d = np.asarray(ndx_system.group_all_distances("Protein", "Protein", Dimension.Z))
    np.testing.assert_allclose(d, -d.T, atol=1e-5)
    assert float(d.max()) == pytest.approx(4.383, abs=1e-4)


# ------------------------------------------------------------- atom distances

def test_atoms_distance_xyz(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    n = s.get_n_atoms()
    assert float(s.atoms_distance(0, 1, Dimension.XYZ)) == pytest.approx(0.31040135, abs=1e-5)
    assert float(s.atoms_distance(n - 1, 0, Dimension.XYZ)) == pytest.approx(6.664787, abs=1e-5)


def test_atoms_distance_out_of_range(test_files):
    from groan_rs_tpu.errors import AtomError

    s = System.from_file(os.path.join(test_files, "example.gro"))
    with pytest.raises(AtomError):
        s.atoms_distance(12, 16844, Dimension.XY)
    with pytest.raises(AtomError):
        s.atoms_distance(197_392, 12, Dimension.YZ)


def test_group_all_distances_xy_cross_groups(ndx_system):
    """analysis.rs:1500 — Membrane x Protein XY matrix: exact min/max and
    spot entries."""
    d = np.asarray(ndx_system.group_all_distances("Membrane", "Protein",
                                                  Dimension.XY))
    nm = ndx_system.group_get_n_atoms("Membrane")
    npr = ndx_system.group_get_n_atoms("Protein")
    assert d.shape == (nm, npr)
    assert float(d.max()) == pytest.approx(9.190487, abs=1e-5)
    assert float(d.min()) == pytest.approx(0.02607, abs=1e-5)
    assert float(d[0, 0]) == pytest.approx(3.747651, abs=1e-5)
    assert float(d[1240, 12]) == pytest.approx(3.7207017, abs=1e-5)
    assert float(d[12, 34]) == pytest.approx(6.2494035, abs=1e-5)
    assert float(d[6143, 60]) == pytest.approx(4.7850933, abs=1e-5)
