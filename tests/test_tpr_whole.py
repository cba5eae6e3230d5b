"""TPR parsing + make-whole golden tests (reference: tpr_io.rs tests,
modifying.rs make_molecules_whole/make_group_whole tests)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.system import System


def test_tpr_read_example(test_files):
    tpr = System.from_file(os.path.join(test_files, "example.tpr"))
    gro = System.from_file(os.path.join(test_files, "example.gro"))
    assert tpr.get_n_atoms() == 16844
    assert tpr.get_name() == gro.get_name()
    # sequential numbering (reference: tpr_io.rs:18)
    assert tpr.get_atom(0).get_atom_number() == 1
    assert tpr.get_atom(16843).get_atom_number() == 16844
    # names/resnames match the gro file
    for i in (0, 100, 5000, 16843):
        assert tpr.topology.atomname.get(i) == gro.topology.atomname.get(i)
        assert tpr.topology.resname.get(i) == gro.topology.resname.get(i)
    # positions and velocities are bit-exact vs the gro used to build the tpr
    np.testing.assert_array_equal(tpr.positions, gro.positions)
    np.testing.assert_array_equal(tpr.velocities, gro.velocities)
    # masses and charges present
    assert tpr.topology.has_mass.all()
    assert tpr.topology.has_charge.all()
    assert tpr.has_bonds()
    sb = tpr.get_box()
    assert sb.x == pytest.approx(13.01331, abs=1e-4)


def test_tpr_read_water_bonds(test_files):
    s = System.from_file(os.path.join(test_files, "water_for_whole.tpr"))
    assert s.get_n_atoms() == 9
    # SETTLE produces OW-HW bonds per water
    bonds = s.topology.bonded
    assert bonds[0] == [1, 2]
    assert bonds[3] == [4, 5]
    assert bonds[6] == [7, 8]
    assert s.topology.n_molecules() == 3


def test_make_molecules_whole_water_golden(test_files, tmp_path):
    """reference: modifying.rs make_molecules_whole_aa test."""
    s = System.from_file(os.path.join(test_files, "water_for_whole.tpr"))
    s.make_molecules_whole()
    out = tmp_path / "whole.gro"
    s.write_gro(out, write_velocities=False)
    golden = open(os.path.join(test_files, "water_for_whole_expected.gro")).read()
    assert out.read_text() == golden


def test_make_molecules_whole_conect_golden(test_files, tmp_path):
    """reference: modifying.rs make_molecules_whole test."""
    s = System.from_file(os.path.join(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(os.path.join(test_files, "conect.pdb"))
    s.atoms_translate(np.array([3.5, 4.5, -3.0], np.float32))
    s.make_molecules_whole()
    out = tmp_path / "whole.gro"
    s.write_gro(out, write_velocities=False)
    golden = open(os.path.join(test_files, "whole_molecules_expected.gro")).read()
    assert out.read_text() == golden


def test_make_group_whole_golden(test_files, tmp_path):
    """reference: modifying.rs make_group_whole test."""
    s = System.from_file(os.path.join(test_files, "conect.pdb"))
    s.atoms_translate(np.array([3.5, 4.5, -3.0], np.float32))
    s.make_group_whole("all")
    out = tmp_path / "whole.gro"
    s.write_gro(out, write_velocities=False)
    golden = open(os.path.join(test_files, "whole_group_expected.gro")).read()
    assert out.read_text() == golden


def test_tpr_elements(test_files):
    s = System.from_file(os.path.join(test_files, "aa_for_testing_tpr.tpr"))
    symbols = {s.topology.element_symbol.get(i) for i in range(s.get_n_atoms())}
    assert "C" in symbols and "H" in symbols
    s.group_create("carbons", "element symbol C")
    assert s.group_get_n_atoms("carbons") > 0


def test_tpr_triclinic_box(test_files):
    s = System.from_file(os.path.join(test_files, "triclinic.tpr"))
    assert not s.get_box().is_orthogonal()
    gro = System.from_file(os.path.join(test_files, "triclinic.gro"))
    np.testing.assert_allclose(
        s.get_box().to_matrix(), gro.get_box().to_matrix(), atol=1e-5
    )
