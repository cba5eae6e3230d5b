"""Atom view parity (reference: structures/atom.rs — field getters/setters,
optional-field semantics, per-atom geometry)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.system import System


@pytest.fixture()
def sys_(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_field_roundtrips(sys_):
    a = sys_.get_atom(0)
    a.set_residue_number(42)
    assert a.get_residue_number() == 42
    a.set_residue_name("XYZ")
    assert a.get_residue_name() == "XYZ"
    a.set_atom_number(99999)
    assert a.get_atom_number() == 99999
    a.set_atom_name("CA")
    assert a.get_atom_name() == "CA"
    a.set_chain("B")
    assert a.get_chain() == "B"
    # the change is visible through a fresh view (SoA storage)
    assert sys_.get_atom(0).get_residue_name() == "XYZ"


def test_optional_fields(sys_):
    a = sys_.get_atom(0)
    # gro files carry no charge/mass/vdw
    assert a.get_charge() is None
    assert a.get_mass() is None
    assert a.get_vdw() is None
    a.set_mass(12.011)
    assert a.get_mass() == pytest.approx(12.011)
    a.set_charge(-0.5)
    assert a.get_charge() == pytest.approx(-0.5)
    assert a.get_element_name() is None
    a.set_element_name("carbon")
    assert a.get_element_name() == "carbon"


def test_position_velocity_force(sys_):
    a = sys_.get_atom(3)
    assert a.has_position()
    np.testing.assert_allclose(a.get_position(), sys_.positions[3], atol=1e-6)
    a.set_position([1.0, 2.0, 3.0])
    np.testing.assert_allclose(sys_.positions[3], [1, 2, 3], atol=1e-6)
    # example.gro has velocities
    assert a.has_velocity()
    assert not a.has_force()
    assert a.get_force() is None
    a.set_force([0.1, 0.2, 0.3])
    assert a.has_force()
    np.testing.assert_allclose(a.get_force(), [0.1, 0.2, 0.3], atol=1e-6)


def test_reset_position_and_atoms_distance(sys_, test_files):
    """atoms_distance errors when an endpoint has no position
    (analysis.rs atoms_distance_fail_position)."""
    from groan_rs_tpu.errors import AtomError, GroupError, PositionError

    a = sys_.get_atom(0)
    sys_.has_position[0] = False
    assert not a.has_position()
    assert a.get_position() is None
    with pytest.raises((AtomError, PositionError, GroupError)):
        sys_.atoms_distance(0, 1, __import__("groan_rs_tpu.core.dimension",
                            fromlist=["Dimension"]).Dimension.XYZ)


def test_bonded_view(test_files):
    s = System.from_file(os.path.join(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(os.path.join(test_files, "conect.pdb"))
    a = s.get_atom(0)
    assert a.get_n_bonded() > 0
    bonded = list(a.get_bonded().indices())
    assert all(0 <= b < s.get_n_atoms() for b in bonded)
    assert 0 not in bonded  # no self bonds
