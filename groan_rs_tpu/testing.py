"""Parity assertion helpers (reference: `src/test_utilities.rs:8-100`)."""

from __future__ import annotations

import math


def _approx(a, b, tol=1e-5):
    if a is None or b is None:
        assert a is None and b is None, f"one side is None: {a} vs {b}"
        return
    if isinstance(a, float) and math.isnan(a) and isinstance(b, float) and math.isnan(b):
        return
    assert abs(a - b) <= tol * max(1.0, abs(a), abs(b)), f"{a} != {b}"


def _vec_approx(v1, v2, what, tol=1e-5):
    if v1 is None or v2 is None:
        assert v1 is None and v2 is None, f"{what} are not both None"
        return
    for x, y in zip(v1, v2):
        _approx(float(x), float(y), tol)


def compare_atoms(a1, a2, check_forces: bool = True):
    """Field-by-field equality of two Atom views (reference:
    `compare_atoms`, test_utilities.rs:12; `compare_atoms_without_forces`
    via check_forces=False)."""
    assert a1.get_residue_number() == a2.get_residue_number()
    assert a1.get_residue_name() == a2.get_residue_name()
    assert a1.get_atom_number() == a2.get_atom_number()
    assert a1.get_atom_name() == a2.get_atom_name()
    assert a1.get_chain() == a2.get_chain()
    _approx(a1.get_mass(), a2.get_mass())
    assert a1.get_element_name() == a2.get_element_name()
    assert a1.get_element_symbol() == a2.get_element_symbol()
    _approx(a1.get_vdw(), a2.get_vdw())
    _approx(a1.get_charge(), a2.get_charge())
    assert a1.get_expected_max_bonds() == a2.get_expected_max_bonds()
    assert list(a1.get_bonded()) == list(a2.get_bonded())

    _vec_approx(a1.get_position(), a2.get_position(), "positions")
    _vec_approx(a1.get_velocity(), a2.get_velocity(), "velocities")
    if check_forces:
        _vec_approx(a1.get_force(), a2.get_force(), "forces")


def compare_atoms_approx(a1, a2, tol: float, check_forces: bool = True):
    """Like `compare_atoms` but with an explicit coordinate tolerance
    (reference: compare_atoms_approx)."""
    assert a1.get_residue_number() == a2.get_residue_number()
    assert a1.get_atom_name() == a2.get_atom_name()
    _vec_approx(a1.get_position(), a2.get_position(), "positions", tol)
    _vec_approx(a1.get_velocity(), a2.get_velocity(), "velocities", tol)
    if check_forces:
        _vec_approx(a1.get_force(), a2.get_force(), "forces", tol)


def compare_systems(s1, s2, check_forces: bool = True):
    """Atom-by-atom comparison of two systems."""
    assert s1.get_n_atoms() == s2.get_n_atoms()
    for a1, a2 in zip(s1.atoms_iter(), s2.atoms_iter()):
        compare_atoms(a1, a2, check_forces=check_forces)
