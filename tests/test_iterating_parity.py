"""Iterator-family parity (src/system/iterating.rs + structures/iterators.rs):
geometry-filtered iteration with the reference's exact counts, bonded/
molecule iteration, and iterator-level center/COM."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.core.shapes import Cylinder, Rectangular, Sphere
from groan_rs_tpu.errors import AtomError
from groan_rs_tpu.system import System


@pytest.fixture(scope="module")
def ndx(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    return s


def test_filter_sphere_count_water(ndx):
    """iterating.rs:695 — 1305 water atoms within 4.5 nm of the protein
    center."""
    c = np.asarray(ndx.group_get_center("Protein"))
    got = ndx.group_filter_geometry("W", Sphere(c, 4.5))
    assert len(got) == 1305


def test_filter_sphere_count_phosphates(ndx):
    s = ndx.copy()
    s.group_create("Phosphates", "name PO4")
    c = np.asarray(s.group_get_center("Protein"))
    assert len(s.group_filter_geometry("Phosphates", Sphere(c, 2.1))) == 6


@pytest.mark.parametrize("axis,expected", [
    (Dimension.X, 29), (Dimension.Y, 17), (Dimension.Z, 79),
])
def test_filter_cylinder_count_water(ndx, axis, expected):
    """iterating.rs:732-788 exact per-axis cylinder counts."""
    c = np.asarray(ndx.group_get_center("Protein"))
    cyl = Cylinder(c, 2.0, 3.0, axis)
    assert len(ndx.group_filter_geometry("W", cyl)) == expected


def test_filter_rectangular_count_water(ndx):
    c = np.asarray(ndx.group_get_center("Protein"))
    rect = Rectangular(c, 2.0, 3.0, 4.0)
    assert len(ndx.group_filter_geometry("W", rect)) == 92
    full = Rectangular([0.0, 0.0, 0.0], 100.0, 100.0, 100.0)
    assert len(ndx.group_filter_geometry("W", full)) == ndx.group_get_n_atoms("W")


def test_filter_atoms_without_positions(ndx):
    """iterating.rs:822 — positionless atoms never pass a geometry filter."""
    s = ndx.copy()
    for i in range(s.get_n_atoms()):
        s.has_position[i] = False
    full = Rectangular([0.0, 0.0, 0.0], 100.0, 100.0, 100.0)
    assert len(s.group_filter_geometry("W", full)) == 0


def test_bonded_atoms_iter(test_files):
    """iterating.rs bonded_atoms_iter — neighbours of atom 1 in example.tpr
    topology; out-of-range raises."""
    s = System.from_file(os.path.join(test_files, "example.tpr"))
    neigh = [a.get_index() for a in s.bonded_atoms_iter(1)]
    assert neigh == list(s.topology.bonded[1])
    assert len(neigh) > 0
    with pytest.raises(AtomError):
        list(s.bonded_atoms_iter(s.get_n_atoms()))


def test_molecule_iter_sizes(test_files):
    """iterating.rs molecule_iter_index0/28/49 — whole-molecule traversal
    from any member atom; invalid index raises."""
    s = System.from_file(os.path.join(test_files, "example.tpr"))
    mol0 = [a.get_index() for a in s.molecule_iter(0)]
    assert 0 in mol0 and len(mol0) >= 1
    assert sorted(mol0) == sorted(s.get_molecule_indices(0))
    # every atom of the same molecule yields the same set
    mol_again = [a.get_index() for a in s.molecule_iter(mol0[-1])]
    assert sorted(mol_again) == sorted(mol0)
    with pytest.raises(AtomError):
        list(s.molecule_iter(10 ** 7))


def test_selection_iter_and_geometry(ndx):
    """iterating.rs selection_iter(_filter_geometry)."""
    names = {a.get_atom_name() for a in ndx.selection_iter("name PO4")}
    assert names == {"PO4"}
    count = sum(1 for _ in ndx.selection_iter("name PO4"))
    s2 = ndx.copy()
    s2.group_create("P", "name PO4")
    assert count == s2.group_get_n_atoms("P")
