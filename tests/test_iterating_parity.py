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


def test_chained_iterator_get_center_exact(test_files):
    """iterators.rs test iterator_get_center — Membrane atoms within a
    2.0-sphere of the Protein center; exact reference doc values."""
    from groan_rs_tpu.core.shapes import Sphere

    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    sphere = Sphere(s.group_get_center("Protein"), 2.0)
    center = s.group_iter("Membrane").filter_geometry(sphere).get_center()
    np.testing.assert_allclose(
        np.asarray(center), [9.848716, 2.4805717, 5.4309845], atol=1e-5)


def test_iterator_union_intersection_match_group_algebra(test_files):
    """iterators.rs union/intersection adaptors agree with the Group
    algebra over the same geometric selections
    (test iterator_filter_geometry_union pattern)."""
    from groan_rs_tpu.core.shapes import Cylinder
    from groan_rs_tpu.core.dimension import Dimension

    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("Protein", "@protein")
    c = s.group_get_center("Protein")
    zcyl = Cylinder(c, 2.5, 4.0, Dimension.Z)
    xcyl = Cylinder(c, 3.5, 2.0, Dimension.X)
    s.group_create_from_geometry("Zcylinder", "@membrane", zcyl)
    s.group_create_from_geometry("Xcylinder", "@membrane", xcyl)
    s.group_union("Xcylinder", "Zcylinder", "Geometry")

    it_u = (s.selection_iter("@membrane").filter_geometry(zcyl)
            .union(s.selection_iter("@membrane").filter_geometry(xcyl)))
    np.testing.assert_array_equal(it_u.indices, s.group_indices("Geometry"))

    s.group_intersection("Xcylinder", "Zcylinder", "Both")
    it_i = (s.selection_iter("@membrane").filter_geometry(zcyl)
            .intersection(s.selection_iter("@membrane").filter_geometry(xcyl)))
    np.testing.assert_array_equal(it_i.indices, s.group_indices("Both"))


def test_iterator_translate_and_wrap(test_files):
    """MutableAtomIterable::translate semantics: move + PBC wrap, only
    the iterator's atoms."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("Protein", "@protein")
    before = s.positions.copy()
    idx = s.group_indices("Protein")
    s.group_iter("Protein").translate([1.0, 0.0, 0.0])
    box = s.simbox.to_lengths_vec()
    expected = before[idx].copy()
    expected[:, 0] = (expected[:, 0] + 1.0) % box[0]
    np.testing.assert_allclose(s.positions[idx], expected, atol=1e-5)
    others = np.setdiff1d(np.arange(s.get_n_atoms()), idx)
    np.testing.assert_array_equal(s.positions[others], before[others])


def test_iterator_estimate_and_naive_centers(test_files):
    """Aggregators agree with the System group_* methods (same kernels)."""
    s = System.from_file(os.path.join(test_files, "example.tpr"))
    s.group_create("Protein", "@protein")
    it = lambda: s.group_iter("Protein")
    np.testing.assert_array_equal(it().get_center(),
                                  s.group_get_center("Protein"))
    np.testing.assert_array_equal(it().get_com(),
                                  s.group_get_com("Protein"))
    np.testing.assert_array_equal(it().get_center_naive(),
                                  s.group_get_center_naive("Protein"))
    np.testing.assert_array_equal(it().get_com_naive(),
                                  s.group_get_com_naive("Protein"))
    np.testing.assert_array_equal(it().estimate_center(),
                                  s.group_estimate_center("Protein"))
    np.testing.assert_array_equal(it().estimate_com(),
                                  s.group_estimate_com("Protein"))
