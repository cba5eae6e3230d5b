"""Groups-family parity vs the reference's expected atom counts
(src/system/groups.rs inline tests, 92 tests)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.core.shapes import Cylinder, Rectangular, Sphere, TriangularPrism
from groan_rs_tpu.errors import GroupError, SelectError
from groan_rs_tpu.system import System
from groan_rs_tpu.system.core import GroupOverwriteWarning


@pytest.fixture(scope="module")
def example(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


@pytest.fixture(scope="module")
def aa_membrane(test_files):
    return System.from_file(os.path.join(test_files, "aa_membrane_peptide.gro"))


def test_group_create_basic(example):
    s = example.copy()
    s.group_create("Membrane", "resname POPC")
    assert s.group_exists("Membrane")
    assert s.group_get_n_atoms("Membrane") == 6144
    assert all(s.group_isin("Membrane", i) for i in range(61, 6205))
    s.group_create("Protein", "serial 1 to 61")
    assert s.group_get_n_atoms("Protein") == 61
    assert all(s.group_isin("Protein", i) for i in range(0, 61))
    # reference groups.rs:772 group_isempty
    assert not s.group_isempty("Protein")
    s.group_create("Nothing", "resname NOPE")
    assert s.group_isempty("Nothing")
    with pytest.raises(GroupError):
        s.group_isempty("Absent")


def test_group_create_fails(example):
    s = example.copy()
    with pytest.raises(GroupError):
        s.group_create("Memb!rane", "resname POPC")
    assert not s.group_exists("Memb!rane")
    with pytest.raises((GroupError, SelectError)):
        s.group_create("Membrane", "resname POPC &&")
    assert not s.group_exists("Membrane")
    with pytest.raises((GroupError, SelectError)):
        s.group_create("Membrane", "(resname POPC && resname POPE))")
    with pytest.raises((GroupError, SelectError)):
        s.group_create("MyProtein", "Protein")  # nonexistent group


def test_group_create_overwrite_warns(example):
    s = example.copy()
    s.group_create("Membrane", "serial 1")
    with pytest.warns(GroupOverwriteWarning):
        s.group_create("Membrane", "resname POPC")
    assert s.group_get_n_atoms("Membrane") == 6144


def test_group_create_chain_pdb(test_files):
    s = System.from_file(os.path.join(test_files, "example.pdb"))
    s.group_create("Chains A+B", "chain A B")
    assert s.group_get_n_atoms("Chains A+B") == 31
    assert all(s.group_isin("Chains A+B", i) for i in range(0, 31))
    s.group_create("Chain C", "chain C")
    assert s.group_get_n_atoms("Chain C") == 19
    assert all(s.group_isin("Chain C", i) for i in range(31, 50))


def test_group_create_chain_from_gro_is_empty(example):
    s = example.copy()
    s.group_create("Chains A+B", "chain A B")
    assert s.group_get_n_atoms("Chains A+B") == 0


def test_group_create_element_name_symbol(aa_membrane):
    s = aa_membrane.copy()
    s.guess_elements()
    for name, query in [("Elements", "element name carbon phosphorus"),
                        ("Elements2", "elname carbon phosphorus"),
                        ("E3", "element symbol C P"),
                        ("E4", "elsymbol C P")]:
        s.group_create(name, query)
        assert s.group_get_n_atoms(name) == 5612


def test_group_create_element_without_guess_is_empty(aa_membrane):
    s = aa_membrane.copy()
    s.group_create("Elements", "element name carbon phosphorus")
    assert s.group_get_n_atoms("Elements") == 0


def test_group_create_molwith(test_files):
    s = System.from_file(os.path.join(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(os.path.join(test_files, "conect.pdb"))
    s.group_create("M1", "molecule  with (resname LYS and name SC2)")
    assert s.group_get_n_atoms("M1") == 1
    s.group_create("M2", "mol with resname LYS and name SC2")
    assert s.group_get_n_atoms("M2") == 8
    s.select_and_label("ReferenceAtom", "serial 17")
    s.group_create("M3", "molecule with label ReferenceAtom")
    assert s.group_get_n_atoms("M3") == 49


@pytest.mark.parametrize("name,query,n,fixture", [
    ("Protein", "@protein", 61, "example.gro"),
    ("Membrane", "@membrane", 6144, "example.gro"),
    ("Water", "@water", 10399, "example.gro"),
    ("Ion", "@ion", 240, "example.gro"),
    ("Water", "@water", 15273, "aa_membrane_peptide.gro"),
    ("Ion", "@ion", 29, "aa_membrane_peptide.gro"),
    ("DNA", "@dna", 169, "protein_with_dna.pdb"),
    ("RNA", "@rna", 1108, "rna.pdb"),
    ("Membrane", "@membrane", 10, "lipids_cdl.gro"),
])
def test_group_create_macros(test_files, name, query, n, fixture):
    s = System.from_file(os.path.join(test_files, fixture))
    s.group_create(name, query)
    assert s.group_get_n_atoms(name) == n


def test_group_create_complex(example, test_files):
    s = example.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    s.group_create(
        "Complex Group",
        "((serial 1 - 15 or atomnum 13 14 15 16 || atomnum 62 64 to 70) && Protein ION) or "
        "(resid 11179 to 13000 or resnum 5400) and (resname W or (resname GLY LEU and (name BB or atomname SC1)))",
    )
    assert s.group_get_n_atoms("Complex Group") == 2
    idx = s.group_indices("Complex Group")
    assert list(idx) == [0, 11063]


def test_group_create_labeled_atoms(example):
    s = example.copy()
    s.label_atom("MyAtom 1", 654)
    s.label_atom("AtomX", 2464)
    s.label_atom("Different one", 52)
    s.group_create("group 1", "label 'MyAtom 1' AtomX 'Different one'")
    assert s.group_get_n_atoms("group 1") == 3
    s.group_create("water", "resname W")
    s.group_create("group 3", "water or label 'MyAtom 1'")
    assert s.group_get_n_atoms("group 3") == s.group_get_n_atoms("water") + 1


@pytest.mark.parametrize("name,query,n", [
    ("LysLeuAla", "resname r'^[LA].*'", 36),
    ("Tails", "resname POPC and name r'^[CD][124][AB]'", 3072),
    ("Group3", "resname r'^..PC' r'L'", 6203),
    ("Selection", "resname POPC and (name r'C[1234]A|C[1234]B' or name D2A)", 4096),
])
def test_group_create_regex(example, name, query, n):
    s = example.copy()
    s.group_create(name, query)
    assert s.group_get_n_atoms(name) == n


def test_group_create_regex_groups(example, test_files):
    s = example.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    s.group_create("Regex1", "r'^Transmembrane'")
    assert s.group_get_n_atoms("Regex1") == 61
    s.group_create("Regex2", "r'^Transmembrane$'")
    assert s.group_get_n_atoms("Regex2") == 29
    s.group_create("Regex3", "group r'^P' ION")
    assert s.group_get_n_atoms("Regex3") == 6445
    s.group_create("Regex4", "group r'^P' r'^X' ION")
    assert s.group_get_n_atoms("Regex4") == 6445
    with pytest.raises((GroupError, SelectError)):
        s.group_create("Regex5", "group r'X'")


def test_group_create_regex_aa(aa_membrane):
    s = aa_membrane.copy()
    s.group_create("Hydrogens", "name r'^[1-9]?H.*'")
    assert s.group_get_n_atoms("Hydrogens") == 20875


# ------------------------------------------------------------- geometry

def test_group_from_geometry_cylinder(example, test_files):
    s = example.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    cyl = Cylinder([5.0, 8.0, 3.0], 2.0, 6.0, Dimension.Y)
    s.group_create_from_geometry("Selected Membrane", "Membrane", cyl)
    assert s.group_get_n_atoms("Selected Membrane") == 206


def test_group_from_geometry_sphere(example, test_files):
    s = example.copy()
    sph = Sphere([0.5, 4.5, 3.5], 4.6)
    s.group_create_from_geometry("Selected Water", "resname W", sph)
    assert s.group_get_n_atoms("Selected Water") == 1881


def test_group_from_geometry_rectangular(example):
    s = example.copy()
    rect = Rectangular([5.0, 0.0, 2.0], 5.0, 4.0, 4.3)
    s.group_create_from_geometry("Selected Protein", "@protein", rect)
    assert s.group_get_n_atoms("Selected Protein") == 25


def test_group_from_geometry_triangular_prism(example):
    s = example.copy()
    prism = TriangularPrism([8.0, 8.0, 8.0], [15.0, 12.0, 8.0], [9.5, 7.3, 8.0], 5.4)
    s.group_create_from_geometry("Selected Water", "@water", prism)
    assert s.group_get_n_atoms("Selected Water") == 213


def test_group_from_geometry_fails(example, test_files):
    s = example.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    cyl = Cylinder([5.0, 8.0, 3.0], 2.0, 6.0, Dimension.Y)
    with pytest.raises(GroupError):
        s.group_create_from_geometry("Selected Me>brane", "Membrane", cyl)
    with pytest.raises((GroupError, SelectError)):
        s.group_create_from_geometry("Selected Membrane", "brane", cyl)


# ------------------------------------------------------------- indices / ranges

def test_group_from_indices(example):
    s = example.copy()
    s.group_create_from_indices("Indexed", [0, 5, 9, 10, 11, 5])
    assert s.group_get_n_atoms("Indexed") == 5


def test_group_from_ranges(example):
    s = example.copy()
    s.group_create_from_ranges("Ranged", [(0, 9), (5, 14), (100, 104)])
    assert s.group_get_n_atoms("Ranged") == 20


def test_group_open_ended_ranges(example):
    s = example.copy()
    s.group_create("First", "serial <= 16")
    assert s.group_get_n_atoms("First") == 16
    s.group_create("Last", "serial > 16843")
    assert s.group_get_n_atoms("Last") == 1
    s.group_create("G3", "serial < 17")
    assert s.group_get_n_atoms("G3") == 16
    s.group_create("G4", "serial >= 16844")
    assert s.group_get_n_atoms("G4") == 1


# ------------------------------------------------------------- union / misc

def test_group_union_intersection(example):
    s = example.copy()
    s.group_create("Protein", "@protein")
    s.group_create("Membrane", "@membrane")
    s.group_union("Protein", "Membrane", "Both")
    assert s.group_get_n_atoms("Both") == 61 + 6144
    s.group_intersection("Protein", "Membrane", "Neither")
    assert s.group_get_n_atoms("Neither") == 0


def test_group_split_by_resid(example, test_files):
    """reference: groups.rs:2389-2415 — 29 residues, exact per-residue
    counts, names ordered 'resid 1'..'resid 29'."""
    s = example.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    names = s.group_split_by_resid("Protein")
    assert len(names) == 29
    for i, n in enumerate(names, start=1):
        assert n == f"resid {i}"
        assert s.group_exists(n)
        assert s.group_get_n_atoms(n) > 0
    assert s.group_get_n_atoms("resid 1") == 1
    assert s.group_get_n_atoms("resid 2") == 3
    assert s.group_get_n_atoms("resid 15") == 2
    assert s.group_get_n_atoms("resid 29") == 2


def test_union_intersection_iterators(example):
    """reference: UnionAtomIterator / IntersectionAtomIterator
    (iterators.rs:660,758) — System order, each atom at most once."""
    s = example.copy()
    s.group_create("A", "serial 1 to 10")
    s.group_create("B", "serial 5 to 15")
    u = [a.get_index() for a in s.group_union_iter("A", "B")]
    assert u == list(range(0, 15))
    i = [a.get_index() for a in s.group_intersection_iter("A", "B")]
    assert i == list(range(4, 10))


def test_atom_pairs_iter(example):
    s = example.copy()
    pairs = [(0, 5), (3, 2)]
    out = [(a.get_index(), b.get_index()) for a, b in s.atom_pairs_iter(pairs)]
    assert out == pairs
    import pytest as _pytest

    from groan_rs_tpu.errors import AtomError
    with _pytest.raises(AtomError):
        list(s.atom_pairs_iter([(0, 10**9)]))


# =====================================================================
# Group management parity (groups.rs: extend/remove/rename/isin/isempty)
# =====================================================================

@pytest.fixture()
def ndx(example, test_files):
    s = example.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    return s


def test_group_extend_simple_and_overlap(ndx):
    """groups.rs group_extend_simple/_overlap."""
    old = ndx.group_get_n_atoms("Protein")
    ndx.group_extend("Protein", "ION")
    assert ndx.group_get_n_atoms("Protein") == old + ndx.group_get_n_atoms("ION")
    old_pm = ndx.group_get_n_atoms("Protein_Membrane")
    ndx.group_extend("Protein_Membrane", "Membrane")
    assert ndx.group_get_n_atoms("Protein_Membrane") == old_pm
    with pytest.raises(GroupError):
        ndx.group_extend("Protein", "Nonexistent")


def test_group_remove_and_nonexistent(ndx):
    ndx.group_remove("Protein")
    assert not ndx.group_exists("Protein")
    with pytest.raises(GroupError, match="Proin"):
        ndx.group_remove("Proin")
    # default groups are protected
    with pytest.raises(GroupError):
        ndx.group_remove("all")


def test_group_rename_variants(ndx):
    """groups.rs group_rename/_nonexistent/_overwrite."""
    ndx.group_rename("Protein", "My Protein Group")
    assert not ndx.group_exists("Protein")
    assert ndx.group_exists("My Protein Group")
    assert all(ndx.group_isin("My Protein Group", i) for i in range(61))

    with pytest.raises(GroupError, match="Proin"):
        ndx.group_rename("Proin", "Whatever")

    with pytest.warns(GroupOverwriteWarning):
        ndx.group_rename("My Protein Group", "Membrane")
    assert not ndx.group_exists("My Protein Group")
    assert ndx.group_exists("Membrane")
    assert all(ndx.group_isin("Membrane", i) for i in range(61))


def test_group_isin_advanced_and_fails(ndx):
    """groups.rs group_isin_advanced/_fails — exact index spans from
    index.ndx."""
    assert all(ndx.group_isin("Transmembrane_all", i) for i in range(0, 61))
    assert all(ndx.group_isin("Membrane", i) for i in range(61, 6205))
    assert all(ndx.group_isin("ION", i) for i in range(16604, 16844))
    with pytest.raises(GroupError, match="Nonexistent"):
        ndx.group_isin("Nonexistent", 3)
    assert not ndx.group_isin("Protein", 16845)


def test_group_isempty_exact(example):
    """groups.rs group_isempty."""
    s = example.copy()
    s.group_create("Membrane2", "@membrane and name PO4")
    s.group_create("Single", "serial 15")
    s.group_create("Empty", "resname NON")
    assert not s.group_isempty("Membrane2")
    assert not s.group_isempty("Single")
    assert s.group_isempty("Empty")
    with pytest.raises(GroupError, match="Nonexistent"):
        s.group_isempty("Nonexistent")


def test_split_by_resname_counts(example):
    """groups.rs split_by_resname — group per residue name with exact
    counts."""
    s = example.copy()
    names = s.atoms_split_by_resname()
    assert set(names) >= {"resname POPC", "resname W", "resname ION"}
    assert s.group_get_n_atoms("resname POPC") == 6144
    total = sum(s.group_get_n_atoms(n) for n in names)
    assert total == s.get_n_atoms()


def test_group_split_by_resid_not_first_group(ndx):
    """groups.rs group_split_by_resid_not_first_group — splitting a
    non-'all' group only covers that group's atoms."""
    names = ndx.group_split_by_resid("Protein")
    got = sum(ndx.group_get_n_atoms(n) for n in names)
    assert got == 61
    assert all(n.startswith("resid ") for n in names)
    with pytest.raises(GroupError):
        ndx.group_split_by_resid("Nonexistent")


def test_group_create_invalid_names(example):
    """groups.rs group_create_invalid_names + from_indices/_ranges
    variants."""
    s = example.copy()
    for bad in ("Memb!rane", "Group<>", "Group&& x"):
        with pytest.raises(GroupError):
            s.group_create_from_indices(bad, [1, 2, 3])
        with pytest.raises(GroupError):
            s.group_create_from_ranges(bad, [(0, 10)])


def test_group_from_geometry_atoms_without_positions(example):
    """groups.rs:1710 — atoms lacking positions are never geometry-selected
    (the group comes out empty, no error)."""
    s = example.copy()
    for i in range(s.get_n_atoms()):
        s.has_position[i] = False
    s.group_create_from_geometry(
        "No atoms", "all", Rectangular([5.0, 0.0, 2.0], 5.0, 4.0, 4.3))
    assert s.group_get_n_atoms("No atoms") == 0


def test_group_from_geometries_complex(example):
    """groups.rs group_create_from_geometries_complex — intersection of
    multiple shapes."""
    s = example.copy()
    s.group_create_from_geometries(
        "G", "all",
        [Sphere([6.0, 6.0, 6.0], 4.0), Rectangular([4.0, 4.0, 4.0], 4.0, 4.0, 4.0)],
    )
    sph = s.copy()
    sph.group_create_from_geometry("S", "all", Sphere([6.0, 6.0, 6.0], 4.0))
    rect = s.copy()
    rect.group_create_from_geometry("R", "all",
                                    Rectangular([4.0, 4.0, 4.0], 4.0, 4.0, 4.0))
    inter = set(map(int, sph.group_indices("S"))) & set(map(int, rect.group_indices("R")))
    assert set(map(int, s.group_indices("G"))) == inter
    assert len(inter) > 0


def test_group_struct_api(test_files):
    """The Group struct's own public surface (group.rs:30-340):
    constructors, algebra, get_atoms, write_ndx."""
    import io as _io

    from groan_rs_tpu.system.core import Group

    s = System.from_file(os.path.join(test_files, "example.gro"))
    n = s.get_n_atoms()

    gi = Group.from_indices([5, 3, 3, 9, n + 50], n)  # dedup + drop OOR
    assert sorted(gi.get_atoms()) == [3, 5, 9]
    gr = Group.from_ranges([(0, 4), (3, 6)], n)       # merge overlap
    assert gr.get_n_atoms() == 7

    gq = Group.from_query("@protein", s)
    assert gq.get_n_atoms() == s.group_indices("Protein").shape[0] \
        if s.group_exists("Protein") else gq.get_n_atoms() > 0

    u = Group.union(gi, gr)
    assert sorted(u.get_atoms()) == [0, 1, 2, 3, 4, 5, 6, 9]
    it = Group.intersection(gi, gr)
    assert sorted(it.get_atoms()) == [3, 5]

    buf = _io.StringIO()
    gi.write_ndx(buf, "Test")
    assert buf.getvalue() == "[ Test ]\n   4    6   10\n"

    from groan_rs_tpu.core.shapes import Sphere

    ggeo = Group.from_query_and_geometry(
        "all", Sphere(s.group_get_center("all"), 1.0), s)
    assert 0 < ggeo.get_n_atoms() < n


def test_container_iter_method(test_files):
    from groan_rs_tpu.core.container import AtomContainer

    c = AtomContainer.from_ranges([(2, 4)], 10)
    assert list(c.iter()) == [2, 3, 4]
