"""Parity tests: structure I/O, groups, GSL selection vs reference test
expectations (values from the reference's inline test suites)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.container import AtomContainer
from groan_rs_tpu.errors import GroupError, ParseGroError, SelectError
from groan_rs_tpu.system import System


@pytest.fixture(scope="module")
def example_gro(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_read_gro_basic(example_gro):
    # reference: gro_io/structure.rs tests_read::read
    s = example_gro
    assert s.get_name() == "INSANE! Membrane UpperLeaflet>POPC=1 LowerLeaflet>POPC=1"
    assert s.get_n_atoms() == 16844
    sb = s.get_box()
    assert sb.x == pytest.approx(13.01331, abs=1e-5)
    assert sb.y == pytest.approx(13.01331, abs=1e-5)
    assert sb.z == pytest.approx(11.25347, abs=1e-5)
    # first atom
    a = s.get_atom(0)
    assert a.get_residue_number() == 1
    assert a.get_residue_name() == "GLY"
    assert a.get_atom_name() == "BB"
    assert a.get_atom_number() == 1
    np.testing.assert_allclose(a.get_position(), [9.497, 1.989, 7.498], atol=1e-5)
    np.testing.assert_allclose(a.get_velocity(), [-0.0683, 0.1133, 0.0005], atol=1e-5)


def test_group_create_basic(example_gro):
    # reference: groups.rs tests group_create_basic
    s = example_gro.copy()
    s.group_create("Membrane", "resname POPC")
    assert s.group_exists("Membrane")
    assert s.group_get_n_atoms("Membrane") == 6144
    for i in (61, 3000, 6204):
        assert s.group_isin("Membrane", i)

    s.group_create("Protein", "serial 1 to 61")
    assert s.group_get_n_atoms("Protein") == 61
    for i in (0, 30, 60):
        assert s.group_isin("Protein", i)
    assert not s.group_isin("Protein", 61)


def test_macros_cover_system(example_gro):
    s = example_gro.copy()
    s.group_create("P", "@protein")
    s.group_create("M", "@membrane")
    s.group_create("W", "@water")
    s.group_create("I", "@ion")
    n_p = s.group_get_n_atoms("P")
    n_m = s.group_get_n_atoms("M")
    n_w = s.group_get_n_atoms("W")
    n_i = s.group_get_n_atoms("I")
    assert n_p == 61
    assert n_m == 6144
    assert n_w > 0 and n_i > 0
    # martini example system is exactly protein + membrane + water + ions
    assert n_p + n_m + n_w + n_i == 16844


def test_complex_queries(example_gro):
    s = example_gro.copy()
    s.group_create("sel", "resname POPC and name PO4")
    assert s.group_get_n_atoms("sel") == 6144 // 12  # 12 beads per POPC
    s.group_create("not_popc", "not resname POPC")
    assert s.group_get_n_atoms("not_popc") == 16844 - 6144
    s.group_create("combo", "(serial 1 to 61 or resname POPC) and not name BB")
    n_bb_protein = sum(
        1 for i in range(61) if s.topology.atomname.get(i) == "BB"
    )
    assert s.group_get_n_atoms("combo") == 61 + 6144 - n_bb_protein - 0
    s.group_create("rx", "resname r'^PO'")
    assert s.group_get_n_atoms("rx") == 6144
    s.group_create("ranges", "resid 1 - 3 5")
    expected = int(np.isin(s.topology.resnum, [1, 2, 3, 5]).sum())
    assert s.group_get_n_atoms("ranges") == expected
    s.group_create("gt", "serial > 16800")
    assert s.group_get_n_atoms("gt") == 44


def test_group_from_group_query(example_gro):
    s = example_gro.copy()
    s.group_create("Membrane", "resname POPC")
    s.group_create("FromGroup", "group Membrane and name PO4")
    assert s.group_get_n_atoms("FromGroup") == 512
    s.group_create("Bare", "Membrane")  # bare token = group name
    assert s.group_get_n_atoms("Bare") == 6144
    with pytest.raises(GroupError):
        s.group_create("Bad", "group Nonexistent")


def test_select_errors(example_gro):
    s = example_gro.copy()
    for q in ["", "((resname POPC)", "resname 'POPC", "resname POPC &&",
              "serial 5 - 3", "atomid 3"]:
        with pytest.raises(GroupError):
            s.group_create("x", q)


def test_container_vectors():
    # reference: group.rs tests from_ranges / from_indices / get_n_atoms_basic
    g = AtomContainer.from_ranges(
        [(10, 15), (17, 25), (11, 11), (7, 3), (9, 10), (15, 15), (16, 18), (2, 5), (10, 15)],
        20,
    )
    assert g.get_n_atoms() == 15
    assert list(g) == [2, 3, 4, 5, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19]

    g2 = AtomContainer.from_indices([11, 1, 2, 3, 20, 5, 0, 5, 4, 18, 6, 19, 1, 13, 20, 27], 20)
    assert g2.get_n_atoms() == 11
    assert list(g2) == [0, 1, 2, 3, 4, 5, 6, 11, 13, 18, 19]

    g3 = AtomContainer.from_ranges(
        [(64, 128), (5, 32), (1, 25), (129, 133), (133, 200), (35, 78), (10, 15)], 1028
    )
    assert g3.get_n_atoms() == 198


def test_read_pdb(test_files):
    s = System.from_file(os.path.join(test_files, "example.pdb"))
    assert s.get_n_atoms() == 50
    assert s.get_atom(0).get_chain() == "A"
    assert s.get_atom(49).get_chain() == "C"
    # chains select
    s.group_create("AB", "chain A B")
    assert s.group_get_n_atoms("AB") == 31
    s.group_create("C", "chain C")
    assert s.group_get_n_atoms("C") == 19
    # nochain variant agrees on coordinates
    s2 = System.from_file(os.path.join(test_files, "example_nochain.pdb"))
    assert s2.get_atom(0).get_chain() is None
    np.testing.assert_allclose(s.positions, s2.positions, atol=1e-6)


def test_read_pqr(test_files):
    s = System.from_file(os.path.join(test_files, "example.pqr"))
    assert s.get_name() == "Buforin II peptide P11L"
    a = s.get_atom(0)
    assert a.get_atom_name() == "BB"
    assert a.get_residue_name() == "THR"
    assert a.get_chain() == "A"
    assert a.get_charge() == pytest.approx(1.0, abs=1e-5)
    assert a.get_vdw() == pytest.approx(0.28, abs=1e-5)
    np.testing.assert_allclose(a.get_position(), [1.66, 2.061, 3.153], atol=1e-5)


def test_read_ndx(example_gro, test_files):
    s = example_gro.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    assert s.group_exists("System")
    assert s.group_get_n_atoms("System") == 16844
    assert s.group_exists("Protein")
    assert s.group_get_n_atoms("Protein") == 61
    assert s.group_exists("Membrane")


def test_write_gro_roundtrip(example_gro, tmp_path):
    s = example_gro
    out = tmp_path / "out.gro"
    s.write_gro(out, write_velocities=True)
    s2 = System.from_file(out)
    assert s2.get_n_atoms() == s.get_n_atoms()
    np.testing.assert_allclose(s2.positions, s.positions, atol=5e-4)
    np.testing.assert_allclose(s2.velocities, s.velocities, atol=5e-5)
    assert s2.get_name() == s.get_name()
    # golden: rewriting our own output is byte-stable
    out2 = tmp_path / "out2.gro"
    s2.write_gro(out2, write_velocities=True)
    assert out.read_bytes() == out2.read_bytes()


def test_write_ndx_roundtrip(example_gro, tmp_path, test_files):
    s = example_gro.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    out = tmp_path / "out.ndx"
    s.write_ndx(out)
    s2 = example_gro.copy()
    s2.read_ndx(out)
    for name in s.group_names():
        assert s2.group_exists(name)
        assert s2.group_get_n_atoms(name) == s.group_get_n_atoms(name)


def test_gro_parse_errors(test_files):
    for bad in [
        "example_invalid_position.gro",
        "example_shifted_line.gro",
        "example_invalid_atomid.gro",
        "example_unparsable_box.gro",
        "example_missing_atom.gro",
        "example_unparsable_natoms.gro",
        "example_only_title.gro",
        "nan_error.gro",
    ]:
        with pytest.raises(ParseGroError):
            System.from_file(os.path.join(test_files, bad))


def test_split_by_resname(example_gro):
    s = example_gro.copy()
    names = s.atoms_split_by_resname()
    assert "resname POPC" in names
    assert s.group_get_n_atoms("resname POPC") == 6144
    total = sum(s.group_get_n_atoms(n) for n in names)
    assert total == 16844


def test_group_algebra(example_gro):
    s = example_gro.copy()
    s.group_create("A", "serial 1 to 100")
    s.group_create("B", "serial 50 to 150")
    s.group_union("A", "B", "U")
    assert s.group_get_n_atoms("U") == 150
    s.group_intersection("A", "B", "I")
    assert s.group_get_n_atoms("I") == 51
    s.group_extend("A", "B")
    assert s.group_get_n_atoms("A") == 150


def test_labels(example_gro):
    s = example_gro.copy()
    s.select_and_label("first_bb", "serial 1")
    assert s.label_exists("first_bb")
    assert s.get_labeled_atom("first_bb").get_index() == 0
    s.group_create("lab", "label first_bb")
    assert s.group_get_n_atoms("lab") == 1
    from groan_rs_tpu.errors import LabelError

    with pytest.raises(LabelError):
        s.select_and_label("many", "resname POPC")


def test_mol_with(test_files):
    s = System.from_file(os.path.join(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(os.path.join(test_files, "conect.pdb"))
    assert s.has_bonds()
    # every atom reachable from atoms named according to a query
    s.group_create("mols", "mol with serial 1")
    n = s.group_get_n_atoms("mols")
    assert n == len(s.get_molecule_indices(0))


def test_triclinic_tpr_box(test_files):
    """triclinic.tpr loads with its non-orthogonal box intact."""
    import numpy as np

    from groan_rs_tpu.system import System

    s = System.from_file(os.path.join(test_files, "triclinic.tpr"))
    sb = s.get_box()
    assert sb is not None and not sb.is_orthogonal()
    m = np.asarray(sb.to_matrix())
    assert np.abs(m[1, 0]) + np.abs(m[2, 0]) + np.abs(m[2, 1]) > 0
    assert s.get_n_atoms() == 50


def test_gro_box9_write_roundtrip(test_files, tmp_path):
    """reference: gro_io/structure.rs write_gro9 — a 9-component box file
    round-trips byte-for-byte."""
    from groan_rs_tpu.system import System

    src = os.path.join(test_files, "example_box9.gro")
    s = System.from_file(src)
    out = tmp_path / "out.gro"
    s.write_gro(out)
    assert open(src, "rb").read() == open(out, "rb").read()


def test_write_ndx_byte_golden(test_files, tmp_path):
    """ndx_io.rs write — rewriting index.ndx reproduces it byte-for-byte."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    out = str(tmp_path / "out.ndx")
    s.write_ndx(out)
    assert open(out, "rb").read() == open(
        os.path.join(test_files, "index.ndx"), "rb").read()


def test_gro_cat_range_step_matches_xtc(test_files):
    """gro_io/trajectory.rs:830 — concatenated GRO split with range+step
    tracks the XTC trajectory frame-for-frame."""
    import itertools

    s1 = System.from_file(os.path.join(test_files, "protein_trajectory.gro"))
    s2 = System.from_file(os.path.join(test_files, "example.gro"))
    it1 = s1.traj_cat_iter(
        [os.path.join(test_files, "split", f"traj{i}.gro") for i in (1, 2, 3, 4, 5)]
    ).with_range(300.0, 800.0).with_step(2)
    it2 = s2.xtc_iter(
        os.path.join(test_files, "short_trajectory.xtc")
    ).with_range(300.0, 800.0).with_step(2)
    n = 0
    for f1, f2 in itertools.zip_longest(it1, it2):
        assert f1 is not None and f2 is not None
        assert f1.get_time() == pytest.approx(f2.get_time(), abs=1e-3)
        n += 1
    assert n == 3  # 300, 500, 700


def test_from_file_unknown_and_no_extension(test_files):
    """mod.rs:759/767 — unsupported or extension-less paths error naming
    the file."""
    from groan_rs_tpu.errors import GroanError

    with pytest.raises(GroanError, match="index.ndx"):
        System.from_file(os.path.join(test_files, "index.ndx"))
    with pytest.raises(GroanError, match="info.txt"):
        System.from_file(os.path.join(test_files, "split", "info.txt"))


def test_has_duplicate_atom_numbers(test_files):
    """mod.rs:928."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    assert not s.has_duplicate_atom_numbers()
    s.get_atom(1).set_atom_number(1)
    assert s.has_duplicate_atom_numbers()


def test_get_box_center_not_orthogonal(test_files):
    """mod.rs:1119 — triclinic boxes reject the orthogonal box-center
    helper."""
    from groan_rs_tpu.errors import SimBoxError

    s = System.from_file(os.path.join(test_files, "triclinic.gro"))
    with pytest.raises(SimBoxError):
        s.get_box_center()


def test_from_file_with_format_overrides_extension(test_files, tmp_path):
    """mod.rs:775 — explicit FileType overrides the extension."""
    import shutil

    from groan_rs_tpu.files import FileType

    renamed = str(tmp_path / "example.txt")
    shutil.copy(os.path.join(test_files, "example.gro"), renamed)
    s = System.from_file_with_format(renamed, FileType.GRO)
    auto = System.from_file(os.path.join(test_files, "example.gro"))
    assert s.get_n_atoms() == auto.get_n_atoms()


def test_format_pinned_writer_inits(test_files, tmp_path):
    """xtc_io/mod.rs:236 / trr_io.rs:424 — format-pinned writer-init
    conveniences write byte-identically to the generic init."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("Protein", "@protein")
    a, b = str(tmp_path / "a.dat"), str(tmp_path / "b.dat")
    s.xtc_writer_init(a)
    s.traj_writer_init(b, fmt="xtc")
    s.traj_write_frame()
    s.traj_close()
    with open(a, "rb") as f1, open(b, "rb") as f2:
        assert f1.read() == f2.read()

    c, d = str(tmp_path / "c.dat"), str(tmp_path / "d.dat")
    s.trr_group_writer_init("Protein", c)
    s.group_traj_writer_init("Protein", d, fmt="trr")
    s.traj_write_frame()
    s.traj_close()
    with open(c, "rb") as f1, open(d, "rb") as f2:
        assert f1.read() == f2.read()


def test_group_traj_cat_iter(test_files):
    """traj_cat.rs:399 — concatenated read restricted to a group equals
    the full concatenated read on that group's atoms."""
    s1 = System.from_file(os.path.join(test_files, "example.tpr"))
    s1.group_create("Protein", "@protein")
    s2 = s1.copy()
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    idx = s1.group_indices("Protein")
    full = [np.asarray(fr.positions[idx]) for fr in s1.traj_cat_iter([xtc, xtc])]
    part = [np.asarray(fr.positions[idx])
            for fr in s2.group_traj_cat_iter([xtc, xtc], "Protein")]
    assert len(full) == len(part)
    for f, p in zip(full, part):
        np.testing.assert_array_equal(f, p)


def test_from_ndx_standalone(test_files):
    """Groups::from_ndx (ndx_io.rs:106) — standalone registry parse."""
    from groan_rs_tpu.io.ndx import from_ndx

    s = System.from_file(os.path.join(test_files, "example.gro"))
    groups, invalid, duplicate = from_ndx(
        os.path.join(test_files, "index.ndx"), s.get_n_atoms())
    assert not invalid and not duplicate
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    assert set(groups) == set(s.group_names()) - {"all", "All"}
    for name, g in groups.items():
        np.testing.assert_array_equal(
            np.fromiter(g.get_atoms(), dtype=np.int64), s.group_indices(name))


class _BareSystem:
    def __init__(self, n):
        self.n = n

    def get_n_atoms(self):
        return self.n


def test_cat_iter_beyond_fd_limit(tmp_path):
    """v0.11.3 parity: concatenating more trajectories than the open-file
    limit works — sources hold offsets, not descriptors; every read opens
    and closes the file transiently."""
    import resource

    from groan_rs_tpu.io import native
    from groan_rs_tpu.io.traj import cat_iter

    box9 = np.diag([8.0] * 3).astype(np.float32).reshape(9)
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 8, size=(50, 3)).astype(np.float32)
    files = []
    for i in range(96):
        p = str(tmp_path / f"t{i}.xtc")
        native.xtc_write_frame(p, 50, i, float(i), box9, pos, 1000.0)
        files.append(p)

    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    resource.setrlimit(resource.RLIMIT_NOFILE, (64, hard))
    try:
        reader = cat_iter(_BareSystem(50), files, batch_size=16)
        n = sum(len(fb) for fb in reader.batches(wire="f32"))
    finally:
        resource.setrlimit(resource.RLIMIT_NOFILE, (soft, hard))
    assert n == 96
