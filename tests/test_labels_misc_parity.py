"""Labeled atoms + System misc error paths (reference: labeled_atoms.rs,
system/mod.rs)."""

import os
import warnings

import numpy as np
import pytest

from groan_rs_tpu.errors import AtomError, LabelError
from groan_rs_tpu.system import System


@pytest.fixture()
def sys_(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_label_atom_pass(sys_):
    sys_.label_atom("labeled atom", 174)
    assert sys_.label_exists("labeled atom")
    assert sys_.get_labeled_atom("labeled atom").get_index() == 174


def test_label_atom_overwrite_warns(sys_):
    """labeled_atoms.rs:277 — overwriting keeps the new index and warns."""
    sys_.label_atom("labeled atom", 174)
    with pytest.warns(UserWarning):
        sys_.label_atom("labeled atom", 7564)
    assert sys_.labeled_atoms["labeled atom"] == 7564


def test_label_atom_invalid_and_out_of_range(sys_):
    with pytest.raises(LabelError):
        sys_.label_atom("bad!label", 0)
    with pytest.raises(LabelError):
        sys_.label_atom("fine", 10**7)
    assert not sys_.label_exists("fine")


def test_select_and_label_multimatch(sys_):
    """labeled_atoms.rs:81 — the query must match exactly one atom."""
    sys_.select_and_label("one", "serial 17")
    assert sys_.get_labeled_atom("one").get_atom_number() == 17
    with pytest.raises(LabelError):
        sys_.select_and_label("many", "resname POPC")
    with pytest.raises(LabelError):
        sys_.select_and_label("none", "serial 999999")


def test_labeled_atoms_iter_and_unlabel(sys_):
    sys_.label_atom("a", 1)
    sys_.label_atom("b", 5)
    pairs = {lbl: a.get_index() for lbl, a in sys_.labeled_atoms_iter()}
    assert pairs == {"a": 1, "b": 5}
    sys_.unlabel_atom("a")
    assert not sys_.label_exists("a")
    with pytest.raises(LabelError):
        sys_.unlabel_atom("a")


def test_label_select_in_queries(sys_):
    sys_.label_atom("marker", 10)
    sys_.group_create("M", "label marker")
    assert sys_.group_get_n_atoms("M") == 1
    assert sys_.group_isin("M", 10)


def test_get_atom_out_of_range(sys_):
    with pytest.raises(AtomError):
        sys_.get_atom(10**7)
    with pytest.raises(AtomError):
        sys_.get_atom(-1)


def test_copy_independence(sys_):
    """System::clone semantics: copies do not alias (mod.rs tests)."""
    c = sys_.copy()
    c.positions[0] = [1.0, 2.0, 3.0]
    assert not np.allclose(sys_.positions[0], [1.0, 2.0, 3.0])
    c.group_create("New", "serial 1")
    assert not sys_.group_exists("New")
    c.topology.resnum[0] = 999
    assert sys_.topology.resnum[0] != 999


def test_filetype_sniffing(test_files):
    """files.rs FileType extension dispatch."""
    from groan_rs_tpu.files import FileType

    cases = {
        "a.gro": "gro", "b.pdb": "pdb", "c.xtc": "xtc", "d.ndx": "ndx",
        "e.trr": "trr", "f.pqr": "pqr", "g.tpr": "tpr", "h.yaml": "yaml",
        "i.nc": "nc", "j.dcd": "dcd", "k.tng": "tng", "l.lammpstrj": "lammpstrj",
        "m.xyz": "xyz", "n.mol2": "mol2",
    }
    for name, kind in cases.items():
        assert FileType.from_name(name).value == kind, name
    assert FileType.from_name("noext").value == "unknown"
    assert FileType.from_name("weird.cif").value == "unknown"


def test_read_ndx_with_default(sys_, test_files):
    """utility.rs:26 — explicit path wins; missing default is tolerated."""
    s = sys_.copy()
    s.read_ndx_with_default(os.path.join(test_files, "index.ndx"), "not_used.ndx")
    assert s.group_exists("Protein")
    s2 = sys_.copy()
    # default that does not exist: no groups added, no exception
    s2.read_ndx_with_default(None, "definitely_missing.ndx")
    assert not s2.group_exists("Protein")


def test_molecule_iter_bfs_order(test_files):
    """reference: iterating.rs:912-946 — molecule_iter yields the exact BFS
    visit order over the bond graph."""
    s = System.from_file(os.path.join(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(os.path.join(test_files, "conect.pdb"))

    expected0 = [1, 2, 3, 4, 6, 5, 7, 8, 9, 10, 11, 13, 12, 14, 15, 16, 17,
                 18, 19, 20, 21, 24, 22, 23, 25, 26, 27, 28, 29, 30, 32, 36,
                 38, 42, 48, 31, 33, 34, 35, 37, 39, 41, 45, 49, 40, 43, 46,
                 44, 47]
    got0 = [a.get_atom_number() for a in s.molecule_iter(0)]
    assert got0 == expected0

    expected28 = [29, 28, 30, 32, 36, 38, 42, 48, 26, 31, 33, 34, 35, 37, 39,
                  41, 45, 49, 24, 27, 40, 43, 46, 20, 25, 44, 47, 18, 21, 16,
                  19, 22, 23, 15, 17, 13, 14, 10, 8, 11, 6, 9, 12, 3, 7, 1,
                  4, 2, 5]
    got28 = [a.get_atom_number() for a in s.molecule_iter(28)]
    assert got28 == expected28

    # isolated atom: its own molecule
    got49 = [a.get_atom_number() for a in s.molecule_iter(49)]
    assert got49 == [50]

    with pytest.raises(AtomError):
        list(s.molecule_iter(50))


def test_system_extras_api(sys_, test_files, tmp_path):
    """Reference-named System conveniences (mod.rs / traj_write.rs)."""
    s = sys_.copy()
    s.group_create("P", "@protein")
    # predicates
    assert s.has_positions() and s.has_velocities() and not s.has_forces()
    assert not s.has_duplicate_atom_numbers()
    s2 = s.copy()
    s2.topology.atomnum[1] = s2.topology.atomnum[0]
    assert s2.has_duplicate_atom_numbers()
    # atoms views
    atoms = s.get_atoms()
    assert len(atoms) == s.get_n_atoms()
    assert atoms[0].get_atom_name() == s.get_atom(0).get_atom_name()
    # writability flags drive write_ndx
    s.group_make_nonwritable("P")
    assert "P" not in s.group_names_writable()
    out = tmp_path / "x.ndx"
    s.write_ndx(out)
    assert "[ P ]" not in open(out).read()
    s.group_make_writable("P")
    s.write_ndx(out)
    assert "[ P ]" in open(out).read()
    # writer registry aliases
    x1 = str(tmp_path / "a.xtc")
    s.traj_writer_auto_init(x1)
    s.traj_group_writer_init("P", str(tmp_path / "b.xtc"))
    assert s.get_n_writers() == 2
    s.traj_write_frame()
    s.traj_write_frame_to_file(x1)
    s.traj_close_file(x1)
    assert s.get_n_writers() == 1
    s.traj_close()
    assert s.get_n_writers() == 0
    # reset box
    s3 = s.copy()
    s3.reset_box()
    assert s3.get_box() is None


def test_system_level_map_reduce(sys_, test_files):
    """System.traj_iter_map_reduce delegates to the engine (parallel.rs)."""
    import jax.numpy as jnp

    from groan_rs_tpu.ops import center as center_ops

    s = sys_.copy()
    s.group_create("Protein", "@protein")
    idx = jnp.asarray(s.group_indices("Protein"))

    def body(positions, boxes, mask):
        return {"c": center_ops.center(jnp.take(positions, idx, 1),
                                       boxes[:, None, :])}

    out = s.traj_iter_map_reduce(
        os.path.join(test_files, "short_trajectory.xtc"), body, batch_size=4)
    assert out["c"].shape == (11, 3)
