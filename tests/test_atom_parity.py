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


# =====================================================================
# Standalone-atom behavior parity (atom.rs:920-2038): built here as a
# two-atom System since our Atom is a view into SoA columns.
# =====================================================================

def _two_atom_system(p1, p2, box):
    from groan_rs_tpu.core.simbox import SimBox
    from groan_rs_tpu.core.topology import Topology

    topo = Topology.from_columns([1, 1], ["LYS", "LYS"], ["BB", "SC1"], [1, 2])
    s = System.new("test", topo, SimBox.from_lengths(*box) if box else None)
    s.get_atom(0).set_position(p1)
    if p2 is not None:
        s.get_atom(1).set_position(p2)
    return s


def test_translate_nopbc_exact():
    """atom.rs:1291 exact values."""
    s = _two_atom_system([15.123, 14.321, 9.834], None, [16, 16, 16])
    a = s.get_atom(0)
    a.translate_nopbc([4.5, 2.3, -8.3])
    np.testing.assert_allclose(a.get_position(), [19.623, 16.621, 1.534], atol=1e-5)


def test_translate_pbc_exact():
    """atom.rs:1335 — translate wraps into [0, box)."""
    s = _two_atom_system([15.123, 14.321, 9.834], None, [16, 16, 16])
    a = s.get_atom(0)
    a.translate([4.5, 2.3, -10.2], s.get_box())
    np.testing.assert_allclose(a.get_position(), [3.623, 0.621, 15.634], atol=1e-5)


def test_wrap_and_wrap_far_exact():
    """atom.rs:1382/1411 — wrap handles near and multi-box excursions."""
    s = _two_atom_system([15.123, 14.321, -1.743], [60.123, 14.321, -31.743],
                         [15, 15, 15])
    a, b = s.get_atom(0), s.get_atom(1)
    a.wrap(s.get_box())
    b.wrap(s.get_box())
    np.testing.assert_allclose(a.get_position(), [0.123, 14.321, 13.257], atol=1e-5)
    np.testing.assert_allclose(b.get_position(), [0.123, 14.321, 13.257], atol=1e-5)


def test_ops_fail_without_position():
    """atom.rs:1318/1364/1440 — missing position raises naming the atom."""
    from groan_rs_tpu.errors import PositionError

    s = _two_atom_system([1, 1, 1], None, [15, 15, 15])
    a = s.get_atom(0)
    a.reset_position()
    assert not a.has_position()
    for op in (lambda: a.translate_nopbc([1, 0, 0]),
               lambda: a.translate([1, 0, 0], s.get_box()),
               lambda: a.wrap(s.get_box())):
        with pytest.raises(PositionError, match="0"):
            op()


@pytest.mark.parametrize("dim,expected,naive", [
    ("X", -0.7, 3.3),
    ("Y", 1.0, 1.0),
    ("XY", 1.2206556, 3.448188),
    ("XZ", 1.6552945, 4.140048),
    ("YZ", 1.8027756, 2.692582),
    ("XYZ", 1.933908, 4.259108),
    ("NONE", 0.0, 0.0),
])
def test_atom_distance_dims_exact(dim, expected, naive):
    """atom.rs:1457-1768 exact oriented PBC + naive distances."""
    from groan_rs_tpu.core.dimension import Dimension

    s = _two_atom_system([3.8, 2.0, 3.5], [0.5, 1.0, 1.0], [4, 4, 4])
    a1, a2 = s.get_atom(0), s.get_atom(1)
    d = Dimension[dim]
    assert a1.distance(a2, d, s.get_box()) == pytest.approx(expected, abs=1e-5)
    assert a2.distance(a1, d, s.get_box()) == pytest.approx(-expected if dim in
                                                            ("X", "Y", "Z") else expected, abs=1e-5)
    assert a1.distance_naive(a2, d) == pytest.approx(naive, abs=1e-5)
    assert a2.distance_naive(a1, d) == pytest.approx(-naive if dim in
                                                     ("X", "Y", "Z") else naive, abs=1e-5)


def test_atom_distance_z_exact():
    """atom.rs:1535 uses swapped z positions: oriented result 1.5/-1.5;
    naive z on the standard pair is 2.5/-2.5."""
    from groan_rs_tpu.core.dimension import Dimension

    s = _two_atom_system([3.8, 2.0, 1.0], [0.5, 1.0, 3.5], [4, 4, 4])
    a1, a2 = s.get_atom(0), s.get_atom(1)
    assert a1.distance(a2, Dimension.Z, s.get_box()) == pytest.approx(1.5, abs=1e-5)
    assert a2.distance(a1, Dimension.Z, s.get_box()) == pytest.approx(-1.5, abs=1e-5)
    s2 = _two_atom_system([3.8, 2.0, 3.5], [0.5, 1.0, 1.0], [4, 4, 4])
    assert s2.get_atom(0).distance_naive(s2.get_atom(1), Dimension.Z) == pytest.approx(2.5, abs=1e-5)
    assert s2.get_atom(1).distance_naive(s2.get_atom(0), Dimension.Z) == pytest.approx(-2.5, abs=1e-5)


def test_distance_fail_without_position():
    from groan_rs_tpu.core.dimension import Dimension
    from groan_rs_tpu.errors import PositionError

    s = _two_atom_system([1, 1, 1], None, [4, 4, 4])
    with pytest.raises(PositionError, match="1"):
        s.get_atom(0).distance(s.get_atom(1), Dimension.XYZ, s.get_box())
    with pytest.raises(PositionError, match="1"):
        s.get_atom(1).distance_naive(s.get_atom(0), Dimension.XYZ)


def test_distance_from_point_exact():
    """atom.rs:1852-1987 — distance from a fixed point, box 4."""
    from groan_rs_tpu.core.dimension import Dimension

    s = _two_atom_system([3.8, 2.0, 3.5], None, [4, 4, 4])
    a = s.get_atom(0)
    point = np.array([0.5, 1.0, 1.0], np.float32)
    assert a.distance_from_point(point, Dimension.X, s.get_box()) == pytest.approx(-0.7, abs=1e-5)
    assert a.distance_from_point(point, Dimension.Y, s.get_box()) == pytest.approx(1.0, abs=1e-5)
    assert a.distance_from_point(point, Dimension.XYZ, s.get_box()) == pytest.approx(1.933908, abs=1e-5)
    assert a.distance_from_point(point, Dimension.NONE, s.get_box()) == pytest.approx(0.0, abs=1e-5)


def test_rotate_exact():
    """atom.rs:2005/2018 — rotate wraps, rotate_nopbc does not."""
    rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    s = _two_atom_system([1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [10, 10, 10])
    a, b = s.get_atom(0), s.get_atom(1)
    a.rotate(rot, s.get_box())
    np.testing.assert_allclose(a.get_position(), [8.0, 1.0, 3.0], atol=1e-6)
    b.rotate_nopbc(rot)
    np.testing.assert_allclose(b.get_position(), [-2.0, 1.0, 3.0], atol=1e-6)


def test_set_position_axes_and_resets():
    """atom.rs:1136-1165 + reset_* semantics."""
    s = _two_atom_system([15.123, 14.321, 9.834], None, [16, 16, 16])
    a = s.get_atom(0)
    a.set_position_x(10.3)
    a.set_position_y(11.4)
    a.set_position_z(0.459)
    np.testing.assert_allclose(a.get_position(), [10.3, 11.4, 0.459], atol=1e-6)
    a.set_velocity([1.0, 2.0, 3.0])
    a.set_force([-1.0, 0.5, 0.25])
    a.reset_velocity()
    a.reset_force()
    assert a.get_velocity() is None and a.get_force() is None
    a.reset_position()
    assert a.get_position() is None
    from groan_rs_tpu.errors import PositionError

    with pytest.raises(PositionError):
        a.set_position_x(1.0)


def test_with_builders_and_metadata_resets(sys_):
    """atom.rs with_* (chainable) and reset_* (clear optional) parity."""
    a = (sys_.get_atom(3)
         .with_chain("A")
         .with_charge(-0.5)
         .with_mass(15.999)
         .with_vdw(0.152)
         .with_element_name("oxygen")
         .with_element_symbol("O")
         .with_expected_min_bonds(1)
         .with_expected_max_bonds(2)
         .with_position([1.0, 2.0, 3.0])
         .with_velocity([0.1, 0.2, 0.3])
         .with_force([-1.0, 0.0, 1.0]))
    assert a.get_chain() == "A"
    assert a.get_charge() == pytest.approx(-0.5)
    assert a.get_mass() == pytest.approx(15.999)
    assert a.get_vdw() == pytest.approx(0.152)
    assert a.get_element_name() == "oxygen"
    assert a.get_element_symbol() == "O"
    assert a.get_expected_min_bonds() == 1
    assert a.get_expected_max_bonds() == 2
    for r in ("chain", "charge", "mass", "vdw", "element_name",
              "element_symbol", "expected_min_bonds", "expected_max_bonds"):
        getattr(a, f"reset_{r}")()
        assert getattr(a, f"get_{r}")() is None, r


def test_atom_line_writers_match_file_writers(sys_, tmp_path):
    """Per-atom write_gro/write_pdb/write_pqr emit exactly the line the
    byte-golden file writers produce for that atom."""
    import io as _io

    from groan_rs_tpu.io.gro import format_atom_lines
    from groan_rs_tpu.io.pdb import format_pdb_atom_line
    from groan_rs_tpu.io.pqr import PqrPrecision, format_pqr_atom_line

    a = sys_.get_atom(7)
    buf = _io.StringIO()
    a.write_gro(buf, write_velocities=True)
    assert buf.getvalue() == format_atom_lines(
        sys_, np.array([7]), True)[0] + "\n"

    buf = _io.StringIO()
    a.write_pdb(buf)
    assert buf.getvalue() == format_pdb_atom_line(sys_, 7) + "\n"

    sys_.get_atom(7).set_charge(0.25)
    sys_.get_atom(7).set_vdw(0.19)
    buf = _io.StringIO()
    a.write_pqr(buf)
    assert buf.getvalue() == format_pqr_atom_line(
        sys_, 7, PqrPrecision()) + "\n"


def test_reset_bonded_symmetric(test_files):
    """The safe form of atom.rs:452 unsafe reset_bonded: bonds vanish
    from BOTH sides and molecule splitting updates."""
    s = System.from_file(os.path.join(test_files, "example.tpr"))
    a = s.get_atom(1)
    neighbors = [b.get_index() for b in s.bonded_atoms_iter(1)]
    assert neighbors
    before_mols = s.topology.molecule_ids().max()
    a.reset_bonded()
    assert a.get_n_bonded() == 0
    for j in neighbors:
        assert 1 not in [b.get_index() for b in s.bonded_atoms_iter(j)]
    # molecule references recompute (atom 1 now its own molecule)
    assert s.topology.molecule_ids().max() >= before_mols
