"""PDB/PQR reader edge-case parity (src/io/pdb_io.rs + pqr_io.rs inline
tests): termination records, HETATM, title/box multiplicity, odd boxes,
CONECT failure modes, and coordinate-overflow write errors."""

import os

import numpy as np
import pytest

from groan_rs_tpu.errors import GroanError, ParsePdbError
from groan_rs_tpu.system import System


def _read(test_files, name):
    return System.from_file(os.path.join(test_files, name))


def test_read_endmdl_and_end_truncate(test_files):
    """pdb_io.rs read_endmdl/read_end — parsing stops at ENDMDL/END with 17
    atoms and the title intact."""
    for fixture in ("example_endmdl.pdb", "example_end.pdb"):
        s = _read(test_files, fixture)
        assert s.get_name() == "Buforin II peptide P11L"
        assert s.get_n_atoms() == 17
        assert s.get_atom(0).get_atom_number() == 1
        assert s.get_atom(16).get_atom_number() == 17


def test_read_hetatm(test_files):
    """pdb_io.rs read_hetatm — HETATM records parse like ATOM."""
    s = _read(test_files, "example_hetatm.pdb")
    assert s.get_name() == "Buforin II peptide P11L"
    assert s.get_n_atoms() == 50
    box = s.get_box()
    assert float(box.x) == pytest.approx(6.0861, abs=1e-4)
    assert float(box.y) == pytest.approx(6.0861, abs=1e-4)
    assert float(box.z) == pytest.approx(6.0861, abs=1e-4)


def test_read_no_title_and_empty_title(test_files):
    """pdb_io.rs read_no_title/read_empty_title — name falls back to
    'Unknown'."""
    for fixture in ("example_notitle.pdb", "example_empty_title.pdb"):
        s = _read(test_files, fixture)
        assert s.get_name() == "Unknown"
        assert s.get_n_atoms() == 50


def test_read_no_box(test_files):
    s = _read(test_files, "example_nobox.pdb")
    assert s.get_name() == "Buforin II peptide P11L"
    assert s.get_n_atoms() == 50
    assert not s.has_box()


def test_read_multiple_titles_takes_last(test_files):
    s = _read(test_files, "example_multiple_titles.pdb")
    assert s.get_name() == "Third title"
    assert s.get_n_atoms() == 50


def test_read_multiple_boxes_takes_last(test_files):
    s = _read(test_files, "example_multiple_boxes.pdb")
    assert float(s.get_box().x) == pytest.approx(5.0861, abs=1e-4)


@pytest.mark.parametrize("fixture,gro", [
    ("triclinic.pdb", "triclinic.gro"),
    ("dodecahedron.pdb", "dodecahedron.gro"),
    ("octahedron.pdb", "octahedron.gro"),
])
def test_pdb_odd_boxes_match_gro(test_files, fixture, gro):
    """pdb_io.rs pdb_read_triclinic/dodecahedron/octahedron — CRYST1 angles
    reconstruct the same box matrix as the GRO twin."""
    p = _read(test_files, fixture)
    g = _read(test_files, gro)
    np.testing.assert_allclose(
        np.asarray(p.get_box().to_matrix()),
        np.asarray(g.get_box().to_matrix()), atol=2e-3)


@pytest.mark.parametrize("fixture", [
    "bonds_invalid_index_1.pdb", "bonds_invalid_index_2.pdb",
])
def test_pdb_bonds_invalid_index(test_files, fixture):
    """pdb_io.rs pdb_bonds_invalid_index — CONECT referencing unknown
    serials raises."""
    s = _read(test_files, "example.pdb")
    with pytest.raises(GroanError):
        s.add_bonds_from_pdb(os.path.join(test_files, fixture))


def test_pdb_bonds_duplicate_numbers(test_files):
    """pdb_io.rs pdb_bonds_duplicate_numbers — ambiguous serials raise."""
    s = _read(test_files, "example.pdb")
    s2 = s.copy()
    s2.get_atom(1).set_atom_number(1)  # duplicate serial 1
    with pytest.raises(GroanError):
        s2.add_bonds_from_pdb(os.path.join(test_files, "bonds_for_example.pdb"))


def test_write_pdb_too_large_coordinate(test_files, tmp_path):
    """pdb_io.rs write_too_large_coordinate — columns overflow above
    9999.999 A; the writer must error, not corrupt."""
    s = _read(test_files, "protein.pdb")
    s.positions[0] = [1000.1, 0.0, 0.0]  # nm -> 10001 A
    with pytest.raises(GroanError):
        s.write_pdb(str(tmp_path / "big.pdb"))


def test_write_gro_too_large_coordinate(test_files, tmp_path):
    """gro_io write_too_large_coordinate — %8.3f overflows above
    9999.9995 nm."""
    s = _read(test_files, "example.gro")
    s.positions[0] = [100000.0, 0.0, 0.0]
    with pytest.raises(GroanError):
        s.write_gro(str(tmp_path / "big.gro"))


def test_pqr_nochain_and_endmdl(test_files):
    """pqr_io.rs read_nochain/read_endmdl."""
    s = _read(test_files, "example_nochain.pqr")
    assert s.get_n_atoms() == 50
    assert s.get_atom(0).get_chain() is None
    s2 = _read(test_files, "example_endmdl.pqr")
    assert s2.get_n_atoms() == 17
