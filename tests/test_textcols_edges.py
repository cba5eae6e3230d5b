"""Edge cases of the vectorized structure-file parsing (round-3 rewrite:
zero-copy byte-matrix GRO parsing, bytes-direct numeric columns)."""

import numpy as np
import pytest

from groan_rs_tpu.errors import ParseGroError
from groan_rs_tpu.io.gro import read_gro
from groan_rs_tpu.utils.textcols import FixedWidthLines

GRO = (
    "test box\n"
    "3\n"
    "    1SOL     OW    1   1.000   2.000   3.000\n"
    "    1SOL    HW1    2   1.100   2.100   3.100\n"
    "    1SOL    HW2    3   1.200   2.200   3.200\n"
    "   4.00000   4.00000   4.00000\n"
)


def _check(system):
    assert system.get_n_atoms() == 3
    np.testing.assert_allclose(system.positions[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(system.positions[2], [1.2, 2.2, 3.2])
    assert system.topology.atomname[1] == "HW1"
    np.testing.assert_allclose(system.get_box().to_lengths_vec(), [4, 4, 4])


def test_read_gro_plain(tmp_path):
    p = tmp_path / "a.gro"
    p.write_text(GRO)
    _check(read_gro(str(p)))


def test_read_gro_crlf(tmp_path):
    p = tmp_path / "crlf.gro"
    p.write_bytes(GRO.replace("\n", "\r\n").encode())
    _check(read_gro(str(p)))


def test_read_gro_no_trailing_newline(tmp_path):
    p = tmp_path / "nonl.gro"
    p.write_bytes(GRO.rstrip("\n").encode())
    _check(read_gro(str(p)))


def test_read_gro_ragged_trailing_spaces(tmp_path):
    """Lines of different physical widths force the ragged gather path."""
    lines = GRO.splitlines()
    lines[2] += "          "  # pad one atom line
    lines[4] += "  "
    p = tmp_path / "ragged.gro"
    p.write_text("\n".join(lines) + "\n")
    _check(read_gro(str(p)))


def test_read_gro_velocities_mixed(tmp_path):
    lines = GRO.splitlines()
    lines[2] += "  0.1000  0.2000  0.3000"  # only atom 1 has velocities
    p = tmp_path / "vel.gro"
    p.write_text("\n".join(lines) + "\n")
    s = read_gro(str(p))
    np.testing.assert_allclose(s.velocities[0], [0.1, 0.2, 0.3], atol=1e-6)
    assert s.has_velocity[0] and not s.has_velocity[1]


def test_read_gro_bad_float_names_line(tmp_path):
    lines = GRO.splitlines()
    lines[3] = "    1SOL    HW1    2   1.100   x.100   3.100"
    p = tmp_path / "bad.gro"
    p.write_text("\n".join(lines) + "\n")
    with pytest.raises(ParseGroError):
        read_gro(str(p))


def test_from_bytes_empty_and_single_line():
    fw = FixedWidthLines.from_bytes(b"hello")
    assert fw.n == 1 and fw.col_bytes(0, 5)[0] == b"hello"
    fw2 = FixedWidthLines.from_bytes(b"a\nbb\nccc\n")
    assert fw2.n == 3
    assert list(fw2.line_lengths()) == [1, 2, 3]


def test_from_bytes_matches_list_constructor():
    lines = ["  12 abc  ", "  34 def", " 5678 ghixx"]
    blob = ("\n".join(lines) + "\n").encode()
    a = FixedWidthLines(lines)
    b = FixedWidthLines.from_bytes(blob)
    assert a.n == b.n
    for s, e in ((0, 5), (5, 9), (0, 12)):
        assert (a.col_bytes(s, e) == b.col_bytes(s, e)).all()
    assert (a.line_lengths() == b.line_lengths()).all()
