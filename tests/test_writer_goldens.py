"""Writer golden-file byte parity vs reference expected outputs
(reference drivers: pdb_io.rs tests_write, pqr_io.rs, gro writers,
make-whole/wrapping goldens)."""

import filecmp
import os

import numpy as np
import pytest

from groan_rs_tpu.system import System


def _p(test_files, name):
    return os.path.join(test_files, name)


def _same(a, b):
    return open(a, "rb").read() == open(b, "rb").read()


def test_write_pdb_golden(test_files, tmp_path):
    """reference: pdb_io.rs write -> example_nochain.pdb byte-identical."""
    s = System.from_file(_p(test_files, "example_novelocities.gro"))
    out = tmp_path / "out.pdb"
    s.write_pdb(out, False)
    assert _same(out, _p(test_files, "example_nochain.pdb"))


def test_write_pdb_conect_golden(test_files, tmp_path):
    """reference: pdb_io.rs write_with_connectivity -> expected_bonds.pdb."""
    s = System.from_file(_p(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(_p(test_files, "conect.pdb"))
    out = tmp_path / "out.pdb"
    s.write_pdb(out, True)
    assert _same(out, _p(test_files, "expected_bonds.pdb"))


def test_group_write_pdb_conect_golden(test_files, tmp_path):
    """reference: pdb_io.rs group_write_with_connectivity ->
    group_expected_bonds.pdb."""
    s = System.from_file(_p(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(_p(test_files, "conect.pdb"))
    s.group_create("Group", "serial 20 to 30")
    out = tmp_path / "out.pdb"
    s.group_write_pdb("Group", out, True)
    assert _same(out, _p(test_files, "group_expected_bonds.pdb"))


def test_write_gro_roundtrip_golden(test_files, tmp_path):
    """GRO writer must reproduce the input byte-for-byte (the reference
    diff-tests write_gro against the original)."""
    src = _p(test_files, "example.gro")
    s = System.from_file(src)
    out = tmp_path / "out.gro"
    s.write_gro(out, write_velocities=True)
    # title lines may differ; compare atom+box content
    a = open(src).read().splitlines()[1:]
    b = open(out).read().splitlines()[1:]
    assert a == b


def test_number_wrapping_golden(test_files, tmp_path):
    """reference: gro_io/structure.rs write_wrap -> wrapping_expected.gro
    (atom/residue numbers wrap modulo 100000, names truncate to 5 chars)."""
    from groan_rs_tpu.core.simbox import SimBox
    from groan_rs_tpu.core.topology import Topology
    from groan_rs_tpu.system import System as Sys

    topo = Topology.from_columns(
        resnum=[158, 158, 100003, 100003, 100003],
        resname=["THR", "THR", "ARG", "ARGGGT", "ARG"],
        atomname=["BBBBBT", "SC1", "BB", "SC1", "SC2"],
        atomnum=[1, 99999, 100000, 200001, 200005],
    )
    s = Sys("Expected atom and residue wrapping", topo, SimBox.from_lengths(1.0, 1.0, 1.0))
    out = tmp_path / "wrap.gro"
    s.write_gro(out)
    assert _same(out, _p(test_files, "wrapping_expected.gro"))


def test_whole_molecules_expected_golden(test_files, tmp_path):
    """reference: modifying.rs make_molecules_whole golden (conect.pdb +
    translate + make whole -> whole_molecules_expected.gro)."""
    s = System.from_file(_p(test_files, "conect.pdb"))
    s.add_bonds_from_pdb(_p(test_files, "conect.pdb"))
    s.atoms_translate([3.5, 4.5, -3.0])
    s.make_molecules_whole()
    out = tmp_path / "whole.gro"
    s.write_gro(out)
    assert _same(out, _p(test_files, "whole_molecules_expected.gro"))


def test_make_group_whole_golden(test_files, tmp_path):
    """reference: modifying.rs make_group_whole -> whole_group_expected.gro."""
    s = System.from_file(_p(test_files, "conect.pdb"))
    s.atoms_translate([3.5, 4.5, -3.0])
    s.make_group_whole("all")
    out = tmp_path / "gw.gro"
    s.write_gro(out)
    assert _same(out, _p(test_files, "whole_group_expected.gro"))


def test_make_molecules_whole_aa_golden(test_files, tmp_path):
    """reference: modifying.rs make_molecules_whole_aa ->
    water_for_whole_expected.gro."""
    s = System.from_file(_p(test_files, "water_for_whole.tpr"))
    s.make_molecules_whole()
    out = tmp_path / "ww.gro"
    s.write_gro(out)
    assert _same(out, _p(test_files, "water_for_whole_expected.gro"))


def test_write_pqr_roundtrip(test_files, tmp_path):
    """PQR write -> re-read gives identical atoms (reference: pqr_io.rs)."""
    s = System.from_file(_p(test_files, "example.pqr"))
    out = tmp_path / "out.pqr"
    s.write_pqr(out)
    s2 = System.from_file(out)
    assert s2.get_n_atoms() == s.get_n_atoms()
    np.testing.assert_allclose(s2.positions, s.positions, atol=1e-4)
    np.testing.assert_allclose(s2.topology.charge, s.topology.charge, atol=1e-5)
    np.testing.assert_allclose(s2.topology.vdw, s.topology.vdw, atol=1e-5)


def test_group_write_pqr(test_files, tmp_path):
    s = System.from_file(_p(test_files, "example.pqr"))
    s.group_create("Few", "serial 1 to 10")
    out = tmp_path / "few.pqr"
    s.group_write_pqr("Few", out)
    s2 = System.from_file(out)
    assert s2.get_n_atoms() == 10


def test_protein_trajectory_golden(test_files, tmp_path):
    """reference: gro_io/trajectory.rs gro_writer_no_velocities —
    protein.gro + first 3 frames of short_trajectory_protein.xtc ->
    expected_protein_trajectory.gro byte-identical."""
    s = System.from_file(_p(test_files, "protein.gro"))
    out = tmp_path / "prot.gro"
    s.traj_writer_init(str(out), fmt="gro")
    for i, _ in enumerate(s.xtc_iter(_p(test_files, "short_trajectory_protein.xtc"))):
        if i >= 3:
            break
        s.traj_write_frame()
    s.traj_writers_close()
    assert _same(out, _p(test_files, "expected_protein_trajectory.gro"))


def test_pqr_precision_variants(test_files, tmp_path):
    """reference: pqr_io.rs PqrPrecision (custom decimal places round-trip)."""
    from groan_rs_tpu.io.pqr import PqrPrecision

    s = System.from_file(_p(test_files, "example.pqr"))
    out = tmp_path / "prec.pqr"
    s.write_pqr(out, precision=PqrPrecision(position=5, charge=3, vdw=3))
    line = [l for l in open(out) if l.startswith("ATOM")][0]
    # 5 decimals on coordinates, 3 on charge/vdw
    import re
    floats = re.findall(r"-?\d+\.\d+", line)
    decs = [len(f.split(".")[1]) for f in floats]
    assert decs[:3] == [5, 5, 5]
    assert decs[3:5] == [3, 3]
    s2 = System.from_file(out)
    np.testing.assert_allclose(s2.positions, s.positions, atol=1e-5)


def test_xtc_write_precision_overflow(tmp_path):
    """Coordinates that overflow int32 at the requested precision raise the
    typed error (native GX_ERR_PRECISION; reference: xdrfile overflow)."""
    from groan_rs_tpu.errors import WriteTrajError
    from groan_rs_tpu.io import native

    bad = np.full((50, 3), 5.0e6, np.float32)
    box9 = np.diag([1e7, 1e7, 1e7]).astype(np.float32).reshape(9)
    with pytest.raises(WriteTrajError):
        native.xtc_write_frame(str(tmp_path / "o.xtc"), 50, 0, 0.0, box9, bad, 1e6)

    # a single NaN (or inf) coordinate must also raise, never be written
    for poison in (np.nan, np.inf, -np.inf):
        one = np.zeros((50, 3), np.float32)
        one[17, 1] = poison
        with pytest.raises(WriteTrajError):
            native.xtc_write_frame(str(tmp_path / "p.xtc"), 50, 0, 0.0,
                                   box9, one, 1000.0)


# =====================================================================
# Byte-exact trajectory writer goldens (xtc_io/mod.rs tests_write,
# trr_io.rs tests_write): our native encoders must reproduce the
# reference's xdrfile output bit-for-bit.
# =====================================================================

@pytest.mark.parametrize("gro,xtc", [
    ("example.gro", "short_trajectory.xtc"),
    ("triclinic.gro", "triclinic_trajectory.xtc"),
    ("octahedron.gro", "octahedron_trajectory.xtc"),
    ("dodecahedron.gro", "dodecahedron_trajectory.xtc"),
])
def test_write_xtc_byte_golden(test_files, tmp_path, gro, xtc):
    """write_xtc[, _triclinic/_octahedron/_dodecahedron]: rewriting a
    trajectory reproduces it byte-for-byte."""
    s = System.from_file(os.path.join(test_files, gro))
    out = str(tmp_path / "out.xtc")
    s.traj_writer_init(out, fmt="xtc")
    for fr in s.xtc_iter(os.path.join(test_files, xtc)):
        fr.traj_write_frame()
    s.traj_writers_close()
    assert open(out, "rb").read() == open(os.path.join(test_files, xtc), "rb").read()


def test_write_group_xtc_phosphates_byte_golden(test_files, tmp_path):
    """write_group_xtc: selection writes match short_trajectory_phosphates.xtc."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("Phosphates", "name PO4")
    out = str(tmp_path / "p.xtc")
    s.group_traj_writer_init("Phosphates", out, fmt="xtc")
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
    s.traj_writers_close()
    want = open(os.path.join(test_files, "short_trajectory_phosphates.xtc"), "rb").read()
    assert open(out, "rb").read() == want


@pytest.mark.parametrize("gro,trr,golden", [
    ("triclinic.gro", "triclinic_trajectory.trr", "triclinic_trajectory_full.trr"),
    ("octahedron.gro", "octahedron_trajectory.trr", "octahedron_trajectory_full.trr"),
    ("dodecahedron.gro", "dodecahedron_trajectory.trr", "dodecahedron_trajectory_full.trr"),
])
def test_write_trr_byte_golden_full(test_files, tmp_path, gro, trr, golden):
    """write_trr_triclinic/octahedron/dodecahedron: frames with missing
    x/v/f blocks carry forward the previous vectors (or zeros) and the
    writer always emits all blocks — matching the *_full.trr goldens
    byte-for-byte (trr_io.rs:1924+)."""
    s = System.from_file(os.path.join(test_files, gro))
    out = str(tmp_path / "out.trr")
    s.traj_writer_init(out, fmt="trr")
    for fr in s.trr_iter(os.path.join(test_files, trr)):
        fr.traj_write_frame()
    s.traj_writers_close()
    assert open(out, "rb").read() == open(os.path.join(test_files, golden), "rb").read()


def test_xtc_write_wide_range_roundtrip(tmp_path):
    """Coordinate ranges past ~2^21·prec per axis push the encoder onto
    the general (schoolbook) put_ints path whose zero-padding put()
    calls carry 58-67 bits in one call; atoms at the min corner pack to
    tiny values, maximizing the pad width.  Regression for the u64
    BitWriter dropping pending bits (or shifting past 63 — UB) on those
    wide puts: the file must round-trip bit-identically through BOTH
    independent readers (reference analogue: xdrfile.c:950+ writes any
    int range the 32-bit ints permit)."""
    from groan_rs_tpu.io import native, xtc_py

    rng = np.random.default_rng(1)
    # triple widths ~67-72 bits -> pad puts of n=59..64 (the latter is
    # the pre-fix undefined-shift case); ints stay < 2^24 so every
    # coordinate is f32-exact at precision 1.0.  This exact data was
    # verified to CORRUPT under the pre-fix writer (bytes differ).
    for span_bits in (22, 24):
        span = 2 ** span_bits - 1
        coords = rng.integers(0, span, size=(40, 3)).astype(np.float32)
        coords[0] = 0.0  # min corner on all axes -> zero-valued pack
        coords[1] = float(span - 1)  # pins the per-axis range
        # near-corner atoms MID-stream: their wide triples pack to tiny
        # values while the bit accumulator holds pending bits from the
        # preceding atoms — the state the padding bug corrupted
        for k, v in zip((5, 9, 14, 23, 31), (1.0, 3.0, 200.0, 4e3, 5e4)):
            coords[k] = (0.0, 0.0, v)
        path = str(tmp_path / f"wide{span_bits}.xtc")
        box9 = np.zeros(9, np.float32)
        box9[:3] = float(span)
        native.xtc_write_frame(path, 40, 0, 0.0, box9, coords, 1.0)

        offs, steps, times, na = native.xtc_scan(path)
        assert na == 40 and len(offs) == 1
        dec_n = native.xtc_read_frames(path, offs, na)[0]
        dec_p = xtc_py.xtc_read_frames(path, offs, na)[0]
        np.testing.assert_array_equal(dec_n, dec_p)
        if span_bits < 24:
            # f32-exact integers at precision 1.0: lossless round-trip
            np.testing.assert_array_equal(dec_n[0], coords)
        else:
            # near 2^24 the quantization's f32 `+0.5` rounding (xdrfile
            # semantics, xdrfile.c:950+) may land on the next integer:
            # at most one grid step of error, never corruption
            assert float(np.abs(dec_n[0] - coords).max()) <= 1.0
