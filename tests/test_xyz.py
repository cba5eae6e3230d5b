"""XYZ / extended-XYZ trajectory format.

The reference reads XYZ through chemfiles ("all trajectory formats
supported by chemfiles can be read", /root/reference/src/io/chemfiles.rs:27);
no XYZ fixture exists in the corpus, so the tests are round-trip based:
the writer (a surpass feature — the reference cannot write XYZ) emits
extended-XYZ that `XyzSource` must read back to f32-exact coordinates,
box, and time, and hand-written plain/extended files pin the parsing
semantics.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu.errors import ReadTrajError
from groan_rs_tpu.io.traj import make_writer, open_source
from groan_rs_tpu.system import System


@pytest.fixture()
def example(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_xyz_roundtrip_via_writer(example, test_files, tmp_path):
    """Writer -> reader round trip on the reference trajectory: positions
    (quantized to the writer's 1e-6 nm grid), per-frame box, and time."""
    s = example.copy()
    path = str(tmp_path / "rt.xyz")
    w = make_writer(s, path, "all")
    want_pos, want_box, want_time = [], [], []
    for frame in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        w.write_frame()
        want_pos.append(np.array(frame.positions))
        want_box.append(np.array(frame.get_box().to_matrix()))
        want_time.append(frame.get_time())
    w.close()

    src = open_source(path)
    assert src.kind == "xyz"
    assert src.n_frames() == 11
    assert src.natoms == s.get_n_atoms()
    fb = src.read_batch(np.arange(11))
    # writer emits %.6f Angstrom = 1e-7 nm grid; decode must land within it
    np.testing.assert_allclose(fb.positions, np.asarray(want_pos), atol=2e-7)
    np.testing.assert_allclose(fb.times, want_time, atol=1e-4)
    for k in range(11):
        got = np.array(
            [fb.boxes9[k][0], fb.boxes9[k][1], fb.boxes9[k][2]], np.float64
        )
        want = np.diag(want_box[k])
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_xyz_iteration_via_system(example, test_files, tmp_path):
    """XYZ rides the full reader facade: traj_iter updates the System and
    analyses agree with the XTC source."""
    s = example.copy()
    path = str(tmp_path / "it.xyz")
    w = make_writer(s, path, "all")
    for _ in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        w.write_frame()
    w.close()

    s2 = example.copy()
    s2.group_create("Protein", "@protein")
    centers_xyz = [
        np.array(f.group_get_center("Protein")) for f in s2.traj_iter(path)
    ]
    s3 = example.copy()
    s3.group_create("Protein", "@protein")
    centers_xtc = [
        np.array(f.group_get_center("Protein"))
        for f in s3.xtc_iter(os.path.join(test_files, "short_trajectory.xtc"))
    ]
    np.testing.assert_allclose(centers_xyz, centers_xtc, atol=1e-4)


def test_xyz_group_writer_species(example, tmp_path):
    """Group writers restrict atoms; species fall back to atom names when
    no element symbols were guessed."""
    s = example.copy()
    s.group_create("BB", "name BB")
    n_bb = len(s.group_indices("BB"))
    assert n_bb > 0
    path = str(tmp_path / "bb.xyz")
    w = make_writer(s, path, "BB")
    w.write_frame()
    w.close()
    lines = open(path).read().splitlines()
    assert int(lines[0]) == n_bb
    assert len(lines) == 2 + n_bb
    assert lines[2].split()[0] == "BB"  # atomname fallback
    src = open_source(path)
    assert src.natoms == n_bb


def test_plain_xyz_semantics(tmp_path):
    """Plain XYZ (no extxyz metadata): Angstrom -> nm, zero box, step =
    frame number, time 0 — the step-less chemfiles convention the
    reference documents (chemfiles.rs:37-40)."""
    path = str(tmp_path / "plain.xyz")
    with open(path, "w") as fh:
        fh.write(
            "2\nfirst frame\nC 1.0 2.0 3.0\nO 4.0 5.0 6.0\n"
            "2\nsecond frame\nC 1.5 2.5 3.5\nO 4.5 5.5 6.5\n"
        )
    src = open_source(path)
    assert src.n_frames() == 2 and src.natoms == 2
    fb = src.read_batch([0, 1])
    np.testing.assert_allclose(
        fb.positions[0], [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], atol=1e-7
    )
    np.testing.assert_allclose(fb.positions[1, 0], [0.15, 0.25, 0.35], atol=1e-7)
    assert fb.boxes9.sum() == 0.0
    assert list(fb.steps) == [0, 1]
    np.testing.assert_allclose(fb.times, [0.0, 0.0])
    # partial read stops after the requested atom count
    fb1 = src.read_batch([1], stop_after=1)
    assert fb1.positions.shape == (1, 1, 3)
    np.testing.assert_allclose(fb1.positions[0, 0], [0.15, 0.25, 0.35], atol=1e-7)


def test_extxyz_lattice_properties_time(tmp_path):
    """Extended-XYZ metadata: triclinic Lattice (Angstrom row vectors),
    Properties-driven column layout, Time stamp."""
    path = str(tmp_path / "ext.xyz")
    with open(path, "w") as fh:
        fh.write(
            "2\n"
            'Lattice="40 0 0 10 35 0 5 -5 30" '
            "Properties=species:S:1:id:I:1:pos:R:3 Time=12.5\n"
            "C 1 1.0 2.0 3.0\n"
            "O 2 4.0 5.0 6.0\n"
        )
    src = open_source(path)
    fb = src.read_batch([0])
    np.testing.assert_allclose(fb.times, [12.5])
    np.testing.assert_allclose(
        fb.positions[0], [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]], atol=1e-7
    )
    # the cell is stored via lengths+angles (chemfiles' UnitCell model):
    # vector lengths and pairwise angles must survive the rotation into
    # the Gromacs lower-triangular convention
    from groan_rs_tpu.core.simbox import SimBox

    h_in = np.array([[4.0, 0, 0], [1.0, 3.5, 0], [0.5, -0.5, 3.0]])
    box = SimBox(*fb.boxes9[0]).to_matrix()
    for j in range(3):
        np.testing.assert_allclose(
            np.linalg.norm(box[j]), np.linalg.norm(h_in[j]), rtol=1e-5
        )
    for a, b in ((0, 1), (0, 2), (1, 2)):
        np.testing.assert_allclose(
            np.dot(box[a], box[b]),
            np.dot(h_in[a], h_in[b]), rtol=1e-4, atol=1e-5,
        )


def test_xyz_error_taxonomy(tmp_path):
    """Adversarial inputs raise typed errors (reference test style)."""
    bad_count = str(tmp_path / "bad_count.xyz")
    with open(bad_count, "w") as fh:
        fh.write("notanumber\ncomment\nC 0 0 0\n")
    with pytest.raises(ReadTrajError) as e:
        open_source(bad_count)
    assert e.value.code == "NotXyz"

    truncated = str(tmp_path / "trunc.xyz")
    with open(truncated, "w") as fh:
        fh.write("3\ncomment\nC 0 0 0\nO 1 1 1\n")
    with pytest.raises(ReadTrajError) as e:
        open_source(truncated)
    assert e.value.code == "CorruptFrame"

    mismatch = str(tmp_path / "mismatch.xyz")
    with open(mismatch, "w") as fh:
        fh.write("2\nf0\nC 0 0 0\nO 1 1 1\n1\nf1\nC 0 0 0\n")
    with pytest.raises(ReadTrajError) as e:
        open_source(mismatch)
    assert e.value.code == "AtomsNumberMismatch"

    with pytest.raises(ReadTrajError) as e:
        open_source(str(tmp_path / "missing.xyz"))
    assert e.value.code == "FileNotFound"

    badline = str(tmp_path / "badline.xyz")
    with open(badline, "w") as fh:
        fh.write("1\ncomment\nC zero 0 0\n")
    src = open_source(badline)
    with pytest.raises(ReadTrajError) as e:
        src.read_batch([0])
    assert e.value.code == "CorruptFrame"


# =====================================================================
# MOL2 (same chemfiles-long-tail axis; reader only, like the reference)
# =====================================================================

MOL2_TWO_FRAMES = """\
# comment line
@<TRIPOS>MOLECULE
frame0
3 2 1 0 0
SMALL
NO_CHARGES

@<TRIPOS>ATOM
1 O1 1.0 2.0 3.0 O.3 1 WAT 0.0
2 H1 2.0 3.0 4.0 H 1 WAT 0.0
3 H2 3.0 4.0 5.0 H 1 WAT 0.0
@<TRIPOS>BOND
1 1 2 1
2 1 3 1
@<TRIPOS>CRYSIN
30.0 40.0 50.0 90.0 90.0 90.0 1 1
@<TRIPOS>MOLECULE
frame1
3 2 1 0 0
SMALL
NO_CHARGES

@<TRIPOS>ATOM
1 O1 1.5 2.5 3.5 O.3 1 WAT 0.0
2 H1 2.5 3.5 4.5 H 1 WAT 0.0
3 H2 3.5 4.5 5.5 H 1 WAT 0.0
@<TRIPOS>BOND
1 1 2 1
2 1 3 1
"""


def test_mol2_frames_and_cell(tmp_path):
    """Each @<TRIPOS>MOLECULE is one frame; CRYSIN provides the cell;
    Angstrom -> nm; step-less chemfiles semantics."""
    path = str(tmp_path / "two.mol2")
    open(path, "w").write(MOL2_TWO_FRAMES)
    src = open_source(path)
    assert src.kind == "mol2"
    assert src.n_frames() == 2 and src.natoms == 3
    fb = src.read_batch([0, 1])
    np.testing.assert_allclose(
        fb.positions[0], [[0.1, 0.2, 0.3], [0.2, 0.3, 0.4], [0.3, 0.4, 0.5]],
        atol=1e-7,
    )
    np.testing.assert_allclose(fb.positions[1, 0], [0.15, 0.25, 0.35], atol=1e-7)
    np.testing.assert_allclose(fb.boxes9[0][:3], [3.0, 4.0, 5.0], atol=1e-6)
    assert fb.boxes9[1].sum() == 0.0  # frame 1 has no CRYSIN
    assert list(fb.steps) == [0, 1]
    np.testing.assert_allclose(fb.times, [0.0, 0.0])
    # partial read
    fb1 = src.read_batch([1], stop_after=2)
    assert fb1.positions.shape == (1, 2, 3)


def test_mol2_error_taxonomy(tmp_path):
    bad = str(tmp_path / "bad.mol2")
    open(bad, "w").write("this is not mol2\n")
    with pytest.raises(ReadTrajError) as e:
        open_source(bad)
    assert e.value.code == "NotMol2"

    trunc = str(tmp_path / "trunc.mol2")
    open(trunc, "w").write(
        "@<TRIPOS>MOLECULE\nm\n3 0\nSMALL\nNO_CHARGES\n\n"
        "@<TRIPOS>ATOM\n1 O1 1.0 2.0 3.0 O.3\n"
    )
    with pytest.raises(ReadTrajError) as e:
        open_source(trunc)
    assert e.value.code == "CorruptFrame"

    mismatch = str(tmp_path / "mm.mol2")
    open(mismatch, "w").write(
        "@<TRIPOS>MOLECULE\nm\n1 0\n\n\n@<TRIPOS>ATOM\n1 O1 0 0 0 O\n"
        "@<TRIPOS>MOLECULE\nm\n2 0\n\n\n@<TRIPOS>ATOM\n1 O1 0 0 0 O\n2 O2 1 1 1 O\n"
    )
    with pytest.raises(ReadTrajError) as e:
        open_source(mismatch)
    assert e.value.code == "AtomsNumberMismatch"

    with pytest.raises(ReadTrajError) as e:
        open_source(str(tmp_path / "missing.mol2"))
    assert e.value.code == "FileNotFound"
