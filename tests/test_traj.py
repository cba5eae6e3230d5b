"""Trajectory reading/writing parity tests against reference fixtures."""

import os

import numpy as np
import pytest

from groan_rs_tpu.errors import ReadTrajError
from groan_rs_tpu.system import System


@pytest.fixture(scope="module")
def system(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def _golden_gro_frames(path):
    """Parse a multi-frame golden gro written by the reference."""
    lines = open(path).read().splitlines()
    i = 0
    frames = []
    while i < len(lines):
        n = int(lines[i + 1])
        atoms = lines[i + 2 : i + 2 + n]
        pos = np.array(
            [[float(l[20 + 8 * k : 28 + 8 * k]) for k in range(3)] for l in atoms], np.float32
        )
        vel = None
        if len(atoms[0].rstrip()) >= 68:
            vel = np.array(
                [[float(l[44 + 8 * k : 52 + 8 * k]) for k in range(3)] for l in atoms], np.float32
            )
        title = lines[i]
        frames.append((title, pos, vel))
        i += 2 + n + 1
    return frames


def test_xtc_iter_updates_system(system, test_files):
    s = system.copy()
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    times, steps = [], []
    first_pos = None
    for frame in s.xtc_iter(xtc):
        times.append(frame.get_time())
        steps.append(frame.get_step())
        if first_pos is None:
            first_pos = frame.positions.copy()
        assert frame.get_box() is not None
        assert not frame.has_velocity.any()  # xtc resets velocities
    assert len(times) == 11
    assert times == [100.0 * i for i in range(11)]
    assert steps == [5000 * i for i in range(11)]
    np.testing.assert_allclose(first_pos[0], [5.97, 7.03, 7.69], atol=1e-4)


def test_xtc_iter_range_step(system, test_files):
    s = system.copy()
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    times = [f.get_time() for f in s.xtc_iter(xtc).with_range(300.0, 800.0)]
    assert times == [300.0, 400.0, 500.0, 600.0, 700.0, 800.0]
    times = [f.get_time() for f in s.xtc_iter(xtc).with_step(3)]
    assert times == [0.0, 300.0, 600.0, 900.0]
    times = [f.get_time() for f in s.xtc_iter(xtc).with_range(200.0, 700.0).with_step(2)]
    assert times == [200.0, 400.0, 600.0]
    with pytest.raises(ReadTrajError):
        next(iter(s.xtc_iter(xtc).with_range(5000.0, 6000.0)))


def test_group_xtc_iter_matches_golden(system, test_files):
    """Partial-frame group read must match the reference golden output."""
    s = system.copy()
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    golden = _golden_gro_frames(os.path.join(test_files, "expected_protein_trajectory.gro"))
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    protein = s.group_indices("Protein")
    it = s.group_xtc_iter("Protein", xtc)
    for (title, gpos, _), frame in zip(golden, it):
        np.testing.assert_allclose(frame.positions[protein], gpos, atol=5e-4)
    # only group atoms got updated positions
    assert s.has_position[protein].all()


def test_trr_iter(system, test_files):
    s = system.copy()
    trr = os.path.join(test_files, "short_trajectory.trr")
    n_with_v = 0
    n_with_x = 0
    for frame in s.trr_iter(trr):
        if frame.has_velocity.all():
            n_with_v += 1
        if frame.has_position.all():
            n_with_x += 1
    assert n_with_x > 0 and n_with_v > 0


def test_gro_iter(system, test_files):
    s = system.copy()
    gro = os.path.join(test_files, "protein_trajectory.gro")
    src_natoms = None
    times = []
    for frame in System.from_file(os.path.join(test_files, "protein.gro")).gro_iter(gro):
        times.append(frame.get_time())
        src_natoms = frame.get_n_atoms()
    assert len(times) > 1


def test_cat_iter_dedup(system, test_files):
    s1 = system.copy()
    split = os.path.join(test_files, "split")
    files = [os.path.join(split, f"traj{i}.xtc") for i in (1, 2, 3, 4, 5, 6)]
    times_cat = [f.get_time() for f in s1.xtc_cat_iter(files)]
    s2 = system.copy()
    times_full = [
        f.get_time()
        for f in s2.xtc_iter(os.path.join(test_files, "short_trajectory.xtc"))
    ]
    assert times_cat == times_full
    # coordinates identical too (last frame)
    np.testing.assert_allclose(s1.positions, s2.positions, atol=1e-6)


def test_write_xtc_roundtrip(system, test_files, tmp_path):
    s = system.copy()
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    out = tmp_path / "out.xtc"
    s.traj_writer_init(out)
    for frame in s.xtc_iter(xtc):
        frame.traj_write_frame()
    s.traj_writers_close()
    assert out.read_bytes() == open(xtc, "rb").read()


def test_write_group_xtc_golden(system, test_files, tmp_path):
    """Group XTC writer output must be byte-equal to the reference fixture
    (reference: traj_write.rs multiple_writers test)."""
    s = system.copy()
    s.group_create("Protein", "@protein")
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    out_x = tmp_path / "protein.xtc"
    s.group_traj_writer_init("Protein", out_x)
    for frame in s.xtc_iter(xtc):
        frame.traj_write_frame()
    s.traj_writers_close()
    golden = open(os.path.join(test_files, "short_trajectory_protein.xtc"), "rb").read()
    assert out_x.read_bytes() == golden


def test_gro_traj_writer_golden(system, test_files, tmp_path):
    """Group GRO trajectory writer: byte-equal to
    expected_protein_trajectory.gro (first 3 frames)."""
    s = system.copy()
    s.group_create("Protein", "@protein")
    out = tmp_path / "protein_traj.gro"
    s.group_traj_writer_init("Protein", out, fmt="gro")
    for i, frame in enumerate(s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc"))):
        if i >= 3:
            break
        frame.traj_write_frame()
    s.traj_writers_close()
    golden = open(os.path.join(test_files, "expected_protein_trajectory.gro")).read()
    ours = open(out).read()
    assert ours == golden


def test_fake_xtc_rejected(system, test_files):
    with pytest.raises(ReadTrajError):
        list(system.copy().xtc_iter(os.path.join(test_files, "fake_xtc.xtc")))


import pytest as _pytest


@_pytest.mark.parametrize("name", [
    "short_trajectory.xtc",
    "aa_membrane_peptide.xtc",
    "dodecahedron_trajectory.xtc",
    "octahedron_trajectory.xtc",
    "triclinic_trajectory.xtc",
])
def test_xtc_transcode_byte_identical(test_files, name, tmp_path):
    """Decode + re-encode of gromacs-written XTC reproduces the file
    BYTE-FOR-BYTE: the 3dfcoord encoder (smallidx adaptation, run coding,
    water swap, bit packing) is bit-compatible with gromacs/xdrfile."""
    import os as _os

    from groan_rs_tpu.io import native

    src = _os.path.join(test_files, name)
    offs, st, tm, na = native.xtc_scan(src)
    c, b9, _, _, pr = native.xtc_read_frames(src, offs, na)
    out = str(tmp_path / "tc.xtc")
    for i in range(len(offs)):
        native.xtc_write_frame(out, na, int(st[i]), float(tm[i]), b9[i], c[i],
                               float(pr[i]))
    assert open(src, "rb").read() == open(out, "rb").read()


def test_read_xtc_large_simulation_step(test_files):
    """xtc_io/mod.rs:1014 — steps beyond 2^31 are unsigned 32-bit on the
    wire and must read back as 3000000000+ (not negative)."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    steps = [fr.get_step() for fr in
             s.xtc_iter(os.path.join(test_files, "large_step.xtc"))]
    assert steps == [3000000000 + 5000 * i for i in range(11)]


def test_write_xtc_large_simulation_step_roundtrip(test_files, tmp_path):
    """Writing a >2^31 step stores the same 32-bit pattern GROMACS would."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    out = str(tmp_path / "big.xtc")
    s.traj_writer_init(out)
    for fr in s.xtc_iter(os.path.join(test_files, "large_step.xtc")):
        fr.traj_write_frame()
    s.traj_writers_close()
    s2 = System.from_file(os.path.join(test_files, "example.gro"))
    steps = [fr.get_step() for fr in s2.xtc_iter(out)]
    assert steps == [3000000000 + 5000 * i for i in range(11)]


def test_group_xtc_writer_byte_golden_snapshot(test_files, tmp_path):
    """xtc_io/mod.rs:1162/1191 — group writer output is byte-identical to
    short_trajectory_protein.xtc even when the group is replaced AND
    removed after writer init (the writer snapshots the selection)."""
    import warnings

    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    out = str(tmp_path / "prot.xtc")
    s.group_traj_writer_init("Protein", out, fmt="xtc")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s.group_create("Protein", "serial 1")
    s.group_remove("Protein")
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
    s.traj_writers_close()
    got = open(out, "rb").read()
    want = open(os.path.join(test_files, "short_trajectory_protein.xtc"), "rb").read()
    assert got == want


def test_cat_duplicate_not_at_boundary(system, test_files):
    """traj_cat.rs:624 — dedup only removes duplicates AT file boundaries;
    traj3b repeats time 300 inside the stream and both copies survive."""
    s = system.copy()
    split = os.path.join(test_files, "split")
    files = [os.path.join(split, n) for n in
             ("traj1.xtc", "traj2.xtc", "traj3b.xtc", "traj4.xtc",
              "traj5.xtc", "traj6.xtc")]
    times = [f.get_time() for f in s.xtc_cat_iter(files)]
    assert times == pytest.approx([0.0, 100.0, 200.0, 300.0, 300.0, 400.0,
                                   500.0, 600.0, 700.0, 800.0, 900.0, 1000.0])


def test_cat_duplicate_not_at_boundary_step3(system, test_files):
    """traj_cat.rs:647 — with_step(3) counts the duplicate frame."""
    s = system.copy()
    split = os.path.join(test_files, "split")
    files = [os.path.join(split, n) for n in
             ("traj1.xtc", "traj2.xtc", "traj3b.xtc", "traj4.xtc",
              "traj5.xtc", "traj6.xtc")]
    times = [f.get_time() for f in s.xtc_cat_iter(files).with_step(3)]
    assert times == pytest.approx([0.0, 300.0, 500.0, 800.0])


def test_cat_trr(system, test_files):
    """traj_cat.rs cat_trr — TRR concatenation with boundary dedup matches
    the unsplit trajectory."""
    s1 = system.copy()
    split = os.path.join(test_files, "split")
    files = [os.path.join(split, f"traj{i}.trr") for i in (1, 2, 3, 4, 5, 6)]
    times_cat = [f.get_time() for f in s1.trr_cat_iter(files)]
    s2 = system.copy()
    times_full = [f.get_time() for f in
                  s2.trr_iter(os.path.join(test_files, "short_trajectory.trr"))]
    assert times_cat == pytest.approx(times_full)


def test_range_step_error_modes(system, test_files):
    """xtc_io/mod.rs read_xtc_range_negative/_end_start/_start_not_found,
    read_xtc_step_0 — invalid range/step arguments raise typed errors."""
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    s = system.copy()
    with pytest.raises(ReadTrajError):
        s.xtc_iter(xtc).with_range(-300.0, 800.0)
    with pytest.raises(ReadTrajError):
        s.xtc_iter(xtc).with_range(800.0, 300.0)
    with pytest.raises(ReadTrajError):
        s.xtc_iter(xtc).with_range(20000.0, 30000.0)  # start beyond the end
    with pytest.raises(ReadTrajError):
        s.xtc_iter(xtc).with_step(0)
    # full range is a no-op
    times = [f.get_time() for f in s.xtc_iter(xtc).with_range(0.0, 10000.0)]
    assert len(times) == 11


def test_read_empty_trajectory_files(system, test_files, tmp_path):
    """xtc_io read_xtc_empty / trr equivalent — an empty file fails with
    CouldNotReadMagic, and a GRO-as-XTC fails cleanly too."""
    for suffix in (".xtc", ".trr"):
        empty = str(tmp_path / f"empty{suffix}")
        open(empty, "wb").close()
        with pytest.raises(ReadTrajError, match="magic"):
            system.copy().traj_iter(empty)
    with pytest.raises(ReadTrajError):
        system.copy().xtc_iter(os.path.join(test_files, "triclinic.gro"))
