"""TRR parity (reference: io/trr_io.rs inline tests — per-frame x/v/f
presence, exact first/second frame values, range/step, triclinic boxes)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.system import System


@pytest.fixture()
def sys_(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_read_trr_first_frames(sys_, test_files):
    """trr_io.rs:574-705 — exact values and per-frame block presence."""
    path = os.path.join(test_files, "short_trajectory.trr")
    it = iter(sys_.trr_iter(path))

    f = next(it)  # frame 0: x + v + f all present
    assert f.get_step() == 0
    assert f.get_lambda() == 0.0
    assert f.get_time() == pytest.approx(0.0)
    sb = f.get_box()
    assert sb.x == pytest.approx(13.01331, abs=1e-5)
    assert sb.z == pytest.approx(11.25347, abs=1e-5)
    np.testing.assert_allclose(f.positions[0], [9.497, 1.989, 7.498], atol=1e-5)
    np.testing.assert_allclose(f.velocities[0], [-0.0683, 0.1133, 0.0005], atol=1e-5)
    np.testing.assert_allclose(f.forces[0], [-6.2916107, -276.57983, -306.23727],
                               atol=1e-3)
    np.testing.assert_allclose(f.positions[16843], [8.829, 11.186, 2.075], atol=1e-5)
    np.testing.assert_allclose(f.forces[16843], [-21.009035, -6.7285156, -68.827545],
                               atol=1e-3)
    assert f.has_position.all() and f.has_velocity.all() and f.has_force.all()

    f = next(it)  # frame 1: velocities+forces only in this fixture
    assert f.get_step() == 6000
    assert f.get_time() == pytest.approx(120.0)
    assert f.get_box().x == pytest.approx(13.024242, abs=1e-5)
    assert not f.has_position.any()  # reference: atom positions are None

    f = next(it)  # frame 2
    assert f.get_step() == 8000
    assert not f.has_position.any()


def test_trr_range_step(sys_, test_files):
    """trr_io.rs range/step adapters (steps 0,6000,8000,... per fixture)."""
    path = os.path.join(test_files, "short_trajectory.trr")
    all_times = [f.get_time() for f in sys_.trr_iter(path)]
    assert len(all_times) > 3
    stepped = [f.get_time() for f in sys_.traj_iter(path, fmt="trr", step=3)]
    assert stepped == all_times[::3]
    lo, hi = all_times[1], all_times[-2]
    ranged = [f.get_time() for f in
              sys_.traj_iter(path, fmt="trr", start_time=lo, end_time=hi)]
    assert ranged == [t for t in all_times if lo - 1e-3 <= t <= hi + 1e-3]


@pytest.mark.parametrize("name,natoms", [
    ("triclinic_trajectory.trr", 50),
    ("dodecahedron_trajectory.trr", 50),
    ("octahedron_trajectory.trr", 50),
])
def test_trr_triclinic_boxes(test_files, name, natoms):
    """Triclinic TRR boxes round through the reader with off-diagonal
    components intact (trr_io.rs:1514,1608)."""
    from groan_rs_tpu.io.traj import open_source

    src = open_source(os.path.join(test_files, name))
    assert src.natoms == natoms
    fb = src.read_batch(np.arange(src.n_frames()))
    h = fb.box_matrices()
    off_diag = np.abs(h[:, 1, 0]).sum() + np.abs(h[:, 2, :2]).sum()
    assert off_diag > 0
    # positions parity vs the xtc twin at SHARED times (the twins sample
    # different schedules) and only where the TRR frame carries positions
    xtc_twin = name.replace(".trr", ".xtc")
    xsrc = open_source(os.path.join(test_files, xtc_twin))
    xb = xsrc.read_batch(np.arange(xsrc.n_frames()))
    xtc_by_time = {round(float(t), 3): k for k, t in enumerate(xb.times)}
    compared = 0
    for k, t in enumerate(fb.times):
        if fb.has_x is not None and not fb.has_x[k]:
            continue
        j = xtc_by_time.get(round(float(t), 3))
        if j is None:
            continue
        np.testing.assert_allclose(
            fb.positions[k], xb.positions[j], atol=6e-3
        )
        compared += 1
    assert compared >= 1


def test_trr_write_roundtrip(sys_, test_files, tmp_path):
    """TRR writer round trip preserves x/v/f and metadata."""
    path = os.path.join(test_files, "short_trajectory.trr")
    out = tmp_path / "out.trr"
    s = sys_.copy()
    s.traj_writer_init(str(out), fmt="trr")
    n = 0
    for f in s.trr_iter(path):
        f.traj_write_frame()
        n += 1
    s.traj_writers_close()

    s2 = sys_.copy()
    frames2 = list(s2.trr_iter(str(out)))
    assert len(frames2) == n
    # re-read first frame: values preserved
    s3 = sys_.copy()
    it3 = iter(s3.trr_iter(str(out)))
    f0 = next(it3)
    np.testing.assert_allclose(f0.positions[0], [9.497, 1.989, 7.498], atol=1e-5)
    np.testing.assert_allclose(f0.velocities[0], [-0.0683, 0.1133, 0.0005], atol=1e-5)


def test_trr_double_precision(test_files):
    """Double-precision TRR downcasts to f32 and matches the
    single-precision twin at shared frames (trr_io.rs:806,1055;
    src/lib.rs:357)."""
    from groan_rs_tpu.io.traj import open_source

    d = open_source(os.path.join(test_files,
                                 "triclinic_trajectory_double_precision.trr"))
    s = open_source(os.path.join(test_files, "triclinic_trajectory.trr"))
    fd = d.read_batch(np.arange(d.n_frames()))
    fs = s.read_batch(np.arange(s.n_frames()))
    assert d.natoms == s.natoms == 50
    # double flag set on every frame of the double fixture
    assert (d.flags & 8).all()
    assert not (s.flags & 8).any()
    # the two fixtures share only the starting structure (they are separate
    # runs): frame 0 must agree to f32 rounding; later frames diverge
    assert fd.has_x[0] and fs.has_x[0]
    np.testing.assert_allclose(fd.positions[0], fs.positions[0], atol=1e-4)
    assert np.isfinite(fd.positions[fd.has_x]).all()
    assert np.isfinite(fd.velocities[fd.has_v]).all()


def test_trr_group_writer_byte_golden(test_files, tmp_path):
    """trr_io.rs write_group_trr — group writer output is byte-identical to
    the reference's short_trajectory_protein.trr golden, and replacing or
    removing the group after init does not affect it (snapshot semantics,
    trr_io.rs write_group_trr_replace/remove)."""
    import warnings

    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    out = str(tmp_path / "prot.trr")
    s.group_traj_writer_init("Protein", out, fmt="trr")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s.group_create("Protein", "serial 1")
    s.group_remove("Protein")
    # the reference test feeds XTC frames into the TRR writer
    # (trr_io.rs:1787) — x from the trajectory, v/f zero-filled
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
    s.traj_writers_close()
    got = open(out, "rb").read()
    want = open(os.path.join(test_files, "short_trajectory_protein.trr"), "rb").read()
    assert got == want
