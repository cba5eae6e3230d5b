"""Multi-frame GRO trajectory parity (reference: gro_io/trajectory.rs)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.errors import ReadTrajError
from groan_rs_tpu.system import System


def test_gro_iter_times_steps_positions(test_files):
    """reference: trajectory.rs:565-597 — exact per-frame times/steps from
    the title lines; protein coordinates match the xtc (low precision)."""
    expected_times = [0.0, 100.0, 200.0, 300.0, 300.0, 500.0, 500.0, 700.0,
                      800.0, 900.0, 1000.0]
    expected_steps = [0, 5000, 10000, 15000, 15000, 25000, 25000, 35000,
                      40000, 45000, 50000]

    s = System.from_file(os.path.join(test_files, "protein_trajectory.gro"))
    s2 = System.from_file(os.path.join(test_files, "example.gro"))

    frames2 = iter(s2.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")))
    for i, f1 in enumerate(
        s.traj_iter(os.path.join(test_files, "protein_trajectory.gro"), fmt="gro")
    ):
        f2 = next(frames2)
        assert f1.get_time() == pytest.approx(expected_times[i], abs=1e-3)
        assert f1.get_step() == expected_steps[i]
        np.testing.assert_allclose(
            f1.positions[:61], f2.positions[:61], atol=5e-3
        )
    assert i == 10


def test_gro_iter_velocities(test_files):
    """trajectory.rs:623 — velocities parsed from multi-frame gro."""
    s = System.from_file(
        os.path.join(test_files, "protein_trajectory_velocities.gro"))
    n_frames = 0
    missing_seen = 0
    for f in s.traj_iter(
        os.path.join(test_files, "protein_trajectory_velocities.gro"), fmt="gro"
    ):
        # the fixture intentionally omits velocities on one line of some
        # frames — per-atom presence must reflect that (reference:
        # line_as_atom leaves velocity None per atom)
        assert f.has_velocity.sum() >= f.get_n_atoms() - 2
        missing_seen += int((~f.has_velocity).sum())
        assert np.abs(f.velocities[f.has_velocity]).sum() > 0
        n_frames += 1
    assert n_frames > 1
    assert missing_seen >= 1


def test_gro_iter_range_step(test_files):
    """trajectory.rs:695-830 — range/step adapters on the gro reader."""
    s = System.from_file(os.path.join(test_files, "protein_trajectory.gro"))
    path = os.path.join(test_files, "protein_trajectory.gro")
    times = [f.get_time() for f in s.traj_iter(path, fmt="gro", step=2)]
    assert times == [0.0, 200.0, 300.0, 500.0, 800.0, 1000.0]
    times = [f.get_time() for f in
             s.traj_iter(path, fmt="gro", start_time=300.0, end_time=800.0)]
    assert times == [300.0, 300.0, 500.0, 500.0, 700.0, 800.0]


@pytest.mark.parametrize("name", [
    "protein_trajectory_missing_box.gro",
    "protein_trajectory_missing_natoms.gro",
    "nan_trajectory.gro",
    "protein_trajectory_incomplete_line.gro",
])
def test_gro_iter_invalid(test_files, name):
    s = System.from_file(os.path.join(test_files, "protein.gro"))
    with pytest.raises(ReadTrajError):
        for _ in s.traj_iter(os.path.join(test_files, name), fmt="gro"):
            pass


def test_gro_writer_goldens(test_files, tmp_path):
    """gro_io/trajectory.rs:985/1011 — writer output is byte-identical to
    expected_protein_trajectory(.gro/_velocities.gro); velocities are
    written automatically whenever the system has them."""
    s = System.from_file(os.path.join(test_files, "protein.gro"))
    out = str(tmp_path / "novel.gro")
    s.traj_writer_init(out, fmt="gro")
    for i, fr in enumerate(s.xtc_iter(
            os.path.join(test_files, "short_trajectory_protein.xtc"))):
        if i >= 3:
            break
        fr.traj_write_frame()
    s.traj_writers_close()
    want = open(os.path.join(test_files, "expected_protein_trajectory.gro")).read()
    assert open(out).read() == want

    s2 = System.from_file(os.path.join(test_files, "protein.gro"))
    out2 = str(tmp_path / "vel.gro")
    s2.traj_writer_init(out2, fmt="gro")
    for fr in s2.gro_iter(os.path.join(
            test_files, "expected_protein_trajectory_velocities.gro")):
        fr.traj_write_frame()
    s2.traj_writers_close()
    want2 = open(os.path.join(
        test_files, "expected_protein_trajectory_velocities.gro")).read()
    assert open(out2).read() == want2


def test_gro_iter_nan_position(test_files):
    """gro_io/trajectory.rs:956 — NaN coordinates in a trajectory frame
    raise a parse error, not silently propagate."""
    from groan_rs_tpu.errors import GroanError

    s = System.from_file(os.path.join(test_files, "protein.gro"))
    with pytest.raises(GroanError):
        for _ in s.gro_iter(os.path.join(test_files, "nan_trajectory.gro")):
            pass


def test_gro_iter_invalid_atom_numbers(test_files):
    """gro_io/trajectory.rs:906 — frame atom count differing from the
    system raises AtomsNumberMismatch naming the file."""
    from groan_rs_tpu.errors import ReadTrajError

    s = System.from_file(os.path.join(test_files, "example.gro"))
    with pytest.raises(ReadTrajError, match="protein_trajectory.gro"):
        for _ in s.gro_iter(os.path.join(test_files, "protein_trajectory.gro")):
            pass
