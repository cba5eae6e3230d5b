"""Progress output golden-file parity vs the reference's
test_files/progress_*.txt (reference drivers: src/progress/mod.rs:494-640,
src/io/traj_read.rs:924-1115, src/system/parallel.rs:1153-1230)."""

import io
import os

import numpy as np
import pytest

from groan_rs_tpu.progress import ProgressPrinter, ProgressStatus
from groan_rs_tpu.system import System


def _golden(test_files, name: str) -> str:
    with open(os.path.join(test_files, name), newline="") as fh:
        return fh.read()


def _drive_printer(printer):
    """The exact call sequence of the reference's printer golden tests
    (progress/mod.rs:494-513)."""
    printer.set_status(ProgressStatus.JUMPING)
    printer.print(0, 0, 0.0)
    printer.set_status(ProgressStatus.RUNNING)
    printer.print(0, 0, 0.0)
    printer.print(1, 10, 10.0)
    printer.print(2, 20, 20.0)
    printer.print(5, 50, 50.0)
    printer.print(95, 950, 950.0)
    printer.print(100, 1000, 1000.0)
    printer.print(101, 1010, 1010.0)
    printer.print(200, 2000, 2000.0)
    printer.print(300, 3000, 3000.0)
    printer.set_status(ProgressStatus.COMPLETED)
    printer.print(400, 4000, 4000.0)
    printer.set_status(ProgressStatus.FAILED)
    printer.print(500, 5000, 5000.0)


@pytest.mark.parametrize(
    "golden,kwargs",
    [
        ("progress_expected.txt", {}),
        ("progress_expected_newline.txt", {"terminating": "\n"}),
        ("progress_expected_terminating.txt", {"terminating": "  |  "}),
        ("progress_expected_no_newline.txt", {"newline_at_end": False}),
    ],
)
def test_printer_goldens(test_files, golden, kwargs):
    buf = io.StringIO()
    p = ProgressPrinter().with_output(buf).with_colored(False)
    if "terminating" in kwargs:
        p = p.with_terminating(kwargs["terminating"])
    if "newline_at_end" in kwargs:
        p = p.with_newline_at_end(kwargs["newline_at_end"])
    _drive_printer(p)
    assert buf.getvalue() == _golden(test_files, golden)


def test_print_freq_zero_raises():
    with pytest.raises(ValueError):
        ProgressPrinter().with_print_freq(0)


def _example_system(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_xtc_iter_progress_golden(test_files):
    """reference: traj_read.rs:924-953 -> progress_xtc_iter.txt."""
    s = _example_system(test_files)
    buf = io.StringIO()
    printer = ProgressPrinter().with_print_freq(3).with_output(buf).with_colored(False)
    for _ in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")).print_progress(printer):
        pass
    assert buf.getvalue() == _golden(test_files, "progress_xtc_iter.txt")


def test_xtc_iter_progress_newline_golden(test_files):
    s = _example_system(test_files)
    buf = io.StringIO()
    printer = (ProgressPrinter().with_print_freq(3).with_output(buf)
               .with_colored(False).with_terminating("\n"))
    for _ in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")).print_progress(printer):
        pass
    assert buf.getvalue() == _golden(test_files, "progress_xtc_iter_newline.txt")


def test_xtc_iter_range_progress_golden(test_files):
    """reference: traj_read.rs:991-1029 -> progress_xtc_iter_range.txt
    (printer attached BEFORE with_range -> jump line)."""
    s = _example_system(test_files)
    buf = io.StringIO()
    printer = ProgressPrinter().with_print_freq(3).with_output(buf).with_colored(False)
    reader = s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc"))
    for _ in reader.print_progress(printer).with_range(300.0, 800.0):
        pass
    assert buf.getvalue() == _golden(test_files, "progress_xtc_iter_range.txt")


def test_xtc_iter_step_progress_golden(test_files):
    """reference: traj_read.rs:1031-1070 -> progress_xtc_iter_step.txt."""
    s = _example_system(test_files)
    buf = io.StringIO()
    printer = ProgressPrinter().with_print_freq(1).with_output(buf).with_colored(False)
    reader = s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc"))
    for _ in reader.print_progress(printer).with_step(3):
        pass
    assert buf.getvalue() == _golden(test_files, "progress_xtc_iter_step.txt")


def test_xtc_iter_step_range_progress_golden(test_files):
    s = _example_system(test_files)
    buf = io.StringIO()
    printer = ProgressPrinter().with_print_freq(1).with_output(buf).with_colored(False)
    reader = s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc"))
    for _ in reader.print_progress(printer).with_step(3).with_range(300.0, 800.0):
        pass
    assert buf.getvalue() == _golden(test_files, "progress_xtc_iter_step_range.txt")


def test_trr_iter_progress_golden(test_files):
    s = _example_system(test_files)
    buf = io.StringIO()
    printer = ProgressPrinter().with_print_freq(3).with_output(buf).with_colored(False)
    for _ in s.trr_iter(os.path.join(test_files, "short_trajectory.trr")).print_progress(printer):
        pass
    assert buf.getvalue() == _golden(test_files, "progress_trr_iter.txt")


def test_map_reduce_progress_golden_4(test_files):
    """reference: parallel.rs:1153-1196 -> progress_multithreaded_4.txt
    (master-shard frames, COMPLETED at its last frame, then final COMPLETED
    with the globally latest step/time)."""
    import jax.numpy as jnp

    from groan_rs_tpu.ops import center as center_ops
    from groan_rs_tpu.parallel import traj_iter_map_reduce
    from groan_rs_tpu.parallel.engine import make_mesh

    s = _example_system(test_files)
    s.group_create("Protein", "@protein")
    idx = jnp.asarray(s.group_indices("Protein"))

    def body(positions, boxes, mask):
        return {"center": center_ops.center(
            jnp.take(positions, idx, axis=1), boxes[:, None, :])}

    buf = io.StringIO()
    printer = (ProgressPrinter().with_print_freq(1).with_output(buf)
               .with_colored(False).with_terminating("\n"))
    mesh = make_mesh(4, 1)
    out = traj_iter_map_reduce(
        s, os.path.join(test_files, "short_trajectory.xtc"), body,
        batch_size=4, progress=printer, mesh=mesh,
    )
    assert out["center"].shape == (11, 3)
    assert buf.getvalue() == _golden(test_files, "progress_multithreaded_4.txt")


def test_map_reduce_progress_golden_many(test_files):
    """reference: parallel.rs:1201-1230 -> progress_multithreaded_many.txt
    (more shards than frames: master holds only frame 0)."""
    from groan_rs_tpu.parallel import traj_iter_map_reduce
    from groan_rs_tpu.parallel.engine import make_mesh

    s = _example_system(test_files)

    def body(positions, boxes, mask):
        return {"first": positions[:, 0]}

    buf = io.StringIO()
    printer = (ProgressPrinter().with_print_freq(1).with_output(buf)
               .with_colored(False).with_terminating("\n"))

    # reference used 32 threads for 11 frames; emulate "more shards than
    # frames" via the progress-shard override (the mesh itself has 8 CPUs)
    out = traj_iter_map_reduce(
        s, os.path.join(test_files, "short_trajectory.xtc"), body,
        batch_size=32, progress=printer, mesh=make_mesh(8, 1),
        progress_shards=32,
    )
    assert out["first"].shape == (11, 3)
    assert buf.getvalue() == _golden(test_files, "progress_multithreaded_many.txt")


def test_custom_messages_builder():
    """mod.rs:235-287 + test new_progress_printer — custom step/time and
    per-status tag messages render in the output; >9-char tags refuse."""
    import io

    from groan_rs_tpu.progress import ProgressPrinter, ProgressStatus

    buf = io.StringIO()
    p = (ProgressPrinter()
         .with_output(buf)
         .with_colored(False)
         .with_print_freq(1)
         .with_step_msg("STEP")
         .with_time_msg("time")
         .with_running_msg("ANALYZING")
         .with_completed_msg("DONE")
         .with_failed_msg("FAILURE")
         .with_jumping_msg("JUMP"))
    p.print(0, 5000, 100.0)
    assert "[ANALYZING]" in buf.getvalue()
    assert "STEP" in buf.getvalue() and "time" in buf.getvalue()
    p.set_status(ProgressStatus.COMPLETED)
    p.print(1, 10000, 200.0)
    assert "[  DONE   ]" in buf.getvalue()
    p.set_status(ProgressStatus.FAILED)
    p.print(2, 10000, 200.0)
    assert "[ FAILURE ]" in buf.getvalue()
    with pytest.raises(ValueError):
        ProgressPrinter().with_running_msg("TOO LONG MSG")
