"""Trajectory progress reporting.

reference: `src/progress/mod.rs:79` — status Running/Completed/Failed/
Jumping, `[{:^9}]   Step {:12} | Time {:12} ps` format, default print
frequency 100, `\\r` terminator, optional ANSI colors.
"""

from __future__ import annotations

import enum
import sys


class ProgressStatus(enum.Enum):
    RUNNING = "RUNNING"
    COMPLETED = "COMPLETED"
    FAILED = "FAILED!"
    JUMPING = "JUMPING"


_COLORS = {
    ProgressStatus.RUNNING: "\x1b[33m",  # yellow
    ProgressStatus.COMPLETED: "\x1b[32m",  # green
    ProgressStatus.FAILED: "\x1b[31m",  # red
    ProgressStatus.JUMPING: "\x1b[95m",  # bright purple
}
_RESET = "\x1b[0m"
_CYAN = "\x1b[36m"
_BRIGHT_PURPLE = "\x1b[95m"


class ProgressPrinter:
    """reference: progress/mod.rs:79-130."""

    def __init__(self):
        self.output = sys.stdout
        self.status = ProgressStatus.RUNNING
        self.print_freq = 100
        self.colored = True
        self.step_msg = "Step"
        self.time_msg = "Time"
        self.terminating = "\r"
        self.newline_at_end = True
        self.status_msgs = {}  # per-status tag overrides (with_*_msg)

    # builder-style configuration (reference: with_* methods)
    def with_output(self, stream):
        self.output = stream
        return self

    def with_status(self, status: ProgressStatus):
        self.status = status
        return self

    def set_status(self, status: ProgressStatus):
        self.status = status

    def with_print_freq(self, freq: int):
        if freq <= 0:
            raise ValueError("print_freq must be non-zero")
        self.print_freq = int(freq)
        return self

    def with_colored(self, colored: bool):
        self.colored = bool(colored)
        return self

    def with_terminating(self, terminating: str):
        self.terminating = terminating
        return self

    def with_newline_at_end(self, v: bool):
        self.newline_at_end = bool(v)
        return self

    def _with_status_msg(self, status: ProgressStatus, msg: str):
        """reference: with_*_msg setters (mod.rs:252-287); the tag field
        is 9 characters wide, longer messages are refused like the
        reference's ProgressMessage::new panic."""
        if len(msg) > 9:
            raise ValueError(
                f"progress message '{msg}' is longer than 9 characters")
        self.status_msgs[status] = msg
        return self

    def with_running_msg(self, msg: str):
        return self._with_status_msg(ProgressStatus.RUNNING, msg)

    def with_completed_msg(self, msg: str):
        return self._with_status_msg(ProgressStatus.COMPLETED, msg)

    def with_failed_msg(self, msg: str):
        return self._with_status_msg(ProgressStatus.FAILED, msg)

    def with_jumping_msg(self, msg: str):
        return self._with_status_msg(ProgressStatus.JUMPING, msg)

    def with_step_msg(self, msg: str):
        """reference: mod.rs:235."""
        self.step_msg = msg
        return self

    def with_time_msg(self, msg: str):
        """reference: mod.rs:242."""
        self.time_msg = msg
        return self

    # ------------------------------------------------------------- printing
    def _status_tag(self) -> str:
        name = self.status_msgs.get(self.status, self.status.value)
        if self.colored:
            return f"[{_COLORS[self.status]}{name:^9}{_RESET}]   "
        return f"[{name:^9}]   "

    def print(self, frame_number: int, sim_step: int, sim_time: float):
        """Print progress for a frame (every `print_freq` frames while
        running; always for terminal states)."""
        if self.status is ProgressStatus.RUNNING and frame_number % self.print_freq != 0:
            return
        self._emit(sim_step, sim_time)

    def _emit(self, sim_step: int, sim_time: float):
        out = self._status_tag()
        if self.status is ProgressStatus.JUMPING:
            out += f"Jumping to the start of the iteration...{self.terminating}"
        else:
            step_label = f"{_CYAN}{self.step_msg}{_RESET}" if self.colored else self.step_msg
            time_label = (
                f"{_BRIGHT_PURPLE}{self.time_msg}{_RESET}" if self.colored else self.time_msg
            )
            out += f"{step_label} {sim_step:12} | {time_label} {int(sim_time):12} ps{self.terminating}"
        if self.status in (ProgressStatus.COMPLETED, ProgressStatus.FAILED) and self.newline_at_end:
            out += "\n"
        self.output.write(out)
        self.output.flush()

    def print_jumping(self):
        prev = self.status
        self.status = ProgressStatus.JUMPING
        self._emit(0, 0.0)
        self.status = prev
