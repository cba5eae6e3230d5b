"""Vectorized fixed-width text column parsing.

The reference parses GRO/PDB line-by-line in Rust (`src/io/gro_io/structure.rs:165`);
a Python loop would be ~100x slower, so structure files parse through numpy:
lines become one contiguous byte matrix, column slices reinterpret as
fixed-width byte strings, and numeric conversion happens in C via `astype`.
"""

from __future__ import annotations

import numpy as np


class FixedWidthLines:
    """A block of text lines as an `[n_lines, width]` byte matrix."""

    def __init__(self, lines):
        arr = np.array(lines, dtype=np.bytes_)
        self.n = arr.shape[0]
        self.width = arr.dtype.itemsize
        # S{W} is W contiguous bytes (NUL padded) -> [n, W] byte matrix
        self.mat = arr.view("S1").reshape(self.n, self.width)

    def col_bytes(self, start: int, end: int) -> np.ndarray:
        """Column slice [start, end) as `S{end-start}` array (NUL = padding)."""
        end = min(end, self.width)
        if end <= start:
            return np.full(self.n, b"", dtype="S1")
        width = end - start
        return np.ascontiguousarray(self.mat[:, start:end]).view(f"S{width}")[:, 0]

    def col_str(self, start: int, end: int) -> np.ndarray:
        """Column slice as stripped unicode strings."""
        return np.char.strip(self.col_bytes(start, end).astype(str))

    def col_int(self, start: int, end: int, what: str, error_cls) -> np.ndarray:
        raw = np.char.strip(self.col_bytes(start, end).astype(str))
        try:
            return raw.astype(np.int64)
        except ValueError:
            bad = _first_bad_int(raw)
            raise error_cls(f"could not parse {what} ('{bad}')") from None

    def col_float(self, start: int, end: int, what: str, error_cls) -> np.ndarray:
        raw = np.char.strip(self.col_bytes(start, end).astype(str))
        try:
            vals = raw.astype(np.float64)
        except ValueError:
            bad = _first_bad_float(raw)
            raise error_cls(f"could not parse {what} ('{bad}')") from None
        return vals

    def line_lengths(self) -> np.ndarray:
        """Trailing-whitespace-stripped length of each line (numpy S-strings
        already ignore trailing NUL padding)."""
        return np.char.str_len(np.char.rstrip(self.col_bytes(0, self.width)))


def _first_bad_int(raw) -> str:
    for v in raw:
        try:
            int(v)
        except ValueError:
            return str(v)
    return ""


def _first_bad_float(raw) -> str:
    for v in raw:
        try:
            float(v)
        except ValueError:
            return str(v)
    return ""
