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

    def __init__(self, lines, _mat=None):
        if _mat is not None:
            self.mat = _mat
            self.n, self.width = _mat.shape
            return
        arr = np.array(lines, dtype=np.bytes_)
        self.n = arr.shape[0]
        self.width = arr.dtype.itemsize
        # S{W} is W contiguous bytes (NUL padded) -> [n, W] byte matrix
        self.mat = arr.view("S1").reshape(self.n, self.width)

    @classmethod
    def from_bytes(cls, data: bytes, n_lines: int | None = None):
        """Vectorized line split of a raw byte blob (no per-line Python
        strings — the 1M-atom-structure fast path).  `data` holds exactly
        the lines (trailing newline optional); \r\n is handled."""
        a = np.frombuffer(data, np.uint8)
        nl = np.flatnonzero(a == 0x0A)
        if len(a) and (not len(nl) or nl[-1] != len(a) - 1):
            nl = np.append(nl, len(a))  # implicit final newline
        starts = np.empty(len(nl), np.int64)
        starts[0] = 0
        starts[1:] = nl[:-1] + 1
        lens = nl - starts
        # strip \r
        if len(lens):
            ends = starts + lens - 1
            has_cr = (lens > 0) & (a[np.minimum(ends, len(a) - 1)] == 0x0D)
            lens = lens - has_cr
        if n_lines is not None:
            starts, lens = starts[:n_lines], lens[:n_lines]
        n = len(starts)
        width = int(lens.max()) if n else 0
        # uniform-width fast path (the normal case for fixed-column
        # formats): a zero-copy reshape of the raw buffer
        if n and (lens == lens[0]).all():
            stride = int(starts[1] - starts[0]) if n > 1 else width + 1
            uniform = n == 1 or (np.diff(starts) == stride).all()
            if uniform and stride >= width:
                total = n * stride
                avail = len(a) - int(starts[0])
                if avail >= total:
                    mat = a[starts[0] : starts[0] + total].reshape(n, stride)
                else:  # final line lacks its trailing newline byte(s)
                    mat = np.zeros((n, stride), np.uint8)
                    mat.reshape(-1)[:avail] = a[starts[0] :]
                mat = mat[:, :width]
                return cls(None, _mat=mat.view("S1"))
        # ragged fallback: chunked gather (bounded index-matrix memory)
        mat = np.zeros((n, width), np.uint8)
        cols = np.arange(width)
        chunk = max(1, (1 << 24) // max(width, 1))
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            idx = starts[s:e, None] + cols[None, :]
            valid = cols[None, :] < lens[s:e, None]
            mat[s:e] = np.where(valid, a[np.minimum(idx, len(a) - 1)], 0)
        return cls(None, _mat=mat.view("S1"))

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

    def col_str_bytes(self, start: int, end: int) -> np.ndarray:
        """Column slice as stripped BYTE strings (no unicode conversion —
        interning/unique on S-dtype is several times faster)."""
        return np.char.strip(self.col_bytes(start, end))

    def col_int(self, start: int, end: int, what: str, error_cls) -> np.ndarray:
        raw = self.col_bytes(start, end)
        try:
            # numpy parses space-padded byte strings directly
            return raw.astype(np.int64)
        except ValueError:
            bad = _first_bad_int(np.char.strip(raw.astype(str)))
            raise error_cls(f"could not parse {what} ('{bad}')") from None

    def col_float(self, start: int, end: int, what: str, error_cls) -> np.ndarray:
        raw = self.col_bytes(start, end)
        try:
            vals = raw.astype(np.float64)
        except ValueError:
            bad = _first_bad_float(np.char.strip(raw.astype(str)))
            raise error_cls(f"could not parse {what} ('{bad}')") from None
        return vals

    def line_lengths(self) -> np.ndarray:
        """Trailing-whitespace-stripped length of each line."""
        # integer scan of the byte matrix: last column that is neither NUL
        # padding nor a space (S1 comparisons go through slow string
        # ufuncs; uint8 compares are plain SIMD)
        m = self.mat.view(np.uint8)
        content = (m != 0x20) & (m != 0)
        any_row = content.any(axis=1)
        last = self.width - np.argmax(content[:, ::-1], axis=1)
        return np.where(any_row, last, 0)


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
