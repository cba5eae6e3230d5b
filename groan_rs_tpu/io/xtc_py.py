"""Pure-Python XTC backend (the second-reader fallback).

The reference ships TWO independent XTC read paths — the default molly
reader and the vendored xdrfile C library (`src/io/xtc_io/xdrfile_xtc.rs`,
selectable via feature flags) — so that either backend can validate the
other.  This module is our analogue: a from-scratch, dependency-free
Python implementation of the XTC container and the 3dfcoord
variable-bit-packed coordinate compression, exposing the same
`xtc_scan` / `xtc_read_frames` contract as the native C++ codec
(`io/native.py`).  Select it with ``GROAN_XTC_BACKEND=py`` (the trajectory
reader then forces the plain f32 wire) or call these functions directly.

It exists for cross-backend validation and as a no-toolchain fallback,
not for speed: Python big-ints make the mixed-radix unpacking exact and
obviously correct, at ~10-100k atoms/s.  Format knowledge comes from the
public Gromacs XTC specification (magicints table, sizeofints/decodeints
mixed-radix coding, the water-swap run optimization) — the same contract
the C++ codec implements; see `io/native/xdrcodec.cpp:20-36`.

Supports magic 1995 and the 2023 large-frame variant (64-bit payload
size), tiny uncompressed systems (natoms <= 9), and partial-frame early
stop (`stop_after`), matching the native backend bit-for-bit.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..errors import ReadTrajError

# Magic quantization table of the XTC format specification (note the
# famous frozen 5060 entry — part of the format contract; TNG's variant
# of this table fixes it to 5160, see io/tng.py).
MAGICINTS = (
    0, 0, 0, 0, 0, 0, 0, 0, 0,
    8, 10, 12, 16, 20, 25, 32, 40, 50,
    64, 80, 101, 128, 161, 203, 256, 322, 406,
    512, 645, 812, 1024, 1290, 1625, 2048, 2580, 3250,
    4096, 5060, 6501, 8192, 10321, 13003, 16384, 20642, 26007,
    32768, 41285, 52015, 65536, 82570, 104031, 131072, 165140, 208063,
    262144, 330280, 416127, 524287, 660561, 832255, 1048576, 1321122,
    1664510, 2097152, 2642245, 3329021, 4194304, 5284491, 6658042,
    8388607, 10568983, 13316085, 16777216,
)
FIRSTIDX = 9
LASTIDX = len(MAGICINTS) - 1


def _err(msg, path, code):
    return ReadTrajError(f"{msg} ('{path}')", code=code)


def _sizeofint(size: int) -> int:
    """Bits needed to represent any value in [0, size] (inclusive)."""
    num, nbits = 1, 0
    while size >= num and nbits < 32:
        nbits += 1
        num <<= 1
    return nbits


def _sizeofints(sizes) -> int:
    """Bits needed for the mixed-radix pack of one value per size."""
    prod = 1
    for s in sizes:
        prod *= int(s)
    return _sizeofint_big(prod)


def _sizeofint_big(p: int) -> int:
    # 8*(nbytes-1) + sizeofint(top byte): the format's exact rule
    nbytes = max(1, (p.bit_length() + 7) // 8)
    top = p >> (8 * (nbytes - 1))
    return 8 * (nbytes - 1) + _sizeofint(top)


class _BitReader:
    """MSB-first bit reader over the packed coordinate payload."""

    __slots__ = ("data", "pos", "nbits", "overrun")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)
        self.overrun = False

    def get(self, nbits: int) -> int:
        if self.pos + nbits > self.nbits:
            self.overrun = True
            return 0
        out = 0
        data, pos = self.data, self.pos
        while nbits > 0:
            byte_i, bit_i = divmod(pos, 8)
            take = min(8 - bit_i, nbits)
            chunk = (data[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            pos += take
            nbits -= take
        self.pos = pos
        return out

    def get_ints(self, nbits: int, sizes) -> tuple[int, int, int]:
        """Mixed-radix decode of 3 ints packed in `nbits` bits.

        The pack is read as 8-bit chunks in little-endian byte order
        (first chunk = least significant), then peeled by successive
        div/mod with sizes[2], sizes[1]; the remainder is sizes[0]'s
        value.  Python big-ints make this exact for any bit width.
        """
        v = 0
        shift = 0
        n = nbits
        while n > 8:
            v |= self.get(8) << shift
            shift += 8
            n -= 8
        if n > 0:
            v |= self.get(n) << shift
        v, c2 = divmod(v, int(sizes[2]))
        c0, c1 = divmod(v, int(sizes[1]))
        return c0, c1, c2


def _parse_header(buf: bytes, off: int, fsize: int, path):
    """Parse one frame header at byte offset `off`.

    Returns (natoms, step, time, box9, precision, minint, maxint,
    smallidx, nbytes, data_offset, frame_size).
    """
    if off + 56 > fsize:
        raise _err("corrupted or truncated frame", path, "CorruptFrame")
    magic, natoms, step = struct.unpack_from(">iii", buf, off)
    if magic not in (1995, 2023):
        raise _err("invalid magic number (not a valid trajectory file)",
                   path, "NotXtc")
    time = struct.unpack_from(">f", buf, off + 12)[0]
    box9 = np.frombuffer(buf, ">f4", 9, off + 16).astype(np.float32)
    natoms2 = struct.unpack_from(">i", buf, off + 52)[0]
    if natoms2 != natoms:
        raise _err("corrupted or truncated frame", path, "CorruptFrame")

    if natoms <= 9:
        nbytes = natoms * 12
        return (natoms, step, time, box9, 0.0, None, None, 0,
                nbytes, off + 56, 56 + nbytes)

    hdr_extra = 40 if magic == 2023 else 36
    if off + 56 + hdr_extra > fsize:
        raise _err("corrupted or truncated frame", path, "CorruptFrame")
    precision = struct.unpack_from(">f", buf, off + 56)[0]
    minint = struct.unpack_from(">iii", buf, off + 60)
    maxint = struct.unpack_from(">iii", buf, off + 72)
    smallidx = struct.unpack_from(">i", buf, off + 84)[0]
    if magic == 2023:
        nbytes = struct.unpack_from(">q", buf, off + 88)[0]
    else:
        nbytes = struct.unpack_from(">i", buf, off + 88)[0]
    if nbytes < 0 or nbytes > fsize:
        raise _err("corrupted or truncated frame", path, "CorruptFrame")
    padded = (nbytes + 3) & ~3
    return (natoms, step, time, box9, precision, minint, maxint, smallidx,
            nbytes, off + 56 + hdr_extra, 56 + hdr_extra + padded)


def _decode_3dfcoord(payload: bytes, natoms: int, precision: float,
                     minint, maxint, smallidx: int, stop_after: int, path):
    """Decode the packed coordinate payload -> float32 [stop_after, 3].

    Quantized ints are collected first and converted in ONE vectorized
    float32 multiply at the end — `float(int) * (1.0f/precision)` in
    single precision is the format contract (the native codec's emit3),
    and a float64 multiply differs by 1 ulp often enough to break
    bit-parity."""
    sizeint = [maxint[a] - minint[a] + 1 for a in range(3)]
    if (sizeint[0] | sizeint[1] | sizeint[2]) > 0xFFFFFF:
        bitsizeint = [_sizeofint(s) for s in sizeint]
        bitsize = 0
    else:
        bitsize = _sizeofints(sizeint)

    if not FIRSTIDX <= smallidx <= LASTIDX:
        raise _err("corrupted or truncated frame", path, "CorruptFrame")
    smaller = MAGICINTS[max(FIRSTIDX, smallidx - 1)] // 2
    smallnum = MAGICINTS[smallidx] // 2
    sizesmall = [MAGICINTS[smallidx]] * 3

    br = _BitReader(payload)
    out = np.empty((min(stop_after, natoms), 3), np.int32)
    n_out = out.shape[0]
    emitted = 0
    prev = (0, 0, 0)
    i = 0
    run = 0  # STICKY across atoms: flag==0 reuses the previous run length

    def done():
        # a truncated payload reads zeros (the reader flags, not raises):
        # any value emitted AFTER the overrun is garbage, so every exit
        # must check, including the partial-read early returns
        if br.overrun:
            raise _err("corrupted or truncated frame", path, "CorruptFrame")
        return out

    while i < natoms:
        if i >= stop_after:
            return done()
        if bitsize == 0:
            x = br.get(bitsizeint[0])
            y = br.get(bitsizeint[1])
            z = br.get(bitsizeint[2])
        else:
            x, y, z = br.get_ints(bitsize, sizeint)
        i += 1
        cur = (x + minint[0], y + minint[1], z + minint[2])
        prev = cur

        flag = br.get(1)
        is_smaller = 0
        if flag:
            run = br.get(5)
            is_smaller = run % 3
            run -= is_smaller
            is_smaller -= 1
        if br.overrun:
            raise _err("corrupted or truncated frame", path, "CorruptFrame")

        if run > 0:
            for k in range(0, run, 3):
                dx, dy, dz = br.get_ints(smallidx, sizesmall)
                i += 1
                cur = (dx + prev[0] - smallnum, dy + prev[1] - smallnum,
                       dz + prev[2] - smallnum)
                if k == 0:
                    # water-swap: first run atom was exchanged with its
                    # predecessor at compression time — swap back, emit both
                    cur, prev = prev, cur
                    if emitted >= n_out:
                        return done()
                    out[emitted] = prev
                    emitted += 1
                else:
                    prev = cur
                if emitted >= n_out:
                    return done()
                out[emitted] = cur
                emitted += 1
            prev = cur
        else:
            if emitted >= n_out:
                return done()
            out[emitted] = cur
            emitted += 1

        smallidx += is_smaller
        if is_smaller < 0:
            smallnum = smaller
            smaller = MAGICINTS[smallidx - 1] // 2 if smallidx > FIRSTIDX else 0
        elif is_smaller > 0:
            smaller = smallnum
            smallnum = MAGICINTS[smallidx] // 2
        if not FIRSTIDX <= smallidx <= LASTIDX:
            raise _err("corrupted or truncated frame", path, "CorruptFrame")
        sizesmall = [MAGICINTS[smallidx]] * 3
        if br.overrun:
            raise _err("corrupted or truncated frame", path, "CorruptFrame")
    return done()


def xtc_scan(path):
    """Frame index -> (offsets i64[F], steps i64[F] (u32 semantics),
    times f32[F], natoms).  Same contract as `native.xtc_scan`."""
    try:
        with open(path, "rb") as fh:
            buf = fh.read()
    except OSError:
        raise ReadTrajError(f"file '{path}' was not found",
                            code="FileNotFound") from None
    fsize = len(buf)
    offsets, steps, times = [], [], []
    natoms0 = None
    off = 0
    while off < fsize:
        natoms, step, time, _, _, _, _, _, _, _, fsz = _parse_header(
            buf, off, fsize, path)
        if natoms0 is None:
            natoms0 = natoms
        elif natoms != natoms0:
            raise _err("number of atoms does not match", path,
                       "AtomsNumberMismatch")
        if off + fsz > fsize:
            raise _err("corrupted or truncated frame", path, "CorruptFrame")
        offsets.append(off)
        steps.append(step)
        times.append(time)
        off += fsz
    if natoms0 is None:
        raise _err("could not read magic number (empty file)", path,
                   "CouldNotReadMagic")
    steps_u32 = np.asarray(steps, np.int64) & 0xFFFFFFFF
    return (np.asarray(offsets, np.int64), steps_u32,
            np.asarray(times, np.float32), int(natoms0))


def xtc_read_frames(path, offsets, natoms: int, stop_after: int | None = None,
                    n_threads: int | None = None):
    """Decode frames at `offsets` -> (coords [F, stop, 3] f32, boxes [F, 9],
    steps i64, times f32, precisions f32).  Same contract (and bit-identical
    output) as `native.xtc_read_frames`; `n_threads` is accepted for
    signature parity and ignored."""
    del n_threads
    with open(path, "rb") as fh:
        buf = fh.read()
    fsize = len(buf)
    offsets = np.ascontiguousarray(offsets, np.int64)
    nf = offsets.shape[0]
    stop = int(stop_after) if stop_after is not None else int(natoms)
    coords = np.empty((nf, stop, 3), np.float32)
    boxes = np.empty((nf, 9), np.float32)
    steps = np.empty(nf, np.int64)
    times = np.empty(nf, np.float32)
    precisions = np.empty(nf, np.float32)
    for fi, off in enumerate(offsets):
        (na, step, time, box9, precision, minint, maxint, smallidx,
         nbytes, doff, _) = _parse_header(buf, int(off), fsize, path)
        if na != natoms:
            raise _err("number of atoms does not match", path,
                       "AtomsNumberMismatch")
        if doff + nbytes > fsize:
            raise _err("corrupted or truncated frame", path, "CorruptFrame")
        if na <= 9:
            n = min(stop, na)
            coords[fi, :n] = np.frombuffer(
                buf, ">f4", 3 * n, doff).reshape(n, 3)
            precisions[fi] = 0.0
        else:
            n = min(stop, na)
            ints = _decode_3dfcoord(
                buf[doff:doff + nbytes], na, precision, minint, maxint,
                smallidx, n, path)
            # single-precision throughout: float(int) * (1.0f/precision)
            inv = np.float32(1.0) / np.float32(precision)
            coords[fi, :n] = ints.astype(np.float32) * inv
            precisions[fi] = precision
        boxes[fi] = box9
        steps[fi] = step & 0xFFFFFFFF
        times[fi] = time
    return coords, boxes, steps, times, precisions


def backend() -> str:
    """Active XTC backend name: 'native' (C++ codec) or 'py' (this module),
    selected by the GROAN_XTC_BACKEND environment variable."""
    return os.environ.get("GROAN_XTC_BACKEND", "native")
