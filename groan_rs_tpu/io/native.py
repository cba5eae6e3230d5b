"""ctypes bindings + on-demand build of the native trajectory codec.

The C++ library (`io/native/xdrcodec.cpp`) plays the role of the
reference's vendored xdrfile C library + molly Rust crate (build glue:
reference `build.rs:1-33`).  It is compiled once per source hash with
`g++ -O3` into `io/native/libgroanxdr-<hash>.so` and bound via ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

from ..errors import ReadTrajError, WriteTrajError

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native", "xdrcodec.cpp")

_lock = threading.Lock()
_lib = None

_ERRORS = {
    -1: ("CouldNotOpen", "file could not be opened"),
    -2: ("NotXtc", "invalid magic number (not a valid trajectory file)"),
    -3: ("CorruptFrame", "corrupted or truncated frame"),
    -4: ("AtomsNumberMismatch", "number of atoms does not match"),
    -5: ("CouldNotRead", "i/o error while reading frame"),
    -6: ("CapacityExceeded", "frame index capacity exceeded"),
    -7: ("PrecisionTooHigh", "coordinate does not fit the requested precision"),
    -8: ("Q16Range", "quantized coordinates do not fit int16"),
    -9: ("DeltaRange", "inter-frame deltas do not fit int8 (or precision varies)"),
    -10: ("CapacityExceeded", "output capacity exceeded"),
}


def _check(rc: int, path, write=False):
    if rc >= 0:
        return rc
    code, msg = _ERRORS.get(int(rc), ("UnknownError", f"native error {rc}"))
    cls = WriteTrajError if write else ReadTrajError
    raise cls(f"{msg} ('{path}')", code=code)


def _build() -> str:
    # instrumented-build override (ASan fuzz harness, tests/asan_fuzz.py)
    override = os.environ.get("GROAN_NATIVE_LIB")
    if override:
        return override
    with open(_SRC, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:12]
    so_path = os.path.join(_DIR, "native", f"libgroanxdr-{tag}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        "-fno-math-errno", "-pthread", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(
            f"failed to build native codec: {e.stderr.decode(errors='replace')}"
        ) from None
    os.replace(tmp, so_path)
    return so_path


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_build())
        i64, i32, f32, f64, u8 = (
            ctypes.c_int64, ctypes.c_int32, ctypes.c_float, ctypes.c_double, ctypes.c_uint8,
        )
        P = ctypes.POINTER
        lib.gx_xtc_scan.restype = i64
        lib.gx_xtc_scan.argtypes = [ctypes.c_char_p, i64, P(i64), P(i32), P(f32), P(i32)]
        lib.gx_xtc_read.restype = i64
        lib.gx_xtc_read.argtypes = [
            ctypes.c_char_p, P(i64), i64, i32, i32, P(f32), P(f32), P(i32), P(f32), P(f32), i32,
        ]
        i16 = ctypes.c_int16
        lib.gx_xtc_read_q16.restype = i64
        lib.gx_xtc_read_q16.argtypes = [
            ctypes.c_char_p, P(i64), i64, i32, i32, P(i16), P(f32), P(i32), P(f32), P(f32), i32,
        ]
        i8 = ctypes.c_int8
        lib.gx_xtc_read_delta.restype = i64
        lib.gx_xtc_read_delta.argtypes = [
            ctypes.c_char_p, P(i64), i64, i32, i32, P(i32), i32, P(i32), f32,
            P(i8), P(i32), P(i32), P(i32), P(i32), i32, P(i32), P(i32),
            P(i32), P(f32), P(i32), P(f32), P(f32), i32,
        ]
        lib.gx_xtc_read_delta6.restype = i64
        lib.gx_xtc_read_delta6.argtypes = [
            ctypes.c_char_p, P(i64), i64, i32, i32, P(i32), i32, P(i32), f32,
            P(u8), P(i32), P(i32), P(i32), P(i32), i32, P(i32), P(i32),
            P(i32), P(f32), P(i32), P(f32), P(f32), i32,
        ]
        lib.gx_xtc_probe.restype = i64
        lib.gx_xtc_probe.argtypes = [ctypes.c_char_p, P(i32), P(i32)]
        lib.gx_selftest_divm.restype = i64
        lib.gx_selftest_divm.argtypes = [i64]
        lib.gx_hbond_candidates.restype = i64
        lib.gx_hbond_candidates.argtypes = [
            P(f32), P(f32), P(i32), i32, P(i32), i32, f32, P(i32), P(i32), i64,
        ]
        lib.gx_xtc_write_frame.restype = i64
        lib.gx_xtc_write_frame.argtypes = [ctypes.c_char_p, i32, i32, f32, P(f32), P(f32), f32]
        lib.gx_trr_scan.restype = i64
        lib.gx_trr_scan.argtypes = [ctypes.c_char_p, i64, P(i64), P(i32), P(f64), P(f64), P(u8), P(i32)]
        lib.gx_trr_read.restype = i64
        lib.gx_trr_read.argtypes = [
            ctypes.c_char_p, P(i64), i64, i32, i32, P(f32), P(f32), P(f32), P(f32), P(i32), P(f64), P(f64), P(u8), i32,
        ]
        lib.gx_trr_probe.restype = i64
        lib.gx_trr_probe.argtypes = [ctypes.c_char_p, P(i32)]
        lib.gx_trr_write_frame.restype = i64
        lib.gx_trr_write_frame.argtypes = [
            ctypes.c_char_p, i32, i32, f64, f64, P(f32), P(f32), P(f32), P(f32),
        ]
        lib.gx_tng_xtc2_decode.restype = i64
        lib.gx_tng_xtc2_decode.argtypes = [P(u8), i64, i32, P(i32)]
        lib.gx_tng_xtc2_encode.restype = i64
        lib.gx_tng_xtc2_encode.argtypes = [P(i32), i32, P(u8), i64]
        _lib = lib
    return _lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if arr is not None else None


def n_default_threads() -> int:
    env = os.environ.get("GROAN_DECODE_THREADS")
    if env:
        return max(1, int(env))
    return max(1, (os.cpu_count() or 1))




def _steps_u32(steps):
    """XTC/TRR store the simulation step as 32 raw bits; GROMACS (and the
    reference via molly, molly_xtc.rs) interprets them unsigned, so steps
    beyond 2^31 (e.g. test_files/large_step.xtc) must not come back
    negative."""
    return steps.astype(np.uint32).astype(np.int64)


def _step_bits(step: int) -> int:
    """Clamp a (possibly >2^31) step into the signed-32 bit pattern the C
    layer pushes onto the wire."""
    step = int(step) & 0xFFFFFFFF
    return step - 0x100000000 if step >= 0x80000000 else step

# ---------------------------------------------------------------- XTC API

def xtc_scan(path):
    """Frame index of an XTC file -> (offsets i64[F], steps i32[F],
    times f32[F], natoms)."""
    lib = get_lib()
    try:
        fsize = os.path.getsize(path)
    except OSError:
        raise ReadTrajError(f"file '{path}' was not found", code="FileNotFound") from None
    cap = max(16, fsize // 56 + 4)
    offsets = np.empty(cap, np.int64)
    steps = np.empty(cap, np.int32)
    times = np.empty(cap, np.float32)
    natoms = ctypes.c_int32(0)
    rc = lib.gx_xtc_scan(
        str(path).encode(), cap,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(natoms),
    )
    n = _check(rc, path)
    return offsets[:n].copy(), _steps_u32(steps[:n]), times[:n].copy(), int(natoms.value)


def xtc_probe(path):
    lib = get_lib()
    natoms = ctypes.c_int32(0)
    magic = ctypes.c_int32(0)
    _check(lib.gx_xtc_probe(str(path).encode(), ctypes.byref(natoms), ctypes.byref(magic)), path)
    return int(natoms.value), int(magic.value)


def xtc_read_frames(path, offsets, natoms: int, stop_after: int | None = None,
                    n_threads: int | None = None):
    """Decode frames at `offsets` -> (coords [F, stop_after, 3], boxes [F, 9],
    steps i32[F], times f32[F], precisions f32[F])."""
    lib = get_lib()
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    nf = offsets.shape[0]
    stop = int(stop_after) if stop_after is not None else int(natoms)
    coords = np.empty((nf, stop, 3), np.float32)
    boxes = np.empty((nf, 9), np.float32)
    steps = np.empty(nf, np.int32)
    times = np.empty(nf, np.float32)
    precisions = np.empty(nf, np.float32)
    rc = lib.gx_xtc_read(
        str(path).encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nf, natoms, stop,
        _fptr(coords), _fptr(boxes),
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _fptr(times), _fptr(precisions),
        n_threads if n_threads is not None else n_default_threads(),
    )
    _check(rc, path)
    return coords, boxes, _steps_u32(steps), times, precisions


def xtc_read_frames_q16(path, offsets, natoms: int, stop_after: int | None = None,
                        n_threads: int | None = None):
    """Decode frames into RAW quantized int16 coordinates (the compact
    on-wire format for device transfer; dequantize with
    `q.astype(f32) * (1.0/precision)` for floats bit-identical to
    `xtc_read_frames`).  Raises NativeError(code='Range') when the file's
    integer bounds exceed int16 — fall back to the float path.

    -> (q [F, stop_after, 3] int16, boxes [F, 9], steps, times, precisions)
    """
    lib = get_lib()
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    nf = offsets.shape[0]
    stop = int(stop_after) if stop_after is not None else int(natoms)
    q = np.empty((nf, stop, 3), np.int16)
    boxes = np.empty((nf, 9), np.float32)
    steps = np.empty(nf, np.int32)
    times = np.empty(nf, np.float32)
    precisions = np.empty(nf, np.float32)
    rc = lib.gx_xtc_read_q16(
        str(path).encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nf, natoms, stop,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _fptr(boxes),
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _fptr(times), _fptr(precisions),
        n_threads if n_threads is not None else n_default_threads(),
    )
    _check(rc, path)
    return q, boxes, _steps_u32(steps), times, precisions


def xtc_read_frames_delta(path, offsets, natoms: int, base=None,
                          base_prec: float = 0.0, stop_after: int | None = None,
                          esc_cap: int | None = None,
                          sel=None,
                          n_threads: int | None = None):
    """Decode frames into the int8 DELTA wire format (~3 bytes/atom-frame):
    int8 inter-frame deltas plus a sparse per-frame escape list (atom
    index + absolute quantized ints) for boundary-crossers / fast movers.

    `base` is the previous chunk's last quantized frame (int32 [stop, 3],
    quantized at `base_prec`); when given and the precision matches,
    deltas chain across chunks and no key frame ships.  Returns
    (deltas int8 [F, stop, 3], shifts int32 [F, 3], esc_idx int32 [F, E],
     esc_val int32 [F, E, 3], base_out int32 [stop, 3] or None,
     last int32 [stop, 3], boxes [F, 9], steps, times, precisions) where
    E = max escapes over the chunk's frames and padding entries have
    esc_idx == stop (scatter with mode='drop' ignores them); `base_out`
    is None when `base` was used, else the key frame to ship.  `shifts`
    is a per-frame global drift term (median delta) removed from the
    int8 stream so whole-system translation does not blow the budget.

    Raises ReadTrajError(code='DeltaRange') when a frame needs more than
    `esc_cap` escapes (default stop//8: dense motion means the wire saves
    nothing) or precision varies — fall back to q16.  Exact device-side
    unpack (bit-identical to the float path):
        carry = base
        for f: carry += shifts[f] + deltas[f]; carry[esc_idx[f]] = esc_val[f]
        pos[f] = float32(carry) * (1/precision)
    """
    lib = get_lib()
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    nf = offsets.shape[0]
    stop = int(stop_after) if stop_after is not None else int(natoms)
    if sel is not None:
        sel = np.ascontiguousarray(sel, np.int32)
    nout = int(sel.shape[0]) if sel is not None else stop
    cap = int(esc_cap) if esc_cap is not None else max(64, nout // 8)
    deltas = np.empty((nf, nout, 3), np.int8)
    shifts = np.empty((nf, 3), np.int32)
    # pre-fill with `nout`: unused slots scatter out-of-bounds -> dropped
    esc_idx = np.full((nf, cap), nout, np.int32)
    esc_val = np.empty((nf, cap, 3), np.int32)
    esc_count = np.zeros(nf, np.int32)
    base_out = np.empty((nout, 3), np.int32)
    last = np.empty((nout, 3), np.int32)
    base_used = ctypes.c_int32(0)
    boxes = np.empty((nf, 9), np.float32)
    steps = np.empty(nf, np.int32)
    times = np.empty(nf, np.float32)
    precisions = np.empty(nf, np.float32)
    if base is not None:
        base = np.ascontiguousarray(base, np.int32)
        if base.shape != (nout, 3):
            raise ValueError(f"base shape {base.shape} != ({nout}, 3)")
    P32 = ctypes.POINTER(ctypes.c_int32)
    rc = lib.gx_xtc_read_delta(
        str(path).encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nf, natoms, stop,
        sel.ctypes.data_as(P32) if sel is not None else None, nout,
        base.ctypes.data_as(P32) if base is not None else None,
        float(base_prec),
        deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        shifts.ctypes.data_as(P32),
        esc_idx.ctypes.data_as(P32),
        esc_val.ctypes.data_as(P32),
        esc_count.ctypes.data_as(P32),
        cap,
        base_out.ctypes.data_as(P32),
        last.ctypes.data_as(P32),
        ctypes.byref(base_used),
        _fptr(boxes),
        steps.ctypes.data_as(P32),
        _fptr(times), _fptr(precisions),
        n_threads if n_threads is not None else n_default_threads(),
    )
    _check(rc, path)
    e = int(esc_count.max()) if nf else 0
    esc_val = esc_val[:, :e]
    # halve the key-frame / escape wire when quantized coords fit int16
    # (typical: |q| <= precision * box ~ 32767 covers 32 nm at prec 1000);
    # the device casts back to int32 before the delta scan
    key = None if base_used.value else base_out
    if key is not None and e >= 0 and abs(key).max(initial=0) <= 32767:
        key = key.astype(np.int16)
    if esc_val.size and np.abs(esc_val).max() <= 32767:
        esc_val = esc_val.astype(np.int16)
    return (deltas, shifts, esc_idx[:, :e], esc_val,
            key, last,
            boxes, _steps_u32(steps), times, precisions)


def xtc_read_frames_delta6(path, offsets, natoms: int, base=None,
                           base_prec: float = 0.0, stop_after: int | None = None,
                           esc_cap: int | None = None,
                           sel=None,
                           n_threads: int | None = None):
    """Decode frames into the 6-BIT packed delta wire (~2.25 bytes/atom-
    frame): biased inter-frame deltas u = d + 32 in [0, 63], four values
    per 3 bytes (MSB-first within the group), plus the same per-frame
    shift / escape / key-frame chaining as `xtc_read_frames_delta`.
    Escapes fire at |d| > 31 so this tier suits densely-saved
    trajectories; `ReadTrajError(code='DeltaRange')` signals the caller
    to fall back to the int8 delta tier.

    Returns (packed uint8 [F, NB], shifts, esc_idx, esc_val, base_out,
    last, boxes, steps, times, precisions) where NB = ceil(stop*3/4)*3.
    Device-side unpack (see FrameEngine's 'delta6' step):
        b0,b1,b2 = packed bytes of each group
        u = [b0>>2, ((b0&3)<<4)|(b1>>4), ((b1&15)<<2)|(b2>>6), b2&63]
        d = u - 32
    """
    lib = get_lib()
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    nf = offsets.shape[0]
    stop = int(stop_after) if stop_after is not None else int(natoms)
    if sel is not None:
        sel = np.ascontiguousarray(sel, np.int32)
    nout = int(sel.shape[0]) if sel is not None else stop
    cap = int(esc_cap) if esc_cap is not None else max(64, nout // 8)
    nout3 = nout * 3
    npad = (nout3 + 3) & ~3
    nb = (npad // 4) * 3
    packed = np.empty((nf, nb), np.uint8)
    shifts = np.empty((nf, 3), np.int32)
    esc_idx = np.full((nf, cap), nout, np.int32)
    esc_val = np.empty((nf, cap, 3), np.int32)
    esc_count = np.zeros(nf, np.int32)
    base_out = np.empty((nout, 3), np.int32)
    last = np.empty((nout, 3), np.int32)
    base_used = ctypes.c_int32(0)
    boxes = np.empty((nf, 9), np.float32)
    steps = np.empty(nf, np.int32)
    times = np.empty(nf, np.float32)
    precisions = np.empty(nf, np.float32)
    if base is not None:
        base = np.ascontiguousarray(base, np.int32)
        if base.shape != (nout, 3):
            raise ValueError(f"base shape {base.shape} != ({nout}, 3)")
    P32 = ctypes.POINTER(ctypes.c_int32)
    rc = lib.gx_xtc_read_delta6(
        str(path).encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nf, natoms, stop,
        sel.ctypes.data_as(P32) if sel is not None else None, nout,
        base.ctypes.data_as(P32) if base is not None else None,
        float(base_prec),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        shifts.ctypes.data_as(P32),
        esc_idx.ctypes.data_as(P32),
        esc_val.ctypes.data_as(P32),
        esc_count.ctypes.data_as(P32),
        cap,
        base_out.ctypes.data_as(P32),
        last.ctypes.data_as(P32),
        ctypes.byref(base_used),
        _fptr(boxes),
        steps.ctypes.data_as(P32),
        _fptr(times), _fptr(precisions),
        n_threads if n_threads is not None else n_default_threads(),
    )
    _check(rc, path)
    e = int(esc_count.max()) if nf else 0
    esc_val = esc_val[:, :e]
    key = None if base_used.value else base_out
    if key is not None and abs(key).max(initial=0) <= 32767:
        key = key.astype(np.int16)
    if esc_val.size and np.abs(esc_val).max() <= 32767:
        esc_val = esc_val.astype(np.int16)
    return (packed, shifts, esc_idx[:, :e], esc_val,
            key, last,
            boxes, _steps_u32(steps), times, precisions)


def hbond_candidates(positions, box3, acceptors, donors, max_distance,
                     cap: int | None = None):
    """Cell-pruned (donor, acceptor) candidate pair RANKS for one frame,
    in exact reference order (the C++ port of the hbonds cell walk; see
    `gx_hbond_candidates` in xdrcodec.cpp).  -> (d_rank, a_rank) int64."""
    lib = get_lib()
    pos = np.ascontiguousarray(positions, np.float32)
    box = np.ascontiguousarray(box3, np.float32).reshape(3)
    acc = np.ascontiguousarray(acceptors, np.int32)
    don = np.ascontiguousarray(donors, np.int32)
    n_guess = int(cap) if cap else max(1024, 64 * don.shape[0])
    P32 = ctypes.POINTER(ctypes.c_int32)
    while True:
        d_out = np.empty(n_guess, np.int32)
        a_out = np.empty(n_guess, np.int32)
        rc = lib.gx_hbond_candidates(
            _fptr(pos), _fptr(box),
            acc.ctypes.data_as(P32), acc.shape[0],
            don.ctypes.data_as(P32), don.shape[0],
            float(max_distance),
            d_out.ctypes.data_as(P32), a_out.ctypes.data_as(P32), n_guess,
        )
        if rc == -10:  # capacity exceeded: double and retry
            n_guess *= 2
            continue
        n = _check(rc, "<hbond candidates>")
        return (d_out[:n].astype(np.int64), a_out[:n].astype(np.int64))


def xtc_write_frame(path, natoms: int, step: int, time: float, box9, coords, precision: float):
    lib = get_lib()
    box9 = np.ascontiguousarray(box9, np.float32).reshape(9) if box9 is not None else None
    coords = np.ascontiguousarray(coords, np.float32).reshape(-1)
    rc = lib.gx_xtc_write_frame(
        str(path).encode(), natoms, _step_bits(step), float(time), _fptr(box9), _fptr(coords), float(precision)
    )
    _check(rc, path, write=True)


# ---------------------------------------------------------------- TRR API

def trr_scan(path):
    """-> (offsets, steps i32, times f64, lambdas f64, flags u8, natoms);
    flag bits: 1 = x, 2 = v, 4 = f, 8 = double precision."""
    lib = get_lib()
    try:
        fsize = os.path.getsize(path)
    except OSError:
        raise ReadTrajError(f"file '{path}' was not found", code="FileNotFound") from None
    cap = max(16, fsize // 76 + 4)
    offsets = np.empty(cap, np.int64)
    steps = np.empty(cap, np.int32)
    times = np.empty(cap, np.float64)
    lambdas = np.empty(cap, np.float64)
    flags = np.empty(cap, np.uint8)
    natoms = ctypes.c_int32(0)
    rc = lib.gx_trr_scan(
        str(path).encode(), cap,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lambdas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(natoms),
    )
    n = _check(rc, path)
    return (
        offsets[:n].copy(), _steps_u32(steps[:n]), times[:n].copy(), lambdas[:n].copy(),
        flags[:n].copy(), int(natoms.value),
    )


def trr_probe(path):
    lib = get_lib()
    natoms = ctypes.c_int32(0)
    _check(lib.gx_trr_probe(str(path).encode(), ctypes.byref(natoms)), path)
    return int(natoms.value)


def trr_read_frames(path, offsets, natoms: int, want_x=True, want_v=True, want_f=True,
                    stop_after: int | None = None, n_threads: int | None = None):
    """-> (x, v, f (each [F, stop_after, 3] or None), boxes [F, 9], steps,
    times f64, lambdas f64, flags u8).  `stop_after` reads only the first
    K atoms of each block at the byte level (TRR blocks are uncompressed)."""
    lib = get_lib()
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    nf = offsets.shape[0]
    stop = int(stop_after) if stop_after is not None else int(natoms)
    x = np.zeros((nf, stop, 3), np.float32) if want_x else None
    v = np.zeros((nf, stop, 3), np.float32) if want_v else None
    f = np.zeros((nf, stop, 3), np.float32) if want_f else None
    boxes = np.empty((nf, 9), np.float32)
    steps = np.empty(nf, np.int32)
    times = np.empty(nf, np.float64)
    lambdas = np.empty(nf, np.float64)
    flags = np.empty(nf, np.uint8)
    rc = lib.gx_trr_read(
        str(path).encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nf, natoms, stop, _fptr(x), _fptr(v), _fptr(f), _fptr(boxes),
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lambdas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads if n_threads is not None else n_default_threads(),
    )
    _check(rc, path)
    return x, v, f, boxes, _steps_u32(steps), times, lambdas, flags


def trr_write_frame(path, natoms: int, step: int, time: float, lam: float, box9,
                    x=None, v=None, f=None):
    lib = get_lib()
    box9 = np.ascontiguousarray(box9, np.float32).reshape(9) if box9 is not None else None

    def prep(a):
        return np.ascontiguousarray(a, np.float32).reshape(-1) if a is not None else None

    rc = lib.gx_trr_write_frame(
        str(path).encode(), natoms, _step_bits(step), float(time), float(lam), _fptr(box9),
        _fptr(prep(x)), _fptr(prep(v)), _fptr(prep(f)),
    )
    _check(rc, path, write=True)


def tng_xtc2_decode(stream: bytes, natoms: int) -> np.ndarray:
    """Decode one tng_compress XTC2 position stream (payload after the
    40-byte TNGP header) -> int32 [natoms, 3] quantized coordinates.
    The Python reference decoder lives in io/tng.py; this native path is
    ~100x faster (docs/tng_compress_notes.md has the format)."""
    lib = get_lib()
    buf = np.frombuffer(stream, np.uint8)
    out = np.empty((natoms, 3), np.int32)
    rc = lib.gx_tng_xtc2_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.shape[0], natoms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    _check(rc, "<tng xtc2 stream>")
    return out


def tng_xtc2_encode(q: np.ndarray) -> bytes:
    """Encode int32 quantized coordinates [natoms, 3] as one XTC2 stream
    (bit-identical to io/tng.py's `_encode_xtc2` reference encoder)."""
    lib = get_lib()
    q = np.ascontiguousarray(q, np.int32).reshape(-1, 3)
    natoms = q.shape[0]
    # worst case: every atom a large (<= 77 bits incl. instruction) plus
    # adversarial per-run smallidx travel (~23 bytes/run) and header
    cap = 16 + natoms * 48 + 4096
    out = np.empty(cap, np.uint8)
    rc = lib.gx_tng_xtc2_encode(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), natoms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if rc == -6:  # coordinate span exceeds the tng magic table — same
        # typed error (and remedy) as the Python reference encoder
        raise WriteTrajError(
            "XTC2 encode: coordinate span exceeds the tng magic table; "
            "use codec='gzip'", code="TngCompressRange")
    _check(rc, "<tng xtc2 encode>", write=True)
    return out[:rc].tobytes()
