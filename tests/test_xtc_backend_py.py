"""Cross-backend XTC validation: the pure-Python reader vs the C++ codec.

The reference ships two independent XTC read paths — the default molly
reader and the vendored xdrfile library (`src/io/xtc_io/xdrfile_xtc.rs`,
feature-gated) — precisely so each can validate the other.  These tests
are our equivalent: `io/xtc_py.py` is a from-scratch pure-Python
implementation of the container + 3dfcoord compression, and must agree
bit-for-bit with `io/native` on the whole fixture corpus, at both the
codec contract level and through the full `System.xtc_iter` product path
(selected via GROAN_XTC_BACKEND=py, which also forces the plain f32
wire since the compact-wire entry points are native-only).
"""

import glob
import os

import numpy as np
import pytest

from groan_rs_tpu.errors import ReadTrajError
from groan_rs_tpu.io import native, xtc_py
from groan_rs_tpu.system import System

ALL_XTC = sorted(
    os.path.basename(p)
    for p in glob.glob("/root/reference/test_files/*.xtc")
    if "fake" not in p
)


@pytest.mark.parametrize("name", ALL_XTC)
def test_scan_and_decode_bit_identical(test_files, name):
    path = os.path.join(test_files, name)
    offs_n, steps_n, times_n, na_n = native.xtc_scan(path)
    offs_p, steps_p, times_p, na_p = xtc_py.xtc_scan(path)
    assert na_n == na_p
    assert np.array_equal(offs_n, offs_p)
    assert np.array_equal(steps_n, steps_p)
    assert np.array_equal(times_n, times_p)

    out_n = native.xtc_read_frames(path, offs_n, na_n)
    out_p = xtc_py.xtc_read_frames(path, offs_p, na_p)
    for a, b in zip(out_n, out_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name", ["short_trajectory.xtc",
                                  "aa_membrane_peptide.xtc"])
def test_partial_decode_bit_identical(test_files, name):
    path = os.path.join(test_files, name)
    offs, _, _, na = native.xtc_scan(path)
    for stop in (1, 7, na // 3, na):
        cn = native.xtc_read_frames(path, offs, na, stop_after=stop)[0]
        cp = xtc_py.xtc_read_frames(path, offs, na, stop_after=stop)[0]
        assert np.array_equal(np.asarray(cn), np.asarray(cp))


def test_fake_xtc_same_error(test_files):
    path = os.path.join(test_files, "fake_xtc.xtc")
    with pytest.raises(ReadTrajError):
        native.xtc_scan(path)
    with pytest.raises(ReadTrajError):
        xtc_py.xtc_scan(path)


def test_truncated_frame_rejected(test_files, tmp_path):
    src = os.path.join(test_files, "short_trajectory.xtc")
    with open(src, "rb") as fh:
        buf = fh.read()
    trunc = tmp_path / "trunc.xtc"
    trunc.write_bytes(buf[: len(buf) // 2])
    with pytest.raises(ReadTrajError):
        xtc_py.xtc_scan(str(trunc))


def test_product_path_parity(test_files, monkeypatch, tmp_path):
    """System.xtc_iter under GROAN_XTC_BACKEND=py matches the native run."""
    gro = os.path.join(test_files, "example.gro")
    xtc = os.path.join(test_files, "short_trajectory.xtc")

    def com_series(tmpdir):
        monkeypatch.setenv("GROAN_INDEX_CACHE_DIR", str(tmpdir))
        system = System.from_file(gro)
        system.group_create("Prot", "@protein")
        out = []
        for _ in system.xtc_iter(xtc):
            out.append(np.asarray(
                system.group_get_center("Prot"), np.float32))
        return np.stack(out)

    monkeypatch.delenv("GROAN_XTC_BACKEND", raising=False)
    ref = com_series(tmp_path / "native")
    monkeypatch.setenv("GROAN_XTC_BACKEND", "py")
    got = com_series(tmp_path / "py")
    assert np.array_equal(ref, got)


def test_truncated_payload_never_silent(test_files):
    """A truncated coordinate payload must either raise CorruptFrame or
    return the exact true prefix — NEVER silently emit values decoded
    from past-the-end zeros.  Regression: the partial-read early returns
    used to skip the overrun check."""
    path = os.path.join(test_files, "short_trajectory.xtc")
    buf = open(path, "rb").read()
    (natoms, _, _, _, precision, minint, maxint, smallidx,
     nbytes, doff, _) = xtc_py._parse_header(buf, 0, len(buf), path)
    payload = buf[doff:doff + nbytes]
    # every byte cut x several stop points: the vulnerable cuts are the
    # handful where the overrun lands in the same iteration that crosses
    # stop_after (e.g. stop_after=10, cut=35 on this fixture)
    for stop in (10, 25, 50):
        want = xtc_py._decode_3dfcoord(payload, natoms, precision, minint,
                                       maxint, smallidx, stop, path)
        for cut in range(0, 400):
            try:
                got = xtc_py._decode_3dfcoord(
                    payload[:cut], natoms, precision, minint, maxint,
                    smallidx, stop, path)
            except ReadTrajError as e:
                assert e.code == "CorruptFrame"
                continue
            np.testing.assert_array_equal(got, want)


def test_wide_box_bitsize_boundaries_bit_identical(tmp_path):
    """Joint packs near the 57-bit single-read limit and the per-axis
    split path (sizeint > 2^24) decode identically on both backends.

    The native decoder fuses the [joint triple][flag] read into one
    <=57-bit get when bitsize+1 fits (xdrcodec.cpp decode_3dfcoord_t);
    spans here are chosen so bitsize lands at ~54..58 and, in the last
    case, exceeds the 24-bit per-axis limit so the decoder takes the
    split bitsizeint reads (xdrfile.c large-box semantics).
    """
    rng = np.random.default_rng(7)
    natoms = 600
    # span (nm) at precision 10 -> sizeint ~ span*10; 3*log2 sizes = bitsize
    cases = [
        ("bitsize~54", (26_000.0, 26_000.0, 26_000.0), 10.0),
        ("bitsize~56", (41_000.0, 41_000.0, 41_000.0), 10.0),
        ("bitsize~57", (52_000.0, 52_000.0, 52_000.0), 10.0),
        ("bitsize~58", (66_000.0, 66_000.0, 66_000.0), 10.0),
        ("per-axis split", (1_700_000.0, 1_700_000.0, 1_700_000.0), 10.0),
    ]
    for label, span, prec in cases:
        coords = np.empty((natoms, 3), np.float32)
        for a in range(3):
            coords[:, a] = rng.uniform(0.0, span[a], natoms).astype(np.float32)
        # pin the extremes so minint/maxint (and so bitsize) are deterministic
        coords[0] = (0.0, 0.0, 0.0)
        coords[1] = span
        box9 = np.zeros(9, np.float32)
        box9[[0, 4, 8]] = span
        path = str(tmp_path / f"wide_{label.replace(' ', '_').replace('~', '')}.xtc")
        native.xtc_write_frame(path, natoms, 0, 0.0, box9,
                               np.ascontiguousarray(coords.reshape(-1)), prec)
        offs_n, _, _, na = native.xtc_scan(path)
        out_n = np.asarray(native.xtc_read_frames(path, offs_n, na)[0])
        out_p = np.asarray(xtc_py.xtc_read_frames(path, offs_n, na)[0])
        assert np.array_equal(out_n, out_p), label
        # the quantization grid is coarse vs the spans; decoded floats must
        # sit within half a grid step of the inputs (catches off-by-one-int
        # decode bugs the cross-backend check could share only if both
        # backends made the identical mistake)
        # ints in the split case exceed 2^24, so float32 holds them only to
        # ~1 unit; allow one grid step plus rounding
        step = 1.0 / prec
        np.testing.assert_allclose(out_n.reshape(-1, 3), coords,
                                   atol=1.1 * step, err_msg=label)
