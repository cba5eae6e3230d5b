"""Native TNG container reader/writer tests.

Reference: TNG reading via chemfiles (src/io/chemfiles.rs:25-41, tng tests
around chemfiles.rs test_chemfiles_read_tng*). The native parser reads
GROMACS-written files completely — container metadata (steps, times,
boxes) AND tng_compress positions (both the triplet-intra and XTC2
codings, reverse-engineered; docs/tng_compress_notes.md) — and writing
round-trips through both the gzip codec (lossless) and the
GROMACS-native XTC2 coder (quantized, codec="tng").
"""

import os

import numpy as np
import pytest

from groan_rs_tpu.errors import ReadTrajError
from groan_rs_tpu.io.tng import TngFrameWriter, TngSource, read_tng, tng_info
from groan_rs_tpu.system import System


# ----------------------------------------------------------- gmx fixtures

def test_gmx_container_metadata(test_files):
    info = tng_info(os.path.join(test_files, "short_trajectory.tng"))
    assert info["n_atoms"] == 16844
    assert info["n_frames"] == 11
    np.testing.assert_array_equal(info["steps"], np.arange(11) * 5000)
    np.testing.assert_allclose(info["times"], np.arange(11) * 100.0)
    assert info["codecs"]["POSITIONS"] == 2  # tng_compress
    assert info["codecs"]["BOX SHAPE"] == 3  # gzip
    assert info["program"].startswith("gmx")


def test_gmx_box_matches_xtc(test_files):
    """BOX SHAPE blocks are gzip-coded and must match the XTC boxes."""
    from groan_rs_tpu.io import native

    endian, _, _, sets = read_tng(os.path.join(test_files, "short_trajectory.tng"))
    offsets, steps, times, natoms = native.xtc_scan(
        os.path.join(test_files, "short_trajectory.xtc"))
    _, boxes, *_ = native.xtc_read_frames(
        os.path.join(test_files, "short_trajectory.xtc"), offsets, natoms)
    tng_boxes = np.stack([fs.data[0x10000000].decode(endian)[0].reshape(3, 3)
                          for fs in sets])
    np.testing.assert_allclose(tng_boxes, boxes.reshape(-1, 3, 3), atol=1e-6)


def test_gmx_positions_unsupported_codec():
    """Never-seen tng_compress sub-codings still raise the documented
    error (the triplet-intra and XTC2 coders decode natively now)."""
    import struct

    from groan_rs_tpu.io.tng import _decode_tng_compress

    payload = b"TNGP" + struct.pack(
        "<9i", 10, 1, 1, 0, 0, 0, 4294967, 0, 8) + b"\0" * 8
    with pytest.raises(ReadTrajError) as e:
        _decode_tng_compress(payload, "POSITIONS")
    assert e.value.code == "UnsupportedCodec"
    assert "initial_coding=1" in str(e.value)


def test_octahedron_container(test_files):
    info = tng_info(os.path.join(test_files, "octahedron_trajectory.tng"))
    assert info["n_atoms"] == 50
    assert info["n_frames"] == 11


def test_tng_compress_triplet_intra_positions(test_files):
    """Native decode of the tng_compress triplet-intra coding
    (initial_coding=3): every frame of octahedron_trajectory.tng must
    reproduce the exact quantized coordinates.  The same trajectory
    exists as XTC at precision 100 (TNG is 1000, written by gmx trjconv
    from it), so the integers must match exactly 10:1."""
    from groan_rs_tpu.io import native

    src = TngSource(os.path.join(test_files, "octahedron_trajectory.tng"))
    assert src.n_frames() == 11 and src.natoms == 50
    fb = src.read_batch(np.arange(11))
    off, _, _, n = native.xtc_scan(
        os.path.join(test_files, "octahedron_trajectory.xtc"))
    cx, *_ = native.xtc_read_frames(
        os.path.join(test_files, "octahedron_trajectory.xtc"), off, n)
    q_tng = np.round(fb.positions.astype(np.float64) * 1000).astype(np.int64)
    q_xtc = np.round(np.asarray(cx, np.float64) * 100).astype(np.int64)
    assert (q_tng == 10 * q_xtc).all()
    # float values agree to XTC's own quantization
    assert float(np.abs(fb.positions - cx).max()) < 5e-3


def test_fake_tng_rejected(test_files):
    with pytest.raises(ReadTrajError):
        tng_info(os.path.join(test_files, "fake_tng.tng"))
    with pytest.raises(ReadTrajError) as e:
        tng_info("/nonexistent/file.tng")
    assert e.value.code == "FileNotFound"


# ----------------------------------------------------------- round trips

@pytest.fixture()
def gro_system(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_xtc_to_tng_roundtrip(gro_system, test_files, tmp_path):
    out = str(tmp_path / "rt.tng")
    s = gro_system
    s.traj_writer_init(out, fmt="tng")
    ref = []
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
        ref.append((np.array(fr.positions), fr.get_step(), fr.get_time(),
                    np.array(fr.get_box().to_matrix())))
    s.traj_writers_close()

    s2 = System.from_file(os.path.join(test_files, "example.gro"))
    n = 0
    for fr in s2.tng_iter(out):
        p, st, t, b = ref[n]
        np.testing.assert_array_equal(np.array(fr.positions), p)  # lossless
        assert fr.get_step() == st
        assert fr.get_time() == pytest.approx(t, abs=1e-4)
        np.testing.assert_allclose(np.array(fr.get_box().to_matrix()), b, atol=1e-6)
        n += 1
    assert n == 11

    # batched source path is bit-exact too
    src = TngSource(out)
    fb = src.read_batch(np.arange(n))
    np.testing.assert_array_equal(fb.positions, np.stack([r[0] for r in ref]))
    np.testing.assert_array_equal(fb.steps, [r[1] for r in ref])


def test_trr_to_tng_keeps_velocities_forces(gro_system, test_files, tmp_path):
    out = str(tmp_path / "vf.tng")
    s = gro_system
    s.traj_writer_init(out, fmt="tng")
    ref = []
    for fr in s.trr_iter(os.path.join(test_files, "short_trajectory.trr")):
        fr.traj_write_frame()
        hv = bool(fr.has_velocity.all())
        hf = bool(fr.has_force.all())
        ref.append((np.array(fr.velocities) if hv else None,
                    np.array(fr.forces) if hf else None))
    s.traj_writers_close()

    src = TngSource(out)
    fb = src.read_batch(np.arange(src.n_frames()))
    for i, (v, f) in enumerate(ref):
        assert fb.has_v[i] == (v is not None)
        assert fb.has_f[i] == (f is not None)
        if v is not None:
            np.testing.assert_array_equal(fb.velocities[i], v)
        if f is not None:
            np.testing.assert_array_equal(fb.forces[i], f)


def test_group_tng_writer(gro_system, test_files, tmp_path):
    """Group writers store only the selection (reference: group writers,
    traj_write.rs)."""
    out = str(tmp_path / "prot.tng")
    s = gro_system
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    s.group_traj_writer_init("Protein", out, fmt="tng")
    idx = s.group_indices("Protein")
    ref = []
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
        ref.append(np.array(fr.positions[idx]))
    s.traj_writers_close()
    src = TngSource(out)
    assert src.natoms == len(idx)
    fb = src.read_batch(np.arange(src.n_frames()))
    np.testing.assert_array_equal(fb.positions, np.stack(ref))


def test_tng_written_frameset_linkage(gro_system, test_files, tmp_path):
    """The frame-set linked list and general-info pointers are patched at
    close (valid for strided readers), and md5s stay consistent."""
    import hashlib
    import struct

    out = str(tmp_path / "link.tng")
    s = gro_system
    s.traj_writer_init(out, fmt="tng")
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
    s.traj_writers_close()

    data = open(out, "rb").read()
    endian, blocks, info, sets = read_tng(out)
    fs_blocks = [b for b in blocks if b.block_id == 0x2]
    assert len(fs_blocks) == 11
    # every block's md5 must match its contents
    for b in blocks:
        md5 = data[b.offset + 24:b.offset + 40]
        assert hashlib.md5(data[b.contents_offset:b.end]).digest() == md5
    # next pointers chain the frame sets in order
    for i, b in enumerate(fs_blocks):
        nxt, = struct.unpack_from("<q", data, b.contents_offset + 16)
        expected = fs_blocks[i + 1].offset if i + 1 < len(fs_blocks) else -1
        assert nxt == expected
    # general info first/last frame set positions
    gi = data[blocks[0].contents_offset:blocks[0].end]
    p = 0
    for _ in range(9):
        p = gi.index(b"\0", p) + 1
    p += 17
    first, last = struct.unpack_from("<qq", gi, p)
    assert first == fs_blocks[0].offset and last == fs_blocks[-1].offset


def test_tng_traj_iter_with_range_and_step(gro_system, test_files, tmp_path):
    out = str(tmp_path / "range.tng")
    s = gro_system
    s.traj_writer_init(out, fmt="tng")
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
    s.traj_writers_close()

    s2 = System.from_file(os.path.join(test_files, "example.gro"))
    times = [fr.get_time() for fr in
             s2.tng_iter(out).with_range(200.0, 600.0).with_step(2)]
    assert times == [pytest.approx(200.0), pytest.approx(400.0), pytest.approx(600.0)]


def test_tng_compress_xtc2_positions(test_files):
    """Native decode of the tng_compress XTC2 coding (initial_coding=5 —
    GROMACS' default position coder for non-tiny systems): every frame of
    short_trajectory.tng must reproduce the exact quantized coordinates.
    The instruction grammar (DEFAULT / SMALL_RUNLENGTH / ONLY_LARGE /
    ONLY_SMALL / SMALLIDX_JUMP / FLIP / LARGE_RLE), the sendints value
    layers, and the corrected tng magic table (5160 where xdrfile's
    frozen typo says 5060) were reverse-engineered from known plaintext —
    see docs/tng_compress_notes.md.  The reference reads these files via
    chemfiles (src/io/chemfiles.rs:25-41)."""
    from groan_rs_tpu.io import native

    src = TngSource(os.path.join(test_files, "short_trajectory.tng"))
    assert src.n_frames() == 11 and src.natoms == 16844
    fb = src.read_batch(np.arange(11))
    off, _, _, n = native.xtc_scan(
        os.path.join(test_files, "short_trajectory.xtc"))
    cx, *_ = native.xtc_read_frames(
        os.path.join(test_files, "short_trajectory.xtc"), off, n)
    # TNG multiplier 1000 vs XTC precision 100: ints match exactly 10:1
    q_tng = np.round(fb.positions.astype(np.float64) * 1000).astype(np.int64)
    q_xtc = np.round(np.asarray(cx, np.float64) * 100).astype(np.int64)
    assert (q_tng == 10 * q_xtc).all()
    assert float(np.abs(fb.positions - cx).max()) < 5e-3

    # frame-parallel decode path (ThreadPoolExecutor over blocks; on this
    # 1-core host only GROAN_DECODE_THREADS exercises it) is bit-identical
    os.environ["GROAN_DECODE_THREADS"] = "3"
    try:
        fb_mt = src.read_batch(np.arange(11))
    finally:
        del os.environ["GROAN_DECODE_THREADS"]
    np.testing.assert_array_equal(fb_mt.positions, fb.positions)
    np.testing.assert_array_equal(fb_mt.boxes9, fb.boxes9)


def test_xtc2_native_equals_python_reference(test_files):
    """The C++ fast path (native.tng_xtc2_decode) and the Python
    reference decoder must agree digit-for-digit on every block."""
    import struct

    from groan_rs_tpu.io import native
    from groan_rs_tpu.io.tng import (_decode_xtc2, _parse_data_block,
                                     _scan_blocks)

    data = open(os.path.join(test_files, "short_trajectory.tng"), "rb").read()
    endian, blocks = _scan_blocks(data, "short")
    pbs = [_parse_data_block(data, b, endian)
           for b in blocks if b.name == "POSITIONS"]
    for pb in pbs[:3]:
        slen = struct.unpack_from("<i", pb.payload, 36)[0]
        qn = native.tng_xtc2_decode(pb.payload[40:40 + slen], 16844)
        qp = _decode_xtc2(pb.payload[40:40 + slen], 16844, "POSITIONS")
        assert (qn == qp).all()


# ------------------------------------------------------- XTC2 *encoder*

def test_xtc2_encoder_roundtrips_gmx_ints(test_files):
    """Re-encoding the fixture's exact quantized ints must round-trip
    digit-for-digit through BOTH decoders (Python reference and the C++
    fast path) — grammar-valid XTC2 output, write-side symmetry for the
    codec the reference can only read (src/io/chemfiles.rs:25-41)."""
    import struct

    from groan_rs_tpu.io import native
    from groan_rs_tpu.io.tng import (_decode_xtc2, _encode_xtc2,
                                     _parse_data_block, _scan_blocks)

    data = open(os.path.join(test_files, "short_trajectory.tng"), "rb").read()
    endian, blocks = _scan_blocks(data, "short")
    pb = [_parse_data_block(data, b, endian)
          for b in blocks if b.name == "POSITIONS"][0]
    slen = struct.unpack_from("<i", pb.payload, 36)[0]
    q = _decode_xtc2(pb.payload[40:40 + slen], 16844, "POSITIONS")
    enc = _encode_xtc2(q)
    assert (_decode_xtc2(enc, 16844, "re") == q).all()
    assert (native.tng_xtc2_decode(enc, 16844).astype(np.int64) == q).all()
    # BEATS GROMACS' own encoder on the same ints (frame 0)
    assert len(enc) < slen


def test_xtc2_encoder_beats_gromacs_every_frame(test_files):
    """The instruction chooser (exact bit costs + LARGE_RLE run
    extension + sticky smallidx) emits a SMALLER stream than GROMACS'
    own tng_compress on every frame of the fixture — surpass: the
    reference cannot write TNG at all."""
    import struct

    from groan_rs_tpu.io.tng import (TNG_TRAJ_POSITIONS, TngSource,
                                     _decode_xtc2, _encode_xtc2)

    src = TngSource(os.path.join(test_files, "short_trajectory.tng"))
    tot_g = tot_o = 0
    for fs in src._sets:
        payload = fs.data[TNG_TRAJ_POSITIONS].payload
        natoms = struct.unpack_from("<i", payload, 4)[0]
        slen = struct.unpack_from("<i", payload, 36)[0]
        stream = payload[40:40 + slen]
        q = _decode_xtc2(stream, natoms, "POS")
        ours = _encode_xtc2(q.astype(np.int64))
        assert np.array_equal(_decode_xtc2(ours, natoms, "re"), q)
        assert len(ours) < len(stream)
        tot_g += len(stream)
        tot_o += len(ours)
    assert tot_o < tot_g  # 913,809 vs 914,609 at last measurement


def test_xtc2_encoder_property(test_files):
    """Adversarial int patterns (random walks, huge isolated jumps, tiny
    systems, constant coords) round-trip exactly."""
    from groan_rs_tpu.io.tng import _decode_xtc2, _encode_xtc2

    rng = np.random.default_rng(7)
    cases = []
    walk = np.cumsum(rng.integers(-40, 41, size=(3000, 3)), axis=0)
    walk[::61] += rng.integers(-200000, 200000, size=(len(walk[::61]), 3))
    cases.append(walk)
    cases.append(np.zeros((100, 3), np.int64))
    cases.append(rng.integers(-8, 8, size=(5, 3)))
    cases.append(rng.integers(-(2 ** 22), 2 ** 22, size=(64, 3)))
    for n in (1, 2, 4, 6, 7, 13):
        cases.append(rng.integers(-5000, 5000, size=(n, 3)))
    for q in cases:
        q = q.astype(np.int64)
        dec = _decode_xtc2(_encode_xtc2(q), q.shape[0], "prop")
        np.testing.assert_array_equal(dec, q)


def test_tng_writer_xtc2_codec(gro_system, test_files, tmp_path):
    """TngFrameWriter(codec='tng') writes codec-2 XTC2 POSITIONS blocks
    that read back quantized to multiplier ints/nm — the same coder and
    block layout `gmx mdrun` itself writes."""
    out = str(tmp_path / "xtc2.tng")
    s = gro_system
    s.traj_writer_init(out, fmt="tng", codec="tng", multiplier=1000.0)
    ref = []
    for fr in s.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        fr.traj_write_frame()
        ref.append(np.array(fr.positions))
    s.traj_writers_close()

    info = tng_info(out)
    assert info["codecs"]["POSITIONS"] == 2  # tng_compress on disk
    src = TngSource(out)
    fb = src.read_batch(np.arange(len(ref)))
    # quantization: |err| <= half a grid step at 1000 ints/nm
    err = np.abs(fb.positions.astype(np.float64) - np.stack(ref))
    assert float(err.max()) <= 0.5 / 1000 + 1e-6
    # and a re-read is stable (decode->encode->decode is the identity
    # on the quantized grid)
    q = np.round(fb.positions.astype(np.float64) * 1000)
    q2 = np.round(np.stack(ref) * 1000)
    assert float(np.abs(q - q2).max()) <= 1.0


def test_xtc2_native_encoder_bit_identical(test_files):
    """The C++ fast-path encoder (native.tng_xtc2_encode) mirrors the
    Python reference encoder decision-for-decision: identical bytes on
    the fixture ints and on adversarial walks."""
    import struct

    from groan_rs_tpu.io import native
    from groan_rs_tpu.io.tng import (_decode_xtc2, _encode_xtc2,
                                     _parse_data_block, _scan_blocks)

    data = open(os.path.join(test_files, "short_trajectory.tng"), "rb").read()
    endian, blocks = _scan_blocks(data, "short")
    pb = [_parse_data_block(data, b, endian)
          for b in blocks if b.name == "POSITIONS"][0]
    slen = struct.unpack_from("<i", pb.payload, 36)[0]
    q = native.tng_xtc2_decode(pb.payload[40:40 + slen], 16844).astype(np.int64)
    assert native.tng_xtc2_encode(q) == _encode_xtc2(q)

    rng = np.random.default_rng(11)
    for _ in range(8):
        n = int(rng.integers(1, 1500))
        w = np.cumsum(rng.integers(-50, 51, size=(n, 3)), axis=0)
        if n > 20:
            stride = int(rng.integers(7, 60))
            w[::stride] += rng.integers(-300000, 300000,
                                        size=(w[::stride].shape[0], 3))
        q = w.astype(np.int64)
        en = native.tng_xtc2_encode(q)
        assert en == _encode_xtc2(q)
        np.testing.assert_array_equal(
            native.tng_xtc2_decode(en, n).astype(np.int64), q)

    # wide-delta walk: spans of ~2^22 per axis force >57-bit large packs
    # AND small runs at bases past 2^15.5, where the native decoder's
    # chunked bignum extracts ONE digit per pass (chunk_m=1) — the
    # slowest, least-travelled path of all three decode tiers
    w = np.cumsum(rng.integers(-60000, 60001, size=(2000, 3)), axis=0)
    q = w.astype(np.int64)
    en = native.tng_xtc2_encode(q)
    assert en == _encode_xtc2(q)
    np.testing.assert_array_equal(
        native.tng_xtc2_decode(en, 2000).astype(np.int64), q)
    np.testing.assert_array_equal(_decode_xtc2(en, 2000, "wide"), q)


# ---------------------- GROMACS-file iterator parity (chemfiles tests)

def _compare_iters(it1, it2, atol):
    """Mirror of the reference's compare_iterators (chemfiles.rs:440-470):
    same steps, times, boxes, positions frame-for-frame; both exhausted."""
    import itertools

    n = 0
    for f1, f2 in itertools.zip_longest(it1, it2):
        assert f1 is not None and f2 is not None, "iterator lengths differ"
        assert f1.get_step() == f2.get_step()
        assert f1.get_time() == pytest.approx(f2.get_time(), abs=1e-3)
        np.testing.assert_allclose(
            np.array(f1.get_box().to_matrix()),
            np.array(f2.get_box().to_matrix()), atol=1e-5)
        np.testing.assert_allclose(np.array(f1.positions),
                                   np.array(f2.positions), atol=atol)
        n += 1
    return n


def test_read_gmx_tng_pass(test_files):
    """reference read_tng_pass (chemfiles.rs:863): the REAL GROMACS
    codec-2 files (XTC2 + triplet-intra) iterate frame-for-frame equal to
    their XTC twins (tolerance = XTC's own precision-100 grid)."""
    for gro, xtc, tng, n_want in [
        ("example.gro", "short_trajectory.xtc", "short_trajectory.tng", 11),
        ("octahedron.gro", "octahedron_trajectory.xtc",
         "octahedron_trajectory.tng", 11),
    ]:
        s1 = System.from_file(os.path.join(test_files, gro))
        s2 = System.from_file(os.path.join(test_files, gro))
        n = _compare_iters(s1.xtc_iter(os.path.join(test_files, xtc)),
                           s2.tng_iter(os.path.join(test_files, tng)),
                           atol=5.01e-3)
        assert n == n_want


def test_read_gmx_tng_ranges_steps(test_files):
    """reference read_tng_ranges / read_tng_steps / read_tng_ranges_steps
    (chemfiles.rs:920-999) on the real codec-2 file."""
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    tng = os.path.join(test_files, "short_trajectory.tng")

    def fresh():
        a = System.from_file(os.path.join(test_files, "example.gro"))
        b = System.from_file(os.path.join(test_files, "example.gro"))
        return a, b

    for start, end in [(0.0, 100_000.0), (200.0, 600.0), (300.0, 500.0),
                       (500.0, 500.0), (300.0, 100_000.0)]:
        s1, s2 = fresh()
        _compare_iters(s1.xtc_iter(xtc).with_range(start, end),
                       s2.tng_iter(tng).with_range(start, end), atol=5.01e-3)
    for step in [1, 2, 3, 5, 23]:
        s1, s2 = fresh()
        _compare_iters(s1.xtc_iter(xtc).with_step(step),
                       s2.tng_iter(tng).with_step(step), atol=5.01e-3)
    for start, end, step in [(0.0, 100_000.0, 1), (300.0, 800.0, 2),
                             (100.0, 900.0, 4)]:
        s1, s2 = fresh()
        _compare_iters(
            s1.xtc_iter(xtc).with_range(start, end).with_step(step),
            s2.tng_iter(tng).with_step(step).with_range(start, end),
            atol=5.01e-3)


def test_read_gmx_tng_unmatching(test_files):
    """reference read_tng_unmatching (chemfiles.rs:887): wrong atom count
    raises AtomsNumberMismatch."""
    s = System.from_file(os.path.join(test_files, "example_novelocities.gro"))
    with pytest.raises(ReadTrajError) as e:
        for _ in s.tng_iter(os.path.join(test_files, "short_trajectory.tng")):
            pass
    assert e.value.code == "AtomsNumberMismatch"


def test_tng_writer_xtc2_range_fallback(tmp_path):
    """A frame whose quantized span exceeds the XTC2 magic table falls
    back to the gzip codec for THAT block (codecs are per data block in
    TNG), keeping the file valid and lossless."""
    w = TngFrameWriter(str(tmp_path / "fb.tng"), 4, codec="tng")
    box = np.eye(3, dtype=np.float32) * 10.0
    ok = np.array([[1, 1, 1], [1.1, 1, 1], [1, 1.2, 1], [2, 2, 2]],
                  np.float32)
    huge = ok.copy()
    huge[0, 0] = 1.0e6  # 1e9 ints at multiplier 1000: beyond the table
    w.write_frame(ok, box, 0, 0.0)
    w.write_frame(huge, box, 1, 1.0)
    w.close()

    info = tng_info(str(tmp_path / "fb.tng"))
    src = TngSource(str(tmp_path / "fb.tng"))
    fb = src.read_batch(np.arange(2))
    np.testing.assert_allclose(fb.positions[0], ok, atol=5.01e-4)
    np.testing.assert_array_equal(fb.positions[1], huge)  # gzip: lossless
    endian, _, _, sets = read_tng(str(tmp_path / "fb.tng"))
    codecs = [fs.data[0x10000001].codec for fs in sets]
    assert codecs == [2, 3]


def test_xtc2_wide_zero_pack_min_corner():
    """An atom sitting at the per-axis minimum packs its wide (>57-bit)
    large triple to 0, so the encoder's wide emission path zero-pads
    with a single put() of n > 56 bits (up to ~67 here).  Regression
    for the u64 BitWriter losing pending bits / undefined shifts on
    those pads: native bytes must equal the Python reference encoder's
    and both decoders must round-trip exactly."""
    from groan_rs_tpu.io import native
    from groan_rs_tpu.io.tng import _decode_xtc2, _encode_xtc2

    from groan_rs_tpu.errors import WriteTrajError

    rng = np.random.default_rng(3)
    for span_bits in (22, 24):  # large-pack widths ~69/73 bits
        span = 2 ** span_bits
        q = rng.integers(0, span, size=(48, 3)).astype(np.int64)
        q[0] = 0           # min corner on all three axes -> zero pack
        q[1] = span - 1    # pins the range
        en = native.tng_xtc2_encode(q)
        assert en == _encode_xtc2(q)
        np.testing.assert_array_equal(
            native.tng_xtc2_decode(en, 48).astype(np.int64), q)
        np.testing.assert_array_equal(_decode_xtc2(en, 48, "corner"), q)

    # beyond the tng magic table (span > 2^24) neither coder can
    # represent the frame: both raise the same typed error
    q = np.zeros((4, 3), np.int64)
    q[1] = 2 ** 27
    for enc in (native.tng_xtc2_encode, _encode_xtc2):
        with pytest.raises(WriteTrajError) as ei:
            enc(q)
        assert ei.value.code == "TngCompressRange"


def test_xtc2_python_fallback_corrupt_streams():
    """The Python fallback decoder must fail corrupt streams the way the
    C++ path does (typed ParseTng), never IndexError or silent garbage:
    out-of-table large size bytes, and a small run arriving before any
    large value exists to delta against."""
    import struct

    from groan_rs_tpu.errors import ReadTrajError
    from groan_rs_tpu.io.tng import _decode_xtc2

    # size byte 200 -> magic index 204, past the 73-entry table
    bad_size = struct.pack("<3i", 0, 0, 0) + bytes([200, 10, 10, 10])
    with pytest.raises(ReadTrajError) as ei:
        _decode_xtc2(bad_size + b"\x00" * 32, 4, "POSITIONS")
    assert ei.value.code == "ParseTng"

    # valid header, but the first instruction is ONLY_SMALL ('0101'):
    # smalls are deltas vs the previous atom and none was emitted yet
    hdr = struct.pack("<3i", 0, 0, 0) + bytes([10, 10, 10, 10])
    with pytest.raises(ReadTrajError) as ei:
        _decode_xtc2(hdr + bytes([0b0101_0000]) + b"\x00" * 16, 4,
                     "POSITIONS")
    assert ei.value.code == "ParseTng"


def test_tng_writer_compressed_velocities_forces(tmp_path):
    """codec='tng' codes VELOCITY/FORCE blocks with the tng_compress
    XTC2 coder too (VERDICT r4 #7): the decode path is block-id-agnostic,
    so compressed velocity blocks — a file class GROMACS can emit — read
    back through the same native XTC2 path, bit-exact on the quantized
    grid (signed values included)."""
    rng = np.random.default_rng(3)
    n = 64
    mult = 1000.0
    out = str(tmp_path / "vf.tng")
    w = TngFrameWriter(out, n, codec="tng", multiplier=mult)
    box = np.eye(3, dtype=np.float32) * 8.0
    pos, vel, frc = [], [], []
    for f in range(3):
        p = rng.uniform(0.0, 8.0, size=(n, 3)).astype(np.float32)
        v = rng.normal(size=(n, 3)).astype(np.float32) * 2.0   # signed
        g = rng.normal(size=(n, 3)).astype(np.float32) * 50.0  # signed
        w.write_frame(p, box, f, float(f), velocities=v, forces=g)
        pos.append(p)
        vel.append(v)
        frc.append(g)
    w.close()

    info = tng_info(out)
    assert info["codecs"]["POSITIONS"] == 2
    assert info["codecs"]["VELOCITIES"] == 2   # tng_compress on disk
    assert info["codecs"]["FORCES"] == 2

    src = TngSource(out)
    fb = src.read_batch(np.arange(3))
    assert fb.velocities is not None and fb.forces is not None
    prec_lo = int(round(2.0 ** 32 / mult))
    prec = prec_lo * 2.0 ** -32
    for got, want in ((fb.velocities, vel), (fb.forces, frc)):
        want = np.stack(want).astype(np.float64)
        # bit-exact on the quantized grid: decode(encode(x)) ==
        # round(x/prec)*prec exactly, signed values included
        expect = (np.round(want / prec) * prec).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(got), expect)


def test_tng_vel_force_range_fallback_stays_lossless(tmp_path):
    """A velocity block whose span exceeds the XTC2 magic table falls
    back to gzip for THAT block only — valid file, lossless values."""
    w = TngFrameWriter(str(tmp_path / "vf2.tng"), 4, codec="tng")
    box = np.eye(3, dtype=np.float32) * 10.0
    p = np.array([[1, 1, 1], [1.1, 1, 1], [1, 1.2, 1], [2, 2, 2]],
                 np.float32)
    v = p * 0.1
    v_huge = v.copy()
    v_huge[0, 0] = 1.0e6
    w.write_frame(p, box, 0, 0.0, velocities=v)
    w.write_frame(p, box, 1, 1.0, velocities=v_huge)
    w.close()
    endian, _, _, sets = read_tng(str(tmp_path / "vf2.tng"))
    codecs = [fs.data[0x10000002].codec for fs in sets]
    assert codecs == [2, 3]
    src = TngSource(str(tmp_path / "vf2.tng"))
    fb = src.read_batch(np.arange(2))
    np.testing.assert_array_equal(fb.velocities[1], v_huge)  # lossless
