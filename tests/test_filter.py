"""Trajectory low-pass filtering (`models.filter_traj`, gmx filter) —
surpass feature absent from the reference.

Exact cosine-kernel oracle, constant-trajectory invariance, window=1
identity, PBC unwrap correctness, and a written-file round trip.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

BOX = np.array([5.0, 5.0, 5.0], np.float32)


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        b9 = np.diag(BOX).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx,
                               float(fidx) * 2.0, b9,
                               frames[fidx].astype(np.float32), 100000.0)


def _system(positions):
    n = positions.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    return System("fl", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
                  positions=np.asarray(positions, np.float32))


def _read_back(s, path):
    out = []
    for fr in s.xtc_iter(path):
        out.append((fr.get_time(), np.asarray(fr.positions).copy()))
    return out


def _oracle(frames, window):
    """float64 cosine filter on unwrapped quantized coords."""
    q = np.round(np.asarray(frames, np.float64) * 100000.0) / 100000.0
    d = q[1:] - q[:-1]
    d -= np.round(d / np.asarray(BOX, np.float64)) * BOX
    u = np.concatenate([q[:1], q[:1] + np.cumsum(d, axis=0)])
    f = u.shape[0]
    half = window // 2
    off = np.arange(-half, half + 1)
    w = 1.0 + np.cos(np.pi * off / (half + 1))
    out = np.empty_like(u)
    for i in range(f):
        j = i + off
        ok = (j >= 0) & (j < f)
        ww = w[ok] / w[ok].sum()
        out[i] = np.tensordot(ww, u[j[ok]], axes=1)
    return out


def test_exact_cosine_oracle(tmp_path):
    rng = np.random.default_rng(67)
    frames = np.cumsum(rng.normal(0, 0.1, size=(12, 6, 3)), axis=0) + 2.5
    src = str(tmp_path / "in.xtc")
    out = str(tmp_path / "out.xtc")
    _write_xtc(src, frames % 5.0)
    s = _system(frames[0] % 5.0)
    n = models.filter_traj(s, src, out, window=5)
    assert n == 12
    got = _read_back(_system(frames[0]), out)
    expect = _oracle(frames % 5.0, 5)
    assert len(got) == 12
    for fi, (t, p) in enumerate(got):
        assert t == 2.0 * fi
        np.testing.assert_allclose(p, expect[fi], atol=5e-4)


def test_window_one_identity_and_constant(tmp_path):
    pts = np.tile(np.array([[1.0, 2.0, 3.0], [4.0, 4.0, 4.0]],
                           np.float32)[None], (6, 1, 1))
    src = str(tmp_path / "c.xtc")
    out = str(tmp_path / "co.xtc")
    _write_xtc(src, pts)
    s = _system(pts[0])
    models.filter_traj(s, src, out, window=1)
    for _, p in _read_back(_system(pts[0]), out):
        np.testing.assert_allclose(p, pts[0], atol=2e-5)
    out3 = str(tmp_path / "c3.xtc")
    models.filter_traj(s, src, out3, window=3)
    for _, p in _read_back(_system(pts[0]), out3):
        np.testing.assert_allclose(p, pts[0], atol=2e-5)


def test_pbc_jump_smoothing(tmp_path):
    # an atom drifting through the boundary: the filter must smooth the
    # UNWRAPPED path, not average 4.9 with 0.1
    xs = np.array([4.7, 4.9, 0.1, 0.3], np.float32)
    frames = np.zeros((4, 1, 3), np.float32) + 2.0
    frames[:, 0, 0] = xs
    src = str(tmp_path / "p.xtc")
    out = str(tmp_path / "po.xtc")
    _write_xtc(src, frames)
    s = _system(frames[0])
    models.filter_traj(s, src, out, window=3)
    got = _read_back(_system(frames[0]), out)
    # unwrapped path 4.7,4.9,5.1,5.3: filtered stays monotone
    x = [p[0, 0] for _, p in got]
    assert x[1] > x[0] and x[2] > x[1] and x[3] > x[2]
    assert x[1] == pytest.approx(4.9, abs=0.05)


def test_filter_errors(tmp_path):
    pts = np.ones((2, 1, 3), np.float32)
    src = str(tmp_path / "e.xtc")
    _write_xtc(src, pts)
    s = _system(pts[0])
    with pytest.raises(ParallelError):
        models.filter_traj(s, src, str(tmp_path / "x.xtc"), window=4)
    with pytest.raises(ParallelError):
        models.filter_traj(s, src, str(tmp_path / "x.xtc"), window=0)
