"""Per-atom RMSF (surpass — the reference has RMSD/fit but no RMSF).

Pins `models.rmsf` against a float64 host oracle (mass-weighted Kabsch
fit per frame + fluctuation reduction), a rigid-body zero property, and
the DeviceTrajectory layout paths.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import ParallelError, RMSDError
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([12.0, 12.0, 12.0], np.float32)


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def _frames(n_frames=16, n_atoms=40, noise=0.05, seed=11):
    """Compact structure (no box crossings) rotated + translated per
    frame, with per-atom gaussian noise of known scale."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-0.8, 0.8, size=(n_atoms, 3))
    masses = rng.uniform(1.0, 16.0, size=n_atoms)
    frames = np.empty((n_frames, n_atoms, 3), np.float64)
    for f in range(n_frames):
        r = _rot(rng.normal(size=3), rng.uniform(0, 2 * np.pi))
        t = BOX / 2 + rng.uniform(-1.5, 1.5, size=3)
        pts = base + rng.normal(size=(n_atoms, 3)) * noise
        frames[f] = pts @ r.T + t
    return frames.astype(np.float32), masses.astype(np.float32)


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        b9 = np.diag(BOX).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx], 10000.0)


def _system(n_atoms, masses, ref_positions):
    topo = Topology(n_atoms)
    topo.atomnum = np.arange(1, n_atoms + 1, dtype=np.int64)
    topo.resnum = np.arange(n_atoms, dtype=np.int64) + 1
    topo.mass = np.asarray(masses, np.float32)
    topo.has_mass = np.ones(n_atoms, bool)
    s = System("rmsf", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.asarray(ref_positions, np.float32))
    s.group_create_from_ranges("All", [(0, n_atoms - 1)])
    return s


def _oracle(frames, masses, ref, ref_com):
    """float64 mass-weighted-centroid Kabsch fit + RMSF (the reference's
    covariance is unweighted, rmsd.rs:547-604; masses weight centroids)."""
    w = np.asarray(masses, np.float64)
    pc = np.asarray(ref, np.float64)
    pc = pc - (w[:, None] * pc).sum(0) / w.sum()
    fitted = np.empty_like(np.asarray(frames, np.float64))
    for f in range(frames.shape[0]):
        q = np.asarray(frames[f], np.float64)
        qc = q - (w[:, None] * q).sum(0) / w.sum()
        h = pc.T @ qc
        u, _, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(u @ vt))
        m = u @ np.diag([1.0, 1.0, d]) @ vt      # pc @ m ~ qc
        fitted[f] = qc @ m.T + ref_com
    mean = fitted.mean(0)
    return np.sqrt(((fitted - mean) ** 2).sum(-1).mean(0))


def test_rmsf_rigid_body_is_zero(tmp_path):
    frames, masses = _frames(noise=0.0)
    path = str(tmp_path / "rigid.xtc")
    _write_xtc(path, frames)
    s = _system(frames.shape[1], masses, frames[0])
    idx, r = models.rmsf(s, path, "All")
    assert idx.shape == r.shape == (frames.shape[1],)
    # only XTC quantization (1e-4 nm) survives the fit
    assert float(r.max()) < 5e-4


def test_rmsf_matches_host_oracle(tmp_path):
    frames, masses = _frames(noise=0.05)
    path = str(tmp_path / "noisy.xtc")
    _write_xtc(path, frames)
    s = _system(frames.shape[1], masses, frames[0])
    _, r = models.rmsf(s, path, "All")

    # oracle on the quantized coordinates the file stores (prec 10000)
    q = np.round(np.asarray(frames, np.float64) * 10000.0) / 10000.0
    expect = _oracle(q, masses, s.positions, s.group_get_com("All"))
    np.testing.assert_allclose(r, expect, rtol=5e-3, atol=5e-4)
    # the fit must remove the rigid motion: rmsf ~ noise scale, far from
    # the multi-nm per-frame translations
    assert 0.02 < float(np.median(r)) < 0.2


def test_rmsf_nofit_translation_only(tmp_path):
    # pure per-frame translation: fit=False (COM shift only) removes it
    frames, masses = _frames(noise=0.0, seed=4)
    base = frames[0]
    rng = np.random.default_rng(7)
    trans = np.stack([base + rng.uniform(-1, 1, size=3) for _ in range(12)])
    path = str(tmp_path / "trans.xtc")
    _write_xtc(path, trans.astype(np.float32))
    s = _system(base.shape[0], masses, base)
    _, r = models.rmsf(s, path, "All", fit=False)
    assert float(r.max()) < 5e-4


def test_rmsf_device_trajectory_layouts(tmp_path):
    frames, masses = _frames(n_frames=10, noise=0.05, seed=2)
    path = str(tmp_path / "layout.xtc")
    _write_xtc(path, frames)
    s = _system(frames.shape[1], masses, frames[0])
    s.group_create_from_ranges("Half", [(0, frames.shape[1] // 2 - 1)])

    _, by_file = models.rmsf(s, path, "Half")
    dt_group = TrajectoryAnalysis(s).runner(group="Half").load_device(path)
    _, by_dt = models.rmsf(s, dt_group, "Half")
    np.testing.assert_allclose(by_dt, by_file, rtol=1e-5, atol=1e-6)

    dt_all = TrajectoryAnalysis(s).runner(ship="all").load_device(path)
    _, by_all = models.rmsf(s, dt_all, "Half")
    np.testing.assert_allclose(by_all, by_file, rtol=1e-5, atol=1e-6)

    s.group_create_from_ranges(
        "Other", [(frames.shape[1] - 4, frames.shape[1] - 1)])
    with pytest.raises(ParallelError):
        models.rmsf(s, dt_group, "Other")


def test_rmsf_reference_group_mismatch(tmp_path):
    frames, masses = _frames(n_frames=6, seed=8)
    path = str(tmp_path / "mismatch.xtc")
    _write_xtc(path, frames)
    s = _system(frames.shape[1], masses, frames[0])
    ref = _system(frames.shape[1], masses, frames[0])
    ref.group_create_from_ranges("All", [(0, frames.shape[1] // 2 - 1)])
    with pytest.raises(RMSDError) as e:
        models.rmsf(s, path, "All", reference=ref)
    assert e.value.code == "InconsistentGroup"


def test_rmsf_fixture_protein():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    idx, r = models.rmsf(s, xtc, "Protein")
    assert idx.shape == r.shape == (61,)
    assert np.isfinite(r).all() and (r > 0).all()
    # a stable CG protein fluctuates on the 0.05-1 nm scale
    assert 0.01 < float(np.median(r)) < 1.0
    # fitting removes rigid-body motion: fitted RMSF <= translated-only
    _, r_nofit = models.rmsf(s, xtc, "Protein", fit=False)
    assert float(r.mean()) <= float(r_nofit.mean()) + 1e-6
