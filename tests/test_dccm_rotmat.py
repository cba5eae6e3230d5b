"""DCCM + rotmat (surpass — `gmx rotmat` and the Ichiye-Karplus
dynamic cross-correlation matrix; the reference applies fits
(rmsd.rs:508-533) but exposes neither the matrix nor correlations).

Pins `models.rotmat` against exact known rotations and `models.dccm`
against an exact correlated/anti-correlated construction and a float64
host oracle (same mass-weighted Kabsch convention as the rmsf oracle).
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


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        b9 = np.diag(BOX).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32), 100000.0)


def _system(n_atoms, masses, ref_positions):
    topo = Topology(n_atoms)
    topo.atomnum = np.arange(1, n_atoms + 1, dtype=np.int64)
    topo.resnum = np.arange(n_atoms, dtype=np.int64) + 1
    topo.mass = np.asarray(masses, np.float32)
    topo.has_mass = np.ones(n_atoms, bool)
    s = System("dccm", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.asarray(ref_positions, np.float32))
    s.group_create_from_ranges("All", [(0, n_atoms - 1)])
    return s


# ---------------------------------------------------------------- rotmat


def test_rotmat_recovers_known_rotations(tmp_path):
    rng = np.random.default_rng(3)
    n = 32
    base = rng.uniform(-0.8, 0.8, size=(n, 3))
    base -= base.mean(0)
    masses = rng.uniform(1.0, 16.0, size=n).astype(np.float32)
    rots, frames = [], []
    for f in range(10):
        r = _rot(rng.normal(size=3), rng.uniform(0, 2 * np.pi))
        t = BOX / 2 + rng.uniform(-1.0, 1.0, size=3)
        # column form: x_f = r @ x_base  ->  the fit must invert r
        frames.append(base @ r.T + t)
        rots.append(r)
    frames = np.stack(frames)
    path = str(tmp_path / "rot.xtc")
    _write_xtc(path, frames)
    s = _system(n, masses, base + BOX / 2)

    out = models.rotmat(s, path, "All")
    m = out["matrices"]
    assert m.shape == (10, 3, 3)
    for f in range(10):
        # recovered R undoes the applied rotation: R @ r_f == I
        np.testing.assert_allclose(m[f] @ rots[f], np.eye(3), atol=2e-4)
        # proper rotation
        np.testing.assert_allclose(m[f] @ m[f].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(m[f]) - 1.0) < 1e-5
    # rigid motion only: fitted RMSD is XTC quantization noise
    assert float(out["rmsd"].max()) < 5e-4


def test_rotmat_rmsd_matches_pipeline(tmp_path):
    rng = np.random.default_rng(9)
    n = 24
    base = rng.uniform(-0.8, 0.8, size=(n, 3)) + BOX / 2
    masses = rng.uniform(1.0, 16.0, size=n).astype(np.float32)
    frames = np.stack([base + rng.normal(size=(n, 3)) * 0.05
                       for _ in range(8)])
    path = str(tmp_path / "noisy.xtc")
    _write_xtc(path, frames)
    s = _system(n, masses, base)

    out = models.rotmat(s, path, "All")
    pipe = TrajectoryAnalysis(s)
    pipe.add_rmsd("All", s, name="r")
    res = pipe.run(path)
    np.testing.assert_allclose(out["rmsd"], res["r"], rtol=1e-5, atol=1e-6)


def test_rotmat_reference_group_mismatch(tmp_path):
    rng = np.random.default_rng(1)
    n = 12
    base = rng.uniform(-0.5, 0.5, size=(n, 3)) + BOX / 2
    masses = np.ones(n, np.float32)
    path = str(tmp_path / "mm.xtc")
    _write_xtc(path, np.stack([base] * 4))
    s = _system(n, masses, base)
    ref = _system(n, masses, base)
    ref.group_create_from_ranges("All", [(0, n // 2 - 1)])
    with pytest.raises(RMSDError) as e:
        models.rotmat(s, path, "All", reference=ref)
    assert e.value.code == "InconsistentGroup"


# ---------------------------------------------------------------- dccm


def test_dccm_exact_correlated_pairs(tmp_path):
    """Displacements s_f * u_i with u = (+x, -x, +y, -y): the DCCM is
    exactly the sign pattern of u_i . u_j (COM is preserved, so the
    fit=False translation is a no-op)."""
    base = np.array([[5.0, 5.0, 6.0], [7.0, 5.0, 6.0],
                     [5.0, 7.0, 6.0], [7.0, 7.0, 6.0]])
    u = np.array([[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0], [0, -1.0, 0]])
    s_f = np.array([-0.3, -0.1, 0.0, 0.2, 0.4])
    frames = base[None] + s_f[:, None, None] * u[None]
    path = str(tmp_path / "pairs.xtc")
    _write_xtc(path, frames)
    s = _system(4, np.ones(4, np.float32), base)

    out = models.dccm(s, path, "All", fit=False)
    expect = np.array([[1, -1, 0, 0], [-1, 1, 0, 0],
                       [0, 0, 1, -1], [0, 0, -1, 1]], np.float64)
    np.testing.assert_allclose(out["dccm"], expect, atol=2e-3)
    # covariance carries the actual variance of s
    var = s_f.var()
    np.testing.assert_allclose(np.diag(out["covariance"]),
                               np.full(4, var), rtol=5e-3, atol=1e-5)


def _fit_oracle(frames, masses, ref, ref_com):
    """float64 mass-weighted-centroid Kabsch fit (rmsf-oracle twin)."""
    w = np.asarray(masses, np.float64)
    pc = np.asarray(ref, np.float64)
    pc = pc - (w[:, None] * pc).sum(0) / w.sum()
    fitted = np.empty_like(np.asarray(frames, np.float64))
    for f in range(frames.shape[0]):
        q = np.asarray(frames[f], np.float64)
        qc = q - (w[:, None] * q).sum(0) / w.sum()
        h = pc.T @ qc
        uu, _, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(uu @ vt))
        m = uu @ np.diag([1.0, 1.0, d]) @ vt
        fitted[f] = qc @ m.T + ref_com
    return fitted


def _dccm_oracle(fitted):
    d = fitted - fitted.mean(0)
    c = np.einsum("fid,fjd->ij", d, d) / fitted.shape[0]
    var = np.diag(c)
    return c / np.sqrt(var[:, None] * var[None, :]), c


def test_dccm_matches_host_oracle_fitted(tmp_path):
    rng = np.random.default_rng(17)
    n, nf = 20, 16
    base = rng.uniform(-0.8, 0.8, size=(n, 3))
    masses = rng.uniform(1.0, 16.0, size=n).astype(np.float32)
    frames = np.empty((nf, n, 3))
    for f in range(nf):
        r = _rot(rng.normal(size=3), rng.uniform(0, 2 * np.pi))
        pts = base + rng.normal(size=(n, 3)) * 0.08
        frames[f] = pts @ r.T + BOX / 2 + rng.uniform(-1, 1, size=3)
    path = str(tmp_path / "orc.xtc")
    _write_xtc(path, frames)
    s = _system(n, masses, base + BOX / 2)

    out = models.dccm(s, path, "All")
    q = np.round(frames * 100000.0) / 100000.0     # XTC quantization
    fitted = _fit_oracle(q, masses, s.positions, s.group_get_com("All"))
    expect_m, expect_c = _dccm_oracle(fitted)
    np.testing.assert_allclose(out["dccm"], expect_m, atol=5e-3)
    np.testing.assert_allclose(out["covariance"], expect_c,
                               rtol=5e-3, atol=1e-6)
    # structural invariants
    np.testing.assert_allclose(np.diag(out["dccm"]), 1.0, atol=0)
    np.testing.assert_allclose(out["dccm"], out["dccm"].T, atol=1e-6)
    assert np.abs(out["dccm"]).max() <= 1.0 + 1e-5


def test_dccm_consistent_with_pca_covariance(tmp_path):
    """Internal consistency: summing the per-dimension diagonal blocks of
    the full 3Kx3K PCA covariance (unweighted, same fit) reproduces the
    DCCM covariance."""
    rng = np.random.default_rng(23)
    n, nf = 10, 12
    base = rng.uniform(-0.6, 0.6, size=(n, 3)) + BOX / 2
    masses = rng.uniform(1.0, 16.0, size=n).astype(np.float32)
    frames = np.stack([base + rng.normal(size=(n, 3)) * 0.06
                       for _ in range(nf)])
    path = str(tmp_path / "pca.xtc")
    _write_xtc(path, frames)
    s = _system(n, masses, base)

    out = models.dccm(s, path, "All")
    p = models.pca(s, path, "All", mass_weighted=False)
    lam, vecs = p["eigenvalues"], p["eigenvectors"]   # [3K], [3K, K, 3]
    cov_full = np.einsum("n,nid,nje->idje", lam, vecs, vecs)
    c = np.einsum("idjd->ij", cov_full)
    np.testing.assert_allclose(out["covariance"], c, rtol=1e-3, atol=1e-7)


def test_dccm_device_trajectory_layouts(tmp_path):
    rng = np.random.default_rng(5)
    n, nf = 16, 8
    base = rng.uniform(-0.6, 0.6, size=(n, 3)) + BOX / 2
    masses = rng.uniform(1.0, 16.0, size=n).astype(np.float32)
    frames = np.stack([base + rng.normal(size=(n, 3)) * 0.05
                       for _ in range(nf)])
    path = str(tmp_path / "lay.xtc")
    _write_xtc(path, frames)
    s = _system(n, masses, base)
    s.group_create_from_ranges("Half", [(0, n // 2 - 1)])

    by_file = models.dccm(s, path, "Half")["dccm"]
    dt_all = TrajectoryAnalysis(s).runner(ship="all").load_device(path)
    by_all = models.dccm(s, dt_all, "Half")["dccm"]
    np.testing.assert_allclose(by_all, by_file, rtol=1e-5, atol=1e-6)


def test_dccm_needs_two_frames(tmp_path):
    base = np.array([[5.0, 5, 5], [6.0, 6, 6]])
    path = str(tmp_path / "one.xtc")
    _write_xtc(path, base[None])
    s = _system(2, np.ones(2, np.float32), base)
    with pytest.raises(ParallelError):
        models.dccm(s, path, "All")


def test_dccm_rotmat_fixture_protein():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")

    out = models.dccm(s, xtc, "Protein")
    k = out["indices"].shape[0]
    assert out["dccm"].shape == (k, k)
    np.testing.assert_allclose(np.diag(out["dccm"]), 1.0, atol=0)
    assert np.abs(out["dccm"]).max() <= 1.0 + 1e-5
    # neighbours along the chain correlate more than distant pairs
    near = np.mean([out["dccm"][i, i + 1] for i in range(k - 1)])
    far = np.mean([out["dccm"][i, j]
                   for i in range(k) for j in range(k) if abs(i - j) > 20])
    assert near > far

    rm = models.rotmat(s, xtc, "Protein")
    assert rm["matrices"].shape[1:] == (3, 3)
    ident = np.einsum("fij,fkj->fik", rm["matrices"], rm["matrices"])
    np.testing.assert_allclose(ident, np.broadcast_to(
        np.eye(3), ident.shape), atol=1e-4)
    assert np.allclose(np.linalg.det(rm["matrices"]), 1.0, atol=1e-4)
