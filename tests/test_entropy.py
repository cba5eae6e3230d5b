"""Configurational entropy (surpass — `gmx anaeig -entropy`; absent
from the reference).

Pins `models.entropy` (Schlitter + quasi-harmonic over the mass-weighted
PCA eigenvalues) against a float64 closed-form oracle on the sample
covariance, the classical-limit identity between the two estimates, and
physical monotonicity properties.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.errors import ParallelError

from test_rmsf import _system, _write_xtc

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"

KB_J = 1.380649e-23
HBAR = 1.0545718176e-34
AMU_NM2 = 1.66053906660e-27 * 1e-18
KB_KJ = 8.31446261815324e-3


def _oracle(lam_amu_nm2, t):
    """Closed-form Schlitter / quasi-harmonic from eigenvalues."""
    lam = np.clip(np.asarray(lam_amu_nm2, np.float64), 0.0, None) * AMU_NM2
    kbt = KB_J * t
    s_sch = 0.5 * KB_KJ * np.log1p(kbt * lam * np.e ** 2 / HBAR ** 2).sum()
    a = HBAR / np.sqrt(kbt * lam[lam > 0])
    with np.errstate(over="ignore"):
        s_qh = KB_KJ * (a / np.expm1(a) - np.log1p(-np.exp(-a))).sum()
    return s_sch, s_qh


def _gaussian_traj(tmp_path, k=20, f=200, seed=7):
    """Frames drawn from a known diagonal-covariance Gaussian around a
    fixed structure (no rotation: fit=False path is exact)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(4.0, 6.0, size=(k, 3))
    sig = rng.uniform(0.02, 0.3, size=(k, 3))
    frames = (base[None] + rng.normal(size=(f, k, 3)) * sig[None]
              ).astype(np.float32)
    path = str(tmp_path / "gauss.xtc")
    _write_xtc(path, frames)
    masses = rng.uniform(1.0, 16.0, k).astype(np.float32)
    return path, frames, masses, base


def test_entropy_matches_f64_sample_covariance(tmp_path):
    path, frames, masses, base = _gaussian_traj(tmp_path)
    s = _system(frames.shape[1], masses, base)
    t = 300.0
    out = models.entropy(s, path, "All", temperature=t, fit=False)

    # float64 oracle: gmx covar semantics (per-frame COM removed, sqrt-
    # mass-weighted deviations), eigenvalues of the sample covariance
    q = np.round(np.asarray(frames, np.float64) * 1e4) / 1e4
    w = np.asarray(masses, np.float64)
    com = (w[None, :, None] * q).sum(1) / w.sum()
    dev = (q - com[:, None, :]) * np.sqrt(w)[None, :, None]
    x = dev.reshape(len(q), -1)
    x = x - x.mean(0)
    cov = x.T @ x / len(q)
    lam = np.linalg.eigvalsh(cov)
    want_sch, want_qh = _oracle(lam, t)

    assert out["schlitter"] == pytest.approx(want_sch, rel=2e-3)
    assert out["quasiharmonic"] == pytest.approx(want_qh, rel=2e-3)
    # Schlitter is an upper bound on the quasi-harmonic estimate
    assert out["schlitter"] >= out["quasiharmonic"]


def test_entropy_classical_limit_and_monotonicity(tmp_path):
    # large eigenvalues (soft modes): the two estimates agree mode-for-
    # mode at kB (1 - ln alpha); higher T or bigger fluctuations -> more S
    path, frames, masses, base = _gaussian_traj(tmp_path, seed=3)
    s = _system(frames.shape[1], masses, base)

    s300 = models.entropy(s, path, "All", temperature=300.0, fit=False)
    s600 = models.entropy(s, path, "All", temperature=600.0, fit=False)
    assert s600["schlitter"] > s300["schlitter"]
    assert s600["quasiharmonic"] > s300["quasiharmonic"]

    # classical limit on the softest mode: alpha << 1 here
    lam0 = float(s300["eigenvalues"][0])
    a0 = float(s300["alphas"][0])
    assert a0 < 0.05  # soft mode: deep in the classical regime
    per_mode_sch = 0.5 * KB_KJ * np.log1p(
        KB_J * 300.0 * lam0 * AMU_NM2 * np.e ** 2 / HBAR ** 2)
    per_mode_qh = KB_KJ * (a0 / np.expm1(a0) - np.log1p(-np.exp(-a0)))
    assert per_mode_sch == pytest.approx(KB_KJ * (1 - np.log(a0)), rel=1e-3)
    assert per_mode_qh == pytest.approx(KB_KJ * (1 - np.log(a0)), rel=1e-2)

    with pytest.raises(ParallelError):
        models.entropy(s, path, "All", temperature=0.0)


def test_entropy_fixture_protein():
    """Fitted protein entropy on the membrane-peptide fixture: rigid-body
    modes contribute ~0 and the estimates are finite and ordered."""
    from groan_rs_tpu.system import System

    sysm = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    sysm.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.entropy(sysm, xtc, "Protein", temperature=310.0)
    assert np.isfinite(out["schlitter"]) and np.isfinite(out["quasiharmonic"])
    assert out["schlitter"] >= out["quasiharmonic"] > 0
    # the fit leaves ~6 near-zero rigid-body eigenvalues
    lam = out["eigenvalues"]
    assert (lam[-6:] < 1e-6 * lam[0]).all()
