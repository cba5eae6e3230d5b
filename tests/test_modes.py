"""PCA mode analyses (surpass — the `gmx anaeig -over` / `gmx analyze
-cc` / `gmx nmtraj` workloads; absent from the reference, which has no
PCA at all).

Pins `models.subspace_overlap` against exact orthonormal-basis
constructions and the Hess covariance-overlap closed form,
`models.cosine_content` against the exact discrete-cosine identity, and
`models.mode_traj` against its defining formula, a projection
round-trip through a real `models.pca`, and a written-file round trip.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.errors import ParallelError

from test_rmsf import _system, _write_xtc

pytestmark = pytest.mark.device_parity


def _fake_pca(evecs, evals, k, mean=None, sw=None):
    """A pca-result dict from explicit [n, 3K] eigenvector rows."""
    n = evecs.shape[0]
    return {
        "mean": np.zeros((k, 3)) if mean is None else mean,
        "eigenvalues": np.asarray(evals, np.float64),
        "eigenvectors": np.asarray(evecs, np.float64).reshape(n, k, 3),
        "mass_weighted": True,
        "sqrt_weights": np.ones(k) if sw is None else sw,
    }


def _basis(k):
    return np.eye(3 * k)


# ------------------------------------------------------- subspace overlap

def test_overlap_identical_subspace_is_one():
    k = 4
    e = _basis(k)
    a = _fake_pca(e[:3], [3.0, 2.0, 1.0], k)
    out = models.subspace_overlap(a, a)
    assert out["n"] == 3
    assert out["subspace_overlap"] == pytest.approx(1.0, abs=1e-12)
    assert out["rmsip"] == pytest.approx(1.0, abs=1e-12)
    assert out["covariance_overlap"] == pytest.approx(1.0, abs=1e-12)
    np.testing.assert_allclose(out["inner"], np.eye(3), atol=1e-12)


def test_overlap_permuted_modes_span_same_subspace():
    # same span, swapped order: subspace overlap stays 1; the covariance
    # overlap pays for the eigenvalue mismatch along each direction.
    k = 3
    e = _basis(k)
    a = _fake_pca(e[:2], [2.0, 1.0], k)
    b = _fake_pca(e[[1, 0]], [2.0, 1.0], k)
    out = models.subspace_overlap(a, b)
    assert out["subspace_overlap"] == pytest.approx(1.0, abs=1e-12)
    np.testing.assert_allclose(out["inner"],
                               [[0.0, 1.0], [1.0, 0.0]], atol=1e-12)
    # Hess closed form: denom = 6, cross = sqrt(2*1) + sqrt(1*2)
    expect = 1.0 - np.sqrt((6.0 - 2.0 * 2.0 * np.sqrt(2.0)) / 6.0)
    assert out["covariance_overlap"] == pytest.approx(expect, abs=1e-12)


def test_overlap_disjoint_subspaces_is_zero():
    k = 4
    e = _basis(k)
    a = _fake_pca(e[:2], [2.0, 1.0], k)
    b = _fake_pca(e[2:4], [2.0, 1.0], k)
    out = models.subspace_overlap(a, b)
    assert out["subspace_overlap"] == pytest.approx(0.0, abs=1e-12)
    assert out["covariance_overlap"] == pytest.approx(0.0, abs=1e-12)


def test_overlap_rotated_plane_partial():
    # B's plane shares only e1 with A's (e1, e2): overlap = 1/2 exactly,
    # independent of the in-plane rotation of B's basis.
    k = 3
    e = _basis(k)
    th = 0.37
    b1 = np.cos(th) * e[0] + np.sin(th) * e[2]
    b2 = -np.sin(th) * e[0] + np.cos(th) * e[2]
    a = _fake_pca(e[:2], [1.0, 1.0], k)
    b = _fake_pca(np.stack([b1, b2]) @ np.eye(3 * k), [1.0, 1.0], k)
    out = models.subspace_overlap(a, b)
    assert out["subspace_overlap"] == pytest.approx(0.5, abs=1e-12)


def test_overlap_n_selects_modes_and_validates():
    k = 3
    e = _basis(k)
    a = _fake_pca(e[:3], [3.0, 2.0, 1.0], k)
    b = _fake_pca(e[[0, 2, 1]], [3.0, 2.0, 1.0], k)
    assert models.subspace_overlap(a, b, n=1)["subspace_overlap"] == (
        pytest.approx(1.0))
    with pytest.raises(ParallelError):
        models.subspace_overlap(a, b, n=4)
    with pytest.raises(ParallelError):
        models.subspace_overlap(a, b, n=0)
    c = _fake_pca(_basis(k + 1)[:2], [1.0, 1.0], k + 1)
    with pytest.raises(ParallelError):
        models.subspace_overlap(a, c)


def test_overlap_on_real_pca_halves(tmp_path):
    """Two halves of one stationary Gaussian trajectory share their
    essential subspace far more than two independent random bases."""
    rng = np.random.default_rng(11)
    k, f = 10, 400
    base = rng.uniform(4.0, 6.0, size=(k, 3))
    sig = rng.uniform(0.02, 0.3, size=(k, 3))
    frames = (base[None] + rng.normal(size=(f, k, 3)) * sig[None]
              ).astype(np.float32)
    p1 = str(tmp_path / "h1.xtc")
    p2 = str(tmp_path / "h2.xtc")
    _write_xtc(p1, frames[: f // 2])
    _write_xtc(p2, frames[f // 2:])
    masses = rng.uniform(1.0, 16.0, k).astype(np.float32)
    s = _system(k, masses, base)
    a = models.pca(s, p1, "All", fit=False)
    b = models.pca(s, p2, "All", fit=False)
    same = models.subspace_overlap(a, b, n=5)
    # random 5-subspaces of R^30 expect n/3K ~ 0.17; shared structure
    # must land far above that
    assert 0.6 < same["subspace_overlap"] <= 1.0
    assert 0.4 < same["covariance_overlap"] <= 1.0
    # a is identical to itself even through the f32 pipeline
    self_ov = models.subspace_overlap(a, a, n=5)
    assert self_ov["subspace_overlap"] == pytest.approx(1.0, abs=1e-5)


# -------------------------------------------------------- cosine content

def test_cosine_content_pure_cosine_exact():
    f = 201
    t = np.arange(f) / (f - 1)
    for i in (1, 2, 3):
        y = np.cos(i * np.pi * t)
        # c = 2/F * (sum cos^2)^2 / sum cos^2 = 2 * sum(cos^2) / F exactly
        expect = 2.0 * float(y @ y) / f
        got = models.cosine_content(y[:, None], n_modes=1)
        # y is mode-1-shaped only for i == 1
        if i == 1:
            assert got[0] == pytest.approx(expect, rel=1e-12)
            assert got[0] == pytest.approx(1.0, abs=2.0 / f + 1e-9)
        cc = models.cosine_content(np.stack([y] * 3, axis=1))
        assert cc[i - 1] == pytest.approx(expect, rel=1e-12)
        # orthogonal modes nearly vanish
        for j in range(3):
            if j != i - 1:
                assert cc[j] < 0.02


def test_cosine_content_scalar_and_validation():
    f = 100
    y = np.cos(np.pi * np.arange(f) / (f - 1))
    c = models.cosine_content(y)
    assert isinstance(c, float) and c > 0.9
    assert models.cosine_content(np.zeros(10)) == 0.0
    with pytest.raises(ParallelError):
        models.cosine_content(np.zeros((1, 2)))
    with pytest.raises(ParallelError):
        models.cosine_content(y, n_modes=0)


def test_cosine_content_random_walk_is_cosine_like():
    """Hess: PC1 of pure diffusion approaches cosine content 1."""
    rng = np.random.default_rng(3)
    walk = np.cumsum(rng.normal(size=(2000, 5)), axis=0)
    walk -= walk.mean(axis=0)
    u, sv, _ = np.linalg.svd(walk, full_matrices=False)
    pc1 = u[:, 0] * sv[0]
    assert models.cosine_content(pc1) > 0.7


# ------------------------------------------------------------ mode_traj

def test_mode_traj_formula_exact():
    k, n = 5, 8
    rng = np.random.default_rng(5)
    mean = rng.uniform(2.0, 4.0, size=(k, 3))
    ev = rng.normal(size=(1, 3 * k))
    ev /= np.linalg.norm(ev)
    sw = rng.uniform(1.0, 4.0, size=k)
    fake = _fake_pca(ev, [0.5], k, mean=mean, sw=sw)
    s = _system(k, sw ** 2, mean)
    amp = 0.7
    out = models.mode_traj(s, fake, "All", mode=1, amplitude=amp, n=n)
    disp = amp * np.cos(2 * np.pi * np.arange(n) / n)
    expect = (mean[None] + disp[:, None, None]
              * (ev.reshape(k, 3) / sw[:, None])[None]).astype(np.float32)
    np.testing.assert_array_equal(out["frames"], expect)
    np.testing.assert_allclose(out["displacement"], disp, atol=1e-12)
    # default amplitude is the quasi-harmonic extreme sqrt(2 lambda)
    out2 = models.mode_traj(s, fake, "All", mode=1, n=n)
    assert out2["amplitude"] == pytest.approx(np.sqrt(2 * 0.5))


def test_mode_traj_validation():
    k = 4
    fake = _fake_pca(_basis(k)[:2], [1.0, 0.5], k)
    s = _system(k, np.ones(k), np.zeros((k, 3)))
    with pytest.raises(ParallelError):
        models.mode_traj(s, fake, "All", mode=3)
    with pytest.raises(ParallelError):
        models.mode_traj(s, fake, "All", mode=0)
    with pytest.raises(ParallelError):
        models.mode_traj(s, fake, "All", n=1)
    s_bad = _system(k + 1, np.ones(k + 1), np.zeros((k + 1, 3)))
    with pytest.raises(ParallelError):
        models.mode_traj(s_bad, fake, "All")


def test_mode_traj_projection_roundtrip(tmp_path):
    """Frames generated along PC1 project back to exactly the cosine
    coordinate on PC1 and to ~0 on every other PC."""
    rng = np.random.default_rng(7)
    k, f = 8, 300
    base = rng.uniform(4.0, 6.0, size=(k, 3))
    sig = rng.uniform(0.05, 0.3, size=(k, 3))
    frames = (base[None] + rng.normal(size=(f, k, 3)) * sig[None]
              ).astype(np.float32)
    path = str(tmp_path / "g.xtc")
    _write_xtc(path, frames)
    masses = rng.uniform(1.0, 16.0, k).astype(np.float32)
    s = _system(k, masses, base)
    res = models.pca(s, path, "All", fit=False)
    amp = 1.3
    out = models.mode_traj(s, res, "All", mode=1, amplitude=amp, n=12)
    sw = res["sqrt_weights"]
    ev = res["eigenvectors"].reshape(-1, 3 * k)
    dev = ((out["frames"].astype(np.float64) - res["mean"][None])
           * sw[None, :, None]).reshape(12, 3 * k)
    proj = dev @ ev.T
    np.testing.assert_allclose(proj[:, 0], out["displacement"], atol=1e-4)
    assert np.abs(proj[:, 1:]).max() < 1e-4


def test_mode_traj_write_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    k, n = 6, 10
    mean = rng.uniform(2.0, 4.0, size=(k, 3))
    ev = rng.normal(size=(1, 3 * k))
    ev /= np.linalg.norm(ev)
    fake = _fake_pca(ev, [0.25], k, mean=mean)
    s = _system(k, np.ones(k), mean)
    path = str(tmp_path / "mode.xtc")
    out = models.mode_traj(s, fake, "All", amplitude=0.4, n=n, output=path)
    assert out["written"] == path
    got = np.stack([np.asarray(fr.positions).copy()
                    for fr in s.copy().xtc_iter(path)])
    np.testing.assert_allclose(got, out["frames"], atol=1.5e-3)
