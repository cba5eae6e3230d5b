"""Property-based invariants of the core kernels (randomized, seeded)."""

import numpy as np
import pytest

from groan_rs_tpu.ops import pbc
from groan_rs_tpu.ops.center import center, estimate_center
from groan_rs_tpu.ops import rmsd as rmsd_ops
from groan_rs_tpu.ops.vecmath import rotation_about_axis, rotate


RNG = np.random.default_rng(42)
BOX = np.array([7.0, 9.0, 5.0], np.float32)


def _blob(n=80, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    c = (rng.random(3) * BOX).astype(np.float32)
    return (c + rng.normal(size=(n, 3)) * sigma).astype(np.float32)


@pytest.mark.parametrize("seed", range(5))
def test_wrap_idempotent(seed):
    rng = np.random.default_rng(seed)
    p = (rng.uniform(-30, 30, size=(200, 3))).astype(np.float32)
    w1 = np.asarray(pbc.wrap(p, BOX))
    w2 = np.asarray(pbc.wrap(w1, BOX))
    np.testing.assert_array_equal(w1, w2)
    assert (w1 >= 0).all() and (w1 <= BOX + 1e-5).all()


@pytest.mark.parametrize("seed", range(5))
def test_min_image_halfbox_bound(seed):
    rng = np.random.default_rng(seed)
    d = (rng.uniform(-40, 40, size=(300, 3))).astype(np.float32)
    m = np.asarray(pbc.min_image(d, BOX))
    assert (np.abs(m) <= BOX / 2 + 1e-4).all()
    # congruence: m == d (mod L)
    resid = np.asarray(pbc.min_image(m - d, BOX))
    np.testing.assert_allclose(resid, 0.0, atol=1e-3)


@pytest.mark.parametrize("seed", range(5))
def test_center_invariant_under_lattice_translation(seed):
    """Translating a wrapped blob by whole lattice vectors does not move the
    refined center (modulo the lattice)."""
    p = np.asarray(pbc.wrap(_blob(seed=seed), BOX))
    c0 = np.asarray(center(p, BOX))
    shift = (np.array([2, -1, 3], np.float32) * BOX)
    c1 = np.asarray(center(np.asarray(pbc.wrap(p + shift, BOX)), BOX))
    np.testing.assert_allclose(
        np.asarray(pbc.min_image(c1 - c0, BOX)), 0.0, atol=1e-3)


@pytest.mark.parametrize("seed", range(5))
def test_center_follows_small_translation(seed):
    """center(p + t) == center(p) + t (mod box) for small t."""
    p = _blob(seed=seed)
    t = np.array([0.31, -0.17, 0.08], np.float32)
    c0 = np.asarray(center(np.asarray(pbc.wrap(p, BOX)), BOX))
    c1 = np.asarray(center(np.asarray(pbc.wrap(p + t, BOX)), BOX))
    d = np.asarray(pbc.min_image(c1 - (c0 + t), BOX))
    np.testing.assert_allclose(d, 0.0, atol=2e-3)


@pytest.mark.parametrize("seed", range(5))
def test_rmsd_invariant_under_rigid_motion(seed):
    """RMSD(p, R p + t) ~ 0 and RMSD is symmetric-ish under noise."""
    rng = np.random.default_rng(seed)
    p = _blob(120, 0.4, seed)
    w = rng.uniform(1, 16, size=120).astype(np.float32)
    r = np.asarray(rotation_about_axis(rng.normal(size=3).astype(np.float32), 0.8))
    q = np.asarray(rotate(p, r)) + rng.normal(size=3).astype(np.float32)
    _, _, rms = rmsd_ops.kabsch(
        p, q.astype(np.float32), w,
        (p * w[:, None]).sum(0) / w.sum(),
        (q * w[:, None]).sum(0) / w.sum(),
    )
    assert float(rms) < 1e-3


@pytest.mark.parametrize("seed", range(3))
def test_estimate_vs_refined_on_compact_blob(seed):
    """For compact groups the estimate and the refined center agree to the
    blob scale (the refinement shrinks the estimate's bias)."""
    p = np.asarray(pbc.wrap(_blob(400, 0.3, seed), BOX))
    est = np.asarray(estimate_center(p, BOX))
    ref = np.asarray(center(p, BOX))
    d = np.asarray(pbc.min_image(est - ref, BOX))
    assert np.abs(d).max() < 0.05


def test_vector_to_antisymmetric():
    rng = np.random.default_rng(7)
    a = (rng.random((100, 3)) * BOX).astype(np.float32)
    b = (rng.random((100, 3)) * BOX).astype(np.float32)
    ab = np.asarray(pbc.vector_to(a, b, BOX))
    ba = np.asarray(pbc.vector_to(b, a, BOX))
    # antisymmetric modulo the lattice (exact half-box ties may keep sign)
    resid = np.asarray(pbc.min_image(ab + ba, BOX))
    np.testing.assert_allclose(resid, 0.0, atol=1e-3)
