"""RMSD fit parity (reference: rmsd.rs tests_fit, 901-1075)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.system import System


@pytest.fixture(scope="module")
def tpr(test_files):
    s = System.from_file(os.path.join(test_files, "example.tpr"))
    s.group_create("Protein", "@protein")
    return s


def _positions_wrap_equal(s1, s2, atol=1e-3):
    box = np.asarray(s1.box_lengths(), np.float64)
    d = np.abs(s1.positions.astype(np.float64) - s2.positions.astype(np.float64))
    d = np.minimum(d, np.abs(d - box))
    assert d.max() < atol


def test_fit_same_structure(tpr):
    """rmsd.rs:901 — fitting a copy onto itself: RMSD ~0, positions equal."""
    s = tpr.copy()
    ref = tpr.copy()
    rmsd = s.calc_rmsd_and_fit(ref, "Protein")
    assert rmsd == pytest.approx(0.0, abs=1e-4)
    _positions_wrap_equal(s, ref)


def test_fit_shifted_and_rotated_copy(tpr):
    """rmsd.rs:922 — translate + rotate 90deg about z, fit recovers the
    original positions with RMSD ~0."""
    from groan_rs_tpu.ops.vecmath import rotate

    s = tpr.copy()
    ref = tpr.copy()
    s.atoms_translate_nopbc([-1.1, 3.4, 2.7])
    rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    s.positions = np.asarray(rotate(s.positions, rot), np.float32)
    rmsd = s.calc_rmsd_and_fit(ref, "Protein")
    assert rmsd == pytest.approx(0.0, abs=1e-4)
    _positions_wrap_equal(s, ref)


def test_fit_trajectory_golden(tpr, test_files, tmp_path):
    """rmsd.rs:952 — the RMSD series matches exactly and the fitted
    trajectory matches short_trajectory_fit.xtc coordinates."""
    from groan_rs_tpu.io import native

    s = tpr.copy()
    ref = tpr.copy()
    out = tmp_path / "fit.xtc"
    s.traj_writer_init(str(out), fmt="xtc")
    rmsds = []
    for frame, r in s.xtc_iter(
        os.path.join(test_files, "short_trajectory.xtc")
    ).calc_rmsd_and_fit(ref, "Protein"):
        frame.traj_write_frame()
        rmsds.append(r)
    s.traj_writers_close()

    expected = [
        0.23669721, 0.2634763, 0.26021627, 0.21364464, 0.22166993, 0.19383307,
        0.26422343, 0.27013618, 0.26398134, 0.23475659, 0.24208021,
    ]
    np.testing.assert_allclose(rmsds, expected, atol=5e-5)

    # fitted coordinates vs the reference's golden fit trajectory: raw fit
    # differences are ~1e-5, but the golden is quantized at precision 100
    # (0.01 nm grid), so values within ~5e-3 of a rounding midpoint may flip
    # by exactly one step — require <1% flips and never more than one step
    golden = os.path.join(test_files, "short_trajectory_fit.xtc")
    go, _, _, gn = native.xtc_scan(golden)
    gc, *_ = native.xtc_read_frames(golden, go, gn)
    mo, _, _, mn = native.xtc_scan(str(out))
    mc, *_ = native.xtc_read_frames(str(out), mo, mn)
    assert mn == gn and len(mo) == len(go)
    d = np.abs(mc - gc)
    assert float(d.max()) <= 0.0101
    assert (d > 2e-3).mean() < 0.01


def test_fit_trajectory_broken_at_pbc(tpr, test_files, tmp_path):
    """rmsd.rs:1046 — a reference broken across the boundary still fits
    (the refined Bai-Breen COM keeps the group compact)."""
    s = tpr.copy()
    ref = tpr.copy()
    ref.atoms_translate([3.2, -2.1, -4.6])
    rmsds = []
    for _, r in s.xtc_iter(
        os.path.join(test_files, "short_trajectory.xtc")
    ).calc_rmsd_and_fit(ref, "Protein"):
        rmsds.append(r)
    expected = [
        0.23669721, 0.2634763, 0.26021627, 0.21364464, 0.22166993, 0.19383307,
        0.26422343, 0.27013618, 0.26398134, 0.23475659, 0.24208021,
    ]
    np.testing.assert_allclose(rmsds, expected, atol=1e-4)


def test_calc_rmsd_partial_extracted_reference(tpr):
    """reference: rmsd.rs test_calc_rmsd_partial — the reference system may
    be the extracted group alone."""
    s = tpr.copy()
    ref = s.group_extract("Protein")
    ref.group_create("Protein", "all")
    assert ref.get_n_atoms() == 61
    assert s.calc_rmsd(ref, "Protein") == pytest.approx(0.0, abs=1e-4)


def test_extract_semantics(tpr, test_files):
    """group_extract/atoms_extract build independent sub-systems with
    remapped bonds."""
    s = tpr.copy()
    sub = s.group_extract("Protein")
    assert sub.get_n_atoms() == 61
    assert sub.get_box().x == pytest.approx(s.get_box().x)
    # bonds are remapped into [0, 61)
    for i, b in enumerate(sub.topology.bonded):
        assert all(0 <= j < 61 for j in b)
    # independence
    sub.positions[0] = [0.0, 0.0, 0.0]
    assert not np.allclose(s.positions[s.group_indices("Protein")][0], 0.0)
    # atoms_extract copies everything without custom groups
    full = s.atoms_extract()
    assert full.get_n_atoms() == s.get_n_atoms()
    assert not full.group_exists("Protein")
    np.testing.assert_allclose(full.positions, s.positions)
