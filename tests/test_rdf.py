"""RDF observable (surpass feature): on-device pair-distance histogram +
ideal-gas normalization, validated against a brute-force numpy reference."""

import os

import numpy as np
import pytest

from groan_rs_tpu.models.pipeline import TrajectoryAnalysis
from groan_rs_tpu.ops import distances as distance_ops
from groan_rs_tpu.system import System


def _numpy_rdf(a, b, box, r_max, n_bins, exclude_self):
    d = np.abs(a[:, None, :].astype(np.float64) - b[None, :, :].astype(np.float64))
    d = np.minimum(d, box - d)
    dist = np.sqrt((d ** 2).sum(-1))
    if exclude_self:
        np.fill_diagonal(dist, 0.0)
    dr = r_max / n_bins
    idx = np.ceil(dist / dr).astype(int) - 1
    ok = (dist > 0) & (idx >= 0) & (idx < n_bins)
    hist = np.bincount(idx[ok], minlength=n_bins)[:n_bins]
    edges = np.arange(n_bins + 1) * dr
    shell = 4 / 3 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    n_pairs = a.shape[0] * b.shape[0] - (a.shape[0] if exclude_self else 0)
    return hist / (n_pairs * shell / box.prod())


def test_pair_histogram_matches_numpy(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("P", "name PO4")
    idx = s.group_indices("P")
    a = s.positions[idx]
    box = np.asarray(s.box_lengths(), np.float64)
    got = np.asarray(distance_ops.pair_distance_histogram(
        a, a, box.astype(np.float32), 3.0, 60, exclude_self=True))
    dr = 3.0 / 60
    d = np.abs(a[:, None, :].astype(np.float64) - a[None, :, :].astype(np.float64))
    d = np.minimum(d, box - d)
    dist = np.sqrt((d ** 2).sum(-1))
    np.fill_diagonal(dist, 0.0)
    i = np.ceil(dist / dr).astype(int) - 1
    ok = (dist > 0) & (i >= 0) & (i < 60)
    want = np.bincount(i[ok], minlength=60)[:60]
    # f32 vs f64 puts a handful of boundary pairs in the neighbouring bin
    assert np.abs(got - want).sum() <= 4
    assert got.sum() == want.sum()


def test_rdf_pipeline_po4(test_files):
    """PO4-PO4 lateral RDF over the trajectory: finite, converges to ~1 at
    long range, zero inside the core."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("P", "name PO4")
    pipe = TrajectoryAnalysis(s)
    pipe.add_rdf("P", "P", r_max=4.0, n_bins=80)
    out = pipe.run(os.path.join(test_files, "short_trajectory.xtc"))
    g = np.asarray(out["rdf_P_P"])
    assert g.shape == (11, 80)
    mean = g.mean(axis=0)
    # excluded-volume core (phosphates never overlap)
    assert mean[:5].max() == 0.0
    # long-range tail approaches the bulk density
    assert mean[-20:].mean() == pytest.approx(1.0, abs=0.35)
    assert np.isfinite(mean).all()


def test_rdf_cross_group_normalization(test_files):
    """Cross-group RDF uses n_a*n_b pairs (no self-exclusion)."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("P", "name PO4")
    s.group_create("N", "name NC3 NH3")
    pipe = TrajectoryAnalysis(s)
    pipe.add_rdf("P", "N", r_max=3.0, n_bins=40)
    out = pipe.run(os.path.join(test_files, "short_trajectory.xtc"))
    g = np.asarray(out["rdf_P_N"]).mean(axis=0)
    idx_p = s.group_indices("P")
    idx_n = s.group_indices("N")
    box = np.asarray(s.box_lengths(), np.float64)
    # numpy cross-check on the FIRST frame
    s2 = System.from_file(os.path.join(test_files, "example.gro"))
    it = iter(s2.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")))
    fr = next(it)
    want0 = _numpy_rdf(np.asarray(fr.positions)[idx_p],
                       np.asarray(fr.positions)[idx_n],
                       np.asarray(fr.box_lengths(), np.float64), 3.0, 40, False)
    got0 = np.asarray(out["rdf_P_N"])[0]
    np.testing.assert_allclose(got0, want0, rtol=0.05, atol=0.05)
