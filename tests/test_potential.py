"""Electrostatic potential profile (surpass — gmx potential; absent
from the reference).

Pins `models.potential_profile` against the parallel-plate capacitor
(constant field between the plates, zero outside, linear psi ramp) and
a float64 oracle that re-derives the double integration from raw
positions; fixture sanity on the charged CG membrane system.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([4.0, 4.0, 10.0], np.float32)
E_OVER_EPS0_NM = 18.0951262


def _capacitor_system(tmp_path, nside=6, z_neg=3.0, z_pos=7.0):
    """Two square sheets of +-1e point charges at z_neg / z_pos."""
    from groan_rs_tpu.io import native

    xs = (np.arange(nside) + 0.5) / nside * BOX[0]
    gx, gy = np.meshgrid(xs, xs * BOX[1] / BOX[0], indexing="ij")
    sheet = np.stack([gx.ravel(), gy.ravel()], axis=1)
    k = sheet.shape[0]
    pts = np.concatenate([
        np.column_stack([sheet, np.full(k, z_neg)]),
        np.column_stack([sheet, np.full(k, z_pos)]),
    ]).astype(np.float32)
    q = np.concatenate([np.full(k, -1.0), np.full(k, 1.0)]).astype(np.float32)

    topo = Topology(2 * k)
    topo.atomnum = np.arange(1, 2 * k + 1, dtype=np.int64)
    topo.resnum = np.ones(2 * k, np.int64)
    topo.charge = q
    topo.has_charge = np.ones(2 * k, bool)
    s = System("cap", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=pts)
    s.group_create_from_ranges("All", [(0, 2 * k - 1)])

    path = str(tmp_path / "cap.xtc")
    b9 = np.diag(BOX).astype(np.float32).reshape(9)
    native.xtc_write_frame(path, 2 * k, 0, 0.0, b9, pts, 10000.0)
    return s, path, k


def test_capacitor_field_and_potential(tmp_path):
    s, path, k = _capacitor_system(tmp_path)
    n_bins = 100
    out = models.potential_profile(s, path, "All", n_bins=n_bins)
    z = out["centers"]
    field, psi = out["field"], out["psi"]

    # between the plates: constant field sigma*e/eps0 (sigma in e/nm^2)
    sigma = k / (float(BOX[0]) * float(BOX[1]))
    expect_field = -E_OVER_EPS0_NM * sigma        # negative plate first
    mid = (z > 3.5) & (z < 6.5)
    np.testing.assert_allclose(field[mid], expect_field, rtol=1e-4)
    # outside: zero field (neutral system), flat psi
    outside = (z < 2.5) | (z > 7.5)
    np.testing.assert_allclose(field[outside], 0.0, atol=1e-6)
    np.testing.assert_allclose(psi[z < 2.5], 0.0, atol=1e-6)
    # potential difference across the gap: -integral of E
    dpsi = psi[np.argmin(np.abs(z - 7.5))] - psi[np.argmin(np.abs(z - 2.5))]
    np.testing.assert_allclose(dpsi, -expect_field * (7.0 - 3.0), rtol=2e-2)
    # psi is a linear ramp between the plates
    ramp = psi[mid]
    slopes = np.diff(ramp) / np.diff(z[mid])
    np.testing.assert_allclose(slopes, -expect_field, rtol=1e-3)


def test_potential_matches_f64_oracle(tmp_path):
    # random charges (neutralized) -> oracle re-derives everything from
    # the raw positions in float64
    from groan_rs_tpu.io import native

    rng = np.random.default_rng(3)
    k, f, n_bins = 50, 3, 40
    pts = rng.uniform(0, 1, size=(f, k, 3)).astype(np.float32) * BOX
    q = rng.uniform(-1, 1, size=k).astype(np.float32)
    q -= q.mean()

    topo = Topology(k)
    topo.atomnum = np.arange(1, k + 1, dtype=np.int64)
    topo.resnum = np.ones(k, np.int64)
    topo.charge = q
    topo.has_charge = np.ones(k, bool)
    s = System("rnd", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=pts[0])
    s.group_create_from_ranges("All", [(0, k - 1)])
    path = str(tmp_path / "rnd.xtc")
    b9 = np.diag(BOX).astype(np.float32).reshape(9)
    for i in range(f):
        native.xtc_write_frame(path, k, i, float(i), b9, pts[i], 10000.0)

    out = models.potential_profile(s, path, "All", n_bins=n_bins)

    # float64 oracle on the quantized coordinates
    zq = np.round(pts[..., 2].astype(np.float64) * 1e4) / 1e4
    lz, dz = float(BOX[2]), float(BOX[2]) / n_bins
    vol_slab = float(BOX[0]) * float(BOX[1]) * dz
    rho = np.zeros((f, n_bins))
    for i in range(f):
        bi = np.clip(((zq[i] / lz) % 1.0 * n_bins).astype(int), 0,
                     n_bins - 1)
        np.add.at(rho[i], bi, q.astype(np.float64))
    rho /= vol_slab
    field = E_OVER_EPS0_NM * np.cumsum(rho, 1) * dz
    psi = -np.cumsum(field, 1) * dz
    np.testing.assert_allclose(out["rho"], rho.mean(0), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(out["field"], field.mean(0), rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(out["psi"], psi.mean(0), rtol=1e-3,
                               atol=1e-6)


def test_potential_fixture_membrane():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("All", "all")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = models.potential_profile(s, xtc, "All", n_bins=50)
    assert out["psi"].shape == (50,)
    assert np.isfinite(out["psi"]).all() and np.isfinite(out["field"]).all()
    # the CG membrane system carries charges; the profile is non-trivial
    assert np.abs(out["rho"]).max() > 0

    with pytest.raises(GroupError, match="axis"):
        models.potential_profile(s, xtc, "All", axis="w")
