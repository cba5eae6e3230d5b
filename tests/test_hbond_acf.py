"""Hydrogen-bond lifetime autocorrelation (surpass — gmx hbond -ac;
the reference detects bonds per frame but has no lifetime analysis).

A two-molecule donor/acceptor system toggles its bond in a known
pattern, so both the intermittent and the continuous ACF have exact
hand-computed values; the fixture test runs real water-water bonds.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology, StrColumn
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.system import System
from groan_rs_tpu.system.hbonds import HBondChain

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([5.0, 5.0, 5.0], np.float32)

CHAIN = [HBondChain("name O1 O2", "name O1", "name H1")]


def _toggle_system(tmp_path, pattern, name="tog.xtc"):
    """Donor O1-H1 pointing at acceptor O2; bonded frames put O2 at
    0.25 nm (angle 180), broken frames at 0.8 nm."""
    from groan_rs_tpu.io import native

    names = ["O1", "H1", "O2"]
    topo = Topology(3)
    topo.atomnum = np.arange(1, 4, dtype=np.int64)
    topo.resnum = np.asarray([1, 1, 2], np.int64)
    topo.resname = StrColumn(values=["W1", "W1", "W2"])
    topo.atomname = StrColumn(values=names)
    topo.bonded = [[1], [0], []]          # O1-H1 (hydrogens bind by bond)
    base = np.array([[2.0, 2.5, 2.5], [2.1, 2.5, 2.5], [2.25, 2.5, 2.5]],
                    np.float32)
    s = System("tog", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=base)
    path = str(tmp_path / name)
    b9 = np.diag(BOX).astype(np.float32).reshape(9)
    for t, on in enumerate(pattern):
        pts = base.copy()
        pts[2, 0] = 2.25 if on else 2.8
        native.xtc_write_frame(path, 3, t, float(t), b9, pts, 10000.0)
    return s, path


def test_hbond_acf_exact_pattern(tmp_path):
    pattern = [1, 1, 1, 0, 1, 1, 0, 0]
    s, path = _toggle_system(tmp_path, pattern)
    h = np.asarray(pattern, bool)[:, None]
    f = len(pattern)
    mean_h = h.mean()

    lag_times, c = models.hbond_acf(s, path, CHAIN, [(0, 0)],
                                    max_distance=0.35, min_angle=150.0)
    expect = np.asarray([
        (h[: f - tau] & h[tau:]).mean() / mean_h for tau in range(f)])
    np.testing.assert_allclose(c, expect, atol=1e-12)
    assert c[0] == pytest.approx(1.0)
    np.testing.assert_allclose(lag_times, np.arange(f, dtype=float))

    _, cc = models.hbond_acf(s, path, CHAIN, [(0, 0)],
                             max_distance=0.35, min_angle=150.0,
                             continuous=True)
    run = np.zeros(f + 1, np.int64)
    for t in range(f - 1, -1, -1):
        run[t] = run[t + 1] + 1 if pattern[t] else 0
    expect_c = np.asarray([
        (run[: f - tau] >= tau + 1).mean() / mean_h for tau in range(f)])
    np.testing.assert_allclose(cc, expect_c, atol=1e-12)
    # continuous never exceeds intermittent
    assert (cc <= c + 1e-12).all()
    # the 0 at frame 3 kills continuous survival across it:
    # run lengths are [3,2,1,0,2,1,0,0] -> no tau=3 survivor
    assert cc[3] == 0.0 and c[3] > 0.0


def test_hbond_acf_errors(tmp_path):
    s, path = _toggle_system(tmp_path, [0, 0, 0])
    with pytest.raises(ParallelError, match="no hydrogen bonds"):
        models.hbond_acf(s, path, CHAIN, [(0, 0)], min_angle=150.0)
    s2, path2 = _toggle_system(tmp_path, [1], name="one.xtc")
    with pytest.raises(ParallelError, match="2 frames"):
        models.hbond_acf(s2, path2, CHAIN, [(0, 0)], min_angle=150.0)


def test_hbond_acf_fixture_water():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    water = [HBondChain("resname SOL and name OW", "resname SOL and name OW",
                        "resname SOL and name HW1 HW2")]
    lag_times, c = models.hbond_acf(s, xtc, water, [(0, 0)],
                                    max_distance=0.3, min_angle=150.0)
    assert c[0] == pytest.approx(1.0)
    # water hydrogen bonds decorrelate: monotone-ish decay, stays positive
    assert c[1] < 1.0 and (c >= 0).all()
    assert c[min(5, len(c) - 1)] < c[1]
    assert np.isfinite(c).all() and len(c) == len(lag_times)


def test_hbond_lifetime_exact_pattern(tmp_path):
    pattern = [1, 1, 1, 0, 1, 1, 0, 0]
    s, path = _toggle_system(tmp_path, pattern)
    out = models.hbond_lifetime(s, path, CHAIN, [(0, 0)],
                                max_distance=0.35, min_angle=150.0)
    # both curves equal their hbond_acf counterparts exactly
    _, ci = models.hbond_acf(s, path, CHAIN, [(0, 0)],
                             max_distance=0.35, min_angle=150.0)
    _, cc = models.hbond_acf(s, path, CHAIN, [(0, 0)],
                             max_distance=0.35, min_angle=150.0,
                             continuous=True)
    np.testing.assert_allclose(out["intermittent"], ci, atol=1e-12)
    np.testing.assert_allclose(out["continuous"], cc, atol=1e-12)
    # trapezoid integrals over the uniform 1 ps grid
    assert out["tau_intermittent"] == pytest.approx(
        np.trapezoid(ci, out["lag_times"]))
    assert out["tau_continuous"] == pytest.approx(
        np.trapezoid(cc, out["lag_times"]))
    assert out["k_forward"] == pytest.approx(1.0 / out["tau_continuous"])
    assert out["tau_continuous"] <= out["tau_intermittent"] + 1e-12
    assert out["n_bonds_seen"] == 1
    assert out["occupancy"] == pytest.approx(np.mean(pattern))


def test_hbond_lifetime_permanent_bond(tmp_path):
    """An unbroken bond: C == S == 1 everywhere, tau = full span."""
    pattern = [1] * 6
    s, path = _toggle_system(tmp_path, pattern, name="perm.xtc")
    out = models.hbond_lifetime(s, path, CHAIN, [(0, 0)],
                                max_distance=0.35, min_angle=150.0)
    np.testing.assert_allclose(out["intermittent"], 1.0, atol=1e-12)
    np.testing.assert_allclose(out["continuous"], 1.0, atol=1e-12)
    assert out["tau_continuous"] == pytest.approx(5.0)   # trapezoid 0..5


def test_hbond_lifetime_fixture_water():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    water = [HBondChain("resname SOL and name OW", "resname SOL and name OW",
                        "resname SOL and name HW1 HW2")]
    out = models.hbond_lifetime(s, xtc, water, [(0, 0)],
                                max_distance=0.3, min_angle=150.0)
    assert 0 < out["tau_continuous"] <= out["tau_intermittent"]
    assert out["k_forward"] > 0 and out["n_bonds_seen"] > 4675
