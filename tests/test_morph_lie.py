"""Conformation morphing (`models.morph`, gmx morph) and linear
interaction energy estimates (`models.lie`, gmx lie) — surpass features
absent from the reference.

Pinned against exact interpolation algebra, rigid-motion invariance of
the fitted path, endpoint RMSD zeros, write round trips, and the
closed-form LIE formula.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import ParallelError, RMSDError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

BOX = (10.0, 10.0, 10.0)


def _sys(coords, name="m"):
    n = len(coords)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.ones(n, np.int64)
    topo.atomname = StrColumn(values=np.asarray(["C"] * n))
    topo.mass = np.ones(n, np.float32)
    topo.has_mass = np.ones(n, bool)
    s = System(name, topo, simbox=SimBox.from_lengths(*BOX),
               positions=np.asarray(coords, np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def _rot(axis_deg):
    t = np.deg2rad(axis_deg)
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def test_morph_exact_interpolation_and_endpoints():
    rng = np.random.default_rng(4)
    xa = rng.uniform(3.0, 6.0, (12, 3))
    xb = xa + rng.normal(0, 0.3, (12, 3))
    a, b = _sys(xa), _sys(xb)
    out = models.morph(a, b, n=5, fit=False)
    np.testing.assert_allclose(out["lambdas"], [0, 0.25, 0.5, 0.75, 1.0])
    for k, lam in enumerate(out["lambdas"]):
        want = (1 - lam) * xa + lam * xb
        np.testing.assert_allclose(out["frames"][k], want, atol=1e-5)
    assert out["rmsd_a"][0] == pytest.approx(0.0, abs=1e-5)
    assert out["rmsd_b"][-1] == pytest.approx(0.0, abs=1e-5)
    assert (np.diff(out["rmsd_a"]) > -1e-6).all()
    assert (np.diff(out["rmsd_b"]) < 1e-6).all()


def test_morph_fit_removes_rigid_motion():
    """Rotating + translating endpoint B must not change the fitted
    morph path."""
    rng = np.random.default_rng(9)
    xa = rng.uniform(3.0, 6.0, (10, 3))
    xb = xa + rng.normal(0, 0.2, (10, 3))
    moved = xb @ _rot(40.0).T + np.array([1.0, -2.0, 0.5])
    a = _sys(xa)
    out1 = models.morph(a, _sys(xb), n=4, fit=True)
    out2 = models.morph(a, _sys(moved), n=4, fit=True)
    np.testing.assert_allclose(out1["frames"], out2["frames"], atol=2e-5)
    np.testing.assert_allclose(out1["rmsd_a"], out2["rmsd_a"], atol=2e-5)


def test_morph_extrapolation_and_errors(tmp_path):
    xa = np.array([[4.0, 4.0, 4.0], [5.0, 4.0, 4.0], [4.0, 5.0, 4.0]])
    xb = xa + [0.0, 0.0, 1.0]
    a, b = _sys(xa), _sys(xb)
    out = models.morph(a, b, n=3, first=-0.5, last=1.5, fit=False)
    np.testing.assert_allclose(out["frames"][0], xa - [0, 0, 0.5],
                               atol=1e-5)
    np.testing.assert_allclose(out["frames"][2], xa + [0, 0, 1.5],
                               atol=1e-5)

    with pytest.raises(ParallelError):
        models.morph(a, b, n=1)
    with pytest.raises(RMSDError):
        models.morph(a, _sys(np.zeros((5, 3))))


def test_morph_write_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xa = rng.uniform(3.0, 6.0, (8, 3))
    xb = xa + rng.normal(0, 0.4, (8, 3))
    a = _sys(xa)
    path = str(tmp_path / "morph.xtc")
    out = models.morph(a, _sys(xb), n=6, fit=False, output=path)
    got = []
    for _ in a.traj_iter(path):
        got.append(a.positions.copy())
    assert len(got) == 6
    for k in range(6):
        np.testing.assert_allclose(got[k], out["frames"][k], atol=2e-3)


def test_lie_closed_form():
    e_lj = np.array([-40.0, -42.0, -38.0])
    e_qq = np.array([-100.0, -90.0, -110.0])
    out = models.lie(e_lj, e_qq, clj=0.2, cqq=0.5, elj0=-5.0, eqq0=-20.0)
    want = 0.2 * (e_lj + 5.0) + 0.5 * (e_qq + 20.0)
    np.testing.assert_allclose(out["dg"], want)
    assert out["dg_mean"] == pytest.approx(want.mean())
    assert out["e_lj_mean"] == pytest.approx(-40.0)

    with pytest.raises(ParallelError):
        models.lie([1.0], [1.0, 2.0])
