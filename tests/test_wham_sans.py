"""WHAM umbrella-sampling PMF (`models.wham`, gmx wham) and neutron
Debye curves (`models.sans`, gmx sans) — surpass features absent from
the reference.

WHAM is pinned against exactly-sampled harmonic constructions (flat
PMF and a known quadratic PMF, where each biased window distribution
is Gaussian in closed form); sans against the two-atom analytic curve,
the saxs-machinery equivalence, and the deuteration contrast swap.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.models.pipeline import _KB_KJ, _NEUTRON_B
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

BOX = np.array([10.0, 10.0, 10.0], np.float32)


# ------------------------------------------------------------------ wham

def _harmonic_windows(rng, a, kbias, centers, n, kt):
    """Windows sampled EXACTLY from G(x) = a x^2 biased by each
    umbrella: the biased density is Gaussian with closed-form mean and
    variance — no MD needed for an exact oracle."""
    out = []
    for x0 in centers:
        prec = (2.0 * a + kbias) / kt                # 1/variance
        mean = kbias * x0 / (2.0 * a + kbias)
        out.append({"samples": rng.normal(mean, np.sqrt(1.0 / prec), n),
                    "center": x0, "k": kbias})
    return out


def test_flat_pmf_recovered():
    rng = np.random.default_rng(41)
    kt = _KB_KJ * 300.0
    # G(x) = 0: biased samples are Gaussians centered at each x0
    windows = [{"samples": rng.normal(x0, np.sqrt(kt / 500.0), 40000),
                "center": x0, "k": 500.0}
               for x0 in np.linspace(-1.0, 1.0, 11)]
    out = models.wham(windows, bins=60, span=(-1.2, 1.2))
    assert out["converged"]
    mid = (np.abs(out["x"]) < 0.9) & np.isfinite(out["pmf"])
    # flat to within sampling noise
    assert out["pmf"][mid].max() < 0.25 * kt


def test_quadratic_pmf_recovered():
    rng = np.random.default_rng(43)
    t, a, kb = 300.0, 30.0, 800.0
    kt = _KB_KJ * t
    centers = np.linspace(-1.0, 1.0, 15)
    windows = _harmonic_windows(rng, a, kb, centers, 60000, kt)
    out = models.wham(windows, bins=80, span=(-1.1, 1.1),
                      temperature=t)
    assert out["converged"]
    x = out["x"]
    mid = (np.abs(x) < 0.8) & np.isfinite(out["pmf"])
    expect = a * x[mid] ** 2
    expect -= expect.min()
    got = out["pmf"][mid]
    got -= got.min()
    np.testing.assert_allclose(got, expect, atol=0.5)
    # and tightly over the deep-sampled middle (< 0.1 kJ/mol)
    deep = np.abs(x[mid]) < 0.5
    np.testing.assert_allclose(got[deep] - got[deep].min(),
                               expect[deep] - expect[deep].min(),
                               atol=0.15)


def test_wham_probability_normalized():
    rng = np.random.default_rng(47)
    windows = [{"samples": rng.normal(0.0, 0.1, 5000), "center": 0.0,
                "k": 1000.0}]
    out = models.wham(windows, bins=50, span=(-0.5, 0.5))
    dx = 1.0 / 50
    assert np.nansum(out["prob"]) * dx == pytest.approx(1.0)
    assert np.nanmin(out["pmf"]) == 0.0
    assert out["f"].shape == (1,) and out["f"][0] == 0.0


def test_wham_errors():
    with pytest.raises(ParallelError):
        models.wham([])
    with pytest.raises(ParallelError):
        models.wham([{"samples": [], "center": 0.0, "k": 1.0}])
    with pytest.raises(ParallelError):
        models.wham([{"samples": [1.0], "center": 0.0, "k": -1.0}])
    with pytest.raises(ParallelError):
        models.wham([{"samples": [1.0], "center": 0.0, "k": 1.0}],
                    span=(2.0, 1.0))


# ------------------------------------------------------------------ sans

def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        b9 = np.diag(BOX).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32),
                               100000.0)


def _system(positions, elements):
    n = positions.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    topo.element_symbol = StrColumn(values=np.asarray(elements))
    s = System("sn", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.asarray(positions, np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def test_sans_two_atom_analytic(tmp_path):
    d = 0.8
    pts = np.array([[4.0, 5.0, 5.0], [4.0 + d, 5.0, 5.0]])
    path = str(tmp_path / "two.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, ["C", "O"])
    q = np.linspace(0.5, 20.0, 15)
    out = models.sans(s, path, "All", q=q)
    bc, bo = _NEUTRON_B["C"], _NEUTRON_B["O"]
    expect = bc**2 + bo**2 + 2 * bc * bo * np.sinc(q * d / np.pi)
    np.testing.assert_allclose(out["intensity"], expect, rtol=2e-4)
    assert out["i0"] == pytest.approx((bc + bo) ** 2)


def test_sans_deuteration_contrast(tmp_path):
    pts = np.array([[5.0, 5.0, 5.0], [5.3, 5.0, 5.0]])
    path = str(tmp_path / "d.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, ["H", "H"])
    q = np.array([1.0, 5.0])
    h = models.sans(s, path, "All", q=q)
    dd = models.sans(s, path, "All", q=q, deuterate=True)
    # b_H = -3.7406, b_D = 6.671: the curve rescales by (b_D/b_H)^2
    ratio = (_NEUTRON_B["D"] / _NEUTRON_B["H"]) ** 2
    np.testing.assert_allclose(dd["intensity"] / h["intensity"],
                               [ratio, ratio], rtol=1e-5)


def test_sans_unknown_element(tmp_path):
    pts = np.array([[1.0, 1.0, 1.0]])
    path = str(tmp_path / "e.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, ["Xx"])
    with pytest.raises(GroupError):
        models.sans(s, path, "All")
