"""Dipole autocorrelation (`models.dipole_corr`, gmx dipoles -corr),
the dielectric spectrum (`models.dielectric_spectrum`, gmx dielectric),
and density-profile interfaces (`models.densorder`, gmx densorder) —
surpass features absent from the reference.

Pinned against closed-form constructions: a rigidly rotating dipole
(C(tau) = m^2 cos(w tau) exactly), the Debye form of the
Fourier-Laplace bridge, exact slab-edge interpolation with NPT
scaling, and float64 oracles.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.io import native
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([4.0, 4.0, 4.0], np.float32)


def _write_xtc(tmp_path, frames, box=None, name="t.xtc", dt=1.0):
    path = str(tmp_path / name)
    frames = np.asarray(frames)
    boxes = (np.broadcast_to(BOX, (frames.shape[0], 3)) if box is None
             else np.asarray(box, np.float32))
    for fidx, pos in enumerate(frames):
        b9 = np.diag(boxes[fidx]).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, pos.shape[0], fidx, fidx * dt, b9,
                               np.asarray(pos, np.float32), 100000.0)
    return path


def _dipole_system(n_mol=1, charges=(1.0, -1.0), masses=(1.0, 1.0)):
    n = 2 * n_mol
    topo = Topology.from_columns(
        resnum=np.repeat(np.arange(1, n_mol + 1), 2),
        resname=np.array(["DIP"] * n),
        atomname=np.array(["A", "B"] * n_mol),
        atomnum=np.arange(1, n + 1),
        mass=np.tile(np.asarray(masses, np.float32), n_mol),
        charge=np.tile(np.asarray(charges, np.float32), n_mol),
    )
    topo.set_bonds_from_pairs([(2 * m, 2 * m + 1) for m in range(n_mol)])
    s = System("dip", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def test_dipole_corr_rotating_exact(tmp_path):
    """A rigid +1/-1 dipole of length L rotating at w rad/ps:
    C(tau) = L^2 cos(w tau) exactly, for both modes."""
    f, L = 48, 0.2
    w = 2.0 * np.pi / 32.0
    c = np.array([2.0, 2.0, 2.0])
    th = w * np.arange(f)
    u = np.stack([np.cos(th), np.sin(th), np.zeros(f)], axis=1)
    frames = np.stack([c + 0.5 * L * u, c - 0.5 * L * u], axis=1)
    s = _dipole_system()
    path = _write_xtc(tmp_path, frames)

    for mode in ("total", "mol"):
        out = models.dipole_corr(s, path, "All", mode=mode)
        want = L * L * np.cos(w * out["lag_times"])
        np.testing.assert_allclose(out["corr"], want, atol=5e-6)
        np.testing.assert_allclose(out["phi"][0], 1.0, atol=1e-6)
        # integral of cos(wt) to its first negative sample ~ 1/w
        assert out["corr_time"] == pytest.approx(1.0 / w, rel=0.1)


def test_dipole_corr_mol_float64_oracle(tmp_path):
    """Random 3-site waters: the molecular-dipole ACF matches a float64
    host recomputation (dipoles about each molecule's own COM)."""
    rng = np.random.default_rng(5)
    n_mol, f = 8, 6
    geom = np.array([[0.0, 0.0, 0.0], [0.096, 0.0, 0.0],
                     [-0.024, 0.093, 0.0]], np.float64)
    q = np.array([-0.8, 0.4, 0.4])
    m = np.array([16.0, 1.0, 1.0])
    topo = Topology.from_columns(
        resnum=np.repeat(np.arange(1, n_mol + 1), 3),
        resname=np.array(["SOL"] * (3 * n_mol)),
        atomname=np.array(["OW", "HW1", "HW2"] * n_mol),
        atomnum=np.arange(1, 3 * n_mol + 1),
        mass=np.tile(m.astype(np.float32), n_mol),
        charge=np.tile(q.astype(np.float32), n_mol),
    )
    topo.set_bonds_from_pairs(
        [(3 * k, 3 * k + 1) for k in range(n_mol)]
        + [(3 * k, 3 * k + 2) for k in range(n_mol)])
    s = System("w", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.zeros((3 * n_mol, 3), np.float32))
    s.group_create_from_ranges("W", [(0, 3 * n_mol - 1)])

    whole = []
    for _ in range(f):
        centers = rng.uniform(0.2, 3.8, (n_mol, 3))
        rots = []
        for k in range(n_mol):
            a = rng.normal(size=(3, 3))
            qr, _ = np.linalg.qr(a)
            rots.append(geom @ qr.T + centers[k])
        whole.append(np.concatenate(rots))
    whole = np.asarray(whole)
    wrapped = np.mod(whole, BOX.astype(np.float64))
    path = _write_xtc(tmp_path, wrapped.astype(np.float32))

    out = models.dipole_corr(s, path, "W", mode="mol")

    mu = np.zeros((f, n_mol, 3))
    for fr in range(f):
        for k in range(n_mol):
            x = whole[fr, 3 * k: 3 * k + 3]
            com = (m[:, None] * x).sum(0) / m.sum()
            mu[fr, k] = (q[:, None] * (x - com)).sum(0)
    want = np.zeros(f)
    for lag in range(f):
        dots = (mu[: f - lag] * mu[lag:]).sum(-1).mean(-1)
        want[lag] = dots.mean()
    np.testing.assert_allclose(out["corr"], want, atol=1e-6)


def test_dipole_corr_charged_molecule_origin_free(tmp_path):
    """A net-charged molecule's mu (about its own COM) is translation
    invariant: shifting + rewrapping the trajectory changes nothing."""
    f = 5
    c = np.array([2.0, 2.0, 2.0])
    rng = np.random.default_rng(2)
    u = rng.normal(size=(f, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    frames = np.stack([c + 0.15 * u, c - 0.15 * u], axis=1)
    s = _dipole_system(charges=(0.7, 0.3))
    p1 = _write_xtc(tmp_path, frames, name="a.xtc")
    p2 = _write_xtc(tmp_path,
                    np.mod(frames + np.array([3.7, 0.2, 1.9]), BOX),
                    name="b.xtc")
    a = models.dipole_corr(s, p1, "All", mode="mol")
    b = models.dipole_corr(s, p2, "All", mode="mol")
    np.testing.assert_allclose(a["corr"], b["corr"], atol=5e-6)


def test_debye_bridge_closed_form():
    """phi = exp(-t/tau) through the Fourier-Laplace trapezoid must
    reproduce eps(w) = 1 + (eps_s - 1)/(1 + i w tau)."""
    from groan_rs_tpu.models.pipeline import _debye_eps

    tau, eps_s = 4.0, 80.0
    t = np.linspace(0.0, 60.0 * tau, 40000)
    phi = np.exp(-t / tau)
    w = np.geomspace(0.01 / tau, 3.0 / tau, 12)
    got = _debye_eps(phi, t, w, eps_s)
    want = 1.0 + (eps_s - 1.0) / (1.0 + 1j * w * tau)
    np.testing.assert_allclose(got.real, want.real, rtol=2e-3)
    np.testing.assert_allclose(-got.imag, -want.imag, rtol=2e-3, atol=1e-4)


def test_dielectric_spectrum_resonance(tmp_path):
    """A rotating dipole makes the loss peak at the rotation frequency."""
    f, L = 256, 0.2
    w0 = 2.0 * np.pi / 16.0
    c = np.array([2.0, 2.0, 2.0])
    th = w0 * np.arange(f)
    u = np.stack([np.cos(th), np.sin(th), np.zeros(f)], axis=1)
    frames = np.stack([c + 0.5 * L * u, c - 0.5 * L * u], axis=1)
    s = _dipole_system()
    path = _write_xtc(tmp_path, frames)
    out = models.dielectric_spectrum(s, path, "All", n_freq=200)
    peak = out["omega"][int(np.argmax(np.abs(out["eps_imag"])))]
    assert peak == pytest.approx(w0, rel=0.15)
    assert out["eps_static"] > 1.0


def test_dielectric_spectrum_rejects_nonuniform():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    trr = os.path.join(TF, "short_trajectory.trr")
    with pytest.raises(ParallelError):
        models.dielectric_spectrum(s, trr, "all")


# ------------------------------------------------------------- densorder

def _slab_system(n):
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    topo.atomname = StrColumn(values=np.asarray(["X"] * n))
    topo.mass = np.ones(n, np.float32)
    topo.has_mass = np.ones(n, bool)
    s = System("slab", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def _slab_frame(z_lo, z_hi, bins, box_len, per_bin=4):
    """Atoms at occupied-slab bin centers between z_lo and z_hi."""
    width = box_len / bins
    lo_bin = int(round(z_lo / width))
    hi_bin = int(round(z_hi / width))
    zs = (np.arange(lo_bin, hi_bin) + 0.5) * width
    pts = []
    for z in zs:
        for k in range(per_bin):
            pts.append([0.5 + k, 2.0, z])
    return np.asarray(pts, np.float64)


def test_densorder_exact_slab_edges(tmp_path):
    """A flat slab over z in [1, 3) in a 4 nm box, 40 bins: the
    half-max crossings interpolate to exactly 1.0 and 3.0 nm."""
    bins = 40
    pts = _slab_frame(1.0, 3.0, bins, 4.0)
    s = _slab_system(len(pts))
    path = _write_xtc(tmp_path, pts[None])
    out = models.densorder(s, path, "All", bins=bins, mode="number")
    assert out["lower"][0] == pytest.approx(1.0, abs=1e-3)
    assert out["upper"][0] == pytest.approx(3.0, abs=1e-3)
    assert out["thickness"][0] == pytest.approx(2.0, abs=2e-3)


def test_densorder_npt_scaling(tmp_path):
    """The same fractional slab in a 1.5x larger box lands at 1.5x the
    positions (per-frame box lengths, not the starting box)."""
    bins = 40
    pts0 = _slab_frame(1.0, 3.0, bins, 4.0)
    pts1 = pts0 * 1.5
    boxes = np.array([[4.0, 4.0, 4.0], [6.0, 6.0, 6.0]], np.float32)
    s = _slab_system(len(pts0))
    path = _write_xtc(tmp_path, np.stack([pts0, pts1]), box=boxes)
    out = models.densorder(s, path, "All", bins=bins, mode="number")
    np.testing.assert_allclose(out["lower"], [1.0, 1.5], atol=2e-3)
    np.testing.assert_allclose(out["upper"], [3.0, 4.5], atol=2e-3)
    np.testing.assert_allclose(out["box_len"], [4.0, 6.0], atol=1e-5)


def test_densorder_edge_touching_slab(tmp_path):
    """A slab starting at z = 0 pins the lower interface to the first
    slab center instead of extrapolating."""
    bins = 40
    pts = _slab_frame(0.0, 2.0, bins, 4.0)
    s = _slab_system(len(pts))
    path = _write_xtc(tmp_path, pts[None])
    out = models.densorder(s, path, "All", bins=bins, mode="number")
    assert out["lower"][0] == pytest.approx(0.5 / bins * 4.0, abs=1e-4)
    assert out["upper"][0] == pytest.approx(2.0, abs=2e-3)


def test_densorder_membrane_fixture():
    """The membrane bilayer: stable interfaces bracketing the box
    center, thickness within physical bounds."""
    s = System.from_file(os.path.join(TF, "example.tpr"))
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = models.densorder(s, xtc, "@membrane", bins=50, mode="mass")
    assert np.isfinite(out["thickness"]).all()
    assert (out["thickness"] > 2.0).all() and (out["thickness"] < 8.0).all()
    assert (out["lower"] < out["upper"]).all()
    assert out["lower_sigma"] < 0.5 and out["upper_sigma"] < 0.5
