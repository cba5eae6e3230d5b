"""Density of states + diffusion coefficients (surpass analyses).

`models.dos`: gmx dos semantics — S(nu) = (2/(kB T)) FT of the
mass-weighted total VACF, discrete Parseval identity
integral(S dnu) == 3N exact at the measured temperature, Green-Kubo D
from the unweighted VACF.  `models.diffusion`: gmx msd's Einstein fit
over a restricted lag window.  Pinned by the exact degrees-of-freedom
identity, on-grid spectral-peak placement, closed-form constant-VACF
integrals, equipartition temperature recovery, and closed-form fit
constructions.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.io.traj import TrrWriter
from groan_rs_tpu.models.pipeline import _BOLTZ
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity


def _make_system(n=32, box_len=50.0, seed=5):
    rng = np.random.default_rng(seed)
    topo = Topology.from_columns(
        resnum=np.arange(1, n + 1),
        resname=np.array(["TST"] * n),
        atomname=np.array(["C"] * n),
        atomnum=np.arange(1, n + 1),
        mass=rng.uniform(1.0, 40.0, size=n).astype(np.float32),
    )
    s = System("dos", topo, simbox=SimBox.from_lengths(*([box_len] * 3)),
               positions=rng.uniform(5, box_len - 5, (n, 3)).astype(np.float32))
    s.group_create_from_ranges("A", [(0, n - 1)])
    return s, rng


def _write_trr(tmp_path, s, vel_frames, dt_ps=0.5, name="v.trr",
               pos_frames=None):
    trr = str(tmp_path / name)
    w = TrrWriter(s, trr)
    for i, v in enumerate(vel_frames):
        if pos_frames is not None:
            s.positions = pos_frames[i].astype(np.float32)
        s.velocities = v.astype(np.float32)
        s.has_velocity = np.ones(s.get_n_atoms(), bool)
        s.set_step(i)
        s.set_time(i * dt_ps)
        w.write_frame()
    w.close()
    return trr


def test_dos_degrees_of_freedom_identity(tmp_path):
    """integral(S dnu) == 3N exactly (discrete Parseval at measured T),
    for arbitrary velocity content."""
    s, rng = _make_system(n=24)
    frames = [rng.normal(0, 0.5, (24, 3)) for _ in range(16)]
    trr = _write_trr(tmp_path, s, frames)
    out = models.dos(s, trr, "A")
    assert out["n_atoms"] == 24
    np.testing.assert_allclose(out["dof"], 3 * 24, rtol=1e-5)
    assert out["T"] > 0


def test_dos_equipartition_temperature(tmp_path):
    """Velocities scaled so sum(m v^2) == 3 N kB T0 in frame 0 ->
    measured T equals the VACF-frame-average of that construction."""
    s, rng = _make_system(n=16)
    m = np.asarray(s.topology.mass, np.float64)
    t0 = 300.0
    frames = []
    for _ in range(12):
        v = rng.normal(0, 1, (16, 3))
        scale = np.sqrt(3 * 16 * _BOLTZ * t0 / (m[:, None] * v * v).sum())
        frames.append(v * scale)          # sum(m v^2) == 3 N kB T0 exactly
    trr = _write_trr(tmp_path, s, frames)
    out = models.dos(s, trr, "A", temperature=None)
    np.testing.assert_allclose(out["T"], t0, rtol=5e-4)  # f32 wire
    np.testing.assert_allclose(out["dof"], 3 * 16, rtol=1e-5)


def test_dos_spectral_peak_on_grid(tmp_path):
    """v(t) = A cos(omega t) with omega exactly on the even-extension
    FFT grid -> DoS concentrates in that single frequency bin."""
    s, _ = _make_system(n=8)
    length = 16
    dt_ps = 0.5
    m_ext = 2 * length - 2                       # even-extension length
    j_peak = 5
    nu0 = j_peak / (m_ext * dt_ps)               # on-grid frequency
    direction = np.tile(np.array([1.0, 0.0, 0.0]), (8, 1))
    frames = [0.3 * np.cos(2 * np.pi * nu0 * (i * dt_ps)) * direction
              for i in range(length)]
    trr = _write_trr(tmp_path, s, frames, dt_ps=dt_ps)
    out = models.dos(s, trr, "A")
    np.testing.assert_allclose(out["nu"][j_peak], nu0, rtol=1e-12)
    # cosine autocorrelation over finite origins is cos(2 pi nu0 tau)
    # up to edge terms; the peak bin must dominate the spectrum
    mags = np.abs(out["dos"])
    assert np.argmax(mags) == j_peak
    others = np.delete(mags, j_peak)
    assert mags[j_peak] > 5 * others.max()


def test_dos_green_kubo_constant_velocity(tmp_path):
    """Constant velocities: unweighted VACF is flat at mean(u^2), so
    D = mean(u^2) * t_max / 3 (trapezoid is exact for a constant)."""
    s, rng = _make_system(n=10)
    u = rng.normal(0, 0.2, (10, 3))
    length, dt_ps = 9, 0.25
    trr = _write_trr(tmp_path, s, [u] * length, dt_ps=dt_ps)
    out = models.dos(s, trr, "A")
    u32 = u.astype(np.float32).astype(np.float64)
    want = (u32 * u32).sum(1).mean() * (length - 1) * dt_ps / 3.0
    np.testing.assert_allclose(out["D"], want * 1e-2, rtol=1e-5)


def test_dos_errors(tmp_path):
    s, rng = _make_system(n=4)
    trr = _write_trr(tmp_path, s, [rng.normal(size=(4, 3))] * 2)
    with pytest.raises(ParallelError, match="at least 3"):
        models.dos(s, trr, "A")
    s.group_create_from_indices("E", np.array([], np.int64))
    with pytest.raises(GroupError, match="empty"):
        models.dos(s, trr, "E")


def test_diffusion_fit_window_and_units(tmp_path):
    """Ballistic motion: MSD(tau) = mean(u^2) tau^2.  The restricted-
    window least-squares line is computed in closed form from the
    analytic curve and must match slope/intercept/D exactly."""
    s, rng = _make_system(n=12, box_len=200.0)
    u = rng.normal(0, 0.05, (12, 3))
    length, dt_ps = 20, 1.0
    base = np.asarray(s.positions, np.float64)
    pos = [base + u * (i * dt_ps) for i in range(length)]
    vel = [np.zeros((12, 3))] * length
    trr = _write_trr(tmp_path, s, vel, dt_ps=dt_ps, pos_frames=pos)

    out = models.diffusion(s, trr, "A", fit_range=(0.2, 0.8))
    t = out["lag_times"]
    # analytic MSD from the f32 positions actually written
    u32 = (pos[1] - pos[0]).astype(np.float32).astype(np.float64) / dt_ps
    y = (u32 * u32).sum(1).mean() * t * t
    np.testing.assert_allclose(out["msd"], y, rtol=5e-3, atol=1e-4)
    mask = (t >= 0.2 * t[-1]) & (t <= 0.8 * t[-1])
    a = np.stack([t[mask], np.ones(mask.sum())], 1)
    (slope, icpt), *_ = np.linalg.lstsq(a, y[mask], rcond=None)
    np.testing.assert_allclose(out["slope"], slope, rtol=5e-3)
    np.testing.assert_allclose(out["D"], slope / 6 * 1e-2, rtol=5e-3)
    np.testing.assert_allclose(out["D_1e5"], out["D"] * 1e5, rtol=1e-12)
    assert (np.asarray(out["fit_mask"]) == mask).all()

    with pytest.raises(ParallelError, match="fit_range"):
        models.diffusion(s, trr, "A", fit_range=(0.9, 0.2))


def test_dos_reference_trr_rejects_nonuniform_grid():
    """The reference corpus TRRs are irregularly subsampled (frame times
    0, 120, 160, 240 ... ps): dos must refuse them with the documented
    resampling guidance instead of silently mis-gridding the FFT —
    exercising the real TRR velocity decode path on the way."""
    import os

    TF = "/root/reference/test_files"
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    with pytest.raises(ParallelError, match="uniform frame-time grid"):
        models.dos(s, os.path.join(TF, "short_trajectory.trr"), "Protein")
