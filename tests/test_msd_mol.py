"""Per-molecule COM MSD / diffusion (surpass — the `gmx msd -mol`
workload; absent from the reference).

Pins `models.msd_mol` against exact ballistic constructions (through
PBC wraps), mass-weighted-COM cancellation, invariance to a molecule
being split across the boundary at frame 0, a float64 end-to-end
oracle, and the TPR fixture's water molecules.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.system import System

from test_rmsf import BOX, _write_xtc

pytestmark = pytest.mark.device_parity


def _bonded_system(n_atoms, masses, bonds, ref):
    topo = Topology(n_atoms)
    topo.atomnum = np.arange(1, n_atoms + 1, dtype=np.int64)
    topo.resnum = np.arange(n_atoms, dtype=np.int64) + 1
    topo.mass = np.asarray(masses, np.float32)
    topo.has_mass = np.ones(n_atoms, bool)
    s = System("msdmol", topo,
               simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.asarray(ref, np.float32))
    for i, j in bonds:
        s.topology.add_bond(i, j)
    s.group_create_from_ranges("All", [(0, n_atoms - 1)])
    return s


def _oracle(frames, box, inv, wts, lags, m):
    """float64 unwrap -> COM -> per-molecule MSD."""
    p = np.asarray(frames, np.float64)
    b = np.asarray(box, np.float64)
    d = p[1:] - p[:-1]
    d -= b * np.round(d / b)
    u = np.concatenate([p[:1], p[:1] + np.cumsum(d, axis=0)], axis=0)
    wsum = np.zeros(m)
    np.add.at(wsum, inv, wts)
    com = np.zeros((u.shape[0], m, 3))
    for a_i, m_i in enumerate(inv):
        com[:, m_i] += u[:, a_i] * wts[a_i]
    com /= wsum[None, :, None]
    f = u.shape[0]
    out = np.zeros((len(lags), m))
    for li, lag in enumerate(lags):
        if lag == 0:
            continue
        disp = com[lag:] - com[:-lag] if lag else com * 0
        out[li] = (disp ** 2).sum(-1).mean(axis=0)
    return out


def test_ballistic_molecule_through_pbc(tmp_path):
    """One dimer drifts 0.9 nm/frame along x (wrapping several times);
    the other is static.  Per-molecule MSD is exactly (0.9 lag)^2 / 0."""
    f = 10
    v = 0.9
    lx = float(BOX[0])
    frames = np.zeros((f, 4, 3), np.float32)
    for t in range(f):
        x = (1.0 + v * t) % lx
        frames[t, 0] = (x, 2.0, 2.0)
        frames[t, 1] = ((x + 0.1) % lx, 2.0, 2.0)
        frames[t, 2] = (4.0, 4.0, 4.0)
        frames[t, 3] = (4.1, 4.0, 4.0)
    path = str(tmp_path / "bal.xtc")
    _write_xtc(path, frames)
    s = _bonded_system(4, [1.0, 1.0, 1.0, 1.0], [(0, 1), (2, 3)],
                       frames[0])
    out = models.msd_mol(s, path, "All", fit_range=(0.0, 1.0))
    assert out["n_molecules"] == 2
    lag = out["lag_times"]
    np.testing.assert_allclose(out["msd"][:, 0], (v * lag) ** 2,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["msd"][:, 1], 0.0, atol=1e-6)
    # D = slope / 6; slope of (v t)^2 fit is not linear, but molecule 2
    # is exactly 0
    assert out["D"][1] == pytest.approx(0.0, abs=1e-9)
    assert out["D"][0] > 0
    np.testing.assert_array_equal(out["first_atom"], [0, 2])


def test_mass_weighted_com_cancellation(tmp_path):
    """Two atoms of a molecule oscillate oppositely with a 2:1 mass
    ratio chosen so the COM never moves: COM MSD is exactly 0 while
    each atom's own MSD is not."""
    f = 8
    frames = np.zeros((f, 2, 3), np.float32)
    for t in range(f):
        a = 0.3 * np.sin(2 * np.pi * t / f)
        frames[t, 0] = (2.0 + a, 2.0, 2.0)         # mass 2
        frames[t, 1] = (3.0 - 2 * a, 2.0, 2.0)     # mass 1
    path = str(tmp_path / "osc.xtc")
    _write_xtc(path, frames)
    s = _bonded_system(2, [2.0, 1.0], [(0, 1)], frames[0])
    out = models.msd_mol(s, path, "All", fit_range=(0.0, 1.0))
    assert out["n_molecules"] == 1
    np.testing.assert_allclose(out["msd"][:, 0], 0.0, atol=1e-5)


def test_frame0_split_molecule_invariance(tmp_path):
    """A dimer straddling the x boundary at frame 0, translated rigidly:
    its COM MSD equals the rigid translation exactly (the constant
    lattice offset from independent atom unwrapping cancels)."""
    f = 6
    lx = float(BOX[0])
    step = 0.2
    frames = np.zeros((f, 2, 3), np.float32)
    for t in range(f):
        d = step * t
        frames[t, 0] = ((lx - 0.1 + d) % lx, 1.0, 1.0)
        frames[t, 1] = ((0.1 + d) % lx, 1.0, 1.0)
    path = str(tmp_path / "split.xtc")
    _write_xtc(path, frames)
    s = _bonded_system(2, [1.0, 1.0], [(0, 1)], frames[0])
    out = models.msd_mol(s, path, "All", fit_range=(0.0, 1.0))
    lag = out["lag_times"]
    np.testing.assert_allclose(out["msd"][:, 0], (step * lag) ** 2,
                               rtol=1e-4, atol=1e-5)


def test_random_walk_f64_oracle(tmp_path):
    rng = np.random.default_rng(23)
    f, na = 12, 9
    bonds = [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 8)]
    inv = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2])
    m = 3
    wts = rng.uniform(1.0, 16.0, na)
    base = rng.uniform(1.0, 4.0, size=(na, 3))
    steps = rng.normal(scale=0.15, size=(f, na, 3))
    steps[0] = 0
    frames = ((base[None] + np.cumsum(steps, axis=0))
              % np.asarray(BOX, np.float64)[None, None]).astype(np.float32)
    path = str(tmp_path / "rw.xtc")
    _write_xtc(path, frames)
    s = _bonded_system(na, wts, bonds, frames[0])
    out = models.msd_mol(s, path, "All", fit_range=(0.1, 0.9))
    lags = np.arange(f)
    want = _oracle(frames, np.asarray(BOX, np.float64), inv, wts, lags, m)
    np.testing.assert_allclose(out["msd"], want, rtol=5e-4, atol=5e-4)
    assert out["msd_mean"].shape == (f,)
    np.testing.assert_allclose(out["msd_mean"], want.mean(axis=1),
                               rtol=5e-4, atol=5e-4)


def test_dims_and_validation(tmp_path):
    f = 6
    frames = np.zeros((f, 2, 3), np.float32)
    for t in range(f):
        frames[t, 0] = (1.0 + 0.1 * t, 1.0 + 0.2 * t, 1.0)
        frames[t, 1] = (1.1 + 0.1 * t, 1.0 + 0.2 * t, 1.0)
    path = str(tmp_path / "d.xtc")
    _write_xtc(path, frames)
    s = _bonded_system(2, [1.0, 1.0], [(0, 1)], frames[0])
    full = models.msd_mol(s, path, "All", fit_range=(0.0, 1.0))
    x = models.msd_mol(s, path, "All", dims="x", fit_range=(0.0, 1.0))
    y = models.msd_mol(s, path, "All", dims="y", fit_range=(0.0, 1.0))
    z = models.msd_mol(s, path, "All", dims="z", fit_range=(0.0, 1.0))
    np.testing.assert_allclose(x["msd"] + y["msd"] + z["msd"],
                               full["msd"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(z["msd"], 0.0, atol=1e-6)
    with pytest.raises(ParallelError):
        models.msd_mol(s, path, "All", dims="xq")
    with pytest.raises(ParallelError):
        models.msd_mol(s, path, "All", fit_range=(0.9, 0.1))


def test_fixture_water(test_files):
    # all-atom fixture: real 3-site waters become one molecule each via
    # the TPR SETTLE entries
    s = System.from_file(os.path.join(test_files,
                                      "aa_membrane_peptide.tpr"))
    s.group_create("W", "@water")
    out = models.msd_mol(
        s, os.path.join(test_files, "aa_membrane_peptide.xtc"), "W")
    nw = len(s.group_indices("W")) // 3
    assert out["n_molecules"] == nw
    assert out["msd"].shape[1] == nw
    # liquid water: molecules diffuse measurably
    assert (out["msd"][-1] >= 0).all() and out["msd"][-1].max() > 0
    assert out["D_mean"] > 0

    # Martini single-bead waters: each bead is its own molecule, and
    # msd_mol degenerates to the per-atom MSD exactly
    sm = System.from_file(os.path.join(test_files, "example.tpr"))
    sm.group_create("W", "@water")
    outm = models.msd_mol(
        sm, os.path.join(test_files, "short_trajectory.xtc"), "W")
    assert outm["n_molecules"] == len(sm.group_indices("W"))
    lag_t, atom_msd = models.msd(
        sm, os.path.join(test_files, "short_trajectory.xtc"), "W")
    np.testing.assert_allclose(outm["msd_mean"], np.asarray(atom_msd),
                               rtol=2e-4, atol=2e-4)
