"""Ionic conductivity (surpass — `gmx current`; absent from the reference).

Pins `models.current` (Einstein-Helfand translational-dipole MSD on
device) with an exact opposite-drift construction through PBC, a float64
end-to-end oracle on a random charged walk, and the charged TPR fixture.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.io import native
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def _ion_system(charges, box):
    n = len(charges)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    topo.charge = np.asarray(charges, np.float64)
    topo.has_charge = np.ones(n, bool)
    s = System("ions", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("Ions", [(0, n - 1)])
    return s


def _write_xtc(tmp_path, frames, box, dt_ps=1.0):
    path = str(tmp_path / "ions.xtc")
    b9 = np.diag(np.asarray(box, np.float32)).reshape(9)
    for fidx, pos in enumerate(frames):
        native.xtc_write_frame(path, pos.shape[0], fidx, fidx * dt_ps, b9,
                               np.asarray(pos, np.float32), 1000.0)
    return path


def test_opposite_drift_exact_quadratic(tmp_path):
    """+1/-1 ions drifting apart through the box: M_J(t) = t (v+ - v-),
    so mj2(lag) = |v+ - v-|^2 lag^2 exactly, PBC crossings removed."""
    box = (2.0, 2.0, 2.0)
    f = 16
    vp = np.array([0.30, 0.0, 0.15])
    vm = np.array([-0.25, 0.10, 0.0])
    t = np.arange(f)[:, None]
    pos_p = np.array([0.5, 0.5, 0.5]) + t * vp
    pos_m = np.array([1.5, 1.5, 1.5]) + t * vm
    frames = np.mod(np.stack([pos_p, pos_m], axis=1), box)
    s = _ion_system([1.0, -1.0], box)
    path = _write_xtc(tmp_path, frames, box)

    out = models.current(s, path, "Ions", temperature=300.0)
    d = vp - vm
    lagt = np.arange(f, dtype=np.float64)
    np.testing.assert_allclose(out["mj2"], (d @ d) * lagt ** 2, rtol=5e-3,
                               atol=1e-4)
    assert out["net_charge"] == pytest.approx(0.0)
    assert out["volume"] == pytest.approx(8.0, rel=1e-5)


def test_matches_f64_oracle(tmp_path):
    rng = np.random.default_rng(17)
    n, f = 24, 40
    box = (3.0, 3.0, 3.0)
    charges = rng.choice([-1.0, 1.0], n)
    p0 = rng.uniform(0, 3, (n, 3))
    steps = rng.normal(size=(f - 1, n, 3)) * 0.2
    true = np.concatenate([p0[None], p0[None] + np.cumsum(steps, 0)])
    frames = np.mod(true, box).astype(np.float32)
    s = _ion_system(charges, box)
    path = _write_xtc(tmp_path, frames, box, dt_ps=2.0)

    temperature = 350.0
    out = models.current(s, path, "Ions", temperature=temperature)

    # float64 oracle on the file-quantized coordinates
    q = np.round(frames.astype(np.float64) * 1000) / 1000
    d = q[1:] - q[:-1]
    d -= box * np.round(d / np.asarray(box))
    u = np.concatenate([q[:1], q[:1] + np.cumsum(d, 0)])
    mj = np.einsum("fka,k->fa", u, charges)
    lags = np.arange(f)
    curve = np.array([
        ((mj[lag:] - mj[: f - lag]) ** 2).sum(1).mean() if lag else 0.0
        for lag in lags])
    t = 2.0 * lags.astype(np.float64)
    mask = (t >= 0.1 * t[-1]) & (t <= 0.5 * t[-1]) & (t > 0)
    a = np.stack([t[mask], np.ones(mask.sum())], axis=1)
    (slope, _), *_ = np.linalg.lstsq(a, curve[mask], rcond=None)
    e_c, kb_j = 1.602176634e-19, 1.380649e-23
    sigma = (slope * e_c ** 2 * 1e-6
             / (6.0 * kb_j * temperature * 27.0 * 1e-27))

    np.testing.assert_allclose(out["mj2"], curve, rtol=1e-3, atol=1e-5)
    assert out["slope"] == pytest.approx(slope, rel=2e-3)
    assert out["conductivity"] == pytest.approx(sigma, rel=2e-3)


def test_fixture_and_errors(tmp_path):
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s.group_create("Water", "@water")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.current(s, xtc, "Water", temperature=310.0,
                         fit_range=(0.0, 1.0))
    assert np.isfinite(out["conductivity"])
    assert out["net_charge"] == pytest.approx(0.0, abs=1e-6)
    assert out["mj2"][0] == 0.0

    with pytest.raises(ParallelError):
        models.current(s, xtc, "Water", fit_range=(0.5, 0.2))
    with pytest.raises(ParallelError):
        models.current(s, xtc, "Water", temperature=-5.0)

    # a structure file carries no charges
    s2 = System.from_file(os.path.join(TF, "aa_membrane_peptide.gro"))
    s2.group_create("W", "resname TIP3 SOL or name OW OH2")
    if int(s2.group_get_n_atoms("W")):
        with pytest.raises(GroupError):
            models.current(s2, xtc, "W")
