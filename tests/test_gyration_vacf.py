"""Radius of gyration + velocity autocorrelation (surpass analyses).

Gyration: `gmx gyrate` semantics — minimum-image displacements to the
group's refined Bai-Breen center, mass-weighted by default — pinned
against a float64 host oracle on the reference fixture corpus.
VACF: `gmx velacc` semantics on TRR velocities through the
device-resident path, pinned against a float64 host oracle.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.ops import msd as msd_ops
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def host_refined_center(p, box, w=None):
    """Float64 refined Bai-Breen center (iterators.rs:1237-1266)."""
    p = np.asarray(p, np.float64)
    box = np.asarray(box, np.float64)
    w = np.ones(len(p)) if w is None else np.asarray(w, np.float64)
    theta = np.mod(p, box) * (2 * np.pi / box)
    xi = (w[:, None] * np.cos(theta)).sum(0)
    zeta = (w[:, None] * np.sin(theta)).sum(0)
    est = (np.arctan2(-zeta, -xi) + np.pi) * box / (2 * np.pi)
    d = p - est
    d -= box * np.round(d / box)
    return (w[:, None] * (est + d)).sum(0) / w.sum()


def host_gyration(p, box, w=None):
    p = np.asarray(p, np.float64)
    box = np.asarray(box, np.float64)
    w = np.ones(len(p)) if w is None else np.asarray(w, np.float64)
    c = host_refined_center(p, box, w)
    d = p - c
    d -= box * np.round(d / box)
    return float(np.sqrt((w * (d**2).sum(-1)).sum() / w.sum()))


def test_gyration_fixture_parity():
    from groan_rs_tpu.io import native

    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = (TrajectoryAnalysis(s)
           .add_gyration("Protein", name="rg")
           .add_gyration("Protein", name="rg_cog", mass_weighted=False)
           .run(xtc, batch_size=4))

    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, b9, *_ = native.xtc_read_frames(xtc, offsets, natoms)
    idx = s.group_indices("Protein")
    w = np.asarray(s.topology.mass)[idx]
    for f in range(len(offsets)):
        box = b9[f][[0, 4, 8]]
        assert abs(out["rg"][f] - host_gyration(coords[f][idx], box, w)) < 2e-4
        assert abs(out["rg_cog"][f]
                   - host_gyration(coords[f][idx], box)) < 2e-4
    # a folded protein's Rg is a couple of nm at most — sanity band
    assert 0.5 < float(np.mean(out["rg"])) < 3.0


def test_gyration_known_value():
    # 4 points on a circle of radius r around a center: Rg == r exactly
    box = np.array([10.0, 10.0, 10.0], np.float32)
    r = 1.25
    c = np.array([5.0, 5.0, 5.0])
    pts = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0]]) + c
    topo = Topology(4)
    topo.atomnum = np.arange(1, 5, dtype=np.int64)
    topo.resnum = np.ones(4, np.int64)
    s = System("circle", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=pts.astype(np.float32))
    s.group_create_from_ranges("All4", [(0, 3)])
    import jax
    import jax.numpy as jnp

    fn = jax.jit(TrajectoryAnalysis(s)
                 .add_gyration("All4", name="rg", mass_weighted=False)
                 .step_fn(None))
    res = fn(jnp.asarray(pts.astype(np.float32))[None],
             jnp.asarray(box)[None], jnp.ones(1, bool))
    assert abs(float(res["rg"][0]) - r) < 1e-5


@pytest.fixture(scope="module")
def vel_trr(tmp_path_factory):
    from groan_rs_tpu.io import native

    rng = np.random.default_rng(21)
    f, k = 20, 30
    box = np.array([4.0, 4.0, 4.0], np.float32)
    pos = rng.uniform(0, 1, size=(f, k, 3)).astype(np.float32) * box
    # velocities: per-atom constant + noise, so C(tau) has structure
    base = rng.normal(size=(1, k, 3)).astype(np.float32) * 0.5
    vel = base + rng.normal(size=(f, k, 3)).astype(np.float32) * 0.3
    path = str(tmp_path_factory.mktemp("vacf") / "v.trr")
    b9 = np.diag(box).astype(np.float32).reshape(9)
    for i in range(f):
        native.trr_write_frame(path, k, i, i * 2.0, 0.0, b9,
                               x=pos[i], v=vel[i])
    return path, vel


def _vel_system(k, box=(4.0, 4.0, 4.0)):
    topo = Topology(k)
    topo.atomnum = np.arange(1, k + 1, dtype=np.int64)
    topo.resnum = np.arange(k, dtype=np.int64) + 1
    topo.mass = np.linspace(1.0, 16.0, k).astype(np.float32)
    topo.has_mass = np.ones(k, bool)
    s = System("vel", topo, simbox=SimBox.from_lengths(*box),
               positions=np.zeros((k, 3), np.float32))
    s.group_create_from_ranges("Sub", [(0, k - 2)])
    return s


def test_vacf_matches_host_oracle(vel_trr):
    path, vel = vel_trr
    s = _vel_system(vel.shape[1])
    lag_times, curve = models.vacf(s, path, "Sub")
    expect = msd_ops.lag_correlation_host_f64(
        vel[:, : vel.shape[1] - 1], np.arange(vel.shape[0]))
    np.testing.assert_allclose(curve, expect, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(lag_times, 2.0 * np.arange(vel.shape[0]))
    # C(0) is the mean squared speed — strictly positive
    assert curve[0] > 0

    # mass-weighted form
    _, curve_m = models.vacf(s, path, "Sub", mass_weighted=True)
    w = np.asarray(s.topology.mass)[: vel.shape[1] - 1]
    expect_m = msd_ops.lag_correlation_host_f64(
        vel[:, : vel.shape[1] - 1], np.arange(vel.shape[0]), weights=w)
    np.testing.assert_allclose(curve_m, expect_m, rtol=2e-4, atol=1e-5)


def test_vacf_resident_and_errors(vel_trr):
    path, vel = vel_trr
    s = _vel_system(vel.shape[1])

    # preloaded velocity-carrying DeviceTrajectory == filename path
    r = TrajectoryAnalysis(s).runner(group="Sub", velocities=True)
    dt = r.load_device(path)
    _, by_file = models.vacf(s, path, "Sub")
    _, by_dt = models.vacf(s, dt, "Sub")
    np.testing.assert_allclose(by_dt, by_file, rtol=1e-6, atol=1e-7)

    # a trajectory loaded WITHOUT the velocity channel must raise
    r2 = TrajectoryAnalysis(s).runner(group="Sub")
    dt2 = r2.load_device(path)
    with pytest.raises(ParallelError, match="velocity"):
        models.vacf(s, dt2, "Sub")
