"""Velocity observables on the batched fast path (TRR x/v/f per frame,
reference trr_io.rs:30): kinetic energy / temperature / custom velocity
steps ride the engine like any observable, with device results matching a
float64 host recomputation."""

import os

import numpy as np
import pytest

from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
KB = 0.008314462618


@pytest.fixture(scope="module")
def tpr_sys():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    return s


def _mesh1():
    import jax

    from groan_rs_tpu.parallel.engine import make_mesh

    return make_mesh(1, 1, devices=jax.devices()[:1])


def _host_series(system, trr, group):
    """Float64 per-frame KE of `group` straight from the TRR batches."""
    from groan_rs_tpu.io.traj import traj_iter

    idx = system.group_indices(group)
    m = np.asarray(system.topology.mass[idx], np.float64)
    kes = []
    has_v = []
    for fb in traj_iter(system, trr, batch_size=4).batches(prefetch=False):
        v = np.asarray(fb.velocities, np.float64)[:, idx, :]
        kes.append(0.5 * np.sum(m[None, :] * np.sum(v * v, axis=-1), axis=-1))
        has_v.append(np.asarray(fb.has_v))
    return np.concatenate(kes), np.concatenate(has_v)


def test_kinetic_energy_parity(tpr_sys):
    trr = os.path.join(TF, "short_trajectory.trr")
    s = tpr_sys.copy()
    pipe = (TrajectoryAnalysis(s, mesh=_mesh1())
            .add_kinetic_energy("Protein", name="ke")
            .add_temperature("Protein", name="temp")
            .add_com("Protein", name="com"))
    out = pipe.runner().run(trr, batch_size=4)
    ke_host, has_v = _host_series(s, trr, "Protein")
    assert out["ke"].shape == ke_host.shape
    np.testing.assert_allclose(np.asarray(out["ke"], np.float64), ke_host,
                               rtol=1e-5)
    # frames without velocities decode v=0 -> KE exactly 0
    assert (np.asarray(out["ke"])[~has_v] == 0).all()
    # temperature is the same series rescaled by 2/(3N kB)
    n = s.group_indices("Protein").shape[0]
    np.testing.assert_allclose(np.asarray(out["temp"], np.float64),
                               ke_host * 2.0 / (3.0 * n * KB), rtol=1e-5)
    # positions observables still ride along
    assert out["com"].shape == (ke_host.shape[0], 3)


def test_custom_velocity_step(tpr_sys):
    import jax.numpy as jnp

    trr = os.path.join(TF, "short_trajectory.trr")
    s = tpr_sys.copy()
    pipe = (TrajectoryAnalysis(s, mesh=_mesh1())
            .add_velocity_step(
                "vmax", lambda pos, vel, boxes, mask:
                jnp.max(jnp.linalg.norm(vel, axis=-1), axis=-1)))
    out = pipe.runner().run(trr, batch_size=4)
    from groan_rs_tpu.io.traj import traj_iter

    host = []
    for fb in traj_iter(s, trr, batch_size=4).batches(prefetch=False):
        host.append(np.linalg.norm(fb.velocities, axis=-1).max(axis=-1))
    np.testing.assert_allclose(np.asarray(out["vmax"]),
                               np.concatenate(host), rtol=1e-6)


def test_velocity_needs_trr(tpr_sys):
    pipe = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
            .add_kinetic_energy("Protein"))
    with pytest.raises(ParallelError):
        pipe.runner().run(os.path.join(TF, "short_trajectory.xtc"),
                          batch_size=4)


def test_velocity_oneshot_matches_streamed(tpr_sys):
    trr = os.path.join(TF, "short_trajectory.trr")

    def run(budget):
        os.environ["GROAN_ONESHOT_BYTES"] = str(budget)
        try:
            pipe = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
                    .add_kinetic_energy("Protein", name="ke"))
            return pipe.runner().run(trr, batch_size=4)
        finally:
            del os.environ["GROAN_ONESHOT_BYTES"]

    a, b = run(0), run(640_000_000)
    np.testing.assert_allclose(np.asarray(a["ke"]), np.asarray(b["ke"]),
                               rtol=0, atol=1e-3)


def test_velocity_device_resident(tpr_sys):
    """Velocities ride DeviceTrajectory too: load once (positions + vel
    channels in HBM), re-analyze at compute speed, equal to streamed."""
    trr = os.path.join(TF, "short_trajectory.trr")
    pipe = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
            .add_kinetic_energy("Protein", name="ke")
            .add_com("Protein", name="com"))
    runner = pipe.runner()
    streamed = runner.run(trr, batch_size=4)
    dt = runner.load_device(trr, batch_size=4)
    assert len(dt.aux) == 1
    resident = runner.run(dt, batch_size=4)
    np.testing.assert_allclose(np.asarray(streamed["ke"]),
                               np.asarray(resident["ke"]), rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(streamed["com"]),
                               np.asarray(resident["com"]), rtol=0,
                               atol=2e-6)


def test_resident_without_vel_rejected(tpr_sys):
    """A positions-only DeviceTrajectory can't serve a velocity pipe."""
    xtc = os.path.join(TF, "short_trajectory.xtc")
    plain = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
             .add_com("Protein", name="com"))
    dt = plain.runner().load_device(xtc, batch_size=4)
    vel_pipe = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
                .add_kinetic_energy("Protein", name="ke"))
    with pytest.raises(ParallelError):
        vel_pipe.runner().run(dt, batch_size=4)


def test_velocity_dt_serves_position_only_runner(tpr_sys):
    """A velocity-loaded DeviceTrajectory carries MORE channels than a
    position-only step needs: the extra channels are ignored by NAME
    (aux_names), so one TRR load serves mixed sweeps."""
    from groan_rs_tpu.models.pipeline import run_many

    trr = os.path.join(TF, "short_trajectory.trr")
    vel_pipe = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
                .add_kinetic_energy("Protein", name="ke"))
    vel_runner = vel_pipe.runner(ship="all")
    dt = vel_runner.load_device(trr, batch_size=4)
    assert dt.aux_names == ("vel",)

    pos_pipe = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
                .add_com("Protein", name="com"))
    pos_runner = pos_pipe.runner(ship="all")
    resident = pos_runner.run(dt, batch_size=4)
    streamed = pos_runner.run(trr, batch_size=4)
    np.testing.assert_allclose(np.asarray(streamed["com"]),
                               np.asarray(resident["com"]),
                               rtol=0, atol=2e-6)

    # mixed sweep over the ONE velocity-loaded trajectory
    many = run_many([vel_runner, pos_runner], dt, batch_size=4)
    np.testing.assert_allclose(np.asarray(many[1]["com"]),
                               np.asarray(resident["com"]),
                               rtol=0, atol=0)
    solo_ke = vel_runner.run(dt, batch_size=4)
    np.testing.assert_array_equal(np.asarray(many[0]["ke"]),
                                  np.asarray(solo_ke["ke"]))
