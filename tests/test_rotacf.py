"""Rotational autocorrelation (surpass — gmx rotacf -P 1/2; absent
from the reference).

Pins `models.rotacf` against the exact constant-angular-velocity
construction (C_1 = cos(w tau), C_2 = P2(cos(w tau))), a float64
oracle on random vectors, and the DeviceTrajectory layout paths.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.models import TrajectoryAnalysis

from test_rmsf import _system, _write_xtc, BOX

pytestmark = pytest.mark.device_parity


def _spinner(tmp_path, f=24, omega=0.31):
    """One bond rotating in the xy plane at constant angular velocity,
    one static bond along z."""
    theta = omega * np.arange(f)
    center = np.asarray(BOX, np.float64) / 2
    frames = np.zeros((f, 4, 3), np.float32)
    frames[:, 0] = center + 0.5 * np.stack(
        [np.cos(theta), np.sin(theta), np.zeros(f)], axis=1)
    frames[:, 1] = center
    frames[:, 2] = center + [0.0, 0.0, 0.7]
    frames[:, 3] = center + [0.3, 0.3, 0.0]
    path = str(tmp_path / "spin.xtc")
    _write_xtc(path, frames)
    s = _system(4, np.ones(4, np.float32), frames[0])
    return s, path, theta


def test_rotacf_constant_angular_velocity(tmp_path):
    s, path, theta = _spinner(tmp_path)
    f, omega = len(theta), theta[1] - theta[0]
    tau = np.arange(f)

    lag_times, c1 = models.rotacf(s, path, [[0, 1]], order=1)
    np.testing.assert_allclose(c1, np.cos(omega * tau), atol=2e-3)
    np.testing.assert_allclose(lag_times, np.arange(f, dtype=float))

    _, c2 = models.rotacf(s, path, [[0, 1]], order=2)
    np.testing.assert_allclose(
        c2, 1.5 * np.cos(omega * tau) ** 2 - 0.5, atol=2e-3)

    # a static vector decorrelates never: C == 1 at every lag
    _, cs = models.rotacf(s, path, [[2, 1]], order=2)
    np.testing.assert_allclose(cs, 1.0, atol=1e-5)


def test_rotacf_f64_oracle_random(tmp_path):
    rng = np.random.default_rng(7)
    f, k = 12, 9
    frames = (rng.uniform(-1, 1, size=(f, 2 * k, 3)) * 0.8
              + np.asarray(BOX) / 2).astype(np.float32)
    path = str(tmp_path / "rnd.xtc")
    _write_xtc(path, frames)
    s = _system(2 * k, np.ones(2 * k, np.float32), frames[0])
    pairs = np.stack([np.arange(k), np.arange(k, 2 * k)], axis=1)
    _, c2 = models.rotacf(s, path, pairs, order=2)

    q = np.round(np.asarray(frames, np.float64) * 1e4) / 1e4
    d = q[:, :k] - q[:, k:]
    u = d / np.linalg.norm(d, axis=-1, keepdims=True)
    expect = np.empty(f)
    for lag in range(f):
        dots = np.sum(u[lag:] * u[: f - lag], axis=-1)
        expect[lag] = (1.5 * dots**2 - 0.5).mean()
    np.testing.assert_allclose(c2, expect, atol=2e-4)


def test_rotacf_layouts_and_errors(tmp_path):
    s, path, _ = _spinner(tmp_path)
    # resident layout equality (whole-system ship)
    dt = TrajectoryAnalysis(s).runner(ship="all").load_device(path)
    _, by_file = models.rotacf(s, path, [[0, 1]], order=2)
    _, by_dt = models.rotacf(s, dt, [[0, 1]], order=2)
    np.testing.assert_allclose(by_dt, by_file, rtol=1e-6, atol=1e-7)
    # a group-limited trajectory missing a pair atom raises
    s.group_create_from_ranges("Pair23", [(2, 3)])
    dt2 = TrajectoryAnalysis(s).runner(group="Pair23").load_device(path)
    with pytest.raises(ParallelError, match="layout"):
        models.rotacf(s, dt2, [[0, 1]])

    with pytest.raises(GroupError, match=r"\[K, 2\]"):
        models.rotacf(s, path, [[0, 1, 2]])
    with pytest.raises(GroupError, match="outside"):
        models.rotacf(s, path, [[0, 99]])
    with pytest.raises(GroupError, match="order"):
        models.rotacf(s, path, [[0, 1]], order=3)
    with pytest.raises(ParallelError, match="lags"):
        models.rotacf(s, path, [[0, 1]], lags=[999])
