"""Mean-squared displacement (surpass — the reference has no MSD).

Pins `ops.msd` and `models.msd` against a float64 host oracle: unwrap
through periodic boundaries, all-origin averaging, exact quadratic law
for uniform drift, and layout handling for preloaded DeviceTrajectories.
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


def _wrapped_walk(n_frames=40, n_atoms=60, seed=5):
    """Random walk + strong drift that crosses the box many times."""
    rng = np.random.default_rng(seed)
    box = np.array([3.0, 4.0, 5.0], np.float32)
    p0 = rng.uniform(0, 1, size=(n_atoms, 3)).astype(np.float32) * box
    steps = (rng.normal(size=(n_frames - 1, n_atoms, 3)).astype(np.float32) * 0.05
             + np.array([0.4, -0.3, 0.6], np.float32))
    true = np.concatenate([p0[None], p0[None] + np.cumsum(steps, 0)], axis=0)
    wrapped = np.mod(true, box)
    boxes = np.broadcast_to(box, (n_frames, 3)).copy()
    return true, wrapped, boxes


def test_unwrap_recovers_true_path():
    true, wrapped, boxes = _wrapped_walk()
    u = np.asarray(msd_ops.unwrap_orthorhombic(wrapped, boxes))
    # unwrap anchors at wrapped[0]; the true path anchors at p0 = wrapped[0]
    np.testing.assert_allclose(u, true, atol=2e-3)


def test_msd_quadratic_for_uniform_drift():
    # pure drift v per frame: MSD(tau) = |v|^2 tau^2 exactly
    v = np.array([0.2, -0.1, 0.15], np.float64)
    box = np.array([2.0, 2.0, 2.0], np.float32)
    f, k = 30, 7
    t = np.arange(f)[:, None, None]
    true = (np.zeros((1, k, 3)) + 0.3) + t * v
    wrapped = np.mod(true, box).astype(np.float32)
    boxes = np.broadcast_to(box, (f, 3))
    u = msd_ops.unwrap_orthorhombic(wrapped, boxes)
    lags = np.arange(f)
    curve = np.asarray(msd_ops.msd_lags(u, lags))
    expect = (v @ v) * lags.astype(np.float64) ** 2
    np.testing.assert_allclose(curve, expect, rtol=1e-4, atol=1e-5)


def test_msd_matches_host_oracle():
    _, wrapped, boxes = _wrapped_walk(n_frames=50, n_atoms=30, seed=9)
    lags = np.array([0, 1, 2, 3, 5, 8, 13, 21, 34, 49])
    u = msd_ops.unwrap_orthorhombic(wrapped, boxes)
    curve = np.asarray(msd_ops.msd_lags(u, lags))
    expect = msd_ops.msd_host_f64(wrapped, boxes, lags)
    np.testing.assert_allclose(curve, expect, rtol=2e-4, atol=1e-5)


@pytest.fixture(scope="module")
def walk_xtc(tmp_path_factory):
    from groan_rs_tpu.io import native

    _, wrapped, boxes = _wrapped_walk(n_frames=24, n_atoms=60, seed=3)
    path = str(tmp_path_factory.mktemp("msd") / "walk.xtc")
    for fidx in range(wrapped.shape[0]):
        b9 = np.diag(boxes[fidx]).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, wrapped.shape[1], fidx * 100,
                               fidx * 2.0, b9, wrapped[fidx], 1000.0)
    return path, wrapped, boxes


def _walk_system(n_atoms, box):
    topo = Topology(n_atoms)
    topo.atomnum = np.arange(1, n_atoms + 1, dtype=np.int64)
    topo.resnum = np.arange(n_atoms, dtype=np.int64) + 1
    s = System("walk", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.zeros((n_atoms, 3), np.float32))
    s.group_create_from_ranges("Half", [(0, n_atoms // 2 - 1)])
    return s


def test_msd_end_to_end_xtc(walk_xtc):
    path, wrapped, boxes = walk_xtc
    n_atoms = wrapped.shape[1]
    s = _walk_system(n_atoms, boxes[0])
    lag_times, curve = models.msd(s, path, "Half")
    # oracle on the quantized (precision 1000) coordinates the file stores
    q = np.round(np.asarray(wrapped[:, : n_atoms // 2], np.float64) * 1000.0) / 1000.0
    expect = msd_ops.msd_host_f64(q, boxes, np.arange(wrapped.shape[0]))
    np.testing.assert_allclose(curve, expect, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(lag_times, 2.0 * np.arange(wrapped.shape[0]))
    assert curve[0] == 0.0


def test_msd_device_trajectory_paths(walk_xtc):
    path, wrapped, boxes = walk_xtc
    s = _walk_system(wrapped.shape[1], boxes[0])

    # group-layout resident trajectory == filename path
    r = TrajectoryAnalysis(s).runner(group="Half")
    dt_group = r.load_device(path)
    _, by_file = models.msd(s, path, "Half")
    _, by_group_dt = models.msd(s, dt_group, "Half")
    np.testing.assert_allclose(by_group_dt, by_file, rtol=1e-6, atol=1e-7)

    # full-layout resident trajectory: group columns taken via the lut
    r_all = TrajectoryAnalysis(s).runner(ship="all")
    dt_all = r_all.load_device(path)
    _, by_all_dt = models.msd(s, dt_all, "Half")
    np.testing.assert_allclose(by_all_dt, by_file, rtol=1e-6, atol=1e-7)

    # a layout missing group atoms must raise, not misread
    s.group_create_from_ranges("Other",
                               [(wrapped.shape[1] - 4, wrapped.shape[1] - 1)])
    with pytest.raises(ParallelError):
        models.msd(s, dt_group, "Other")

    # out-of-range lags rejected
    with pytest.raises(ParallelError):
        models.msd(s, dt_group, "Half", lags=[0, 999])


def test_msd_fixture_protein():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    lag_times, curve = models.msd(s, xtc, "Protein", lags=[0, 1, 2, 5, 10])
    # float64 host oracle on the decoded full frames
    from groan_rs_tpu.io import native

    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, b9, *_ = native.xtc_read_frames(xtc, offsets, natoms)
    idx = s.group_indices("Protein")
    expect = msd_ops.msd_host_f64(coords[:, idx], b9[:, [0, 4, 8]],
                                  [0, 1, 2, 5, 10])
    np.testing.assert_allclose(curve, expect, rtol=2e-3, atol=1e-4)
    assert np.all(np.diff(lag_times) > 0)


def test_msd_dims_lateral(walk_xtc):
    """dims='xy' + dims='z' decompose the full MSD exactly; the
    diffusion fit divides by 2*len(dims)."""
    path, wrapped, boxes = walk_xtc
    n_atoms = wrapped.shape[1]
    s = _walk_system(n_atoms, boxes[0])
    _, full = models.msd(s, path, "Half")
    _, lat = models.msd(s, path, "Half", dims="xy")
    _, z = models.msd(s, path, "Half", dims="z")
    np.testing.assert_allclose(lat + z, full, rtol=1e-5, atol=1e-6)
    assert (lat[1:] <= full[1:] + 1e-9).all()

    # the slopes decompose like the curves: 6 D3 = 4 D_xy + 2 D_z
    d3 = models.diffusion(s, path, "Half")
    d2 = models.diffusion(s, path, "Half", dims="xy")
    dz = models.diffusion(s, path, "Half", dims="z")
    assert 6 * d3["D_1e5"] == pytest.approx(
        4 * d2["D_1e5"] + 2 * dz["D_1e5"], rel=1e-6)
    assert d2["D_1e5"] > 0 and dz["D_1e5"] > 0

    from groan_rs_tpu.errors import ParallelError
    with pytest.raises(ParallelError):
        models.msd(s, path, "Half", dims="xq")
    with pytest.raises(ParallelError):
        models.msd(s, path, "Half", dims="")
    with pytest.raises(ParallelError):
        models.msd(s, path, "Half", dims="xx")
