"""2D density maps (`models.densmap`, gmx densmap) and the Van Hove
self-correlation (`models.vanhove`, gmx vanhove) — both surpass
features absent from the reference.

Pins densmap against exact numpy scatter oracles (incl. NPT per-frame
volume scaling) and vanhove against rigid-translation analytics and a
float64 random-walk oracle.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([4.0, 4.0, 4.0], np.float32)


def _write_xtc(path, frames, boxes=None):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        box = BOX if boxes is None else boxes[fidx]
        b9 = np.diag(box).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32), 100000.0)


def _system(positions, box=None, mass=None, charge=None):
    n = positions.shape[0]
    box = BOX if box is None else box
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    if mass is not None:
        topo.mass = np.asarray(mass, np.float32)
    if charge is not None:
        topo.charge = np.asarray(charge, np.float32)
    s = System("dm", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.asarray(positions, np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def _oracle_densmap(frames, boxes, i1, i2, nx, ny, w):
    """float64 scatter oracle with XTC 1e-5 quantization applied."""
    q = np.round(np.asarray(frames, np.float64) * 100000.0) / 100000.0
    counts = np.zeros((nx, ny))
    dens = np.zeros((nx, ny))
    f = q.shape[0]
    for fi in range(f):
        b = np.asarray(boxes[fi], np.float64)
        frac = q[fi] / b
        frac -= np.floor(frac)
        ix = np.clip((frac[:, i1] * nx).astype(int), 0, nx - 1)
        iy = np.clip((frac[:, i2] * ny).astype(int), 0, ny - 1)
        np.add.at(counts, (ix, iy), w)
        np.add.at(dens, (ix, iy), w * nx * ny / b.prod())
    return counts, dens / f


def test_exact_counts(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.uniform(0.05, 3.95, size=(3, 40, 3))
    path = str(tmp_path / "dm.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0])
    out = models.densmap(s, path, "All", axes="xy", bins=(8, 4))
    boxes = np.repeat(BOX[None], 3, axis=0)
    counts, dens = _oracle_densmap(frames, boxes, 0, 1, 8, 4,
                                   np.ones(40))
    np.testing.assert_array_equal(out["counts"], counts)
    np.testing.assert_allclose(out["density"], dens, rtol=1e-6)
    # integral of density over the box == mean weighted count per frame
    v = float(BOX.prod())
    assert out["density"].sum() * v / (8 * 4) == pytest.approx(40.0)


def test_mass_and_charge_weights(tmp_path):
    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 4, size=(2, 12, 3))
    mass = rng.uniform(1, 16, size=12)
    charge = rng.normal(size=12)
    path = str(tmp_path / "w.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0], mass=mass, charge=charge)
    boxes = np.repeat(BOX[None], 2, axis=0)
    for wname, w in (("mass", mass), ("charge", charge)):
        out = models.densmap(s, path, "All", axes="yz", bins=(5, 5),
                             weights=wname)
        counts, dens = _oracle_densmap(
            frames, boxes, 1, 2, 5, 5, w.astype(np.float32))
        np.testing.assert_allclose(out["counts"], counts, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(out["density"], dens, rtol=1e-5,
                                   atol=1e-6)


def test_npt_fractional_binning(tmp_path):
    # two frames with different boxes: binning is fractional and each
    # frame is normalized by its OWN volume
    frames = np.array([[[1.0, 1.0, 1.0]], [[1.25, 1.25, 1.25]]])
    boxes = np.array([[4.0, 4.0, 4.0], [5.0, 5.0, 5.0]], np.float32)
    path = str(tmp_path / "npt.xtc")
    _write_xtc(path, frames, boxes)
    s = _system(frames[0])
    out = models.densmap(s, path, "All", axes="xy", bins=(4, 4))
    # both frames land in fractional bin (1, 1)
    counts = np.zeros((4, 4))
    counts[1, 1] = 2.0
    np.testing.assert_array_equal(out["counts"], counts)
    dens = (16.0 / 64.0 + 16.0 / 125.0) / 2.0
    assert out["density"][1, 1] == pytest.approx(dens, rel=1e-6)
    np.testing.assert_allclose(out["mean_box"], [4.5, 4.5, 4.5])


def test_gridmap_output(tmp_path):
    frames = np.array([[[0.5, 2.5, 1.0], [0.5, 2.5, 3.0]]])
    path = str(tmp_path / "gm.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0])
    out = models.densmap(s, path, "All", axes="xy", bins=(4, 4))
    gm = out["map"]
    assert gm.n_tiles_x() == 4 and gm.n_tiles_y() == 4
    # tile centered at the occupied bin carries the density value
    assert gm.get_at(0.5, 2.5) == pytest.approx(
        2.0 * 16.0 / 64.0, rel=1e-6)
    assert gm.get_at(2.5, 0.5) == 0.0
    # the map writes and reads back through the GridMap text format
    p = str(tmp_path / "map.dat")
    gm.save(p)
    from groan_rs_tpu.core.gridmap import GridMap
    gm2 = GridMap.from_file(p)
    np.testing.assert_allclose(gm2.values, gm.values, rtol=1e-6)


def test_densmap_errors(tmp_path):
    frames = np.zeros((1, 1, 3), np.float32) + 1.0
    path = str(tmp_path / "e.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0])
    with pytest.raises(ParallelError):
        models.densmap(s, path, "All", axes="xx")
    with pytest.raises(ParallelError):
        models.densmap(s, path, "All", axes="xq")
    with pytest.raises(ParallelError):
        models.densmap(s, path, "All", weights="volume")


# ---------------------------------------------------------------- vanhove

def test_vanhove_rigid_translation(tmp_path):
    # every atom moves +0.11 nm in x per frame: displacement at lag L is
    # exactly 0.11 L for every atom and origin
    f, k, step = 6, 7, 0.11
    base = np.random.default_rng(7).uniform(1.0, 3.0, size=(k, 3))
    frames = np.stack([base + [step * i, 0, 0] for i in range(f)])
    frames %= 4.0
    path = str(tmp_path / "vh.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0])
    out = models.vanhove(s, path, "All", lags=[1, 3, 5], r_max=1.0,
                         bins=50)
    dr = 1.0 / 50
    for li, lag in enumerate([1, 3, 5]):
        expect_bin = int(step * lag / dr)
        assert out["counts"][li, expect_bin] == (f - lag) * k
        assert out["counts"][li].sum() == (f - lag) * k
        assert out["overflow"][li] == 0.0
        # normalized: integral gs dr == 1
        assert out["gs"][li].sum() * dr == pytest.approx(1.0)


def test_vanhove_oracle_random_walk(tmp_path):
    rng = np.random.default_rng(11)
    f, k = 8, 20
    steps = rng.normal(0, 0.15, size=(f - 1, k, 3))
    unwrapped = np.concatenate(
        [rng.uniform(0, 4, size=(1, k, 3)),
         ], axis=0)
    unwrapped = np.cumsum(
        np.concatenate([unwrapped, steps], axis=0), axis=0)
    wrapped = unwrapped % 4.0
    path = str(tmp_path / "rw.xtc")
    _write_xtc(path, wrapped)
    s = _system(wrapped[0])
    lags = [1, 2, 4, 7]
    out = models.vanhove(s, path, "All", lags=lags, r_max=2.0, bins=40)

    # float64 oracle on the quantized wrapped coords, re-unwrapped
    q = np.round(wrapped * 100000.0) / 100000.0
    d = q[1:] - q[:-1]
    d -= np.round(d / 4.0) * 4.0
    u = np.concatenate([q[:1], q[:1] + np.cumsum(d, axis=0)])
    for li, lag in enumerate(lags):
        disp = np.linalg.norm(u[lag:] - u[:-lag], axis=-1).ravel()
        h, _ = np.histogram(disp[disp < 2.0], bins=40, range=(0.0, 2.0))
        # device bins in f32 — allow bin-edge jitter but pin the
        # cumulative distribution and the totals exactly
        assert out["counts"][li].sum() + out["overflow"][li] * disp.size \
            == pytest.approx(disp.size)
        assert np.abs(np.cumsum(out["counts"][li])
                      - np.cumsum(h)).max() <= 2
        over = (disp >= 2.0).sum()
        assert out["overflow"][li] == pytest.approx(
            over / disp.size, abs=2.0 / disp.size)


def test_vanhove_errors(tmp_path):
    frames = np.ones((3, 2, 3), np.float32)
    path = str(tmp_path / "ve.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0])
    with pytest.raises(ParallelError):
        models.vanhove(s, path, "All", lags=[0])
    with pytest.raises(ParallelError):
        models.vanhove(s, path, "All", lags=[3])


def test_fixture_membrane_densmap():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    s.group_create("Phos", "name P")
    out = models.densmap(s, xtc, "Phos", axes="xz", bins=(16, 32),
                         batch_size=8)
    # phosphates concentrate in two z-bands (the leaflets): the two
    # most occupied z-columns must dominate a uniform distribution
    colsum = out["counts"].sum(axis=0)
    top2 = np.sort(colsum)[-8:].sum()
    assert top2 > 0.8 * colsum.sum()
    # total counts: every P atom in every frame lands somewhere
    n_p = len(s.group_indices("Phos"))
    assert out["counts"].sum() == pytest.approx(n_p * 21)
