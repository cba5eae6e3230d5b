"""Free-volume fraction by MC probe insertion (surpass —
`gmx freevolume`; absent from the reference).

Pins `models.freevolume` against analytic sphere volumes (single atom,
disjoint pair, PBC-wrapped corner atom), an exact float64 oracle on
injected sample points, and the membrane fixture.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([4.0, 4.0, 4.0], np.float32)


def _write_xtc(path, frames, box=None):
    from groan_rs_tpu.io import native

    box = BOX if box is None else box
    for fidx in range(frames.shape[0]):
        b9 = np.diag(box).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32), 100000.0)


def _system(positions, vdw, box=None):
    n = positions.shape[0]
    box = BOX if box is None else box
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    topo.vdw = np.asarray(vdw, np.float32)
    topo.has_vdw = np.ones(n, bool)
    s = System("fv", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.asarray(positions, np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def _sphere_vol(r):
    return 4.0 / 3.0 * np.pi * r ** 3


def test_single_atom_analytic(tmp_path):
    r = 0.8
    pts = np.array([[2.0, 2.0, 2.0]])
    path = str(tmp_path / "one.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, [r])
    out = models.freevolume(s, path, "All", n_samples=200_000, seed=3)
    expect = 1.0 - _sphere_vol(r) / float(BOX.prod())
    assert out["mean_fraction"] == pytest.approx(expect, abs=3e-3)
    assert out["n_samples"] == 200_000
    np.testing.assert_allclose(out["box_volume"], [64.0])
    np.testing.assert_allclose(
        out["free_volume"], out["fraction"] * 64.0)


def test_probe_extends_radius(tmp_path):
    r, probe = 0.5, 0.3
    pts = np.array([[2.0, 2.0, 2.0]])
    path = str(tmp_path / "probe.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, [r])
    out = models.freevolume(s, path, "All", probe=probe,
                            n_samples=200_000, seed=5)
    expect = 1.0 - _sphere_vol(r + probe) / float(BOX.prod())
    assert out["mean_fraction"] == pytest.approx(expect, abs=3e-3)


def test_pbc_corner_atom(tmp_path):
    # a sphere at the box corner occludes the same volume as one in the
    # middle — the occlusion test must be minimum-image
    r = 0.7
    pts = np.array([[0.05, 0.05, 3.95]])
    path = str(tmp_path / "corner.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, [r])
    out = models.freevolume(s, path, "All", n_samples=200_000, seed=7)
    expect = 1.0 - _sphere_vol(r) / float(BOX.prod())
    assert out["mean_fraction"] == pytest.approx(expect, abs=3e-3)


def test_disjoint_pair_additive(tmp_path):
    r1, r2 = 0.5, 0.6
    pts = np.array([[1.0, 1.0, 1.0], [3.0, 3.0, 3.0]])
    path = str(tmp_path / "pair.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, [r1, r2])
    out = models.freevolume(s, path, "All", n_samples=200_000, seed=11)
    expect = 1.0 - (_sphere_vol(r1) + _sphere_vol(r2)) / float(BOX.prod())
    assert out["mean_fraction"] == pytest.approx(expect, abs=3e-3)


def test_exact_oracle_on_injected_points(tmp_path):
    rng = np.random.default_rng(13)
    n, f, p = 24, 3, 500
    atoms = rng.uniform(0, 4, size=(f, n, 3))
    vdw = rng.uniform(0.1, 0.4, size=n)
    path = str(tmp_path / "orc.xtc")
    _write_xtc(path, atoms)
    s = _system(atoms[0], vdw)
    pts_unit = rng.uniform(0, 1, size=(f, p, 3)).astype(np.float32)
    out = models.freevolume(s, path, "All", points=pts_unit, probe=0.05)

    q = np.round(atoms * 100000.0) / 100000.0
    box = np.asarray(BOX, np.float64)
    r2 = (np.asarray(vdw, np.float32) + np.float32(0.05)) ** 2
    for fi in range(f):
        xyz = pts_unit[fi].astype(np.float64) * box
        d = xyz[:, None, :] - q[fi][None, :, :]
        d -= np.round(d / box) * box
        free = (np.sum(d * d, axis=-1)
                > np.asarray(r2, np.float64)[None, :]).all(axis=1)
        assert out["fraction"][fi] == pytest.approx(free.mean(), abs=2e-5)


def test_chunking_invariance(tmp_path):
    rng = np.random.default_rng(17)
    atoms = rng.uniform(0, 4, size=(2, 10, 3))
    path = str(tmp_path / "chunk.xtc")
    _write_xtc(path, atoms)
    s = _system(atoms[0], np.full(10, 0.3))
    a = models.freevolume(s, path, "All", n_samples=4096, seed=1, chunk=64)
    b = models.freevolume(s, path, "All", n_samples=4096, seed=1,
                          chunk=4096)
    np.testing.assert_array_equal(a["fraction"], b["fraction"])


def test_errors(tmp_path):
    pts = np.array([[2.0, 2.0, 2.0]])
    path = str(tmp_path / "err.xtc")
    _write_xtc(path, pts[None])
    topo = Topology(1)
    topo.atomnum = np.array([1], np.int64)
    topo.resnum = np.array([1], np.int64)
    s = System("fv", topo, simbox=SimBox.from_lengths(4.0, 4.0, 4.0),
               positions=pts.astype(np.float32))
    s.group_create_from_ranges("All", [(0, 0)])
    with pytest.raises(GroupError):            # no vdW radii
        models.freevolume(s, path, "All")
    with pytest.raises(GroupError):            # wrong radii shape
        models.freevolume(s, path, "All", radii=[0.1, 0.2])
    with pytest.raises(ParallelError):         # bad points shape
        models.freevolume(s, path, "All", radii=[0.1],
                          points=np.zeros((3, 10, 3)))


def test_fixture_membrane():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s.guess_elements()
    s.group_create("P", "@protein")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.freevolume(s, xtc, "P", n_samples=2048, batch_size=8)
    f = out["fraction"].shape[0]
    assert f == 21
    # a ~400-atom peptide occupies a tiny fraction of the full box
    assert (out["fraction"] > 0.9).all()
    # the full solvated system leaves far less free volume (NA/CL have
    # no vdW radius in the elements table — same as the reference — so
    # exclude them; freevolume on 'all' raises InvalidVdW, also checked)
    with pytest.raises(GroupError):
        models.freevolume(s, xtc, "all", n_samples=64)
    s.group_create("NoIons", "not resname NA CL")
    out_all = models.freevolume(s, xtc, "NoIons", n_samples=512,
                                batch_size=8, chunk=256)
    assert out_all["mean_fraction"] < out["mean_fraction"]
    assert 0.05 < out_all["mean_fraction"] < 0.9
