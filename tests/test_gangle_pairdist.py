"""Selection-defined vector/plane angles (`models.gangle`, gmx gangle)
and per-frame unit distance matrices (`models.pairdist`, gmx pairdist)
— surpass features absent from the reference.

Pinned by exact geometric constructions (known vector/plane angles,
PBC-split sites, t0 drift) and float64 brute-force oracles.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

BOX = np.array([10.0, 10.0, 10.0], np.float32)


def _system(pos, names=None, resnums=None, resnames=None, masses=None):
    n = pos.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = (np.asarray(resnums, np.int64) if resnums is not None
                   else np.arange(1, n + 1, dtype=np.int64))
    if names is not None:
        topo.atomname = StrColumn(values=np.asarray(names))
    if resnames is not None:
        topo.resname = StrColumn(values=np.asarray(resnames))
    topo.mass = (np.asarray(masses, np.float32) if masses is not None
                 else np.ones(n, np.float32))
    topo.has_mass = np.ones(n, bool)
    return System("t", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
                  positions=np.asarray(pos, np.float32))


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    b9 = np.diag(BOX).astype(np.float32).reshape(9)
    for i in range(frames.shape[0]):
        native.xtc_write_frame(path, frames.shape[1], i, float(i), b9,
                               frames[i].astype(np.float32), 100000.0)


# ---------------------------------------------------------------- gangle

def test_gangle_vector_vs_axis_exact(tmp_path):
    # two vectors: one at 30 deg to z (in the xz plane), one along z
    a = np.deg2rad(30.0)
    pos = np.array([
        [5.0, 5.0, 5.0], [5.0 + np.sin(a), 5.0, 5.0 + np.cos(a)],
        [2.0, 2.0, 2.0], [2.0, 2.0, 3.0],
    ])
    s = _system(pos)
    path = str(tmp_path / "g.xtc")
    _write_xtc(path, pos[None])
    out = models.gangle(s, path, "all", g1="vector", g2="z")
    assert out["angles"].shape == (1, 2)
    np.testing.assert_allclose(out["angles"][0], [30.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(out["mean"], [15.0], atol=1e-3)


def test_gangle_plane_vs_axis_and_pbc(tmp_path):
    # plane spanned by +x and +y: normal = +z -> angle to z is 0;
    # one edge crosses the box boundary (min image must recover it)
    pos = np.array([
        [9.8, 5.0, 5.0], [0.3, 5.0, 5.0],   # +0.5 x through the wall
        [9.8, 5.7, 5.0],                    # +0.7 y
    ])
    s = _system(pos)
    path = str(tmp_path / "g.xtc")
    _write_xtc(path, pos[None])
    out = models.gangle(s, path, "all", g1="plane", g2="z")
    np.testing.assert_allclose(out["angles"][0], [0.0], atol=1e-3)


def test_gangle_vector_vector_broadcast(tmp_path):
    # two vectors vs ONE reference vector along x: 90 and 45 deg
    pos = np.array([
        [5.0, 5.0, 5.0], [5.0, 5.0, 6.0],            # along z
        [2.0, 2.0, 2.0], [2.7, 2.0, 2.7],            # 45 deg in xz
        [8.0, 8.0, 8.0], [8.9, 8.0, 8.0],            # reference: +x
    ])
    s = _system(pos)
    path = str(tmp_path / "g.xtc")
    _write_xtc(path, pos[None])
    out = models.gangle(s, path, "serial 1 2 3 4", g1="vector",
                        g2="vector", group2="serial 5 6")
    np.testing.assert_allclose(out["angles"][0], [90.0, 45.0], atol=1e-3)


def test_gangle_t0_tracks_drift(tmp_path):
    # a vector rotating 20 deg per frame in the xz plane: angle vs its
    # own first-frame orientation grows linearly
    frames = []
    for i in range(4):
        a = np.deg2rad(20.0 * i)
        frames.append([[5.0, 5.0, 5.0],
                       [5.0 + np.sin(a), 5.0, 5.0 + np.cos(a)]])
    frames = np.asarray(frames)
    s = _system(frames[0])
    path = str(tmp_path / "g.xtc")
    _write_xtc(path, frames)
    out = models.gangle(s, path, "all", g1="vector", g2="t0")
    np.testing.assert_allclose(out["angles"][:, 0], [0, 20, 40, 60],
                               atol=1e-2)


def test_gangle_errors(tmp_path):
    pos = np.array([[5.0, 5.0, 5.0], [5.0, 5.0, 6.0], [6.0, 5.0, 5.0]])
    s = _system(pos)
    path = str(tmp_path / "g.xtc")
    _write_xtc(path, pos[None])
    with pytest.raises(ParallelError):
        models.gangle(s, path, "all", g1="nope")
    with pytest.raises(GroupError):
        models.gangle(s, path, "all", g1="vector")    # 3 atoms % 2
    with pytest.raises(ParallelError):
        models.gangle(s, path, "serial 1 2", g2="vector")  # no group2


# -------------------------------------------------------------- pairdist

def _two_res_system():
    # res 1: two atoms near the origin corner; res 2: two atoms near
    # the far corner (min-image closest through the boundary);
    # res 3 (group2): one atom in the middle
    pos = np.array([
        [0.4, 0.5, 0.5], [0.8, 0.5, 0.5],       # res 1
        [9.7, 0.5, 0.5], [9.3, 0.5, 0.5],       # res 2
        [5.0, 0.5, 0.5],                        # res 3
    ])
    s = _system(pos, resnums=[1, 1, 2, 2, 3],
                resnames=["A", "A", "B", "B", "C"],
                masses=[1.0, 1.0, 1.0, 1.0, 1.0])
    return s, pos


def test_pairdist_min_exact_pbc(tmp_path):
    s, pos = _two_res_system()
    path = str(tmp_path / "p.xtc")
    _write_xtc(path, pos[None])
    out = models.pairdist(s, path, "resid 1 2", "resid 3", split="res",
                          mode="min")
    assert out["dist"].shape == (1, 2, 1)
    # res1 closest atom at x=0.8 -> 4.2; res2 closest at x=9.3 -> 4.3
    np.testing.assert_allclose(out["dist"][0, :, 0], [4.2, 4.3],
                               atol=1e-5)
    assert list(out["resids1"]) == [1, 2]
    assert list(out["resnames2"]) == ["C"]
    # res1-res2 smallest crosses the boundary: 9.7 -> 0.4 is 0.7
    full = models.pairdist(s, path, "resid 1", "resid 2", mode="min")
    np.testing.assert_allclose(full["dist"][0, 0, 0], 0.7, atol=1e-5)


def test_pairdist_com_and_group_split(tmp_path):
    s, pos = _two_res_system()
    path = str(tmp_path / "p.xtc")
    _write_xtc(path, pos[None])
    # res 1 COM x=0.6, res 2 COM x=9.5 (whole through the wall), res 3 at 5
    out = models.pairdist(s, path, "resid 1 2", "resid 3", split="res",
                          mode="com")
    np.testing.assert_allclose(out["dist"][0, :, 0], [4.4, 4.5],
                               atol=1e-5)
    grp = models.pairdist(s, path, "resid 1", "resid 3", split="group",
                          mode="com")
    assert grp["dist"].shape == (1, 1, 1)
    np.testing.assert_allclose(grp["dist"][0, 0, 0], 4.4, atol=1e-5)


def test_pairdist_atom_split_matches_brute(tmp_path):
    rng = np.random.default_rng(5)
    pos = rng.uniform(0.5, 9.5, (6, 3))
    s = _system(pos)
    path = str(tmp_path / "p.xtc")
    _write_xtc(path, pos[None])
    out = models.pairdist(s, path, "serial 1 2 3", "serial 4 5 6",
                          split="atom", mode="min")
    a = pos[:3].astype(np.float64)
    b = pos[3:].astype(np.float64)
    d = a[:, None, :] - b[None, :, :]
    d -= BOX * np.round(d / BOX)
    brute = np.sqrt((d * d).sum(-1))
    np.testing.assert_allclose(out["dist"][0], brute, atol=2e-4)


def test_pairdist_errors(tmp_path):
    s, pos = _two_res_system()
    path = str(tmp_path / "p.xtc")
    _write_xtc(path, pos[None])
    with pytest.raises(ParallelError):
        models.pairdist(s, path, "resid 1", "resid 2", split="nope")
    with pytest.raises(ParallelError):
        models.pairdist(s, path, "resid 1", "resid 2", mode="nope")
    with pytest.raises(GroupError):
        models.pairdist(s, path, "resname NOPE", "resid 2")
