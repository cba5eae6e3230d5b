"""Water-orientation analyses: `models.sorient` (gmx sorient) and
`models.h2order` (gmx h2order) — surpass features absent from the
reference.

Pinned against exactly-constructed waters: dipoles pointing toward /
away from / perpendicular to a reference atom (sorient) and slab-wise
up/down dipoles (h2order), plus the membrane fixture.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([6.0, 6.0, 6.0], np.float32)
_D = 0.09572 * np.cos(np.deg2rad(104.52 / 2.0))  # O->H projection on bisector
_S = 0.09572 * np.sin(np.deg2rad(104.52 / 2.0))


def _water(o, bisector):
    """Water coordinates: O at `o`, H's so the dipole bisector points
    along the unit vector `bisector` (perp picked automatically)."""
    b = np.asarray(bisector, np.float64)
    b = b / np.linalg.norm(b)
    p = np.cross(b, [1.0, 0.0, 0.0])
    if np.linalg.norm(p) < 1e-6:
        p = np.cross(b, [0.0, 1.0, 0.0])
    p /= np.linalg.norm(p)
    return np.stack([o, o + _D * b + _S * p, o + _D * b - _S * p])


def _system(waters, extra=None):
    """Build a System of W waters (+ optional extra leading atoms)."""
    n_extra = 0 if extra is None else len(extra)
    coords = [] if extra is None else list(extra)
    names, resnums = (["REF"] * n_extra), list(range(1, n_extra + 1))
    for w, (o, b) in enumerate(waters):
        coords.extend(_water(o, b))
        names.extend(["OW", "HW1", "HW2"])
        resnums.extend([n_extra + w + 1] * 3)
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.asarray(resnums, np.int64)
    topo.atomname = StrColumn(values=np.asarray(names))
    topo.mass = np.ones(n, np.float32)
    s = System("wo", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=coords)
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        b9 = np.diag(BOX).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32),
                               100000.0)


def test_sorient_exact_orientations(tmp_path):
    ref = np.array([3.0, 3.0, 3.0])
    # three waters at r = 0.4 with dipole outward (+x), inward (-x from
    # the +y side means cos approx -1), and perpendicular
    waters = [
        ((ref + [0.4, 0, 0]), [1.0, 0, 0]),     # outward: cos1 = +1
        ((ref + [0, 0.4, 0]), [0, -1.0, 0]),    # inward:  cos1 = -1
        ((ref + [0, 0, 0.4]), [1.0, 0, 0]),     # perp:    cos1 = 0
    ]
    s = _system(waters, extra=[ref])
    s.group_create("Ref", "name REF")
    pos = np.asarray(s.positions, np.float32)
    path = str(tmp_path / "so.xtc")
    _write_xtc(path, pos[None])
    out = models.sorient(s, path, "Ref", rmin=0.0, rmax=0.5, bins=20)
    assert out["n_selected"] == 3.0
    assert out["mean_cos1"] == pytest.approx(0.0, abs=1e-3)
    # bins: cos=-1 -> bin 0, cos=0 -> bin 10, cos=+1 -> bin 19
    h = out["cos1_hist"]
    dc = 2.0 / 20
    assert h[0] * dc * 3 == pytest.approx(1.0)
    assert h[10] * dc * 3 == pytest.approx(1.0)
    assert h[19] * dc * 3 == pytest.approx(1.0)
    # density normalization: integral == 1
    assert h.sum() * dc == pytest.approx(1.0)
    assert out["cos2_hist"].sum() * dc == pytest.approx(1.0)
    # shell-resolved curve: all three waters sit at r = 0.4 (exactly a
    # shell edge in f32 — accept either neighboring bin)
    pop = np.flatnonzero(~np.isnan(out["mean_cos1_r"]))
    assert pop.size == 1 and pop[0] in (15, 16)
    np.testing.assert_allclose(out["mean_cos1_r"][pop[0]], 0.0,
                               atol=1e-3)


def test_sorient_shell_selection(tmp_path):
    ref = np.array([3.0, 3.0, 3.0])
    waters = [
        ((ref + [0.2, 0, 0]), [1.0, 0, 0]),     # inside rmin: excluded
        ((ref + [0.45, 0, 0]), [1.0, 0, 0]),    # in shell
        ((ref + [1.5, 0, 0]), [1.0, 0, 0]),     # beyond rmax: excluded
    ]
    s = _system(waters, extra=[ref])
    s.group_create("Ref", "name REF")
    pos = np.asarray(s.positions, np.float32)
    path = str(tmp_path / "sh.xtc")
    _write_xtc(path, pos[None])
    out = models.sorient(s, path, "Ref", rmin=0.3, rmax=0.6)
    assert out["n_selected"] == 1.0
    assert out["mean_cos1"] == pytest.approx(1.0, abs=1e-3)
    assert out["mean_cos2"] == pytest.approx(
        np.cos(np.deg2rad(104.52 / 2)), abs=1e-3)


def test_sorient_pbc_minimum_image(tmp_path):
    # reference at the box corner; water across the boundary
    ref = np.array([0.1, 3.0, 3.0])
    waters = [((np.array([5.8, 3.0, 3.0])), [-1.0, 0, 0])]
    # outward vector ref->O is -0.3 x (min image); dipole -x => cos1 = +1
    s = _system(waters, extra=[ref])
    s.group_create("Ref", "name REF")
    pos = np.asarray(s.positions, np.float32)
    path = str(tmp_path / "pb.xtc")
    _write_xtc(path, pos[None])
    out = models.sorient(s, path, "Ref", rmax=0.5)
    assert out["n_selected"] == 1.0
    assert out["mean_cos1"] == pytest.approx(1.0, abs=1e-3)


def test_water_sites_validation(tmp_path):
    # an oxygen with only one hydrogen in its residue
    coords = np.array([[1, 1, 1], [1.1, 1, 1]], np.float32)
    topo = Topology(2)
    topo.atomnum = np.array([1, 2], np.int64)
    topo.resnum = np.array([1, 1], np.int64)
    topo.atomname = StrColumn(values=np.array(["OW", "HW1"]))
    s = System("bad", topo, simbox=SimBox.from_lengths(6, 6, 6),
               positions=coords)
    with pytest.raises(GroupError):
        models.sorient(s, "unused.xtc", "All")


def test_h2order_slabs(tmp_path):
    # waters in the lower half point +z, upper half -z
    waters = []
    for i in range(4):
        waters.append((np.array([1.0 + i, 2.0, 1.5]), [0, 0, 1.0]))
    for i in range(4):
        waters.append((np.array([1.0 + i, 2.0, 4.5]), [0, 0, -1.0]))
    s = _system(waters)
    pos = np.asarray(s.positions, np.float32)
    path = str(tmp_path / "h2.xtc")
    _write_xtc(path, pos[None])
    out = models.h2order(s, path, bins=6)
    # z=1.5 -> slab 1 of 6 (6 nm box), z=4.5 -> slab 4
    assert out["count"][1] == 4.0 and out["count"][4] == 4.0
    assert out["cos"][1] == pytest.approx(1.0, abs=1e-3)
    assert out["cos"][4] == pytest.approx(-1.0, abs=1e-3)
    assert np.isnan(out["cos"][0]) and np.isnan(out["cos"][3])
    np.testing.assert_allclose(out["z"], (np.arange(6) + 0.5))


def test_fixture_membrane_water():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    s.group_create("Pep", "@protein")
    out = models.sorient(s, xtc, "Pep", oxygen="resname SOL and name OW",
                         hydrogens="resname SOL and name HW1 HW2",
                         rmax=0.6, batch_size=8)
    assert out["n_selected"] > 0
    assert abs(out["mean_cos1"]) < 1.0
    dc = 2.0 / 40
    assert out["cos1_hist"].sum() * dc == pytest.approx(1.0, rel=1e-6)

    o2 = models.h2order(s, xtc, oxygen="resname SOL and name OW",
                        hydrogens="resname SOL and name HW1 HW2",
                        bins=24, batch_size=8)
    # every water lands in some slab in every frame
    s.group_create("Ox", "resname SOL and name OW")
    assert o2["count"].sum() == len(s.group_indices("Ox")) * 21
    ok = o2["count"] > 0
    assert (np.abs(o2["cos"][ok]) <= 1.0 + 1e-6).all()
