"""Local helix geometry (`models.helixorient`, gmx helixorient/helix)
— surpass feature absent from the reference.

Pinned against an exactly-constructed ideal helix (Sugeta-Miyazawa
recovers the axis, rise, twist, and radius in closed form), a tilted
copy, and a PBC-wrapped copy.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

BOX = np.array([10.0, 10.0, 10.0], np.float32)


def _ideal_helix(nres, radius=0.23, rise=0.15, twist_deg=100.0,
                 rot=None, offset=(5.0, 5.0, 1.0)):
    t = np.deg2rad(twist_deg) * np.arange(nres)
    ca = np.stack([radius * np.cos(t), radius * np.sin(t),
                   rise * np.arange(nres)], axis=1)
    if rot is not None:
        ca = ca @ np.asarray(rot).T
    return ca + np.asarray(offset)


def _system(ca, box=None):
    n = ca.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(1, n + 1, dtype=np.int64)
    topo.atomname = StrColumn(values=np.asarray(["CA"] * n))
    topo.resname = StrColumn(values=np.asarray(["ALA"] * n))
    b = BOX if box is None else box
    return System("hx", topo, simbox=SimBox.from_lengths(*map(float, b)),
                  positions=np.asarray(ca, np.float32))


def _write_xtc(path, frames, box=None):
    from groan_rs_tpu.io import native

    b = BOX if box is None else box
    b9 = np.diag(b).astype(np.float32).reshape(9)
    for i in range(frames.shape[0]):
        native.xtc_write_frame(path, frames.shape[1], i, float(i), b9,
                               frames[i].astype(np.float32), 100000.0)


def test_ideal_helix_closed_form(tmp_path):
    nres, radius, rise, twist = 12, 0.23, 0.15, 100.0
    ca = _ideal_helix(nres, radius, rise, twist)
    path = str(tmp_path / "h.xtc")
    _write_xtc(path, ca[None])
    out = models.helixorient(_system(ca), path, "all")
    np.testing.assert_allclose(out["axis_vec"][0], [0, 0, 1], atol=1e-4)
    assert out["tilt"][0] == pytest.approx(0.0, abs=0.05)
    assert out["rise"][0] == pytest.approx(rise, abs=1e-4)
    assert out["twist"][0] == pytest.approx(twist, abs=0.05)
    assert out["radius"][0] == pytest.approx(radius, abs=1e-3)
    np.testing.assert_allclose(out["rise_per_residue"][0], rise,
                               atol=1e-4)
    np.testing.assert_allclose(out["twist_per_residue"][0], twist,
                               atol=0.05)
    assert out["local_axes"].shape == (1, nres - 3, 3)
    np.testing.assert_array_equal(out["resids"], np.arange(1, nres + 1))


def test_tilted_helix(tmp_path):
    # rotate the helix 30 deg about y: tilt vs z = 30
    a = np.deg2rad(30.0)
    rot = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]])
    ca = _ideal_helix(12, rot=rot, offset=(5.0, 5.0, 3.0))
    path = str(tmp_path / "t.xtc")
    _write_xtc(path, ca[None])
    out = models.helixorient(_system(ca), path, "all")
    assert out["tilt"][0] == pytest.approx(30.0, abs=0.1)
    assert out["rise"][0] == pytest.approx(0.15, abs=1e-4)


def test_pbc_wrapped_helix(tmp_path):
    # helix crossing the z boundary: min-image rebuild must recover the
    # same geometry
    ca = _ideal_helix(12, offset=(5.0, 5.0, 9.5))
    wrapped = ca % 10.0
    path = str(tmp_path / "w.xtc")
    _write_xtc(path, wrapped[None])
    out = models.helixorient(_system(wrapped), path, "all")
    assert out["rise"][0] == pytest.approx(0.15, abs=1e-4)
    assert out["twist"][0] == pytest.approx(100.0, abs=0.05)
    assert out["tilt"][0] == pytest.approx(0.0, abs=0.05)


def test_helixorient_errors(tmp_path):
    ca = _ideal_helix(4)
    path = str(tmp_path / "e.xtc")
    _write_xtc(path, ca[None])
    with pytest.raises(GroupError):
        models.helixorient(_system(ca), path, "all")
