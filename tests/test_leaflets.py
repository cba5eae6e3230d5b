"""Membrane leaflet assignment + thickness (surpass — the reference
author's downstream tools (gorder/FATSLiM) need this step; groan_rs
itself has no leaflet analysis).

A synthetic bilayer with known leaflet plan and thickness — including
one wrapped across the box face — must classify exactly; the real
membrane fixture must split its P heads into two balanced leaflets at a
plausible thickness.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([8.0, 8.0, 10.0], np.float32)


def _bilayer(tmp_path, z_mid, thickness, n_per_leaf=24, seed=5,
             name="bi.xtc"):
    from groan_rs_tpu.io import native

    rng = np.random.default_rng(seed)
    k = 2 * n_per_leaf
    xy = rng.uniform(0, 1, size=(k, 2)) * BOX[:2]
    z_up = (z_mid + thickness / 2 + rng.normal(size=n_per_leaf) * 0.1)
    z_dn = (z_mid - thickness / 2 + rng.normal(size=n_per_leaf) * 0.1)
    z = np.concatenate([z_up, z_dn]) % BOX[2]
    pts = np.column_stack([xy, z]).astype(np.float32)

    topo = Topology(k)
    topo.atomnum = np.arange(1, k + 1, dtype=np.int64)
    topo.resnum = np.arange(1, k + 1, dtype=np.int64)
    s = System("bi", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=pts)
    s.group_create_from_ranges("Heads", [(0, k - 1)])
    path = str(tmp_path / name)
    b9 = np.diag(BOX).astype(np.float32).reshape(9)
    native.xtc_write_frame(path, k, 0, 0.0, b9, pts, 10000.0)
    return s, path, z_up, z_dn


def test_leaflets_synthetic_and_wrapped(tmp_path):
    for z_mid, name in ((5.0, "mid.xtc"), (9.7, "edge.xtc")):
        # the edge case wraps the bilayer across the z face
        s, path, z_up, z_dn = _bilayer(tmp_path, z_mid, 4.0, name=name)
        out = models.leaflets(s, path, "Heads")
        leaf = out["leaflet"][0]
        n = len(z_up)
        assert (leaf[:n] == 1).all() and (leaf[n:] == -1).all(), z_mid
        expect_t = z_up.mean() - z_dn.mean()
        np.testing.assert_allclose(out["thickness"][0], expect_t,
                                   rtol=5e-3)
        # the center sits between the leaflets (min-image distance)
        d = (out["center"][0] - z_mid) % BOX[2]
        d = min(d, BOX[2] - d)
        assert d < 0.3


def test_leaflets_fixture_membrane():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.gro"))
    s.group_create("P", "name P")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.leaflets(s, xtc, "P")
    f, l = out["leaflet"].shape
    assert f > 0 and l > 20
    up = (out["leaflet"] == 1).sum(axis=1)
    dn = (out["leaflet"] == -1).sum(axis=1)
    # balanced bilayer: leaflet populations within 30% of each other
    assert (np.abs(up - dn) < 0.3 * l).all()
    # P-P thickness of a POPC-like bilayer: 3-5 nm
    assert (2.5 < out["thickness"]).all() and (out["thickness"] < 5.5).all()
    # assignments are stable across frames for almost all lipids
    flips = (out["leaflet"][1:] != out["leaflet"][:-1]).mean()
    assert flips < 0.02


def test_leaflets_errors(tmp_path):
    s, path, *_ = _bilayer(tmp_path, 5.0, 4.0, name="err.xtc")
    with pytest.raises(GroupError, match="axis"):
        models.leaflets(s, path, "Heads", axis="w")
