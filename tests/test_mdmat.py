"""Residue-residue smallest-distance matrix (surpass — gmx mdmat; the
reference has whole-group N x M atom matrices only, analysis.rs:401).

Pins `models.mdmat` / `ops.distances.residue_min_matrix` against exact
constructions (ragged residues, PBC splits) and a float64 brute-force
oracle on the fixture protein.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology, StrColumn
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([10.0, 10.0, 10.0], np.float32)


def _res_system(pts, resnums):
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.asarray(resnums, np.int64)
    topo.resname = StrColumn(values=[f"R{r}" for r in resnums])
    s = System("mdmat", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=pts)
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    b9 = np.diag(BOX).astype(np.float32).reshape(9)
    for f in range(frames.shape[0]):
        native.xtc_write_frame(path, frames.shape[1], f, float(f), b9,
                               frames[f].astype(np.float32), 10000.0)


def test_mdmat_exact_ragged_residues(tmp_path):
    # residue 1: two atoms; residue 2: one atom; residue 3: three atoms.
    # smallest pair distances are chosen by construction.
    pts = np.array([
        [1.0, 1.0, 1.0], [1.4, 1.0, 1.0],            # res 1
        [3.0, 1.0, 1.0],                             # res 2
        [5.0, 1.0, 1.0], [9.9, 1.0, 1.0], [5.0, 2.0, 1.0],  # res 3
    ], np.float32)
    resnums = [1, 1, 2, 3, 3, 3]
    path = str(tmp_path / "r.xtc")
    _write_xtc(path, pts[None])
    s = _res_system(pts, resnums)
    out = models.mdmat(s, path, "All")
    m = out["mean"]
    assert out["resids"].tolist() == [1, 2, 3]
    assert m.shape == (3, 3)
    np.testing.assert_allclose(np.diag(m), 0.0, atol=1e-6)
    np.testing.assert_allclose(m, m.T, atol=1e-6)
    assert abs(m[0, 1] - 1.6) < 1e-3          # 1.4 -> 3.0
    # res1-res3: 9.9 vs 1.0 across the face -> 10 - 8.9 = 1.1 (the
    # smallest of all six pairs; direct 5.0 - 1.4 would be 3.6)
    assert abs(m[0, 2] - 1.1) < 1e-3
    assert abs(m[1, 2] - 2.0) < 1e-3          # 3.0 -> 5.0


def test_mdmat_pbc_split_residue(tmp_path):
    # two residues straddling the boundary: distance via the face
    pts = np.array([[9.8, 5.0, 5.0], [0.3, 5.0, 5.0]], np.float32)
    path = str(tmp_path / "p.xtc")
    _write_xtc(path, pts[None])
    s = _res_system(pts, [1, 2])
    m = models.mdmat(s, path, "All")["mean"]
    assert abs(m[0, 1] - 0.5) < 1e-3


def test_mdmat_fixture_oracle_and_chunking():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = models.mdmat(s, xtc, "Protein", per_frame=True, chunk=7)
    m = out["frames"]
    f, r, _ = m.shape
    assert f > 0 and r == len(np.unique(
        np.asarray(s.topology.resnum)[s.group_indices("Protein")]))

    # float64 brute oracle on frame 0
    from groan_rs_tpu.io import native

    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, b9, *_ = native.xtc_read_frames(xtc, offsets[:1], natoms)
    box = b9[0][[0, 4, 8]].astype(np.float64)
    idx = s.group_indices("Protein")
    resnum = np.asarray(s.topology.resnum)[idx]
    p = coords[0][idx].astype(np.float64)
    uniq = list(dict.fromkeys(resnum.tolist()))
    for i in range(0, len(uniq), 7):          # sample rows
        ai = p[resnum == uniq[i]]
        for j in range(len(uniq)):
            aj = p[resnum == uniq[j]]
            d = ai[:, None, :] - aj[None, :, :]
            d -= box * np.round(d / box)
            expect = np.sqrt((d * d).sum(-1)).min()
            assert abs(m[0, i, j] - expect) < 5e-4

    # chunk size must not change results
    m2 = models.mdmat(s, xtc, "Protein", per_frame=True, chunk=64)["frames"]
    np.testing.assert_allclose(m2, m, atol=1e-6)
    # mean is the frame average
    np.testing.assert_allclose(out["mean"], m.mean(0), atol=1e-6)
