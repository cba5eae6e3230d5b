"""3D spatial distribution function (`models.sdf`, gmx spatial) —
surpass feature absent from the reference.

Exact voxel placement, rotational-fit concentration, PBC min-image
offsets, density normalization, and the cube-file round trip.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

BOX = np.array([6.0, 6.0, 6.0], np.float32)


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        b9 = np.diag(BOX).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32),
                               100000.0)


def _system(positions, names):
    n = positions.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    topo.atomname = StrColumn(values=np.asarray(names))
    topo.mass = np.ones(n, np.float32)
    s = System("sdf", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.asarray(positions, np.float32))
    s.group_create("Ref", "name REF")
    s.group_create("Sat", "name SAT")
    return s


def test_exact_voxels(tmp_path):
    ref = np.array([3.0, 3.0, 3.0])
    # satellites at offsets +0.3x, -0.7y, and one outside the 2 nm cube
    pts = np.stack([ref, ref + [0.3, 0, 0], ref + [0, -0.7, 0],
                    ref + [1.5, 0, 0]])
    s = _system(pts, ["REF", "SAT", "SAT", "SAT"])
    path = str(tmp_path / "v.xtc")
    _write_xtc(path, pts[None])
    out = models.sdf(s, path, "Sat", "Ref", side=2.0, bins=8)
    vox = 2.0 / 8
    assert out["voxel"] == pytest.approx(vox)
    c = out["counts"]
    assert c.sum() == 2.0                      # third satellite outside
    # offset +0.3x -> voxel floor((0.3+1)/0.25) = 5, center bins 4,4
    assert c[5, 4, 4] == 1.0
    # offset -0.7y -> voxel x=4, y=floor(0.3/0.25)=1, z=4
    assert c[4, 1, 4] == 1.0
    assert out["occupancy"] == pytest.approx(2.0 / 3.0)
    np.testing.assert_allclose(out["grid"], c / vox ** 3)
    np.testing.assert_allclose(out["origin"], [-1.0, -1.0, -1.0])


def test_rotational_fit_concentrates(tmp_path):
    # a rigid 3-atom reference rotating 90 deg/frame about z, with a
    # satellite riding along: unfitted SDF spreads over 4 voxels,
    # fitted SDF concentrates in 1
    center = np.array([3.0, 3.0, 3.0])
    frames = []
    for k in range(4):
        a = np.pi / 2 * k
        rot = np.array([[np.cos(a), -np.sin(a), 0],
                        [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        ref_pts = np.stack([center + rot @ [0.4, 0.0, 0.0],
                            center + rot @ [-0.4, 0.0, 0.0],
                            center + rot @ [0.0, 0.0, 0.4]])
        # offsets chosen safely interior to voxels under all rotations
        sat = center + rot @ [0.13, 0.57, 0.0]
        frames.append(np.vstack([ref_pts, sat[None]]))
    frames = np.stack(frames)
    s = _system(frames[0], ["REF", "REF", "REF", "SAT"])
    path = str(tmp_path / "rot.xtc")
    _write_xtc(path, frames)
    plain = models.sdf(s, path, "Sat", "Ref", side=2.0, bins=10)
    fitted = models.sdf(s, path, "Sat", "Ref", side=2.0, bins=10,
                        fit=True)
    assert (plain["counts"] > 0).sum() == 4
    assert (fitted["counts"] > 0).sum() == 1
    assert fitted["counts"].max() == 4.0


def test_pbc_offsets(tmp_path):
    # reference near the corner; satellite across the boundary at
    # min-image offset +0.4x
    pts = np.array([[5.9, 3.0, 3.0], [0.3, 3.0, 3.0]])
    s = _system(pts, ["REF", "SAT"])
    path = str(tmp_path / "pbc.xtc")
    _write_xtc(path, pts[None])
    out = models.sdf(s, path, "Sat", "Ref", side=2.0, bins=8)
    assert out["counts"][5, 4, 4] == 1.0


def test_cube_roundtrip(tmp_path):
    rng = np.random.default_rng(61)
    grid = rng.uniform(0, 5, size=(4, 3, 5))
    path = str(tmp_path / "g.cube")
    models.write_cube(path, grid, np.array([-1.0, -1.0, -1.0]), 0.5)
    lines = open(path).read().splitlines()
    assert lines[2].split()[0] == "1"
    nx = int(lines[3].split()[0])
    ny = int(lines[4].split()[0])
    nz = int(lines[5].split()[0])
    assert (nx, ny, nz) == (4, 3, 5)
    vals = np.array([float(x) for ln in lines[7:] for x in ln.split()])
    np.testing.assert_allclose(vals.reshape(4, 3, 5), grid, rtol=1e-4)
    # voxel in Bohr
    # %12.6f in the file: 6 decimals of precision
    assert float(lines[3].split()[1]) == pytest.approx(
        0.5 / 0.052917721092, abs=1e-6)


def test_sdf_errors(tmp_path):
    pts = np.array([[3.0, 3.0, 3.0], [3.3, 3.0, 3.0]])
    s = _system(pts, ["REF", "SAT"])
    path = str(tmp_path / "e.xtc")
    _write_xtc(path, pts[None])
    with pytest.raises(ParallelError):
        models.sdf(s, path, "Sat", "Ref", weights="charge")
    with pytest.raises(GroupError):
        models.sdf(s, path, "name NOSUCH", "Ref")
