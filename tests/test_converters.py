"""trjconv-class frame converters (models.convert).

Reference protocol: `src/structures/traj_convert.rs:19-161` (converter
chain semantics).  MakeWhole/Center wrap reference-parity System methods
(modifying.rs:338, utility.rs:109); Unwrap (nojump) is a surpass feature
pinned against the device MSD unwrapper and exact PBC constructions.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import System
from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology


def _tiny(points, simbox):
    pts = np.asarray(points, np.float32)
    topo = Topology(len(pts))
    topo.atomnum = np.arange(1, len(pts) + 1, dtype=np.int64)
    topo.resnum = np.ones(len(pts), np.int64)
    return System("t", topo, simbox=simbox, positions=pts)
from groan_rs_tpu.models import (
    CenterConverter,
    MakeWholeConverter,
    UnwrapConverter,
    convert_iter,
)


@pytest.fixture(scope="module")
def example(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_unwrap_matches_device_unwrap(example, test_files):
    """Per-frame nojump output == ops.msd.unwrap_orthorhombic on the
    whole trajectory (same min-image sampling assumption)."""
    import jax.numpy as jnp

    from groan_rs_tpu.ops import msd as msd_ops

    s = example.copy()
    xtc = os.path.join(test_files, "short_trajectory.xtc")

    conv = UnwrapConverter()
    unwrapped, boxes, raw = [], [], []
    for frame in convert_iter(s.xtc_iter(xtc), [conv]):
        unwrapped.append(frame.positions.copy())
        boxes.append(frame.get_box().to_lengths_vec())

    s2 = example.copy()
    for frame in s2.xtc_iter(xtc):
        raw.append(frame.positions.copy())

    dev = np.asarray(msd_ops.unwrap_orthorhombic(
        jnp.asarray(np.stack(raw)), jnp.asarray(np.stack(boxes))))
    np.testing.assert_allclose(np.stack(unwrapped), dev, atol=2e-4)
    # and the unwrap changed something (atoms do cross the box here)
    assert np.abs(np.stack(unwrapped) - np.stack(raw)).max() > 1.0


def test_unwrap_triclinic_exact():
    """A jump across any triclinic box vector is removed exactly."""
    h = np.array([[5.0, 0.0, 0.0],
                  [2.5, 4.0, 0.0],
                  [1.0, 1.5, 3.5]], dtype=np.float64)
    start = np.array([[0.4, 0.2, 0.1], [2.0, 1.0, 3.0]], dtype=np.float64)
    true_disp = np.array([[0.3, -0.2, 0.1], [-0.1, 0.4, -0.3]])
    # frame 1 = frame 0 + true displacement, then wrapped through images
    images = np.array([[1, -1, 0], [0, 2, -1]], dtype=np.float64)
    frame1 = start + true_disp + images @ h

    s0 = _tiny(start, SimBox.from_matrix(h))
    conv = UnwrapConverter()
    conv.convert(s0)  # first frame: taken as-is
    np.testing.assert_allclose(s0.positions, start, atol=1e-6)

    s1 = _tiny(frame1, SimBox.from_matrix(h))
    conv.convert(s1)
    np.testing.assert_allclose(s1.positions, start + true_disp, atol=1e-5)


def test_unwrap_npt_box_change():
    """Each frame uses its own box (NPT): a non-jumping atom in a
    shrinking box is untouched."""
    conv = UnwrapConverter()
    p = np.array([[1.0, 1.0, 1.0]], dtype=np.float32)
    s0 = _tiny(p.copy(), SimBox.from_lengths(4.0, 4.0, 4.0))
    conv.convert(s0)
    s1 = _tiny((p + 0.05).copy(), SimBox.from_lengths(3.8, 3.9, 4.0))
    conv.convert(s1)
    np.testing.assert_allclose(s1.positions, p + 0.05, atol=1e-6)


def test_make_whole_converter(test_files):
    """Equals calling make_molecules_whole per frame; molecules end whole."""
    tpr = os.path.join(test_files, "example.tpr")
    xtc = os.path.join(test_files, "short_trajectory.xtc")

    s = System.from_file(tpr)
    got = [f.positions.copy()
           for f in convert_iter(s.xtc_iter(xtc), [MakeWholeConverter()])]

    s2 = System.from_file(tpr)
    want = []
    for f in s2.xtc_iter(xtc):
        f.make_molecules_whole()
        want.append(f.positions.copy())
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert len(got) == 11


def test_center_converter(example, test_files):
    """Group center lands on the box center in the masked dimensions."""
    xtc = os.path.join(test_files, "short_trajectory.xtc")

    s = example.copy()
    s.group_create("Protein", "@protein")
    conv = CenterConverter("Protein", Dimension.XY)
    n = 0
    for frame in convert_iter(s.xtc_iter(xtc), [conv]):
        center = np.asarray(frame.group_estimate_center("Protein"))
        box_c = frame.get_box_center()
        np.testing.assert_allclose(center[:2], box_c[:2], atol=1e-3)
        n += 1
    assert n == 11

    # mass-weighted variant centers the COM instead (TPR carries masses)
    s2 = System.from_file(os.path.join(test_files, "example.tpr"))
    s2.group_create("Protein", "@protein")
    conv = CenterConverter("Protein", Dimension.XYZ, mass_weighted=True)
    for frame in convert_iter(s2.xtc_iter(xtc), [conv]):
        com = np.asarray(frame.group_estimate_com("Protein"))
        np.testing.assert_allclose(com, frame.get_box_center(), atol=1e-3)
        break
