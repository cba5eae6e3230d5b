"""Periodic-image minimum distance (surpass — the `gmx mindist -pi`
workload; absent from the reference).

Pins `ops.distances.self_image_min` / `models.pi_mindist` against exact
single- and two-atom constructions (orthorhombic and triclinic), a
float64 brute-force oracle over all 26 images, chunk invariance, and
the reference fixture corpus.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.ops import distances as distance_ops

from test_rmsf import _system, _write_xtc

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def _oracle(pos, rows):
    """float64 min-image / max-internal over all 26 shifts, one frame."""
    pos = np.asarray(pos, np.float64)
    rows = np.asarray(rows, np.float64)
    mn = np.inf
    mx = 0.0
    d0 = pos[:, None, :] - pos[None, :, :]
    mx = float(np.sqrt((d0 ** 2).sum(-1).max()))
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            for c in (-1, 0, 1):
                if (a, b, c) == (0, 0, 0):
                    continue
                s = a * rows[0] + b * rows[1] + c * rows[2]
                dist = np.sqrt(((d0 + s) ** 2).sum(-1))
                mn = min(mn, float(dist.min()))
    return mn, mx


def test_single_atom_min_is_shortest_box_vector():
    pos = np.array([[[1.0, 1.5, 2.0]]], np.float32)       # [1, 1, 3]
    boxes = np.array([[2.0, 3.0, 4.0]], np.float32)
    mn, mx = distance_ops.self_image_min(pos, boxes)
    assert float(mn[0]) == pytest.approx(2.0, abs=1e-6)
    assert float(mx[0]) == 0.0


def test_two_atoms_across_boundary_exact():
    # direct separation 4.6 along x; through the +x image only 0.4
    pos = np.array([[[0.2, 1.0, 1.0], [4.8, 1.0, 1.0]]], np.float32)
    boxes = np.array([[5.0, 7.0, 7.0]], np.float32)
    mn, mx = distance_ops.self_image_min(pos, boxes)
    assert float(mn[0]) == pytest.approx(0.4, abs=1e-6)
    assert float(mx[0]) == pytest.approx(4.6, abs=1e-6)


def test_triclinic_single_atom():
    rows = np.array([[[2.0, 0.0, 0.0],
                      [1.0, 2.0, 0.0],
                      [0.0, 0.0, 3.0]]], np.float32)
    pos = np.array([[[0.3, 0.4, 0.5]]], np.float32)
    mn, _ = distance_ops.self_image_min(pos, rows)
    expect, _ = _oracle(pos[0], rows[0])
    # shortest combination is b - a = (-1, 2, 0), length sqrt(5)... the
    # oracle enumerates all 26; the kernel must agree exactly
    assert float(mn[0]) == pytest.approx(expect, rel=1e-6)
    assert expect == pytest.approx(2.0)         # |a| is the shortest


def test_brute_force_oracle_and_chunk_invariance():
    rng = np.random.default_rng(13)
    f, k = 4, 37
    boxes = rng.uniform(3.0, 5.0, size=(f, 3)).astype(np.float32)
    pos = (rng.uniform(0.0, 1.0, size=(f, k, 3))
           * boxes[:, None, :]).astype(np.float32)
    mn, mx = distance_ops.self_image_min(pos, boxes, chunk=16)
    mn3, mx3 = distance_ops.self_image_min(pos, boxes, chunk=5)
    np.testing.assert_allclose(np.asarray(mn), np.asarray(mn3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mx3), atol=1e-6)
    for fr in range(f):
        omn, omx = _oracle(pos[fr], np.diag(boxes[fr]))
        assert float(mn[fr]) == pytest.approx(omn, rel=2e-5, abs=1e-5)
        assert float(mx[fr]) == pytest.approx(omx, rel=2e-5, abs=1e-5)


def test_triclinic_random_oracle():
    rng = np.random.default_rng(17)
    f, k = 3, 21
    rows = np.zeros((f, 3, 3), np.float32)
    rows[:, 0, 0] = rng.uniform(3.0, 5.0, f)
    rows[:, 1, 0] = rng.uniform(-1.0, 1.0, f)
    rows[:, 1, 1] = rng.uniform(3.0, 5.0, f)
    rows[:, 2, 0] = rng.uniform(-1.0, 1.0, f)
    rows[:, 2, 1] = rng.uniform(-1.0, 1.0, f)
    rows[:, 2, 2] = rng.uniform(3.0, 5.0, f)
    pos = rng.uniform(0.0, 3.0, size=(f, k, 3)).astype(np.float32)
    mn, mx = distance_ops.self_image_min(pos, rows)
    for fr in range(f):
        omn, omx = _oracle(pos[fr], rows[fr])
        assert float(mn[fr]) == pytest.approx(omn, rel=2e-5, abs=1e-5)
        assert float(mx[fr]) == pytest.approx(omx, rel=2e-5, abs=1e-5)


def test_model_on_synthetic_trajectory(tmp_path):
    rng = np.random.default_rng(19)
    f, k = 6, 30
    base = rng.uniform(0.0, 4.0, size=(k, 3))
    frames = (base[None]
              + rng.normal(scale=0.1, size=(f, k, 3))).astype(np.float32)
    path = str(tmp_path / "pi.xtc")
    _write_xtc(path, frames)
    s = _system(k, np.ones(k, np.float32), base)
    out = models.pi_mindist(s, path, "All", chunk=7)
    assert out["min_image"].shape == (f,) and out["times"].shape == (f,)
    from test_rmsf import BOX

    for fr in range(f):
        omn, omx = _oracle(frames[fr], np.diag(np.asarray(BOX, np.float64)))
        assert out["min_image"][fr] == pytest.approx(omn, rel=2e-5, abs=2e-4)
        assert out["max_internal"][fr] == pytest.approx(
            omx, rel=2e-5, abs=2e-4)


def test_fixture_protein(test_files):
    import os

    from groan_rs_tpu.system import System

    s = System.from_file(os.path.join(test_files, "example.tpr"))
    s.group_create("Prot", "@protein")
    out = models.pi_mindist(
        s, os.path.join(test_files, "short_trajectory.xtc"), "Prot")
    # a solvated protein never touches its image at closer than a few
    # angstroms, and its extent is bounded by the box diagonal
    assert (out["min_image"] > 0.1).all()
    assert (out["max_internal"] > 0.5).all()
    assert (out["min_image"] < 10.0).all()
    # oracle on frame 0 (read host-side)
    fr0 = next(iter(s.copy().xtc_iter(
        os.path.join(test_files, "short_trajectory.xtc"))))
    idx = s.group_indices("Prot")
    pos0 = np.asarray(fr0.positions)[idx]
    from groan_rs_tpu.core.simbox import simbox_check

    lens = simbox_check(fr0.get_box()).to_lengths_vec()
    omn, omx = _oracle(pos0, np.diag(np.asarray(lens, np.float64)))
    assert out["min_image"][0] == pytest.approx(omn, rel=1e-4, abs=2e-4)
    assert out["max_internal"][0] == pytest.approx(omx, rel=1e-4, abs=2e-4)
