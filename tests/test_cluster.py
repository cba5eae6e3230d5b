"""All-pairs RMSD matrix + GROMOS clustering (surpass — gmx rms -m /
gmx cluster -method gromos; the reference computes single-pair RMSD
only, rmsd.rs:432).

Pins `ops.rmsd.rmsd_matrix` against a float64 per-pair Kabsch oracle in
the repo's exact calc_rmsd convention, and `models.cluster` against the
Daura greedy algorithm on hand-built matrices and a planted-modes
trajectory.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.system import System

from test_rmsf import _frames, _system, _write_xtc, _rot, BOX

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def _pair_rmsd_f64(a, b, masses):
    """calc_rmsd convention in float64: mass-weighted centroids,
    unweighted covariance fit, mass-weighted deviations."""
    w = np.asarray(masses, np.float64)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ac = a - (w[:, None] * a).sum(0) / w.sum()
    bc = b - (w[:, None] * b).sum(0) / w.sum()
    h = ac.T @ bc
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(u @ vt))
    m = u @ np.diag([1.0, 1.0, d]) @ vt
    dev = bc @ m.T - ac          # rotate b onto a (pc.T@qc convention)
    return float(np.sqrt((w * (dev * dev).sum(1)).sum() / w.sum()))


def test_rmsd_matrix_matches_pair_oracle(tmp_path):
    frames, masses = _frames(n_frames=9, noise=0.06, seed=23)
    path = str(tmp_path / "m.xtc")
    _write_xtc(path, frames)
    s = _system(frames.shape[1], masses, frames[0])
    _, m = models.rmsd_matrix(s, path, "All", chunk=4)

    q = np.round(np.asarray(frames, np.float64) * 1e4) / 1e4
    f = q.shape[0]
    expect = np.zeros((f, f))
    for i in range(f):
        for j in range(f):
            expect[i, j] = _pair_rmsd_f64(q[i], q[j], masses)
    np.testing.assert_allclose(m, expect, rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(m, m.T, atol=1e-6)
    assert float(np.abs(np.diag(m)).max()) < 1e-5


def test_rmsd_matrix_rigid_rotations_are_zero(tmp_path):
    # pure rigid motion: every pair fits exactly -> all-zero matrix
    frames, masses = _frames(n_frames=8, noise=0.0, seed=31)
    path = str(tmp_path / "rigid.xtc")
    _write_xtc(path, frames)
    s = _system(frames.shape[1], masses, frames[0])
    _, m = models.rmsd_matrix(s, path, "All")
    assert float(m.max()) < 5e-4       # XTC quantization only


def test_gromos_clustering_hand_matrix():
    # 6 frames: {0,1,2} mutually close, {3,4} close, 5 alone
    big = 1.0
    m = np.full((6, 6), big)
    np.fill_diagonal(m, 0.0)
    for i, j in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        m[i, j] = m[j, i] = 0.05
    out = models.cluster(None, matrix=m, cutoff=0.1)
    assert out["sizes"].tolist() == [3, 2, 1]
    assert out["centers"].tolist() == [0, 3, 5]
    assert out["labels"].tolist() == [0, 0, 0, 1, 1, 2]

    # chain topology: 1 neighbours {0,2}; greedy picks 1 first, then
    # 0 and 2 are singletons? no — 0,2 were removed with 1; 3 alone
    m2 = np.full((4, 4), big)
    np.fill_diagonal(m2, 0.0)
    m2[0, 1] = m2[1, 0] = 0.05
    m2[1, 2] = m2[2, 1] = 0.05
    out2 = models.cluster(None, matrix=m2, cutoff=0.1)
    assert out2["sizes"].tolist() == [3, 1]
    assert out2["centers"].tolist() == [1, 3]

    with pytest.raises(ParallelError, match="square"):
        models.cluster(None, matrix=np.zeros((3, 4)))
    with pytest.raises(ParallelError, match="matrix"):
        models.cluster(None)


def test_cluster_planted_conformations(tmp_path):
    # three distinct conformations, each visited several times under
    # rigid motion + small noise; clustering must recover the plan
    rng = np.random.default_rng(42)
    k = 30
    confs = [rng.uniform(-0.8, 0.8, size=(k, 3)) for _ in range(3)]
    plan = [0, 1, 2, 0, 1, 2, 0, 0, 1, 2, 2, 0]
    frames = np.empty((len(plan), k, 3), np.float32)
    for f, c in enumerate(plan):
        r = _rot(rng.normal(size=3), rng.uniform(0, 2 * np.pi))
        t = BOX / 2 + rng.uniform(-1.0, 1.0, size=3)
        pts = confs[c] + rng.normal(size=(k, 3)) * 0.01
        frames[f] = (pts @ r.T + t).astype(np.float32)
    path = str(tmp_path / "three.xtc")
    _write_xtc(path, frames)
    s = _system(k, np.ones(k, np.float32), frames[0])

    out = models.cluster(s, path, "All", cutoff=0.1)
    assert out["sizes"].tolist() == [5, 4, 3]       # sizes of 0s, 1/2s
    # frames of the same planted conformation share a label, and
    # different conformations never share one
    labels = out["labels"]
    for c in range(3):
        sel = [f for f, pc in enumerate(plan) if pc == c]
        assert len(set(labels[sel])) == 1
    assert len(set(labels)) == 3
    # medoid property: each centre belongs to its own cluster
    for cid, ctr in enumerate(out["centers"]):
        assert labels[ctr] == cid
    # matrix reuse path gives the identical result
    again = models.cluster(None, matrix=out["matrix"], cutoff=0.1)
    np.testing.assert_array_equal(again["labels"], labels)


def test_rmsd_matrix_fixture_row_vs_calc_rmsd():
    """Row 0 of the matrix == the reference-convention RMSD of every
    frame against frame 0 (the rmsd.rs doc-test series anchors
    calc_rmsd itself; here we anchor the matrix against calc_rmsd)."""
    from groan_rs_tpu.io.traj import open_source

    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    _, m = models.rmsd_matrix(s, xtc, "Protein")

    src = open_source(xtc)
    fb = src.read_batch(np.arange(src.n_frames()))
    idx = s.group_indices("Protein")
    masses = np.asarray(s.topology.mass)[idx]

    # oracle must mirror prepare_coords: shift each frame's group COM to
    # its own box center and wrap, in float64
    b9 = fb.box_matrices()
    boxes = np.stack([np.diag(b9[f]) for f in range(b9.shape[0])])
    w = masses.astype(np.float64)

    def prep(p, box):
        p = np.asarray(p, np.float64)
        # Bai-Breen circular-mean center (matching ops.center) is within
        # float tolerance of the arithmetic COM for this compact group
        com = (w[:, None] * p).sum(0) / w.sum()
        sh = p + (box / 2 - com)
        return sh - np.floor(sh / box) * box

    f = fb.positions.shape[0]
    p0 = prep(fb.positions[0][idx], boxes[0])
    for j in range(f):
        pj = prep(fb.positions[j][idx], boxes[j])
        assert abs(m[0, j] - _pair_rmsd_f64(p0, pj, masses)) < 5e-4
    assert m.shape == (f, f)


def test_linkage_chains_where_gromos_splits():
    # frames on a line, spacing 0.09 nm, cutoff 0.1: single linkage
    # chains everything into ONE cluster; gromos splits it
    f = 9
    x = np.arange(f) * 0.09
    m = np.abs(x[:, None] - x[None, :])
    link = models.cluster(None, matrix=m, cutoff=0.1, method="linkage")
    assert len(link["sizes"]) == 1 and link["sizes"][0] == f
    assert (link["labels"] == 0).all()
    # medoid of the chain is its middle
    assert link["centers"][0] == f // 2
    grom = models.cluster(None, matrix=m, cutoff=0.1, method="gromos")
    assert len(grom["sizes"]) > 1


def test_jarvis_patrick_two_groups():
    # two tight 4-frame groups far apart + one outlier
    pts = np.r_[np.arange(4) * 0.01,
                5.0 + np.arange(4) * 0.01,
                20.0]
    m = np.abs(pts[:, None] - pts[None, :])
    out = models.cluster(None, matrix=m, method="jarvis-patrick",
                         jp_m=3, jp_p=2)
    assert out["sizes"].tolist() == [4, 4, 1]
    assert len(set(out["labels"][:4])) == 1
    assert len(set(out["labels"][4:8])) == 1
    assert out["labels"][8] not in out["labels"][:8]


def test_cluster_method_errors():
    m = np.zeros((3, 3))
    with pytest.raises(ParallelError):
        models.cluster(None, matrix=m, method="kmeans")
    with pytest.raises(ParallelError):
        models.cluster(None, matrix=m, method="jarvis-patrick", jp_m=5)
