"""Aggregate cluster-size analysis (surpass — `gmx clustsize`; absent
from the reference).

Pins `models.clustsize` against exact blob constructions (separated /
bridged / PBC-split), a float64 brute-force BFS oracle, and the
molecule mode against hand-built bond graphs.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([10.0, 10.0, 10.0], np.float32)


def _write_xtc(path, frames):
    from groan_rs_tpu.io import native

    for fidx in range(frames.shape[0]):
        b9 = np.diag(BOX).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32), 100000.0)


def _system(positions, bonds=()):
    n = positions.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    s = System("clust", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.asarray(positions, np.float32))
    for i, j in bonds:
        s.add_bond(i, j)
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def test_two_blobs_separate_then_merge(tmp_path):
    # 3-atom blob at (2,2,2), 2-atom blob at (7,7,7); frame 1 moves the
    # second blob to within cutoff of the first
    blob1 = np.array([[2.0, 2, 2], [2.2, 2, 2], [2.0, 2.2, 2]])
    blob2 = np.array([[7.0, 7, 7], [7.2, 7, 7]])
    f0 = np.vstack([blob1, blob2])
    f1 = np.vstack([blob1, blob2 - 4.85])   # -> 0.218 nm from blob1
    frames = np.stack([f0, f1])
    path = str(tmp_path / "blobs.xtc")
    _write_xtc(path, frames)
    s = _system(f0)

    out = models.clustsize(s, path, "All", cutoff=0.35, mode="atom")
    assert out["n_entities"] == 5
    np.testing.assert_array_equal(out["n_clusters"], [2, 1])
    np.testing.assert_array_equal(out["max_size"], [3, 5])
    np.testing.assert_array_equal(out["labels"][0], [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(out["labels"][1], [0, 0, 0, 0, 0])
    np.testing.assert_allclose(out["mean_size"], [2.5, 5.0])
    np.testing.assert_allclose(out["mean_size_w"], [(9 + 4) / 5, 5.0])
    # frame 0: one 3-cluster + one 2-cluster; frame 1: one 5-cluster
    expect_hist = np.zeros(6, np.int64)
    expect_hist[2] = 1
    expect_hist[3] = 1
    expect_hist[5] = 1
    np.testing.assert_array_equal(out["size_hist"], expect_hist)


def test_pbc_split_blob_is_one_cluster(tmp_path):
    # pair straddling the x boundary: 9.9 and 0.1 are 0.2 apart min-image
    pts = np.array([[9.9, 5, 5], [0.1, 5, 5], [5.0, 5, 5]])
    path = str(tmp_path / "pbc.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts)
    out = models.clustsize(s, path, "All", cutoff=0.35, mode="atom")
    assert out["n_clusters"][0] == 2
    assert out["labels"][0][0] == out["labels"][0][1]


def test_chain_spacing_threshold(tmp_path):
    # 8 atoms in a line: spacing 0.3 < cutoff chains them all; spacing
    # 0.4 > cutoff isolates every atom
    n = 8
    near = np.stack([np.arange(n) * 0.3 + 1.0,
                     np.full(n, 5.0), np.full(n, 5.0)], axis=1)
    far = np.stack([np.arange(n) * 0.4 + 1.0,
                    np.full(n, 5.0), np.full(n, 5.0)], axis=1)
    frames = np.stack([near, far])
    path = str(tmp_path / "chain.xtc")
    _write_xtc(path, frames)
    s = _system(near)
    out = models.clustsize(s, path, "All", cutoff=0.35, mode="atom")
    np.testing.assert_array_equal(out["n_clusters"], [1, n])
    np.testing.assert_array_equal(out["max_size"], [n, 1])


def test_molecule_mode_bridging(tmp_path):
    # two 2-atom molecules; the gap between them is 0.3 (< cutoff), so
    # molecule mode sees ONE cluster of 2 molecules while the molecules
    # themselves stay distinct entities
    pts = np.array([[2.0, 5, 5], [2.2, 5, 5],     # molecule A
                    [2.5, 5, 5], [2.7, 5, 5],     # molecule B
                    [8.0, 5, 5]])                 # lone atom C
    path = str(tmp_path / "mol.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, bonds=[(0, 1), (2, 3)])
    out = models.clustsize(s, path, "All", cutoff=0.35, mode="molecule")
    assert out["mode"] == "molecule"
    assert out["n_entities"] == 3
    assert out["n_clusters"][0] == 2
    assert out["max_size"][0] == 2
    np.testing.assert_array_equal(out["labels"][0], [0, 0, 1])

    # atom mode on the same frame: 4 contact-chained atoms + 1 lone
    out_a = models.clustsize(s, path, "All", cutoff=0.35, mode="atom")
    assert out_a["n_entities"] == 5
    assert out_a["n_clusters"][0] == 2
    assert out_a["max_size"][0] == 4


def _oracle_components(pts, box, cutoff):
    """float64 brute-force min-image adjacency + BFS components."""
    n = len(pts)
    d = pts[:, None, :] - pts[None, :, :]
    d -= np.round(d / box) * box
    adj = np.sqrt((d ** 2).sum(-1)) < cutoff
    seen = np.full(n, -1)
    lab = 0
    for i in range(n):
        if seen[i] >= 0:
            continue
        stack = [i]
        while stack:
            j = stack.pop()
            if seen[j] >= 0:
                continue
            seen[j] = lab
            stack.extend(np.nonzero(adj[j])[0].tolist())
        lab += 1
    return seen, lab


def test_matches_brute_force_oracle(tmp_path):
    rng = np.random.default_rng(42)
    frames = rng.uniform(0, 10, size=(4, 40, 3))
    path = str(tmp_path / "rand.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0])
    out = models.clustsize(s, path, "All", cutoff=0.7, mode="atom")
    q = np.round(frames * 100000.0) / 100000.0
    for f in range(4):
        seen, nlab = _oracle_components(
            np.asarray(q[f], np.float64), np.asarray(BOX, np.float64), 0.7)
        assert out["n_clusters"][f] == nlab
        # identical partition (labels both numbered by first appearance)
        np.testing.assert_array_equal(out["labels"][f], seen)
        sizes = np.bincount(seen)
        assert out["max_size"][f] == sizes.max()


def test_bad_mode_raises(tmp_path):
    pts = np.array([[5.0, 5, 5]])
    path = str(tmp_path / "one.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts)
    with pytest.raises(ParallelError):
        models.clustsize(s, path, "All", mode="residue")


def test_fixture_peptide():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s.group_create("P", "@protein")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.clustsize(s, xtc, "P", cutoff=0.35, mode="atom",
                           batch_size=8, chunk=32)
    f, m = out["labels"].shape
    assert m == out["n_entities"] > 100
    # a covalently bonded peptide is contact-percolated at 0.35 nm:
    # one cluster containing every atom, every frame
    np.testing.assert_array_equal(out["n_clusters"], np.ones(f))
    np.testing.assert_array_equal(out["max_size"], np.full(f, m))
    # histogram bookkeeping: total entity count over all (frame, cluster)
    assert (out["size_hist"] * np.arange(m + 1)).sum() == f * m

    # molecule mode: the whole peptide is one bonded molecule
    out_m = models.clustsize(s, xtc, "P", cutoff=0.35, mode="molecule",
                             batch_size=8)
    assert out_m["n_entities"] == 1
    np.testing.assert_array_equal(out_m["n_clusters"], np.ones(f))
