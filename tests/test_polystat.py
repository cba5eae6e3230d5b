"""Polymer statistics (surpass — `gmx polystat`; absent from the reference).

Pins `models.polystat` with exact geometric constructions (rod, PBC-split
rod, zigzag correlation), a float64 host oracle on ragged random-walk
chains, and the TPR water fixture (every SETTLE water is a 3-atom chain).
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.io import native
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def _chain_system(chain_lens, box, masses=None):
    n = int(sum(chain_lens))
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    if masses is not None:
        topo.mass = np.asarray(masses, np.float64)
        topo.has_mass = np.ones(n, bool)
    s = System("poly", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.zeros((n, 3), np.float32))
    at = 0
    for ln in chain_lens:
        for i in range(at, at + ln - 1):
            s.add_bond(i, i + 1)
        at += ln
    s.group_create_from_ranges("Poly", [(0, n - 1)])
    return s


def _write_xtc(tmp_path, frames, box):
    path = str(tmp_path / "poly.xtc")
    b9 = np.diag(np.asarray(box, np.float32)).reshape(9)
    for fidx, pos in enumerate(frames):
        native.xtc_write_frame(path, pos.shape[0], fidx, float(fidx), b9,
                               np.asarray(pos, np.float32), 1000.0)
    return path


def test_rod_exact(tmp_path):
    # 6 beads, spacing 0.3 along x: ete = 1.5, Rg^2 = d^2 (n^2-1)/12
    n, d = 6, 0.3
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = 1.0 + d * np.arange(n)
    pos[:, 1:] = 2.0
    s = _chain_system([n], (50.0, 50.0, 50.0))
    path = _write_xtc(tmp_path, [pos, pos], (50.0, 50.0, 50.0))

    out = models.polystat(s, path, "Poly")
    np.testing.assert_allclose(out["ete"], [1.5, 1.5], rtol=1e-5)
    np.testing.assert_allclose(out["rg2"], d * d * (n * n - 1) / 12.0,
                               rtol=1e-4)
    np.testing.assert_allclose(out["bond_corr"], np.ones(n - 1), atol=1e-5)
    np.testing.assert_allclose(out["mean_bond_length"], d, rtol=1e-5)
    assert out["n_chains"] == 1 and np.isnan(out["persistence_length"])


def test_rod_pbc_split_invariant(tmp_path):
    # the same rod wrapped through a 1 nm box: identical statistics
    n, d, box = 6, 0.3, (1.0, 1.0, 1.0)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = 0.8 + d * np.arange(n)   # crosses x twice
    pos[:, 1:] = 0.5
    wrapped = np.mod(pos, np.asarray(box, np.float32))
    s = _chain_system([n], box)
    path = _write_xtc(tmp_path, [wrapped], box)

    out = models.polystat(s, path, "Poly")
    np.testing.assert_allclose(out["ete"], [1.5], rtol=1e-4)
    np.testing.assert_allclose(out["rg2"], d * d * (n * n - 1) / 12.0,
                               rtol=1e-3)
    np.testing.assert_allclose(out["mean_bond_length"], d, rtol=1e-4)


def test_zigzag_bond_correlation(tmp_path):
    # bonds alternate between two directions 2a apart:
    # C(1) = cos(2a), C(2) = 1
    a = np.deg2rad(25.0)
    ua = np.array([np.cos(a), np.sin(a), 0.0])
    ub = np.array([np.cos(a), -np.sin(a), 0.0])
    n = 9
    pos = np.zeros((n, 3))
    pos[0] = [1.0, 5.0, 5.0]
    for i in range(1, n):
        pos[i] = pos[i - 1] + 0.2 * (ua if i % 2 else ub)
    s = _chain_system([n], (50.0, 50.0, 50.0))
    path = _write_xtc(tmp_path, [pos], (50.0, 50.0, 50.0))

    out = models.polystat(s, path, "Poly")
    assert out["bond_corr"][0] == pytest.approx(1.0, abs=1e-5)
    assert out["bond_corr"][1] == pytest.approx(np.cos(2 * a), abs=1e-4)
    assert out["bond_corr"][2] == pytest.approx(1.0, abs=1e-4)
    # persistence length from C(1)
    assert out["persistence_length"] == pytest.approx(
        -0.2 / np.log(np.cos(2 * a)), rel=1e-3)


def _host_oracle(frames, box, chains, weights):
    """float64 reimplementation: min-image chain rebuild + stats."""
    box = np.asarray(box, np.float64)
    e2s, rg2s, bls = [], [], []
    lmax = max(len(c) for c in chains)
    csum = np.zeros(lmax - 1)
    ccnt = np.zeros(lmax - 1)
    for pos in frames:
        pos = np.asarray(pos, np.float64)
        e2f, rgf, blf = [], [], []
        for c, w in zip(chains, weights):
            g = pos[c]
            d = g[1:] - g[:-1]
            d -= box * np.round(d / box)
            rel = np.concatenate([np.zeros((1, 3)), np.cumsum(d, 0)])
            e2f.append(float(rel[-1] @ rel[-1]))
            com = (w[:, None] * rel).sum(0) / w.sum()
            rgf.append(float((w * ((rel - com) ** 2).sum(1)).sum() / w.sum()))
            bl = np.linalg.norm(d, axis=1)
            blf.append(bl)
            u = d / bl[:, None]
            for k in range(len(c) - 1):
                dots = (u[: len(u) - k] * u[k:]).sum(1)
                csum[k] += dots.sum()
                ccnt[k] += len(dots)
        e2s.append(np.mean(e2f))
        rg2s.append(np.mean(rgf))
        bls.append(np.concatenate(blf))
    nb = sum(len(c) - 1 for c in chains)
    mean_bl = float(np.concatenate(bls).sum() / (len(frames) * nb))
    return (np.array(e2s), np.array(rg2s), csum / ccnt, mean_bl)


def test_ragged_random_walk_oracle(tmp_path):
    rng = np.random.default_rng(11)
    chain_lens = [5, 9, 3, 7]
    box = (4.0, 4.0, 4.0)
    n = sum(chain_lens)
    frames = []
    for _ in range(6):
        pos = []
        for ln in chain_lens:
            p0 = rng.uniform(0, 4, 3)
            steps = rng.normal(size=(ln - 1, 3)) * 0.25
            pos.append(p0 + np.concatenate([np.zeros((1, 3)),
                                            np.cumsum(steps, 0)]))
        frames.append(np.mod(np.concatenate(pos), box).astype(np.float32))

    masses = rng.uniform(1.0, 16.0, n)
    s = _chain_system(chain_lens, box, masses=masses)
    path = _write_xtc(tmp_path, frames, box)

    # the file quantizes to 0.001 nm: oracle on the quantized coords
    qframes = [np.round(f.astype(np.float64) * 1000) / 1000 for f in frames]
    chains, at = [], 0
    for ln in chain_lens:
        chains.append(np.arange(at, at + ln))
        at += ln

    out = models.polystat(s, path, "Poly")
    ones = [np.ones(ln) for ln in chain_lens]
    e2, rg2, corr, mbl = _host_oracle(qframes, box, chains, ones)
    np.testing.assert_allclose(out["ete2"], e2, rtol=5e-4)
    np.testing.assert_allclose(out["rg2"], rg2, rtol=5e-4)
    np.testing.assert_allclose(out["bond_corr"], corr, atol=5e-4)
    np.testing.assert_allclose(out["mean_bond_length"], mbl, rtol=1e-4)
    assert list(out["chain_lengths"]) == chain_lens

    # mass-weighted Rg against the weighted oracle
    outw = models.polystat(s, path, "Poly", mass_weighted=True)
    ws = [masses[c] for c in chains]
    _, rg2w, _, _ = _host_oracle(qframes, box, chains, ws)
    np.testing.assert_allclose(outw["rg2"], rg2w, rtol=5e-4)
    np.testing.assert_allclose(outw["ete2"], e2, rtol=5e-4)


def test_fixture_waters():
    """Every TPR SETTLE water is a 3-atom chain; oracle via per-frame
    make_molecules_whole in float64."""
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s.group_create("Water", "@water")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")

    out = models.polystat(s, xtc, "Water")
    widx = np.asarray(s.group_indices("Water"))
    assert out["n_chains"] == len(widx) // 3
    assert set(out["chain_lengths"].tolist()) == {3}

    # float64 oracle on frame 0
    s2 = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s2.group_create("Water", "@water")
    it = s2.xtc_iter(xtc)
    frame = next(iter(it))
    frame.make_molecules_whole()
    pos = frame.positions.astype(np.float64)[widx].reshape(-1, 3, 3)
    e2 = ((pos[:, 2] - pos[:, 0]) ** 2).sum(1).mean()
    com = pos.mean(axis=1, keepdims=True)
    rg2 = ((pos - com) ** 2).sum(2).mean()
    assert out["ete2"][0] == pytest.approx(e2, rel=1e-3)
    assert out["rg2"][0] == pytest.approx(rg2, rel=1e-3)

    # a bondless group raises
    s.group_create_from_ranges("One", [(0, 0)])
    with pytest.raises(GroupError):
        models.polystat(s, xtc, "One")
