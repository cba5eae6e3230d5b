"""Strict dense hbonds: decision-boundary exactness by construction.

A donor-H-acceptor triple is engineered so the D-H-A angle equals the
threshold EXACTLY in host float32 — the worst case for a device kernel
whose libm may differ by ulps.  The strict dense path must (a) flag the
frame via the in-step guard counter and (b) end up bit-equal to the exact
host/cells scoring after the re-read re-score (hbonds.rs:302-340)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.io import native
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.system import System
from groan_rs_tpu.system.hbonds import HBondChain, make_dense_counter

pytestmark = pytest.mark.device_parity


def _mesh1():
    import jax

    from groan_rs_tpu.parallel.engine import make_mesh

    return make_mesh(1, 1, devices=jax.devices()[:1])


@pytest.fixture(scope="module")
def threshold_case(tmp_path_factory):
    """A 3-atom D/H/A system + 3-frame XTC with the middle frame's angle
    exactly at the float32 threshold."""
    box = np.array([3.0, 3.0, 3.0], np.float32)
    topo = Topology.from_columns(
        resnum=np.array([1, 1, 1], np.int64),
        resname=["MOL", "MOL", "MOL"],
        atomname=["OD", "H1", "OA"],
        atomnum=np.array([1, 2, 3], np.int64),
    )
    topo.set_bonds_from_pairs(np.array([[0, 1]], np.int64))

    pos = np.array([
        [1.00, 1.00, 1.00],   # OD (donor)
        [1.10, 1.02, 1.00],   # H1 bonded to OD
        [1.31, 1.17, 1.00],   # OA (acceptor)
    ], np.float32)
    xtc = str(tmp_path_factory.mktemp("hb") / "thr.xtc")
    box9 = np.diag(box).astype(np.float32).reshape(9)
    for f in range(3):
        p = pos.copy()
        p[2, 2] += 0.004 * (f - 1)  # frames 0/2 off-threshold
        native.xtc_write_frame(xtc, 3, f, float(f), box9, p, 1000.0)

    s = System("thr", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=pos)
    s.set_precision(1000)
    chains = [HBondChain("name OA", "name OD", "name H1")]

    # exact host f32 angle of the middle frame's (dequantized) triple
    off, _, _, n = native.xtc_scan(xtc)
    c, *_ = native.xtc_read_frames(xtc, off, n)
    qpos = np.asarray(c[1], np.float32)
    s2 = s.copy()
    s2.positions[:] = qpos
    bonds = s2.hbonds_analyze_frame(chains, [(0, 0)], max_distance=0.5,
                                    min_angle=0.0)
    (hb,) = bonds[(0, 0)]
    thr = np.float32(hb.angle)
    return s, chains, xtc, thr, qpos, box


def test_guard_fires_at_threshold(threshold_case):
    import jax.numpy as jnp

    from groan_rs_tpu.system.hbonds import HBondAnalysis

    s, chains, xtc, thr, qpos, box = threshold_case
    ana = HBondAnalysis(s, chains, [(0, 0)], 0.5, float(thr))
    count = make_dense_counter(ana, with_guard=True)
    counts, guarded = count(jnp.asarray(qpos[None]), jnp.asarray(box[None]))
    # the angle sits exactly ON the threshold: the guard band must flag it
    assert int(np.asarray(guarded)[0]) >= 1


def test_strict_dense_equals_cells_at_threshold(threshold_case):
    s, chains, xtc, thr, qpos, box = threshold_case

    def run(method, strict=True):
        pipe = TrajectoryAnalysis(s.copy(), mesh=_mesh1())
        pipe.add_hbonds(chains, [(0, 0)], 0.5, float(thr), name="hb",
                        method=method, strict=strict)
        return pipe.runner(ship="all").run(xtc, batch_size=2)

    dense = run("dense")
    cells = run("cells")
    np.testing.assert_array_equal(dense["hb_0_0"], cells["hb_0_0"])
    # host semantics: angle == threshold is KEPT (criterion is
    # `!(angle < min_angle)`, hbonds.rs:256) -> the middle frame counts 1
    assert int(dense["hb_0_0"][1]) == 1
    # the guard key never leaks to users
    assert not any(k.startswith("__guard__") for k in dense)
