"""Density profiles, order parameters, dipole moments (surpass analyses).

Density profile: `gmx density` semantics — fractional-coordinate slabs,
per-frame slab-volume normalization.  Order parameters: `gmx order` /
gorder semantics — S = (3 cos^2 theta - 1)/2 per heavy-atom->hydrogen
bond vs the membrane normal.  Dipole: `gmx dipoles` semantics — charge-
weighted minimum-image displacements from the group's refined COM.
All pinned against float64 host oracles on the reference fixture corpus
plus exact known-value constructions.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def host_refined_center(p, box, w=None):
    """Float64 refined Bai-Breen center (iterators.rs:1237-1266)."""
    p = np.asarray(p, np.float64)
    box = np.asarray(box, np.float64)
    w = np.ones(len(p)) if w is None else np.asarray(w, np.float64)
    theta = np.mod(p, box) * (2 * np.pi / box)
    xi = (w[:, None] * np.cos(theta)).sum(0)
    zeta = (w[:, None] * np.sin(theta)).sum(0)
    est = (np.arctan2(-zeta, -xi) + np.pi) * box / (2 * np.pi)
    d = p - est
    d -= box * np.round(d / box)
    return (w[:, None] * (est + d)).sum(0) / w.sum()


def host_profile(p, box, ax, n_bins, w=None, scale=1.0):
    p = np.asarray(p, np.float64)
    box = np.asarray(box, np.float64)
    w = np.ones(len(p)) if w is None else np.asarray(w, np.float64)
    frac = np.mod(p[:, ax] / box[ax], 1.0)
    bi = np.clip((frac * n_bins).astype(np.int64), 0, n_bins - 1)
    hist = np.zeros(n_bins)
    np.add.at(hist, bi, w)
    return hist * (n_bins * scale) / np.prod(box)


def host_dipole(p, box, q, m):
    p = np.asarray(p, np.float64)
    box = np.asarray(box, np.float64)
    c = host_refined_center(p, box, np.asarray(m, np.float64))
    d = p - c
    d -= box * np.round(d / box)
    return (np.asarray(q, np.float64)[:, None] * d).sum(0)


def host_order(pc, ph, box, nvec):
    d = np.asarray(ph, np.float64) - np.asarray(pc, np.float64)
    box = np.asarray(box, np.float64)
    d -= box * np.round(d / box)
    cos2 = (d @ np.asarray(nvec, np.float64)) ** 2 / (d * d).sum(-1)
    return 1.5 * cos2 - 0.5


@pytest.fixture(scope="module")
def tpr_system():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    return s


def _frames(xtc):
    from groan_rs_tpu.io import native

    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, b9, *_ = native.xtc_read_frames(xtc, offsets, natoms)
    return coords, b9


def test_density_profile_fixture_parity(tpr_system):
    s = tpr_system
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = (TrajectoryAnalysis(s)
           .add_density_profile("Protein", axis="z", n_bins=24, name="num")
           .add_density_profile("Protein", axis="x", n_bins=10, mode="mass",
                                name="mass")
           .run(xtc, batch_size=4))

    coords, b9 = _frames(xtc)
    idx = s.group_indices("Protein")
    m = np.asarray(s.topology.mass)[idx]
    amu = 1.66053906660
    for f in range(coords.shape[0]):
        box = b9[f][[0, 4, 8]]
        np.testing.assert_allclose(
            out["num"][f], host_profile(coords[f][idx], box, 2, 24),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            out["mass"][f],
            host_profile(coords[f][idx], box, 0, 10, w=m, scale=amu),
            rtol=1e-3, atol=1e-2)
        # integral identity: sum over slabs x slab volume == group content
        vol = float(np.prod(box.astype(np.float64)))
        assert abs(out["num"][f].sum() * vol / 24 - len(idx)) < 1e-2
        assert abs(out["mass"][f].sum() * vol / 10 / amu - m.sum()) < 0.5


def test_density_profile_charge_mode_and_errors(tpr_system):
    s = tpr_system
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = (TrajectoryAnalysis(s)
           .add_density_profile("Protein", axis="y", n_bins=8, mode="charge",
                                name="qp")
           .run(xtc, batch_size=6))
    coords, b9 = _frames(xtc)
    idx = s.group_indices("Protein")
    q = np.asarray(s.topology.charge)[idx]
    box = b9[0][[0, 4, 8]]
    np.testing.assert_allclose(
        out["qp"][0], host_profile(coords[0][idx], box, 1, 8, w=q),
        rtol=1e-3, atol=1e-3)

    with pytest.raises(GroupError, match="axis"):
        TrajectoryAnalysis(s).add_density_profile("Protein", axis="w")
    with pytest.raises(GroupError, match="mode"):
        TrajectoryAnalysis(s).add_density_profile("Protein", mode="energy")


def test_density_profile_triclinic_matches_f64_oracle():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    h = np.array([[5.0, 0.0, 0.0],
                  [2.5, 4.33, 0.0],
                  [1.0, 0.8, 4.0]], np.float32)  # GROMACS-legal triclinic
    n = 96
    frac = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    pos = frac @ h
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    s = System("tric", topo, simbox=SimBox.from_matrix(h), positions=pos)
    s.group_create_from_ranges("A", [(0, n - 1)])

    pipe = (TrajectoryAnalysis(s, triclinic=True)
            .add_density_profile("A", axis="z", n_bins=12, name="p"))
    fn = jax.jit(pipe.step_fn(None))
    res = fn(jnp.asarray(pos)[None], jnp.asarray(h)[None], jnp.ones(1, bool))

    inv = np.linalg.inv(h.astype(np.float64))
    fz = np.mod(pos.astype(np.float64) @ inv, 1.0)[:, 2]
    hist = np.zeros(12)
    np.add.at(hist, np.clip((fz * 12).astype(np.int64), 0, 11), 1.0)
    want = hist * 12 / abs(np.linalg.det(h.astype(np.float64)))
    np.testing.assert_allclose(np.asarray(res["p"][0]), want,
                               rtol=1e-4, atol=1e-4)


def test_dipole_known_value():
    import jax
    import jax.numpy as jnp

    box = np.array([8.0, 8.0, 8.0], np.float32)
    # +e and -e separated by 0.5 nm along z, equal masses -> mu = (0,0,0.5)
    pos = np.array([[4.0, 4.0, 4.25], [4.0, 4.0, 3.75]], np.float32)
    topo = Topology.from_columns(
        resnum=[1, 1], resname=["ION"] * 2, atomname=["P", "M"],
        atomnum=[1, 2], mass=np.array([10.0, 10.0], np.float32),
        charge=np.array([1.0, -1.0], np.float32))
    s = System("dip", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=pos)
    s.group_create_from_ranges("A", [(0, 1)])
    fn = jax.jit(TrajectoryAnalysis(s).add_dipole("A", name="mu").step_fn(None))
    res = fn(jnp.asarray(pos)[None], jnp.asarray(box)[None], jnp.ones(1, bool))
    np.testing.assert_allclose(np.asarray(res["mu"][0]), [0.0, 0.0, 0.5],
                               atol=1e-6)


def test_dipole_fixture_parity(tpr_system):
    s = tpr_system
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = (TrajectoryAnalysis(s)
           .add_dipole("Protein", name="mu")
           .run(xtc, batch_size=4))
    coords, b9 = _frames(xtc)
    idx = s.group_indices("Protein")
    q = np.asarray(s.topology.charge)[idx]
    m = np.asarray(s.topology.mass)[idx]
    for f in range(coords.shape[0]):
        box = b9[f][[0, 4, 8]]
        np.testing.assert_allclose(
            out["mu"][f], host_dipole(coords[f][idx], box, q, m),
            rtol=5e-3, atol=5e-3)


def _ch_system():
    """4 C-H bonds at known angles to z: 0, 90, 45, magic (54.7356deg)."""
    box = np.array([6.0, 6.0, 6.0], np.float32)
    c = np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0],
                  [3.0, 3.0, 3.0], [4.0, 4.0, 4.0]], np.float32)
    r = 0.109
    s2 = np.sqrt(0.5)
    magic = np.arccos(np.sqrt(1.0 / 3.0))
    dirs = np.array([
        [0.0, 0.0, 1.0],
        [1.0, 0.0, 0.0],
        [s2, 0.0, s2],
        [np.sin(magic), 0.0, np.cos(magic)],
    ], np.float32)
    h = c + r * dirs
    pos = np.empty((8, 3), np.float32)
    pos[0::2] = c
    pos[1::2] = h
    topo = Topology.from_columns(
        resnum=np.repeat(np.arange(1, 5), 2),
        resname=["LIP"] * 8,
        atomname=["C1", "H1"] * 4,
        atomnum=np.arange(1, 9),
        mass=np.tile([12.011, 1.008], 4).astype(np.float32),
    )
    s = System("ch", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=pos)
    for k in range(4):
        s.add_bond(2 * k, 2 * k + 1)
    s.group_create_from_ranges("All8", [(0, 7)])
    s.group_create_from_ranges("Heavies", [(0, 0), (2, 2), (4, 4), (6, 6)])
    return s, pos, box


def test_order_known_values():
    import jax
    import jax.numpy as jnp

    s, pos, box = _ch_system()
    pipe = TrajectoryAnalysis(s).add_order("All8", axis="z", name="S")
    fn = jax.jit(pipe.step_fn(None))
    res = fn(jnp.asarray(pos)[None], jnp.asarray(box)[None], jnp.ones(1, bool))
    got = np.asarray(res["S"][0])
    # parallel -> 1, perpendicular -> -0.5, 45deg -> 0.25, magic -> 0
    np.testing.assert_allclose(got, [1.0, -0.5, 0.25, 0.0], atol=1e-5)
    c_idx, h_idx = pipe.order_pairs["S"]
    np.testing.assert_array_equal(c_idx, [0, 2, 4, 6])
    np.testing.assert_array_equal(h_idx, [1, 3, 5, 7])

    # heavy-only selection finds the same bonds (partner outside group ok)
    pipe2 = TrajectoryAnalysis(s).add_order("Heavies", axis="z", name="S")
    np.testing.assert_array_equal(pipe2.order_pairs["S"][0], c_idx)

    # a custom axis: x-normal flips the parallel/perpendicular roles
    pipe3 = TrajectoryAnalysis(s).add_order("All8", axis=(1.0, 0.0, 0.0),
                                            name="Sx")
    fnx = jax.jit(pipe3.step_fn(None))
    resx = fnx(jnp.asarray(pos)[None], jnp.asarray(box)[None],
               jnp.ones(1, bool))
    np.testing.assert_allclose(np.asarray(resx["Sx"][0])[:2], [-0.5, 1.0],
                               atol=1e-5)


def test_order_errors():
    s, _, _ = _ch_system()
    with pytest.raises(GroupError, match="axis"):
        TrajectoryAnalysis(s).add_order("All8", axis="q")
    with pytest.raises(GroupError, match="non-zero"):
        TrajectoryAnalysis(s).add_order("All8", axis=(0.0, 0.0, 0.0))

    # a bond-less system raises NoBonds
    topo = Topology(4)
    topo.atomnum = np.arange(1, 5, dtype=np.int64)
    topo.resnum = np.ones(4, np.int64)
    s2 = System("nobonds", topo, simbox=SimBox.from_lengths(3.0, 3.0, 3.0),
                positions=np.zeros((4, 3), np.float32))
    s2.group_create_from_ranges("A", [(0, 3)])
    with pytest.raises(GroupError, match="bond"):
        TrajectoryAnalysis(s2).add_order("A")


@pytest.fixture(scope="module")
def membrane_xtc(tmp_path_factory):
    """Atomistic POPC membrane (aa_membrane_peptide.tpr, 32,817 atoms,
    real bonds + hydrogens) with a 3-frame jittered trajectory."""
    from groan_rs_tpu.io import native

    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s.group_create("Membrane", "@membrane")
    rng = np.random.default_rng(31)
    pos = np.asarray(s.positions, np.float32)
    box = np.asarray(s.box_lengths(), np.float32)
    b9 = np.zeros(9, np.float32)
    b9[:3] = box
    path = str(tmp_path_factory.mktemp("aamem") / "mem.xtc")
    frames = []
    for f in range(3):
        cur = (pos + rng.normal(size=pos.shape).astype(np.float32) * 0.004
               * f) % box
        native.xtc_write_frame(path, pos.shape[0], f, f * 10.0,
                               np.diag(box).astype(np.float32).reshape(9),
                               cur, 1000.0)
        frames.append(cur)
    return s, path, np.asarray(frames), box


def test_order_fixture_parity(membrane_xtc):
    s, xtc, frames, box = membrane_xtc
    pipe = TrajectoryAnalysis(s).add_order("Membrane", name="S")
    out = pipe.run(xtc, batch_size=2)
    c_idx, h_idx = pipe.order_pairs["S"]
    assert len(c_idx) > 5000  # a real POPC membrane has many X-H bonds

    from groan_rs_tpu.io import native

    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, _, *_ = native.xtc_read_frames(xtc, offsets, natoms)
    nvec = np.array([0.0, 0.0, 1.0])
    for f in range(coords.shape[0]):
        np.testing.assert_allclose(
            out["S"][f],
            host_order(coords[f][c_idx], coords[f][h_idx], box, nvec),
            rtol=3e-4, atol=3e-4)

    # hydrogens never appear as the heavy side
    from groan_rs_tpu.models.pipeline import _hydrogen_mask

    hm = _hydrogen_mask(s.topology)
    assert not hm[c_idx].any()
    assert hm[h_idx].all()


def test_order_parameters_convenience(membrane_xtc):
    s, xtc, _, _ = membrane_xtc
    res = models.order_parameters(s, xtc, "Membrane")
    c_idx, h_idx = res["pairs"]
    assert res["heavy"].shape[0] == np.unique(c_idx).shape[0]
    assert res["s"].shape == res["heavy"].shape
    assert res["s_pairs"].shape == c_idx.shape
    # grouping: a heavy atom's s is the mean of its bonds' s_pairs
    first = res["heavy"][0]
    sel = c_idx == first
    np.testing.assert_allclose(res["s"][0], res["s_pairs"][sel].mean(),
                               rtol=1e-12)
    # S is bounded in [-0.5, 1]
    assert (res["s_pairs"] >= -0.5 - 1e-6).all()
    assert (res["s_pairs"] <= 1.0 + 1e-6).all()


def test_box_volume_fixture_parity(tpr_system):
    """add_box_volume matches a float64 host product of the per-frame box
    lengths (the reference computes SimBox volume host-side per frame,
    simbox.rs; here a device observable)."""
    s = tpr_system
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = (TrajectoryAnalysis(s)
           .add_box_volume(name="vol")
           .add_com("Protein", name="com")   # volume rides a mixed pass
           .run(xtc, batch_size=4))
    _, b9 = _frames(xtc)
    want = np.prod(b9[:, [0, 4, 8]].astype(np.float64), axis=1)
    np.testing.assert_allclose(out["vol"], want, rtol=1e-5)


def test_box_volume_triclinic_determinant():
    import jax
    import jax.numpy as jnp

    h = np.array([[5.0, 0.0, 0.0],
                  [2.5, 4.33, 0.0],
                  [1.0, 0.8, 4.0]], np.float32)
    n = 4
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    pos = np.zeros((n, 3), np.float32)
    s = System("tric", topo, simbox=SimBox.from_matrix(h), positions=pos)
    fn = jax.jit(TrajectoryAnalysis(s, triclinic=True)
                 .add_box_volume(name="vol").step_fn(None))
    res = fn(jnp.asarray(pos)[None], jnp.asarray(h)[None], jnp.ones(1, bool))
    want = abs(np.linalg.det(h.astype(np.float64)))
    np.testing.assert_allclose(np.asarray(res["vol"][0]), want, rtol=1e-5)
