"""Total dipole + static dielectric constant (surpass analyses).

`add_total_dipole`: gmx dipoles M_tot semantics — sum of per-molecule
dipoles with minimum-image per-molecule origins, algebraically equal to
sum(q_i r_i) over WHOLE molecules (modifying.rs:338) for molecules
smaller than half the box.  `models.dielectric`: the Neumann
fluctuation formula eps = 1 + (<M^2>-<M>^2)/(3 eps0 V kB T)
(`gmx dipoles -epsilon`).  Pinned against float64 make-whole host
oracles, exact image-invariance constructions, and a closed-form
two-frame epsilon.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.models.pipeline import _BOLTZ, _EPSILON0
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def _water_box(n_mol=24, box_len=4.0, seed=11, split_some=True):
    """n_mol rigid 3-site waters (q = -0.8, +0.4, +0.4), some wrapped
    across PBC faces so per-molecule min-image repair is exercised."""
    rng = np.random.default_rng(seed)
    box = np.array([box_len] * 3, np.float32)
    geom = np.array([[0.0, 0.0, 0.0],
                     [0.096, 0.0, 0.0],
                     [-0.024, 0.093, 0.0]], np.float64)  # O, H1, H2 (nm)
    centers = rng.uniform(0.3, box_len - 0.3, size=(n_mol, 3))
    if split_some:
        centers[: n_mol // 4, 0] = box_len - 0.01   # straddle the +x face
    whole = (centers[:, None, :] + geom[None]).reshape(-1, 3)
    wrapped = np.mod(whole, box.astype(np.float64))  # break molecules
    n = 3 * n_mol
    topo = Topology.from_columns(
        resnum=np.repeat(np.arange(1, n_mol + 1), 3),
        resname=np.array(["SOL"] * n),
        atomname=np.array(["OW", "HW1", "HW2"] * n_mol),
        atomnum=np.arange(1, n + 1),
        mass=np.tile(np.array([16.0, 1.0, 1.0], np.float32), n_mol),
        charge=np.tile(np.array([-0.8, 0.4, 0.4], np.float32), n_mol),
    )
    topo.set_bonds_from_pairs(
        [(3 * m, 3 * m + 1) for m in range(n_mol)]
        + [(3 * m, 3 * m + 2) for m in range(n_mol)])
    s = System("diel", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=wrapped.astype(np.float32))
    s.group_create_from_ranges("W", [(0, n - 1)])
    return s, whole, wrapped.astype(np.float32), box


def _host_M(whole_f64, charges):
    """Oracle: sum(q_i r_i) over WHOLE molecules, float64."""
    return (np.asarray(charges, np.float64)[:, None] * whole_f64).sum(0)


def test_total_dipole_matches_whole_molecule_oracle():
    import jax
    import jax.numpy as jnp

    s, whole, wrapped, box = _water_box()
    q = np.asarray(s.topology.charge)
    fn = jax.jit(TrajectoryAnalysis(s)
                 .add_total_dipole("W", name="M").step_fn(None))
    res = fn(jnp.asarray(wrapped)[None], jnp.asarray(box)[None],
             jnp.ones(1, bool))
    np.testing.assert_allclose(np.asarray(res["M"][0]), _host_M(whole, q),
                               rtol=1e-4, atol=1e-5)


def test_total_dipole_image_invariance():
    """Shifting any molecule by whole box vectors leaves M unchanged
    (per-neutral-molecule origin independence)."""
    import jax
    import jax.numpy as jnp

    s, whole, wrapped, box = _water_box(split_some=False)
    fn = jax.jit(TrajectoryAnalysis(s)
                 .add_total_dipole("W", name="M").step_fn(None))
    shifted = wrapped.copy()
    shifted[0:3] += box * np.array([1, -2, 3], np.float32)  # molecule 0
    shifted[6:9] += box * np.array([0, 0, -1], np.float32)  # molecule 2
    a = fn(jnp.asarray(wrapped)[None], jnp.asarray(box)[None],
           jnp.ones(1, bool))
    b = fn(jnp.asarray(shifted)[None], jnp.asarray(box)[None],
           jnp.ones(1, bool))
    np.testing.assert_allclose(np.asarray(a["M"][0]), np.asarray(b["M"][0]),
                               rtol=1e-4, atol=1e-4)


def test_dielectric_closed_form_two_frames(tmp_path):
    """Two frames with hand-computed M -> epsilon matches the formula
    evaluated in closed form."""
    from groan_rs_tpu.io.traj import XtcWriter

    s, whole, wrapped, box = _water_box(n_mol=8, split_some=False)
    q = np.asarray(s.topology.charge)
    # frame 2: rotate every water 180 deg about its O around z -> M flips
    # in x/y.  Build it by mirroring H displacements through the O.
    f2 = whole.copy().reshape(8, 3, 3)
    f2[:, 1:, :2] = 2 * f2[:, :1, :2] - f2[:, 1:, :2]
    f2 = f2.reshape(-1, 3)
    frames = [wrapped, np.mod(f2, box.astype(np.float64)).astype(np.float32)]

    xtc = str(tmp_path / "two.xtc")
    s.set_precision(100000)   # dipoles are differences of ~nm coords;
    w = XtcWriter(s, xtc)     # default 0.01 nm grid would dominate them
    for i, f in enumerate(frames):
        s.positions = f
        s.set_step(i)
        s.set_time(float(i))
        w.write_frame()
    w.close()

    out = models.dielectric(s, xtc, "W", temperature=300.0, batch_size=2)
    M = np.stack([_host_M(whole, q),
                  _host_M(f2, q)])
    m_mean = M.mean(0)
    fluct = (M * M).sum(1).mean() - (m_mean * m_mean).sum()
    vol = float(np.prod(box, dtype=np.float64))
    want = 1.0 + fluct / (3.0 * _EPSILON0 * vol * _BOLTZ * 300.0)
    np.testing.assert_allclose(out["M"], M, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(out["epsilon"], want, rtol=2e-3)
    assert out["n_charged_molecules"] == 0
    assert out["epsilon"] > 1.0


def test_dielectric_constant_M_gives_unity(tmp_path):
    """Identical frames -> zero fluctuation -> epsilon == 1 exactly."""
    from groan_rs_tpu.io.traj import XtcWriter

    s, whole, wrapped, box = _water_box(n_mol=6, split_some=False)
    xtc = str(tmp_path / "const.xtc")
    s.set_precision(100000)
    w = XtcWriter(s, xtc)
    for i in range(3):
        s.set_step(i)
        s.set_time(float(i))
        w.write_frame()
    w.close()
    out = models.dielectric(s, xtc, "W", batch_size=2)
    assert abs(out["epsilon"] - 1.0) < 1e-6
    assert abs(out["fluct"]) < 1e-8
    np.testing.assert_allclose(out["volume"],
                               np.prod(box, dtype=np.float64), rtol=1e-5)


def test_dielectric_martini_single_bead_water_is_vacuum():
    """example.tpr is Martini coarse-grained: 'W' is one NEUTRAL bead per
    molecule, so M == 0 for every frame and epsilon == 1 exactly — the
    singleton-molecule (no-bond) edge case handled by construction."""
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("W", "@water")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = models.dielectric(s, xtc, "W", batch_size=4)
    assert np.abs(out["M"]).max() == 0.0
    assert out["epsilon"] == 1.0
    assert out["n_charged_molecules"] == 0

    # whole-system group picks up the charged ion beads
    out_all = models.dielectric(s, xtc, "all", batch_size=4)
    assert out_all["n_charged_molecules"] > 0


def test_dielectric_all_atom_fixture_vs_make_whole_oracle():
    """aa_membrane_peptide: real TIP3P waters (SETTLE bonds from the
    tpr).  M per frame must match the float64 make-molecules-whole
    oracle sum(q_i r_i), and epsilon comes out finite and > 1."""
    from groan_rs_tpu.io import native

    tpr = os.path.join(TF, "aa_membrane_peptide.tpr")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    s = System.from_file(tpr)
    s.group_create("W", "@water")
    idx = np.asarray(s.group_indices("W"))
    assert len(idx) % 3 == 0 and len(idx) > 0
    mol = s.topology.molecule_ids()[idx]
    assert len(np.unique(mol)) == len(idx) // 3   # SETTLE made 3-site mols

    out = models.dielectric(s, xtc, "W", batch_size=4)
    assert out["n_charged_molecules"] == 0
    assert np.isfinite(out["epsilon"]) and out["epsilon"] > 1.0

    # float64 oracle on every frame: make molecules whole, sum q_i r_i
    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, b9, *_ = native.xtc_read_frames(xtc, offsets, natoms)
    q = np.asarray(s.topology.charge, np.float64)[idx]
    oracle = System.from_file(tpr)
    for f in range(coords.shape[0]):
        oracle.positions = coords[f]
        oracle.set_box(SimBox.from_matrix(b9[f].reshape(3, 3)))
        oracle.make_molecules_whole()
        want = (q[:, None]
                * np.asarray(oracle.positions, np.float64)[idx]).sum(0)
        np.testing.assert_allclose(out["M"][f], want, rtol=5e-4, atol=2e-3)
