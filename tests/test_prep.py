"""System preparation (surpass — `gmx insert-molecules` / `gmx
solvate` / `gmx genion`; the reference has no topology assembly).

Exact clash-geometry constructions, determinism, topology/charge
bookkeeping, and a solvate+genion pipeline on a synthetic water box.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.system import System


def _mono(name, pos, box=(4.0, 4.0, 4.0), resname=None):
    """Single-residue system of len(pos) atoms named `name`."""
    pos = np.asarray(pos, np.float32).reshape(-1, 3)
    n = pos.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.ones(n, np.int64)
    topo.atomname = StrColumn(values=np.asarray([name] * n))
    topo.resname = StrColumn(values=np.asarray([resname or name] * n))
    topo.mass = np.ones(n, np.float32)
    topo.has_mass = np.ones(n, bool)
    return System(name, topo, simbox=SimBox.from_lengths(*map(float, box)),
                  positions=pos)


def _water_box(nx=3, ny=3, nz=3, spacing=1.0):
    """Grid of 3-atom waters, one residue each."""
    coords, resnums, names = [], [], []
    r = 1
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                o = np.array([i, j, k], np.float64) * spacing + 0.3
                coords.extend([o, o + [0.1, 0, 0], o + [0, 0.1, 0]])
                resnums.extend([r] * 3)
                names.extend(["OW", "HW1", "HW2"])
                r += 1
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.asarray(resnums, np.int64)
    topo.atomname = StrColumn(values=np.asarray(names))
    topo.resname = StrColumn(values=np.asarray(["SOL"] * n))
    topo.mass = np.ones(n, np.float32)
    topo.has_mass = np.ones(n, bool)
    box = (nx * spacing, ny * spacing, nz * spacing)
    return System("water", topo, simbox=SimBox.from_lengths(*box),
                  positions=coords)


def test_insert_molecules_count_and_clashes():
    base = _mono("BIG", [[2.0, 2.0, 2.0]])
    mol = _mono("INS", [[0.0, 0.0, 0.0], [0.15, 0.0, 0.0]])
    out, n = models.insert_molecules(base, mol, 5, radius=0.3, seed=7)
    assert n == 5
    assert out.get_n_atoms() == 1 + 5 * 2
    p = np.asarray(out.positions, np.float64)
    box = np.array([4.0, 4.0, 4.0])
    # no pair of atoms from different molecules within the radius
    mol_id = np.r_[0, np.repeat(np.arange(1, 6), 2)]
    d = p[:, None, :] - p[None, :, :]
    d -= np.round(d / box) * box
    dist = np.linalg.norm(d, axis=-1)
    diff = mol_id[:, None] != mol_id[None, :]
    assert dist[diff].min() > 0.3
    # the intramolecular bond length is preserved under rotation
    for m in range(5):
        a, b = p[1 + 2 * m], p[2 + 2 * m]
        assert np.linalg.norm(a - b) == pytest.approx(0.15, abs=1e-5)
    # residues renumbered uniquely
    res = np.asarray(out.topology.resnum)
    assert len(np.unique(res)) == 6


def test_insert_molecules_deterministic_and_impossible():
    base = _mono("BIG", [[2.0, 2.0, 2.0]])
    mol = _mono("INS", [[0.0, 0.0, 0.0]])
    a, _ = models.insert_molecules(base, mol, 3, radius=0.4, seed=3)
    b, _ = models.insert_molecules(base, mol, 3, radius=0.4, seed=3)
    np.testing.assert_array_equal(np.asarray(a.positions),
                                  np.asarray(b.positions))
    # a radius larger than the box can never fit two molecules
    with pytest.raises(ParallelError):
        models.insert_molecules(base, mol, 2, radius=3.9, tries=64)


def test_solvate_empty_solute_fills_box():
    empty = _mono("X", np.empty((0, 3)), box=(3.0, 3.0, 3.0))
    water = _water_box(3, 3, 3, 1.0)
    out, n = models.solvate(empty, water)
    assert n == 27
    assert out.get_n_atoms() == 81
    # all solvent molecules intact: OW/HW1/HW2 triplets share residues
    res = np.asarray(out.topology.resnum)
    assert len(np.unique(res)) == 27
    assert (np.bincount(res)[1:] == 3).sum() == 27


def test_solvate_carves_out_solute():
    solute = _mono("BIG", [[1.3, 1.3, 1.3]], box=(3.0, 3.0, 3.0))
    water = _water_box(3, 3, 3, 1.0)
    out, n = models.solvate(solute, water, radius=0.4)
    assert 0 < n < 27
    p = np.asarray(out.positions, np.float64)
    # no solvent atom within the radius of the solute
    d = np.linalg.norm(p[1:] - p[0], axis=-1)
    box = np.array([3.0, 3.0, 3.0])
    dm = p[1:] - p[0]
    dm -= np.round(dm / box) * box
    assert np.linalg.norm(dm, axis=-1).min() > 0.4
    # tiling a bigger target box replicates the solvent tile
    big = _mono("X", np.empty((0, 3)), box=(6.0, 3.0, 3.0))
    out2, n2 = models.solvate(big, water)
    assert n2 == 54


def test_genion_replaces_and_balances():
    water = _water_box(3, 3, 3, 1.0)
    out, ions = models.genion(water, 2, 3, seed=11)
    # 5 solvent molecules (15 atoms) -> 5 single-atom ions
    assert out.get_n_atoms() == 81 - 15 + 5
    assert ions.shape == (5,)
    names = [out.topology.atomname[int(i)] for i in ions]
    assert names.count("NA") == 2 and names.count("CL") == 3
    q = np.asarray(out.topology.charge)[ions]
    assert q.sum() == pytest.approx(2 * 1.0 + 3 * (-1.0))
    # ion positions coincide with replaced solvent first atoms
    p = np.asarray(out.positions)
    water_p = np.asarray(water.positions)
    for i in ions:
        d = np.linalg.norm(water_p - p[int(i)], axis=-1).min()
        assert d < 1e-6
    # remaining solvent is intact
    res = np.asarray(out.topology.resnum)[:-5]
    assert (np.bincount(res)[np.unique(res)] == 3).all()


def test_genion_errors():
    water = _water_box(2, 2, 2, 1.0)
    with pytest.raises(ParallelError):
        models.genion(water, 5, 5)              # only 8 molecules
    with pytest.raises(ParallelError):
        models.genion(water, 1, 0, positive="XX")
    with pytest.raises(GroupError):
        models.genion(water, 1, 0, solvent="resname NOSUCH")


def test_prep_pipeline_roundtrip(tmp_path):
    """solvate -> genion -> write gro -> re-read: consistent system."""
    solute = _mono("BIG", [[1.5, 1.5, 1.5]], box=(3.0, 3.0, 3.0))
    water = _water_box(3, 3, 3, 1.0)
    solvated, n = models.solvate(solute, water, radius=0.35)
    withions, ions = models.genion(solvated, 1, 1, seed=5)
    path = str(tmp_path / "prep.gro")
    withions.write_gro(path)
    back = System.from_file(path)
    assert back.get_n_atoms() == withions.get_n_atoms()
    np.testing.assert_allclose(np.asarray(back.positions),
                               np.asarray(withions.positions), atol=1e-3)
    back.group_create("Ions", "resname NA CL")
    assert len(back.group_indices("Ions")) == 2


def test_genconf_replicates():
    w = _water_box(2, 2, 2, 1.0)            # 8 waters, box 2x2x2
    out = models.genconf(w, (2, 1, 3))
    assert out.get_n_atoms() == 24 * 6
    assert out.simbox.x == pytest.approx(4.0)
    assert out.simbox.y == pytest.approx(2.0)
    assert out.simbox.z == pytest.approx(6.0)
    p = np.asarray(out.positions, np.float64)
    w0 = np.asarray(w.positions, np.float64)
    # copy order: ix, iy, iz loops; second copy shifted +2 in z
    np.testing.assert_allclose(p[24:48], w0 + [0, 0, 2.0], atol=1e-6)
    # last copy shifted +2x +4z
    np.testing.assert_allclose(p[-24:], w0 + [2.0, 0, 4.0], atol=1e-6)
    # residues unique across copies
    res = np.asarray(out.topology.resnum)
    assert len(np.unique(res)) == 8 * 6
    # spacing option grows the cell
    out2 = models.genconf(w, (1, 1, 2), dist=(0.5, 0.5, 0.5))
    assert out2.simbox.z == pytest.approx(5.0)
    with pytest.raises(ParallelError):
        models.genconf(w, (0, 1, 1))
