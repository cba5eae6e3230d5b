"""Solvent ordering (`models.trjorder`, gmx trjorder) and tetrahedrality
order parameters (`models.hydorder`, gmx hydorder) — surpass features
absent from the reference.

Pinned against exact geometric constructions (minimum-image cases,
perfect/planar tetrahedra with closed-form S_g/S_k), chunk-width
invariance, float64 brute oracles, and reordered-output round trips.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.io import native
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([4.0, 4.0, 4.0], np.float32)


def _write_xtc(tmp_path, frames, box=BOX, name="t.xtc"):
    path = str(tmp_path / name)
    b9 = np.diag(np.asarray(box, np.float32)).reshape(9)
    for fidx, pos in enumerate(frames):
        native.xtc_write_frame(path, pos.shape[0], fidx, float(fidx), b9,
                               np.asarray(pos, np.float32), 100000.0)
    return path


def _mol_system(n_ref, mol_sizes, masses=None, box=BOX):
    """n_ref reference atoms (residue 1..n_ref) + molecules of the given
    sizes (one residue each)."""
    n = n_ref + sum(mol_sizes)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    resnums = list(range(1, n_ref + 1))
    names = ["REF"] * n_ref
    for m, sz in enumerate(mol_sizes):
        resnums.extend([n_ref + m + 1] * sz)
        names.extend([f"A{j}" for j in range(sz)])
    topo.resnum = np.asarray(resnums, np.int64)
    topo.atomname = StrColumn(values=np.asarray(names))
    topo.resname = StrColumn(
        values=np.asarray(["REF"] * n_ref + ["SOL"] * sum(mol_sizes)))
    topo.mass = (np.ones(n, np.float32) if masses is None
                 else np.asarray(masses, np.float32))
    topo.has_mass = np.ones(n, bool)
    topo.charge = np.zeros(n, np.float64)
    topo.has_charge = np.ones(n, bool)
    s = System("to", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("Ref", [(0, n_ref - 1)])
    s.group_create_from_ranges("Sol", [(n_ref, n - 1)])
    return s


# -------------------------------------------------------------- trjorder

def test_trjorder_exact_order_and_shell(tmp_path):
    s = _mol_system(1, [1, 1, 1])
    ref = np.array([2.0, 2.0, 2.0])
    frames = np.array([
        [ref, ref + [0.3, 0, 0], ref + [0, 0.1, 0], ref + [0, 0, 0.2]],
        [ref, ref + [0.05, 0, 0], ref + [0, 0.5, 0], ref + [0, 0, 0.2]],
    ], np.float32)
    path = _write_xtc(tmp_path, frames)
    out = models.trjorder(s, path, "Ref", "Sol", shell=0.25)
    np.testing.assert_allclose(out["dist"][0], [0.3, 0.1, 0.2], atol=2e-4)
    np.testing.assert_allclose(out["dist"][1], [0.05, 0.5, 0.2], atol=2e-4)
    assert out["order"][0].tolist() == [1, 2, 0]
    assert out["order"][1].tolist() == [0, 2, 1]
    assert out["nshell"].tolist() == [2, 2]
    assert out["molecules"].tolist() == [1, 2, 3]


def test_trjorder_minimum_image_and_closest_ref_atom(tmp_path):
    """Molecule across the box boundary is nearest; distance is to the
    CLOSEST of several reference atoms."""
    s = _mol_system(2, [1, 1])
    frames = np.array([[
        [0.2, 2.0, 2.0], [2.0, 2.0, 2.0],      # two ref atoms
        [3.9, 2.0, 2.0],                       # 0.3 from ref[0] via PBC
        [1.0, 2.0, 2.0],                       # 0.8 from ref[0], 1.0 from ref[1]
    ]], np.float32)
    path = _write_xtc(tmp_path, frames)
    out = models.trjorder(s, path, "Ref", "Sol")
    np.testing.assert_allclose(out["dist"][0], [0.3, 0.8], atol=2e-4)
    assert out["order"][0].tolist() == [0, 1]


def test_trjorder_modes(tmp_path):
    """atom(da) picks one site; min takes the closest site; com the
    mass-weighted whole-molecule center (rebuilt through PBC)."""
    masses = [1.0, 1.0, 3.0]  # ref + 2-atom molecule with 1:3 masses
    s = _mol_system(1, [2], masses=masses)
    ref = np.array([2.0, 2.0, 2.0])
    # molecule atoms at x = +1.0 and +0.2 from ref
    frames = np.array([[ref, ref + [1.0, 0, 0], ref + [0.2, 0, 0]]],
                      np.float32)
    path = _write_xtc(tmp_path, frames)
    d_a0 = models.trjorder(s, path, "Ref", "Sol", mode="atom", da=0)
    d_a1 = models.trjorder(s, path, "Ref", "Sol", mode="atom", da=1)
    d_min = models.trjorder(s, path, "Ref", "Sol", mode="min")
    d_com = models.trjorder(s, path, "Ref", "Sol", mode="com")
    assert d_a0["dist"][0, 0] == pytest.approx(1.0, abs=2e-4)
    assert d_a1["dist"][0, 0] == pytest.approx(0.2, abs=2e-4)
    assert d_min["dist"][0, 0] == pytest.approx(0.2, abs=2e-4)
    # COM = 1.0 * (1/4) + 0.2 * (3/4) = 0.4
    assert d_com["dist"][0, 0] == pytest.approx(0.4, abs=2e-4)

    with pytest.raises(GroupError):
        models.trjorder(s, path, "Ref", "Sol", mode="atom", da=2)


def test_trjorder_com_rebuilds_whole(tmp_path):
    """Molecule split across the boundary: COM must come from the
    min-image rebuild, not the wrapped coordinates."""
    s = _mol_system(1, [2])
    # atoms at x = 3.95 and 0.05: whole molecule centered at x = 0.0
    frames = np.array([[[2.0, 2.0, 2.0],
                        [3.95, 2.0, 2.0], [0.05, 2.0, 2.0]]], np.float32)
    path = _write_xtc(tmp_path, frames)
    out = models.trjorder(s, path, "Ref", "Sol", mode="com")
    assert out["dist"][0, 0] == pytest.approx(2.0, abs=2e-4)


def test_trjorder_reordered_output(tmp_path):
    """Written trajectory carries solvent coordinates permuted into
    closest-first order, frame by frame."""
    s = _mol_system(1, [2, 2, 2])
    ref = np.array([2.0, 2.0, 2.0])

    def mol(dx):
        return [ref + [dx, 0, 0], ref + [dx, 0.1, 0]]

    frames = np.array([
        [ref] + mol(0.9) + mol(0.3) + mol(0.6),
        [ref] + mol(0.2) + mol(0.8) + mol(0.5),
    ], np.float32)
    path = _write_xtc(tmp_path, frames)
    outp = str(tmp_path / "ordered.xtc")
    out = models.trjorder(s, path, "Ref", "Sol", output=outp)
    assert out["order"][0].tolist() == [1, 2, 0]
    assert out["order"][1].tolist() == [0, 2, 1]

    got = []
    for _ in s.traj_iter(outp):
        got.append(s.positions.copy())
    for f in range(2):
        want = np.concatenate(
            [frames[f][:1]]
            + [frames[f][1 + 2 * m: 3 + 2 * m] for m in out["order"][f]])
        np.testing.assert_allclose(got[f], want, atol=2e-4)


def test_trjorder_fixture_oracle():
    """Water ordering around the protein on the TPR fixture matches a
    float64 brute recomputation (first 2 frames)."""
    s = System.from_file(os.path.join(TF, "example.tpr"))
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = models.trjorder(s, xtc, "@protein", "resname W", chunk=128)

    from groan_rs_tpu.select.compile import select_to_mask

    ridx = np.flatnonzero(select_to_mask("@protein", s))
    widx = np.flatnonzero(select_to_mask("resname W", s))
    f = 0
    for _ in s.traj_iter(xtc):
        box = s.simbox.to_lengths_vec().astype(np.float64)
        d = s.positions[widx, None, :].astype(np.float64) \
            - s.positions[None, ridx, :]
        d -= np.round(d / box) * box
        want = np.sqrt((d * d).sum(-1)).min(axis=1)
        np.testing.assert_allclose(out["dist"][f], want, atol=5e-4)
        # near-ties may swap between float32 device distances and the
        # float64 oracle: assert a valid permutation that sorts `want`
        perm = out["order"][f]
        assert sorted(perm.tolist()) == list(range(want.size))
        assert (np.diff(want[perm]) > -5e-4).all()
        f += 1
        if f == 2:
            break


# -------------------------------------------------------------- hydorder

def _point_system(n, box=BOX):
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    topo.atomname = StrColumn(values=np.asarray(["OW"] * n))
    topo.mass = np.ones(n, np.float32)
    topo.has_mass = np.ones(n, bool)
    s = System("ho", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("O", [(0, n - 1)])
    return s


_TET = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                np.float64) / np.sqrt(3.0)


def test_hydorder_perfect_tetrahedron(tmp_path):
    """Ideal tetrahedral neighbours: cos = -1/3 for all 6 pairs ->
    S_g = 1; equal distances -> S_k = 1 (central atom)."""
    c = np.array([2.0, 2.0, 2.0])
    coords = np.concatenate([[c], c + 0.28 * _TET])
    s = _point_system(5)
    path = _write_xtc(tmp_path, coords[None])
    out = models.hydorder(s, path, "O")
    assert out["sg"][0, 0] == pytest.approx(1.0, abs=1e-4)
    assert out["sk"][0, 0] == pytest.approx(1.0, abs=1e-4)


def test_hydorder_square_planar_exact(tmp_path):
    """Square-planar neighbours: 2 pairs at 180 deg + 4 at 90 deg ->
    S_g = 1 - 3/8 * (2*(2/3)^2 + 4*(1/3)^2) = 0.5 exactly."""
    c = np.array([2.0, 2.0, 2.0])
    coords = np.concatenate([[c],
                             c + [[0.3, 0, 0], [-0.3, 0, 0],
                                  [0, 0.3, 0], [0, -0.3, 0]]])
    s = _point_system(5)
    path = _write_xtc(tmp_path, coords[None])
    out = models.hydorder(s, path, "O")
    assert out["sg"][0, 0] == pytest.approx(0.5, abs=1e-4)
    assert out["sk"][0, 0] == pytest.approx(1.0, abs=1e-4)


def test_hydorder_distance_order_exact(tmp_path):
    """Tetrahedral directions with radii [.2, .2, .3, .3]: rbar = .25,
    S_k = 1 - 0.01 / (3 * 4 * 0.0625) = 0.98666... (central atom)."""
    c = np.array([2.0, 2.0, 2.0])
    r = np.array([0.2, 0.2, 0.3, 0.3])
    coords = np.concatenate([[c], c + r[:, None] * _TET])
    s = _point_system(5)
    path = _write_xtc(tmp_path, coords[None])
    out = models.hydorder(s, path, "O")
    assert out["sk"][0, 0] == pytest.approx(1.0 - 0.01 / 0.75, abs=1e-4)
    assert out["sg"][0, 0] == pytest.approx(1.0, abs=1e-4)


def test_hydorder_minimum_image(tmp_path):
    """The same perfect tetrahedron rigidly wrapped across a corner of
    the box must still give S_g = S_k = 1."""
    c = np.array([0.05, 0.05, 3.98])
    coords = np.concatenate([[c], c + 0.28 * _TET])
    coords = np.mod(coords, BOX.astype(np.float64))
    s = _point_system(5)
    path = _write_xtc(tmp_path, coords[None])
    out = models.hydorder(s, path, "O")
    assert out["sg"][0, 0] == pytest.approx(1.0, abs=1e-4)
    assert out["sk"][0, 0] == pytest.approx(1.0, abs=1e-4)


def test_hydorder_chunk_invariance_and_oracle(tmp_path):
    """Random points: chunk widths agree, and both parameters match a
    float64 brute-force recomputation."""
    rng = np.random.default_rng(3)
    n, f = 40, 2
    frames = rng.uniform(0, 4.0, (f, n, 3)).astype(np.float32)
    s = _point_system(n)
    path = _write_xtc(tmp_path, frames)
    a = models.hydorder(s, path, "O", chunk=7)
    b = models.hydorder(s, path, "O", chunk=64)
    np.testing.assert_allclose(a["sg"], b["sg"], atol=1e-5)
    np.testing.assert_allclose(a["sk"], b["sk"], atol=1e-5)

    box = BOX.astype(np.float64)
    for fr in range(f):
        x = frames[fr].astype(np.float64)
        for i in range(n):
            d = x - x[i]
            d -= np.round(d / box) * box
            r2 = (d * d).sum(-1)
            r2[i] = np.inf
            nb = np.argsort(r2)[:4]
            v = d[nb]
            r = np.sqrt(r2[nb])
            u = v / r[:, None]
            sg = 0.0
            for j in range(4):
                for k in range(j + 1, 4):
                    sg += (u[j] @ u[k] + 1.0 / 3.0) ** 2
            sg = 1.0 - 3.0 / 8.0 * sg
            rbar = r.mean()
            sk = 1.0 - ((r - rbar) ** 2).sum() / (12.0 * rbar ** 2)
            assert a["sg"][fr, i] == pytest.approx(sg, abs=5e-4)
            assert a["sk"][fr, i] == pytest.approx(sk, abs=5e-4)


def test_hydorder_slab_profile(tmp_path):
    """A perfect tetrahedron in the low-z half and a square-planar one
    in the high-z half separate into their slabs."""
    c1 = np.array([1.0, 1.0, 1.0])
    c2 = np.array([3.0, 3.0, 3.0])
    sq = np.array([[0.3, 0, 0], [-0.3, 0, 0], [0, 0.3, 0], [0, -0.3, 0]],
                  np.float64)
    coords = np.concatenate([[c1], c1 + 0.28 * _TET, [c2], c2 + sq])
    s = _point_system(10)
    path = _write_xtc(tmp_path, coords[None])
    out = models.hydorder(s, path, "O", slabs=2)
    assert out["slab_counts"].tolist() == [5, 5]
    # central atoms pin the extremes; neighbours shift the means, so
    # only assert ordering and the exact central values
    assert out["sg"][0, 0] == pytest.approx(1.0, abs=1e-4)
    assert out["sg"][0, 5] == pytest.approx(0.5, abs=1e-4)
    assert out["slab_sg"][0] > out["slab_sg"][1]


def test_hydorder_needs_five(tmp_path):
    s = _point_system(4)
    with pytest.raises(GroupError):
        models.hydorder(s, "unused.xtc", "O")
