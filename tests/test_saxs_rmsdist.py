"""Debye-formula SAXS curves (`models.saxs`, gmx saxs) and distance-
matrix RMS deviation (`models.rmsdist`, gmx rmsdist) — surpass features
absent from the reference.

Pins saxs against the two-atom analytic Debye curve, a float64 oracle,
and the f(0) = Z identity of the Cromer-Mann table; rmsdist against the
identity, a uniform-scaling analytic, a float64 oracle exercising the
multi-chunk path, and a PBC-straddling pair.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology, StrColumn
from groan_rs_tpu.errors import GroupError, RMSDError
from groan_rs_tpu.models.pipeline import (_CM_Z, _CROMER_MANN,
                                          _cm_form_factors)
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([10.0, 10.0, 10.0], np.float32)


def _write_xtc(path, frames, box=None):
    from groan_rs_tpu.io import native

    box = BOX if box is None else box
    for fidx in range(frames.shape[0]):
        b9 = np.diag(box).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, frames.shape[1], fidx, float(fidx),
                               b9, frames[fidx].astype(np.float32), 100000.0)


def _system(positions, elements=None, box=None):
    n = positions.shape[0]
    box = BOX if box is None else box
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    if elements is not None:
        topo.element_symbol = StrColumn(values=np.asarray(elements))
    s = System("sx", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.asarray(positions, np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def test_cromer_mann_f0_is_Z():
    for sym, z in _CM_Z.items():
        a, b, c = _CROMER_MANN[sym]
        assert sum(a) + c == pytest.approx(z, abs=0.02), sym
    assert set(_CM_Z) == set(_CROMER_MANN)


def test_two_atom_analytic(tmp_path):
    d = 0.5
    pts = np.array([[4.0, 5.0, 5.0], [4.0 + d, 5.0, 5.0]])
    path = str(tmp_path / "two.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts, ["C", "C"])
    q = np.linspace(0.5, 30.0, 25)
    out = models.saxs(s, path, "All", q=q)
    fq = _cm_form_factors(["C"], q)[0]
    expect = 2.0 * fq ** 2 * (1.0 + np.sinc(q * d / np.pi))
    np.testing.assert_allclose(out["intensity"], expect, rtol=2e-4)
    assert out["i0"] == pytest.approx((2 * 5.9992) ** 2, rel=1e-3)


def test_f64_oracle_multi_chunk(tmp_path):
    rng = np.random.default_rng(23)
    f, k = 3, 37
    frames = rng.uniform(3.0, 7.0, size=(f, k, 3))
    elements = rng.choice(["C", "N", "O", "S", "H"], size=k)
    path = str(tmp_path / "orc.xtc")
    _write_xtc(path, frames)
    s = _system(frames[0], elements)
    q = np.linspace(0.2, 20.0, 11)
    out = models.saxs(s, path, "All", q=q, chunk=8)  # 37 -> 5 chunks, pad

    ff = _cm_form_factors(list(elements), q)          # [K, Q]
    qz = np.round(frames * 100000.0) / 100000.0
    expect = np.zeros((f, q.size))
    for fi in range(f):
        dm = np.linalg.norm(qz[fi][:, None, :] - qz[fi][None, :, :],
                            axis=-1)
        for qi, qv in enumerate(q):
            s_ = np.sinc(qv * dm / np.pi)
            expect[fi, qi] = ff[:, qi] @ s_ @ ff[:, qi]
    np.testing.assert_allclose(out["per_frame"], expect, rtol=5e-4)
    np.testing.assert_allclose(out["intensity"], expect.mean(axis=0),
                               rtol=5e-4)
    # chunking invariance
    out2 = models.saxs(s, path, "All", q=q, chunk=64)
    np.testing.assert_allclose(out2["per_frame"], out["per_frame"],
                               rtol=1e-5)


def test_saxs_errors(tmp_path):
    pts = np.array([[1.0, 1.0, 1.0]])
    path = str(tmp_path / "e.xtc")
    _write_xtc(path, pts[None])
    s = _system(pts)                                  # no elements
    with pytest.raises(GroupError):
        models.saxs(s, path, "All")
    s2 = _system(pts, ["Xx"])
    with pytest.raises(GroupError):
        models.saxs(s2, path, "All")
    s3 = _system(pts, ["C"])
    from groan_rs_tpu.errors import ParallelError
    with pytest.raises(ParallelError):
        models.saxs(s3, path, "All", q=[0.0, 1.0])


def test_saxs_fixture_protein():
    s = System.from_file(os.path.join(TF, "aa_peptide.pdb"))
    s.guess_elements()
    xtc = None
    # single-structure "trajectory": write the structure's coords once
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        from groan_rs_tpu.io import native
        pts = np.asarray(s.positions, np.float32)
        path = os.path.join(td, "pep.xtc")
        b9 = np.diag([10.0, 10.0, 10.0]).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, pts.shape[0], 0, 0.0, b9, pts,
                               100000.0)
        out = models.saxs(s, path, "all", q=np.linspace(0.5, 8.0, 8))
    # I(q) decays from near i0 and stays positive for a compact peptide
    assert out["intensity"][0] < out["i0"]
    assert out["intensity"][0] > 0.5 * out["i0"]
    assert (out["intensity"] > 0).all()
    assert out["intensity"][-1] < out["intensity"][0]


# ---------------------------------------------------------------- rmsdist

def _rd_system(positions, box=None):
    return _system(positions, None, box)


def test_rmsdist_identity(tmp_path):
    rng = np.random.default_rng(29)
    pts = rng.uniform(2, 8, size=(9, 3))
    path = str(tmp_path / "id.xtc")
    _write_xtc(path, pts[None])
    s = _rd_system(pts)
    out = models.rmsdist(s, path, "All")
    # the only deviation is the XTC 1e-5 write quantization
    assert out["rmsdist"][0] < 5e-5
    assert out["mean_deviation"].shape == (9, 9)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.testing.assert_allclose(out["ref_distances"], d, atol=1e-4)


def test_rmsdist_uniform_scaling(tmp_path):
    rng = np.random.default_rng(31)
    k, alpha = 12, 1.25
    pts = rng.uniform(3, 6, size=(k, 3))
    center = pts.mean(axis=0)
    scaled = center + alpha * (pts - center)
    path = str(tmp_path / "sc.xtc")
    _write_xtc(path, scaled[None])
    s = _rd_system(pts)
    out = models.rmsdist(s, path, "All")
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    iu = np.triu_indices(k, 1)
    expect = (alpha - 1.0) * np.sqrt((d[iu] ** 2).mean())
    assert out["rmsdist"][0] == pytest.approx(expect, rel=1e-4)
    # mean_deviation is (alpha-1) * dref off-diagonal
    np.testing.assert_allclose(
        out["mean_deviation"][iu], (alpha - 1.0) * d[iu], rtol=1e-3,
        atol=1e-4)


def test_rmsdist_f64_oracle_chunks(tmp_path):
    rng = np.random.default_rng(37)
    f, k = 4, 11
    ref = rng.uniform(2, 8, size=(k, 3))
    frames = ref[None] + rng.normal(0, 0.3, size=(f, k, 3))
    path = str(tmp_path / "orc.xtc")
    _write_xtc(path, frames)
    s = _rd_system(ref)
    out = models.rmsdist(s, path, "All", chunk=4)     # 11 -> 3 chunks, pad
    qz = np.round(frames * 100000.0) / 100000.0
    dref = np.linalg.norm(ref[:, None] - ref[None, :], axis=-1)
    iu = np.triu_indices(k, 1)
    sad = np.zeros((k, k))
    for fi in range(f):
        d = np.linalg.norm(qz[fi][:, None] - qz[fi][None, :], axis=-1)
        dev = d - dref
        np.fill_diagonal(dev, 0.0)
        sad += np.abs(dev)
        rms = np.sqrt((dev[iu] ** 2).mean())
        assert out["rmsdist"][fi] == pytest.approx(rms, rel=1e-3,
                                                   abs=1e-6)
    np.testing.assert_allclose(out["mean_deviation"], sad / f,
                               rtol=1e-3, atol=1e-6)
    out2 = models.rmsdist(s, path, "All", chunk=64)
    np.testing.assert_allclose(out2["rmsdist"], out["rmsdist"],
                               rtol=1e-6)
    np.testing.assert_allclose(out2["mean_deviation"],
                               out["mean_deviation"], rtol=1e-5,
                               atol=1e-7)


def test_rmsdist_pbc_aware(tmp_path):
    # two atoms straddling the boundary: min-image distance is 0.4, the
    # naive distance 9.6
    pts = np.array([[0.2, 5.0, 5.0], [9.8, 5.0, 5.0]])
    path = str(tmp_path / "pbc.xtc")
    _write_xtc(path, pts[None])
    s = _rd_system(pts)
    out = models.rmsdist(s, path, "All", pbc_aware=True)
    assert out["ref_distances"][0, 1] == pytest.approx(0.4, abs=1e-4)
    assert out["rmsdist"][0] < 5e-5
    naive = models.rmsdist(s, path, "All")
    assert naive["ref_distances"][0, 1] == pytest.approx(9.6, abs=1e-4)


def test_rmsdist_reference_mismatch(tmp_path):
    pts = np.ones((3, 3), np.float32)
    path = str(tmp_path / "m.xtc")
    _write_xtc(path, pts[None])
    s = _rd_system(pts)
    other = _rd_system(np.ones((4, 3), np.float32))
    with pytest.raises(RMSDError):
        models.rmsdist(s, path, "All", reference=other)


def test_rmsdist_fixture():
    s = System.from_file(os.path.join(TF, "example.gro"))
    s.group_create("Prot", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    out = models.rmsdist(s, xtc, "Prot", batch_size=8)
    assert out["rmsdist"].shape[0] == 11
    assert (out["rmsdist"] > 0.01).all()
    assert (out["rmsdist"] < 2.0).all()
    # frame-0 cross-check against a float64 oracle via the reader
    # (iterating UPDATES the system — capture the reference coords first)
    gsel = np.asarray(s.group_indices("Prot"))
    r = np.asarray(s.positions, np.float64)[gsel].copy()
    from groan_rs_tpu.io.traj import xtc_iter
    fr = next(iter(xtc_iter(s, xtc)))
    p = np.asarray(fr.positions, np.float64)[gsel]
    dm = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
    dr = np.linalg.norm(r[:, None] - r[None, :], axis=-1)
    iu = np.triu_indices(len(gsel), 1)
    rms = np.sqrt(((dm[iu] - dr[iu]) ** 2).mean())
    assert out["rmsdist"][0] == pytest.approx(rms, rel=5e-3)
