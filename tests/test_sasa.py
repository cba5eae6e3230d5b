"""SASA — Shrake-Rupley on device (surpass; the reference has none).

Pins `models.sasa` / `ops.sasa` against closed-form sphere/cap areas,
a float64 all-neighbours host oracle, PBC-split pairs, the exactness
guard (relevant neighbours > cap must raise, never truncate), and the
reference fixture corpus via guessed vdW radii.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.ops import sasa as sasa_ops
from groan_rs_tpu.system import System

from test_rmsf import _system, _write_xtc, BOX

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def _run(pts, radii, **kw):
    import jax.numpy as jnp

    pts = np.asarray(pts, np.float32)
    boxes = jnp.asarray(np.asarray([BOX]), jnp.float32)
    areas, max_rel = sasa_ops.sasa_frames(
        jnp.asarray(pts)[None], boxes, np.asarray(radii, np.float32), **kw)
    return np.asarray(areas)[0], int(max_rel)


def test_sasa_isolated_atom_full_sphere():
    r = 0.17
    probe = 0.14
    area, nrel = _run(np.array([[5.0, 5.0, 5.0]]), [r], probe=probe)
    assert nrel == 0
    np.testing.assert_allclose(area[0], 4 * np.pi * (r + probe) ** 2,
                               rtol=1e-5)


def test_sasa_two_spheres_analytic_cap():
    # two equal extended spheres of radius R at distance d < 2R: each
    # loses a cap of height h = R - d/2 -> area 4*pi*R^2 - 2*pi*R*h
    r, probe = 0.2, 0.1
    R = r + probe
    d = 0.4
    pts = np.array([[5.0, 5.0, 5.0], [5.0 + d, 5.0, 5.0]])
    area, nrel = _run(pts, [r, r], probe=probe, n_points=4096)
    assert nrel == 1
    expect = 4 * np.pi * R * R - 2 * np.pi * R * (R - d / 2)
    np.testing.assert_allclose(area, [expect, expect], rtol=3e-3)


def test_sasa_buried_atom_is_zero():
    # a small atom at the center of a tight icosahedral cage of large ones
    phi = (1 + np.sqrt(5)) / 2
    verts = np.array([[0, 1, phi], [0, -1, phi], [0, 1, -phi], [0, -1, -phi],
                      [1, phi, 0], [-1, phi, 0], [1, -phi, 0], [-1, -phi, 0],
                      [phi, 0, 1], [-phi, 0, 1], [phi, 0, -1], [-phi, 0, -1]],
                     np.float64)
    verts /= np.linalg.norm(verts[0])
    pts = np.vstack([[0.0, 0.0, 0.0], verts * 0.25]) + 5.0
    radii = np.array([0.1] + [0.2] * 12)
    area, _ = _run(pts, radii, probe=0.14, n_points=512)
    assert area[0] == 0.0
    assert (area[1:] > 0).all()


def test_sasa_pbc_split_pair_matches_contiguous():
    r, probe, d = 0.2, 0.1, 0.35
    contiguous = np.array([[5.0, 5.0, 5.0], [5.0 + d, 5.0, 5.0]])
    split = np.array([[BOX[0] - d / 2, 5.0, 5.0], [d / 2, 5.0, 5.0]])
    a1, _ = _run(contiguous, [r, r], probe=probe)
    a2, _ = _run(split, [r, r], probe=probe)
    np.testing.assert_allclose(a2, a1, rtol=1e-5)


def test_sasa_matches_host_oracle_random_cluster():
    rng = np.random.default_rng(12)
    k = 40
    pts = (rng.uniform(-0.6, 0.6, size=(k, 3)) + 6.0).astype(np.float32)
    radii = rng.uniform(0.1, 0.25, size=k).astype(np.float32)
    area, nrel = _run(pts, radii, probe=0.14, n_points=192,
                      max_neighbors=k - 1)
    expect = sasa_ops.sasa_frames_host_f64(
        pts[None], np.asarray([BOX]), radii, probe=0.14, n_points=192)[0]
    np.testing.assert_allclose(area, expect, rtol=2e-4, atol=1e-5)


def test_sasa_chunking_invariance():
    rng = np.random.default_rng(5)
    k = 37                      # deliberately not a multiple of the chunk
    pts = (rng.uniform(-0.5, 0.5, size=(k, 3)) + 4.0).astype(np.float32)
    radii = rng.uniform(0.1, 0.2, size=k).astype(np.float32)
    a_one, _ = _run(pts, radii, chunk=k)
    a_chunked, _ = _run(pts, radii, chunk=8)
    np.testing.assert_allclose(a_chunked, a_one, rtol=1e-6, atol=1e-7)


def test_sasa_models_pipeline_and_guards(tmp_path):
    rng = np.random.default_rng(9)
    k, f = 24, 6
    frames = (rng.uniform(-0.5, 0.5, size=(f, k, 3)) + 6.0).astype(np.float32)
    path = str(tmp_path / "c.xtc")
    _write_xtc(path, frames)
    s = _system(k, np.ones(k, np.float32), frames[0])
    radii = rng.uniform(0.1, 0.2, size=k).astype(np.float32)

    # no vdW radii on the topology -> explicit error
    with pytest.raises(GroupError) as e:
        models.sasa(s, path, "All")
    assert e.value.code == "InvalidVdW"
    with pytest.raises(GroupError, match="shape"):
        models.sasa(s, path, "All", radii=radii[:3])

    out = models.sasa(s, path, "All", radii=radii)
    assert out["area"].shape == (f, k) and out["total"].shape == (f,)
    expect = sasa_ops.sasa_frames_host_f64(
        np.round(np.asarray(frames, np.float64) * 1e4) / 1e4,
        np.repeat(np.asarray([BOX], np.float64), f, axis=0), radii)
    np.testing.assert_allclose(out["area"], expect, rtol=2e-4, atol=1e-5)

    # cap smaller than the true relevant count must raise, not truncate
    with pytest.raises(ParallelError, match="max_neighbors"):
        models.sasa(s, path, "All", radii=radii, max_neighbors=2)

    # device-resident layouts agree with the by-filename path
    from groan_rs_tpu.models import TrajectoryAnalysis

    dt = TrajectoryAnalysis(s).runner(group="All").load_device(path)
    by_dt = models.sasa(s, dt, "All", radii=radii)
    np.testing.assert_allclose(by_dt["area"], out["area"], rtol=1e-6)


def test_sasa_fixture_protein_guessed_radii():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.gro"))
    s.guess_elements()
    s.group_create("Peptide", "@protein")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.sasa(s, xtc, "Peptide", max_neighbors=96)
    f, k = out["area"].shape
    assert k == len(s.group_indices("Peptide")) and f > 0
    # a ~20-residue peptide's SASA is a few tens of nm^2
    assert 5.0 < float(out["total"].mean()) < 100.0
    # buried backbone atoms exist, exposed sidechain atoms exist
    assert (out["area"] == 0).any() and (out["area"] > 0.1).any()
    # oracle parity on frame 0
    from groan_rs_tpu.io import native

    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, b9, *_ = native.xtc_read_frames(xtc, offsets[:1], natoms)
    idx = s.group_indices("Peptide")
    radii = np.asarray(s.topology.vdw, np.float64)[idx]
    expect = sasa_ops.sasa_frames_host_f64(
        coords[:, idx], b9[:, [0, 4, 8]], radii)[0]
    np.testing.assert_allclose(out["area"][0], expect, rtol=2e-3, atol=1e-4)
