"""Bond-angle and dihedral observables (surpass analyses).

The reference only exposes pairwise, non-PBC `Vector3D::angle`
(vector3d.rs:276) evaluated one pair at a time on the host; there is no
per-frame angle/dihedral trajectory analysis.  These tests pin the
`gmx angle`-class batched kernels against exact geometric constructions
(sign convention included) and a float64 host oracle on the reference
fixture corpus, through both step_fn and the full `.run()` fast path.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.ops import geometry
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


def _tiny_system(pts, box=(10.0, 10.0, 10.0)):
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.ones(n, np.int64)
    return System("geom", topo, simbox=SimBox.from_lengths(*box),
                  positions=pts)


def _eval(system, build, pts, box=(10.0, 10.0, 10.0)):
    import jax
    import jax.numpy as jnp

    fn = jax.jit(build.step_fn(None))
    res = fn(jnp.asarray(np.asarray(pts, np.float32))[None],
             jnp.asarray(np.asarray(box, np.float32))[None],
             jnp.ones(1, bool))
    return {k: np.asarray(v)[0] for k, v in res.items()}


def test_angles_known_values():
    # right angle, straight line, equilateral-triangle apex (60 degrees),
    # and a PBC-split right angle (vertex across the box face)
    pts = np.array([
        [1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0],   # 0-1-2: 90
        [2.0, 2.0, 2.0], [3.0, 2.0, 2.0], [4.0, 2.0, 2.0],   # 3-4-5: 180
        [5.0, 5.0, 0.0],                                     # triangle base L
        [5.5, 5.0 + np.sqrt(3) / 2, 0.0],                    # triangle apex
        [6.0, 5.0, 0.0],                                     # triangle base R
        [9.8, 5.0, 5.0], [0.2, 5.0, 5.0], [0.2, 5.4, 5.0],   # 90 via PBC
    ], np.float32)
    s = _tiny_system(pts)
    tri = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    out = _eval(s, TrajectoryAnalysis(s).add_angles(tri), pts)
    np.testing.assert_allclose(
        out["angles"], [90.0, 180.0, 60.0, 90.0], atol=5e-3)


def test_dihedrals_sign_convention_and_values():
    # chain a-b-c-d with b2 along +z; d placed at azimuth phi relative to
    # a's azimuth gives dihedral exactly phi (IUPAC: clockwise looking
    # along b->c is positive; cis = 0, trans = 180)
    def chain(phi_deg):
        phi = np.radians(phi_deg)
        return np.array([
            [1.0, 0.0, 0.0] + np.array([5, 5, 5]),
            [0.0, 0.0, 0.0] + np.array([5, 5, 5]),
            [0.0, 0.0, 1.0] + np.array([5, 5, 5]),
            [np.cos(phi), np.sin(phi), 1.0] + np.array([5, 5, 5]),
        ], np.float32)

    phis = [0.0, 60.0, -60.0, 120.0, 180.0, -90.0]
    pts = np.concatenate([chain(p) for p in phis])
    s = _tiny_system(pts)
    quads = [[4 * i, 4 * i + 1, 4 * i + 2, 4 * i + 3]
             for i in range(len(phis))]
    out = _eval(s, TrajectoryAnalysis(s).add_dihedrals(quads), pts)
    np.testing.assert_allclose(out["dihedrals"], phis, atol=5e-3)


def test_dihedral_pbc_split_chain():
    # the same 60-degree chain, translated so every bond crosses a face
    base = np.array([
        [1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0],
        [np.cos(np.radians(60)), np.sin(np.radians(60)), 1.0]], np.float32)
    box = np.array([3.0, 3.0, 3.0], np.float32)
    split = np.mod(base + np.array([2.7, 2.8, 2.5], np.float32), box)
    s = _tiny_system(split, box=tuple(map(float, box)))
    out = _eval(s, TrajectoryAnalysis(s).add_dihedrals([[0, 1, 2, 3]]),
                split, box=box)
    np.testing.assert_allclose(out["dihedrals"], [60.0], atol=5e-3)


def test_geometry_fixture_parity_full_run():
    from groan_rs_tpu.io import native

    s = System.from_file(os.path.join(TF, "example.tpr"))
    xtc = os.path.join(TF, "short_trajectory.xtc")
    n = s.get_n_atoms()
    rng = np.random.default_rng(7)
    tri = rng.integers(0, n, size=(64, 3))
    quad = rng.integers(0, n, size=(48, 4))
    out = (TrajectoryAnalysis(s)
           .add_angles(tri, name="ang")
           .add_dihedrals(quad, name="dih")
           .run(xtc, batch_size=4))

    offsets, _, _, natoms = native.xtc_scan(xtc)
    coords, b9, *_ = native.xtc_read_frames(xtc, offsets, natoms)
    boxes = b9[:, [0, 4, 8]]
    exp_ang = geometry.angles_host_f64(
        coords[:, tri[:, 0]], coords[:, tri[:, 1]], coords[:, tri[:, 2]],
        boxes)
    exp_dih = geometry.dihedrals_host_f64(
        coords[:, quad[:, 0]], coords[:, quad[:, 1]], coords[:, quad[:, 2]],
        coords[:, quad[:, 3]], boxes)
    np.testing.assert_allclose(out["ang"], exp_ang, atol=2e-2)
    # signed angles near +-180 may legitimately wrap; compare circularly
    ddih = np.abs(np.asarray(out["dih"], np.float64) - exp_dih)
    ddih = np.minimum(ddih, 360.0 - ddih)
    assert float(ddih.max()) < 2e-2


def _brute_min_image(d, h):
    """Exhaustive 125-image minimum-norm displacement, float64.

    d: [B, K, 3] raw displacements; h: [B, 3, 3] per-frame box matrices.
    (matmul batch-broadcasting of [B, K, 3] @ [B, 1, 3, 3] silently mixes
    frames — keep the shapes explicit.)
    """
    shifts = np.array([[i, j, k] for i in range(-2, 3)
                       for j in range(-2, 3) for k in range(-2, 3)], np.float64)
    d = np.asarray(d, np.float64)
    h = np.asarray(h, np.float64)
    d0 = d - np.round(d @ np.linalg.inv(h)) @ h   # [B,K,3] @ [B,3,3]
    sv = shifts @ h                               # [B, 125, 3]
    cand = d0[:, :, None, :] + sv[:, None, :, :]  # [B, K, 125, 3]
    best = np.argmin((cand * cand).sum(-1), axis=-1)
    return np.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]


def test_geometry_triclinic_fixture_parity():
    from groan_rs_tpu.io.traj import open_source

    s = System.from_file(os.path.join(TF, "dodecahedron.gro"))
    xtc = os.path.join(TF, "dodecahedron_trajectory.xtc")
    n = s.get_n_atoms()
    rng = np.random.default_rng(3)
    tri = rng.integers(0, n, size=(16, 3))
    quad = rng.integers(0, n, size=(12, 4))
    out = (TrajectoryAnalysis(s, triclinic=True)
           .add_angles(tri, name="ang")
           .add_dihedrals(quad, name="dih")
           .run(xtc, batch_size=4))

    src = open_source(xtc)
    fb = src.read_batch(np.arange(src.n_frames()))
    p = np.asarray(fb.positions, np.float64)
    h = fb.box_matrices()
    va = _brute_min_image(p[:, tri[:, 0]] - p[:, tri[:, 1]], h)
    vc = _brute_min_image(p[:, tri[:, 2]] - p[:, tri[:, 1]], h)
    sin = np.linalg.norm(np.cross(va, vc), axis=-1)
    cos = np.sum(va * vc, axis=-1)
    exp_ang = np.degrees(np.arctan2(sin, cos))
    np.testing.assert_allclose(out["ang"], exp_ang, atol=3e-2)

    b1 = _brute_min_image(p[:, quad[:, 1]] - p[:, quad[:, 0]], h)
    b2 = _brute_min_image(p[:, quad[:, 2]] - p[:, quad[:, 1]], h)
    b3 = _brute_min_image(p[:, quad[:, 3]] - p[:, quad[:, 2]], h)
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    b2n = b2 / np.linalg.norm(b2, axis=-1, keepdims=True)
    exp_dih = np.degrees(np.arctan2(np.sum(np.cross(n1, n2) * b2n, -1),
                                    np.sum(n1 * n2, -1)))
    ddih = np.abs(np.asarray(out["dih"], np.float64) - exp_dih)
    ddih = np.minimum(ddih, 360.0 - ddih)
    assert float(ddih.max()) < 3e-2


def test_geometry_site_validation():
    s = _tiny_system(np.zeros((4, 3), np.float32))
    with pytest.raises(GroupError, match=r"\[K, 3\]"):
        TrajectoryAnalysis(s).add_angles([[0, 1]])
    with pytest.raises(GroupError, match="outside"):
        TrajectoryAnalysis(s).add_angles([[0, 1, 4]])
    with pytest.raises(GroupError, match="outside"):
        TrajectoryAnalysis(s).add_dihedrals([[0, 1, 2, -1]])
    with pytest.raises(GroupError, match=r"\[K, 4\]"):
        TrajectoryAnalysis(s).add_dihedrals(np.zeros((0, 4), np.int64))


def test_geometry_no_sharded_formulation():
    from groan_rs_tpu.errors import ParallelError
    from groan_rs_tpu.ops.sharded import compile_decl

    s = _tiny_system(np.zeros((4, 3), np.float32))
    with pytest.raises(ParallelError, match="atoms-sharded"):
        compile_decl({"kind": "angles", "name": "a"}, s)


def _named_system(pts, names, resnums, box=(10.0, 10.0, 10.0)):
    from groan_rs_tpu.core.topology import StrColumn

    pts = np.asarray(pts, np.float32)
    n = len(pts)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.asarray(resnums, np.int64)
    topo.atomname = StrColumn(values=list(names))
    topo.resname = StrColumn(values=["ALA"] * n)
    s = System("rama", topo, simbox=SimBox.from_lengths(*box),
               positions=pts)
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def test_ramachandran_synthetic_chain(tmp_path):
    from groan_rs_tpu import models
    from groan_rs_tpu.io import native

    # 4 residues x (N, CA, C, O); interior residues 2 and 3 get phi/psi
    rng = np.random.default_rng(8)
    nres = 4
    names = ["N", "CA", "C", "O"] * nres
    resnums = np.repeat(np.arange(1, nres + 1), 4)
    pts = (rng.uniform(-1.2, 1.2, size=(len(names), 3)) + 5.0)

    box9 = np.diag([10.0, 10.0, 10.0]).astype(np.float32).reshape(9)
    path = str(tmp_path / "rama.xtc")
    frames = np.stack([pts, pts + rng.normal(size=pts.shape) * 0.1])
    for f in range(2):
        native.xtc_write_frame(path, len(names), f, float(f), box9,
                               frames[f].astype(np.float32), 10000.0)

    s = _named_system(pts, names, resnums)
    out = models.ramachandran(s, path, "All")
    assert out["resids"].tolist() == [2, 3]
    assert out["phi"].shape == out["psi"].shape == (2, 2)

    # oracle: dihedrals over hand-built site tables on the decoded coords
    offsets, _, _, natoms = native.xtc_scan(path)
    coords, b9, *_ = native.xtc_read_frames(path, offsets, natoms)
    boxes = b9[:, [0, 4, 8]]
    at = {(r, nm): 4 * (r - 1) + ["N", "CA", "C", "O"].index(nm)
          for r in range(1, nres + 1) for nm in ("N", "CA", "C", "O")}
    for j, r in enumerate((2, 3)):
        phi_sites = [at[(r - 1, "C")], at[(r, "N")], at[(r, "CA")],
                     at[(r, "C")]]
        psi_sites = [at[(r, "N")], at[(r, "CA")], at[(r, "C")],
                     at[(r + 1, "N")]]
        exp_phi = geometry.dihedrals_host_f64(
            coords[:, [phi_sites[0]]], coords[:, [phi_sites[1]]],
            coords[:, [phi_sites[2]]], coords[:, [phi_sites[3]]], boxes)
        exp_psi = geometry.dihedrals_host_f64(
            coords[:, [psi_sites[0]]], coords[:, [psi_sites[1]]],
            coords[:, [psi_sites[2]]], coords[:, [psi_sites[3]]], boxes)
        np.testing.assert_allclose(out["phi"][:, j], exp_phi[:, 0],
                                   atol=2e-2)
        np.testing.assert_allclose(out["psi"][:, j], exp_psi[:, 0],
                                   atol=2e-2)


def test_ramachandran_gap_and_errors(tmp_path):
    from groan_rs_tpu import models

    rng = np.random.default_rng(2)
    # residues 1,2,4,5: no residue has BOTH neighbours -> explicit error
    names = ["N", "CA", "C"] * 4
    resnums = np.repeat([1, 2, 4, 5], 3)
    pts = rng.uniform(3.0, 7.0, size=(12, 3))
    s = _named_system(pts, names, resnums)
    with pytest.raises(GroupError, match="phi and psi"):
        models.ramachandran(s, "unused.xtc", "All")


def test_ramachandran_fixture_peptide():
    from groan_rs_tpu import models
    from groan_rs_tpu.io import native

    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.gro"))
    s.group_create("Peptide", "@protein")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.ramachandran(s, xtc, "Peptide")
    f, r = out["phi"].shape
    assert f > 0 and r >= 3
    assert out["psi"].shape == (f, r)
    assert np.isfinite(out["phi"]).all() and np.isfinite(out["psi"]).all()
    assert (np.abs(out["phi"]) <= 180.0).all()
    # a helical membrane peptide: phi clusters near -60, psi near -45
    assert -180.0 < float(np.median(out["phi"])) < 0.0


def test_in_shape_observable_matches_host_shapes(tmp_path):
    """add_in_shape == host Shape.inside sums on the decoded coords, for
    all three shapes, including PBC-wrapped members."""
    from groan_rs_tpu.core.dimension import Dimension
    from groan_rs_tpu.core.shapes import Cylinder, Rectangular, Sphere
    from groan_rs_tpu.io import native

    rng = np.random.default_rng(11)
    k, f = 120, 5
    box = np.array([6.0, 6.0, 6.0], np.float32)
    pts = rng.uniform(0, 1, size=(f, k, 3)).astype(np.float32) * box
    path = str(tmp_path / "s.xtc")
    b9 = np.diag(box).astype(np.float32).reshape(9)
    for i in range(f):
        native.xtc_write_frame(path, k, i, float(i), b9, pts[i], 10000.0)
    s = _tiny_system(pts[0], box=tuple(map(float, box)))
    s.group_create_from_ranges("All", [(0, k - 1)])

    shapes = {
        "sph": Sphere([5.8, 3.0, 3.0], 1.5),        # wraps through a face
        "rect": Rectangular([4.5, 4.5, 4.5], 2.5, 2.0, 3.0),
        "cyl": Cylinder([3.0, 3.0, 5.5], 1.2, 2.0, Dimension.Z),
    }
    pipe = TrajectoryAnalysis(s)
    for nm, sh in shapes.items():
        pipe.add_in_shape("All", sh, name=nm)
    out = pipe.run(path, batch_size=2)

    offsets, _, _, natoms = native.xtc_scan(path)
    coords, b9r, *_ = native.xtc_read_frames(path, offsets, natoms)
    for nm, sh in shapes.items():
        for fi in range(f):
            expect = int(sh.inside(coords[fi], box).sum())
            assert int(out[nm][fi]) == expect, (nm, fi)
        assert out[nm].max() > 0          # shapes actually catch atoms


def test_in_shape_build_time_errors():
    from groan_rs_tpu.core.shapes import Shape, Sphere
    from groan_rs_tpu.errors import ShapeError

    s = _tiny_system(np.zeros((4, 3), np.float32))
    s.group_create_from_ranges("All", [(0, 3)])
    with pytest.raises(ShapeError, match="device formulation"):
        TrajectoryAnalysis(s).add_in_shape("All", Shape())
    with pytest.raises(GroupError, match="triclinic"):
        TrajectoryAnalysis(s, triclinic=True).add_in_shape(
            "All", Sphere([1, 1, 1], 0.5))


def test_principal_moments_known_bodies(tmp_path):
    """Thin rod: I = [~0, I, I] with I = sum m x^2; PBC-split rod same."""
    from groan_rs_tpu.io import native
    from groan_rs_tpu import models as _m

    k = 11
    xs = np.linspace(-0.5, 0.5, k)
    box = np.array([4.0, 4.0, 4.0], np.float32)
    rod = np.column_stack([xs + 2.0, np.full(k, 2.0), np.full(k, 2.0)])
    split = rod.copy()
    split[:, 0] = np.mod(xs + 0.05, box[0])     # rod across the x face
    masses = np.linspace(1.0, 3.0, k).astype(np.float32)

    for pts in (rod, split):
        pts = pts.astype(np.float32)
        s = _tiny_system(pts, box=tuple(map(float, box)))
        s.topology.mass = masses
        s.topology.has_mass = np.ones(k, bool)
        s.group_create_from_ranges("All", [(0, k - 1)])
        path = str(tmp_path / f"rod{int(pts[0, 0] * 100)}.xtc")
        b9 = np.diag(box).astype(np.float32).reshape(9)
        native.xtc_write_frame(path, k, 0, 0.0, b9, pts, 10000.0)
        out = (TrajectoryAnalysis(s).add_principal("All", name="I")
               .run(path))
        moments = np.asarray(out["I"][0], np.float64)
        com = (masses * xs).sum() / masses.sum()
        expect = (masses * (xs - com) ** 2).sum()
        assert moments[0] < 1e-4                          # rod axis
        np.testing.assert_allclose(moments[1:], expect, rtol=1e-3)


def test_principal_fixture_ordering():
    from groan_rs_tpu import models as _m

    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    out = (TrajectoryAnalysis(s).add_principal("Protein")
           .run(os.path.join(TF, "short_trajectory.xtc"), batch_size=4))
    m = np.asarray(out["principal_Protein"])
    assert m.shape[1] == 3 and (np.diff(m, axis=1) >= -1e-3).all()
    assert (m > 0).all() and np.isfinite(m).all()
