"""Tests: serde round-trip, analysis pipeline, parallel engine, extra formats,
trajectory RMSD."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.system import System


@pytest.fixture(scope="module")
def example(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_serde_roundtrip(example, test_files):
    from groan_rs_tpu.io.serde import system_from_yaml, system_to_yaml

    s = example.copy()
    s.group_create("Protein", "@protein")
    s.label_atom("first", 0)
    text = system_to_yaml(s)
    s2 = system_from_yaml(text)
    assert s2.get_n_atoms() == s.get_n_atoms()
    assert s2.get_name() == s.get_name()
    np.testing.assert_allclose(s2.positions, s.positions, atol=1e-6)
    assert s2.group_get_n_atoms("Protein") == s.group_get_n_atoms("Protein")
    assert s2.labeled_atoms == {"first": 0}
    assert s2.get_box().x == pytest.approx(s.get_box().x)


def test_serde_reference_fixture(test_files):
    """Load the reference's serde_system.yaml (protein group of example.gro)."""
    from groan_rs_tpu.io.serde import system_from_yaml

    s = system_from_yaml(os.path.join(test_files, "serde_system.yaml"))
    assert s.get_n_atoms() == 61
    assert s.get_atom(0).get_residue_name() == "GLY"
    np.testing.assert_allclose(s.positions[0], [9.497, 1.989, 7.498], atol=1e-5)
    assert s.get_box().x == pytest.approx(13.01331, abs=1e-5)


def test_pipeline_full(example, test_files):
    from groan_rs_tpu.models import TrajectoryAnalysis

    s = example.copy()
    s.group_create("Protein", "@protein")
    s.group_create("Membrane", "resname POPC")
    ref = System.from_file(os.path.join(test_files, "example.tpr"))
    ref.group_create("Protein", "@protein")

    # masses come from the tpr-based system for COM; copy them over
    s.topology.mass = ref.topology.mass.copy()
    s.topology.has_mass = ref.topology.has_mass.copy()
    pipe2 = (
        TrajectoryAnalysis(s)
        .add_center("Protein")
        .add_com("Membrane")
        .add_distance("Protein", "Membrane", Dimension.XYZ)
        .add_rmsd("Protein", ref)
        .add_min_distance("Protein", "Membrane")
    )
    out = pipe2.run(os.path.join(test_files, "short_trajectory.xtc"), batch_size=4)
    assert out["center_Protein"].shape == (11, 3)
    assert out["com_Membrane"].shape == (11, 3)
    assert out["distance_Protein_Membrane"].shape == (11,)
    assert out["rmsd_Protein"].shape == (11,)
    assert np.isfinite(out["rmsd_Protein"]).all()
    assert (out["rmsd_Protein"] >= 0).all()
    assert list(out["times"]) == [100.0 * i for i in range(11)]

    # per-frame parity vs the System-level API
    s3 = System.from_file(os.path.join(test_files, "example.tpr"))
    s3.group_create("Protein", "@protein")
    host_rmsd = []
    host_center = []
    for frame in s3.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        host_rmsd.append(frame.calc_rmsd(ref, "Protein"))
        host_center.append(frame.group_get_center("Protein"))
    np.testing.assert_allclose(out["rmsd_Protein"], host_rmsd, atol=2e-3)
    np.testing.assert_allclose(out["center_Protein"], host_center, atol=2e-3)


def test_traj_rmsd_iterator(example, test_files):
    ref = System.from_file(os.path.join(test_files, "example.tpr"))
    ref.group_create("Protein", "@protein")
    s = System.from_file(os.path.join(test_files, "example.tpr"))
    s.group_create("Protein", "@protein")
    rmsds = [r for _, r in s.xtc_iter(
        os.path.join(test_files, "short_trajectory.xtc")).calc_rmsd(ref, "Protein")]
    assert len(rmsds) == 11
    # exact reference expected values (rmsd.rs test_calc_rmsd_trajectory)
    expected = [
        0.23669721, 0.2634763, 0.26021627, 0.21364464, 0.22166993, 0.19383307,
        0.26422343, 0.27013618, 0.26398134, 0.23475659, 0.24208021,
    ]
    np.testing.assert_allclose(rmsds, expected, atol=5e-5)
    # against one-shot API
    s2 = System.from_file(os.path.join(test_files, "example.tpr"))
    s2.group_create("Protein", "@protein")
    it = iter(s2.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")))
    next(it)
    assert s2.calc_rmsd(ref, "Protein") == pytest.approx(rmsds[0], abs=2e-3)


def test_parallel_map_reduce(example, test_files):
    import jax.numpy as jnp

    from groan_rs_tpu.ops import center as center_ops
    from groan_rs_tpu.parallel import traj_iter_map_reduce

    s = example.copy()
    s.group_create("Protein", "@protein")
    idx = jnp.asarray(s.group_indices("Protein"))

    def body(positions, boxes, mask):
        g = jnp.take(positions, idx, axis=1)
        return {"center": center_ops.center(g, boxes[:, None, :])}

    out = traj_iter_map_reduce(
        s, os.path.join(test_files, "short_trajectory.xtc"), body, batch_size=4
    )
    assert out["center"].shape == (11, 3)
    # parity vs serial
    serial = []
    s2 = example.copy()
    s2.group_create("Protein", "@protein")
    for frame in s2.xtc_iter(os.path.join(test_files, "short_trajectory.xtc")):
        serial.append(frame.group_get_center("Protein"))
    np.testing.assert_allclose(out["center"], serial, atol=1e-4)


def test_extra_formats_match_xtc(example, test_files):
    from groan_rs_tpu.io import native
    from groan_rs_tpu.io.traj import open_source

    p = test_files
    offs, st, tm, na = native.xtc_scan(os.path.join(p, "short_trajectory.xtc"))
    cx, *_ = native.xtc_read_frames(os.path.join(p, "short_trajectory.xtc"), offs, na)
    for fname in ("short_trajectory.dcd", "short_trajectory.nc"):
        src = open_source(os.path.join(p, fname))
        assert src.n_frames() == 11 and src.natoms == na
        fb = src.read_batch(np.arange(11))
        np.testing.assert_allclose(fb.positions, cx, atol=1e-5)
    lm = open_source(os.path.join(p, "octahedron_trajectory.lammpstrj"))
    ox, *_ , ona = native.xtc_scan(os.path.join(p, "octahedron_trajectory.xtc"))
    ocx, *_ = native.xtc_read_frames(os.path.join(p, "octahedron_trajectory.xtc"), ox, ona)
    fbl = lm.read_batch(np.arange(lm.n_frames()))
    np.testing.assert_allclose(fbl.positions, ocx, atol=1e-5)


def test_dcd_iteration_via_system(example, test_files):
    s = example.copy()
    times = [f.get_time() for f in s.traj_iter(os.path.join(test_files, "short_trajectory.dcd"))]
    assert len(times) == 11
    assert times[1] == pytest.approx(100.0)


def test_convert_analyze_framework(example, test_files):
    """reference: traj_convert.rs converter/analyzer protocol."""
    import numpy as _np

    from groan_rs_tpu.models import (
        TranslateConverter, WrapConverter, analyze_iter, convert_iter,
    )

    s = example.copy()
    s.group_create("Protein", "@protein")
    xtc = os.path.join(test_files, "short_trajectory.xtc")

    # converter chain: translate + wrap; analyzer: protein center
    conv = [TranslateConverter([1.0, 0.0, 0.0]), WrapConverter()]
    centers = [
        _np.asarray(v)
        for _, v in analyze_iter(
            s.xtc_iter(xtc), lambda sys: sys.group_get_center("Protein"), conv
        )
    ]
    assert len(centers) == 11

    # parity: translating by x shifts the center by x (mod box)
    s2 = example.copy()
    s2.group_create("Protein", "@protein")
    raw = [
        _np.asarray(f.group_get_center("Protein")) for f in s2.xtc_iter(xtc)
    ]
    box_x = s2.get_box().x
    for c, r in zip(centers, raw):
        dx = (c[0] - r[0]) % box_x
        assert min(abs(dx - 1.0), abs(dx - 1.0 - box_x), abs(dx - 1.0 + box_x)) < 1e-3
        _np.testing.assert_allclose(c[1:], r[1:], atol=1e-3)

    # plain function converters work too
    seen = []
    for frame in convert_iter(s.xtc_iter(xtc), [lambda sys: seen.append(sys.get_time())]):
        pass
    assert len(seen) == 11


def test_density_map_pipeline(example, test_files):
    """Device-side 2D density histogram over a trajectory matches a host
    numpy histogram, and feeds a GridMap."""
    import numpy as _np

    from groan_rs_tpu import GridMap, TrajectoryAnalysis
    from groan_rs_tpu.io.traj import open_source

    s = example.copy()
    s.group_create("Protein", "@protein")
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    out = (TrajectoryAnalysis(s).add_density_map("Protein", "xy", tile=1.0)
           .run(xtc, batch_size=4))
    dm = out["density_Protein_xy"]
    assert dm.shape[0] == 11
    total = dm.sum(axis=0)

    # host reference histogram
    src = open_source(xtc)
    fb = src.read_batch(_np.arange(11))
    idx = s.group_indices("Protein")
    box = _np.asarray(s.box_lengths(), _np.float64)
    nx, ny = total.shape
    href = _np.zeros((nx, ny), _np.int64)
    for k in range(11):
        g = fb.positions[k][idx]
        ui = _np.floor(g[:, 0] / box[0] * nx).astype(int)
        vi = _np.floor(g[:, 1] / box[1] * ny).astype(int)
        ok = (ui >= 0) & (ui < nx) & (vi >= 0) & (vi < ny)
        _np.add.at(href, (ui[ok], vi[ok]), 1)
    _np.testing.assert_array_equal(total, href)
    assert total.sum() > 0

    # renders into a GridMap
    gm = GridMap((0.0, float(box[0])), (0.0, float(box[1])), (1.0, 1.0))
    assert gm.values.shape[0] >= nx and gm.values.shape[1] >= ny


def test_lammps_time_units_conversion(test_files):
    """chemfiles.rs lammps_time_convert:413 — TIME in declared units
    converts to ps ('real' = fs -> x1e-3); matches the XTC twin."""
    from groan_rs_tpu.io.traj import open_source

    lm = open_source(os.path.join(test_files, "octahedron_trajectory.lammpstrj"))
    xt = open_source(os.path.join(test_files, "octahedron_trajectory.xtc"))
    np.testing.assert_allclose(lm.times, xt.times, atol=1e-3)
    np.testing.assert_array_equal(lm.steps, xt.steps)


def test_lammps_unknown_units_errors(test_files, tmp_path):
    from groan_rs_tpu.errors import ReadTrajError
    from groan_rs_tpu.io.traj import open_source

    src = open(os.path.join(test_files, "octahedron_trajectory.lammpstrj")).read()
    bad = str(tmp_path / "bad.lammpstrj")
    open(bad, "w").write(src.replace("real", "parsecs", 1))
    with pytest.raises(ReadTrajError, match="parsecs"):
        open_source(bad, "lammpstrj")


def test_extra_format_iters_ranges_steps(example, test_files):
    """reference read_dcd_ranges/steps + read_nc/lammps equivalents
    (chemfiles.rs:1102-1180): range/step adapters behave identically on
    every trajectory format because frame selection is index arithmetic
    over the shared time table."""
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    # nc excluded: time is not read from NetCDF (reference parity — the
    # reference's chemfiles nc tests have no range/step cases either)
    for other in ("short_trajectory.dcd",):
        for args in (dict(rng=(200.0, 600.0)), dict(step=3),
                     dict(rng=(100.0, 900.0), step=4)):
            s1, s2 = example.copy(), example.copy()
            i1 = s1.traj_iter(xtc)
            i2 = s2.traj_iter(os.path.join(test_files, other))
            if "step" in args:  # deliberately swap adapter order (i2)
                i2 = i2.with_step(args["step"])
            if "rng" in args:
                i1 = i1.with_range(*args["rng"])
                i2 = i2.with_range(*args["rng"])
            if "step" in args:
                i1 = i1.with_step(args["step"])
            f1 = [(fr.get_time(), np.array(fr.positions)) for fr in i1]
            f2 = [(fr.get_time(), np.array(fr.positions)) for fr in i2]
            assert len(f1) == len(f2) and len(f1) > 0
            for (t1, p1), (t2, p2) in zip(f1, f2):
                assert t1 == pytest.approx(t2, abs=1e-3)
                np.testing.assert_allclose(p1, p2, atol=1e-5)
