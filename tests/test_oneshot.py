"""One-shot latency path (`FrameEngine.run_oneshot`): the whole pass ships
as ONE packed device_put and evaluates in ONE dispatch.  Must be
result-identical to the streamed engine path on the same wire
(BASELINE.md rows 5-7 — the reference's small-group partial reads)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"


@pytest.fixture(scope="module")
def tpr_sys():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    return s


def _mesh1():
    import jax

    from groan_rs_tpu.parallel.engine import make_mesh

    return make_mesh(1, 1, devices=jax.devices()[:1])


def _run_with_budget(system, budget, **kw):
    old = os.environ.get("GROAN_ONESHOT_BYTES")
    os.environ["GROAN_ONESHOT_BYTES"] = str(budget)
    try:
        pipe = (TrajectoryAnalysis(system, mesh=_mesh1())
                .add_com("Protein", name="com")
                .add_rmsd("Protein", reference=system, name="rmsd"))
        runner = pipe.runner()
        out = runner.run(os.path.join(TF, "short_trajectory.xtc"), **kw)
        return out, runner
    finally:
        if old is None:
            del os.environ["GROAN_ONESHOT_BYTES"]
        else:
            os.environ["GROAN_ONESHOT_BYTES"] = old


def test_oneshot_equals_streamed(tpr_sys):
    streamed, r1 = _run_with_budget(tpr_sys.copy(), 0, batch_size=4)
    oneshot, r2 = _run_with_budget(tpr_sys.copy(), 64_000_000, batch_size=4)
    # both passes ship the q16 wire and dequantize identically; batch
    # tiling (4-frame batches vs one 11-frame dispatch) may still change
    # XLA's reduction vectorization by f32 ulps (same contract as
    # test_resident_batch_boundaries)
    for k in ("com", "rmsd"):
        np.testing.assert_allclose(np.asarray(streamed[k]),
                                   np.asarray(oneshot[k]),
                                   rtol=0, atol=2e-6)
    np.testing.assert_array_equal(streamed["times"], oneshot["times"])
    np.testing.assert_array_equal(streamed["steps"], oneshot["steps"])
    # the one-shot engine really took the packed path: exactly one
    # "oneshot" compiled entry, and frames shipped in one go
    assert any(isinstance(k, tuple) and k and k[0] == "oneshot"
               for k in r2.engine._steps)
    assert r2.engine.frames_shipped == 11


def test_oneshot_respects_range_and_step(tpr_sys):
    streamed, _ = _run_with_budget(tpr_sys.copy(), 0, batch_size=3,
                                   start_time=200.0, end_time=800.0, step=2)
    oneshot, _ = _run_with_budget(tpr_sys.copy(), 64_000_000, batch_size=3,
                                  start_time=200.0, end_time=800.0, step=2)
    np.testing.assert_array_equal(streamed["times"], oneshot["times"])
    for k in ("com", "rmsd"):
        np.testing.assert_allclose(np.asarray(streamed[k]),
                                   np.asarray(oneshot[k]),
                                   rtol=0, atol=2e-6)


def test_oneshot_hbonds_match_streamed():
    from groan_rs_tpu.system.hbonds import HBondChain

    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s.group_create("Protein", "@protein")
    chains = [HBondChain("resname SOL and name OW",
                         "resname SOL and name OW",
                         "resname SOL and name HW1 HW2")]
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")

    def build(budget):
        os.environ["GROAN_ONESHOT_BYTES"] = str(budget)
        try:
            pipe = (TrajectoryAnalysis(s.copy(), mesh=_mesh1())
                    .add_com("Protein", name="com")
                    .add_hbonds(chains, [(0, 0)], 0.3, 150.0,
                                name="hb", method="cells"))
            return pipe.runner().run(xtc, batch_size=2)
        finally:
            del os.environ["GROAN_ONESHOT_BYTES"]

    a = build(0)
    b = build(640_000_000)
    # host-assisted hbond counting sees identical q16 frames either way:
    # counts are the exact reference values on both paths
    np.testing.assert_array_equal(a["hb_0_0"], b["hb_0_0"])
    assert list(a["hb_0_0"][:3]) == [4675, 4644, 4629]
    np.testing.assert_allclose(np.asarray(a["com"]), np.asarray(b["com"]),
                               rtol=0, atol=2e-6)


def test_oneshot_honors_wire_env(tpr_sys, monkeypatch):
    """GROAN_WIRE pins the reader's wire AFTER the oneshot path chooses
    one, so a delta-pinned small pass must stream instead of reaching
    run_oneshot (which supports q16/f32 only) and crashing."""
    monkeypatch.setenv("GROAN_ONESHOT_BYTES", "64000000")
    monkeypatch.setenv("GROAN_WIRE", "delta6")
    pipe = (TrajectoryAnalysis(tpr_sys.copy(), mesh=_mesh1())
            .add_com("Protein", name="com"))
    out = pipe.runner().run(
        os.path.join(TF, "short_trajectory.xtc"), batch_size=4)
    assert np.asarray(out["com"]).shape[0] == 11
