"""Map-reduce engine protocol tests (reference: parallel.rs:31-49,208-322 —
ParallelTrajData initialize/reduce, serial-vs-parallel equivalence, error
surfacing)."""

import io
import os

import numpy as np
import pytest

from groan_rs_tpu.errors import ParallelError
from groan_rs_tpu.progress import ProgressPrinter
from groan_rs_tpu.system import System
from groan_rs_tpu.parallel import traj_iter_map_reduce
from groan_rs_tpu.parallel.engine import make_mesh


@pytest.fixture(scope="module")
def example(test_files):
    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("Protein", "@protein")
    return s


def _center_body(s):
    import jax.numpy as jnp

    idx = jnp.asarray(s.group_indices("Protein"))

    def body(positions, boxes, mask):
        from groan_rs_tpu.ops import center as center_ops

        return {"center": center_ops.center(
            jnp.take(positions, idx, axis=1), boxes[:, None, :])}

    return body


def test_fold_device_reduction_matches_serial(example, test_files):
    """init/fold keep the running reduction on device; the result matches
    the serial per-frame pass (reference: 1..N-thread equivalence tests)."""
    import jax.numpy as jnp

    def fold(carry, out, mask):
        m = mask.astype(out["center"].dtype)
        return {
            "sum": carry["sum"] + jnp.sum(out["center"] * m[:, None], axis=0),
            "n": carry["n"] + jnp.sum(m),
        }

    init = {"sum": jnp.zeros(3, jnp.float32), "n": jnp.float32(0)}
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    s = example.copy()
    mean = traj_iter_map_reduce(
        s, xtc, _center_body(s), init=init, fold=fold,
        reduce=lambda c: np.asarray(c["sum"]) / float(c["n"]),
        batch_size=4,
    )

    # serial reference
    s2 = example.copy()
    serial = []
    for frame in s2.xtc_iter(xtc):
        serial.append(frame.group_get_center("Protein"))
    np.testing.assert_allclose(mean, np.mean(serial, axis=0), atol=1e-5)


def test_fold_with_collect_returns_both(example, test_files):
    import jax.numpy as jnp

    def fold(carry, out, mask):
        return carry + jnp.sum(mask)

    s = example.copy()
    result, collected = traj_iter_map_reduce(
        s, os.path.join(test_files, "short_trajectory.xtc"),
        _center_body(s), init=jnp.float32(0), fold=fold, batch_size=4,
        collect=True,
    )
    assert float(result) == 11.0
    assert collected["center"].shape == (11, 3)


def test_error_surfacing_sets_failed_progress(example, test_files):
    """A failing body aborts the pass with ParallelError naming the frame
    range, and progress flips to FAILED (the error-flag analogue)."""
    def bad_body(positions, boxes, mask):
        raise RuntimeError("boom")

    buf = io.StringIO()
    printer = (ProgressPrinter().with_print_freq(1).with_output(buf)
               .with_colored(False).with_terminating("\n"))
    s = example.copy()
    with pytest.raises(ParallelError, match="frames 0..3"):
        traj_iter_map_reduce(
            s, os.path.join(test_files, "short_trajectory.xtc"),
            bad_body, batch_size=4, progress=printer,
        )
    assert "FAILED" in buf.getvalue()


def test_multi_file_cat_map_reduce(example, test_files):
    """Concatenated multi-file pass with dedup matches the single-file pass
    (reference: parallel.rs xtc_iter_cat_map_reduce tests)."""
    split = [
        os.path.join(test_files, "split", f"traj{i}.xtc") for i in range(1, 7)
    ]
    s = example.copy()
    out_cat = traj_iter_map_reduce(s, split, _center_body(s), batch_size=4)
    s2 = example.copy()
    out_one = traj_iter_map_reduce(
        s2, os.path.join(test_files, "short_trajectory.xtc"),
        _center_body(s2), batch_size=4,
    )
    np.testing.assert_allclose(out_cat["center"], out_one["center"], atol=1e-6)


def test_mesh_shard_counts_agree(example, test_files):
    """Results are identical for 1, 2, 4, 8 frame shards (the reference's
    1..N-thread equivalence, parallel.rs tests)."""
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    outs = []
    for n in (1, 2, 4, 8):
        s = example.copy()
        outs.append(traj_iter_map_reduce(
            s, xtc, _center_body(s), batch_size=8, mesh=make_mesh(n, 1)))
    for o in outs[1:]:
        np.testing.assert_allclose(o["center"], outs[0]["center"], atol=1e-6)


def test_host_sharding_partitions_frames(example, test_files):
    """with_host_shard(k, n) stripes the frame selection; the union over
    hosts is exactly the serial pass (the multi-host DCN decomposition)."""
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    all_times = []
    for k in range(3):
        s = example.copy()
        reader = s.xtc_iter(xtc).with_host_shard(k, 3)
        all_times.extend(float(t) for t in reader.times)
    assert sorted(all_times) == [100.0 * i for i in range(11)]

    # composes with range/step restrictions
    s = example.copy()
    r = s.xtc_iter(xtc).with_range(200.0, 900.0).with_host_shard(1, 2)
    assert list(r.times) == [300.0, 500.0, 700.0, 900.0]

    with pytest.raises(Exception):
        example.copy().xtc_iter(xtc).with_host_shard(5, 3)


def test_group_map_reduce_matches_full(example, test_files):
    """parallel.rs:1984 group_xtc_iter_map_reduce_basic — group-restricted
    map-reduce yields the same per-frame values as the full read."""
    import jax.numpy as jnp

    s = example.copy()
    s.group_create("Membrane", "@membrane")
    xtc = os.path.join(test_files, "short_trajectory.xtc")
    k = int(s.group_indices("Membrane").shape[0])

    def body(positions, boxes, mask):
        return {"mean": positions.mean(axis=1)}

    full_idx = s.group_indices("Membrane")

    def body_full(positions, boxes, mask):
        g = jnp.take(positions, jnp.asarray(full_idx), axis=1)
        return {"mean": g.mean(axis=1)}

    grp = traj_iter_map_reduce(s, [xtc], body, group="Membrane")
    ful = traj_iter_map_reduce(s, [xtc], body_full)
    np.testing.assert_allclose(np.asarray(grp["mean"]),
                               np.asarray(ful["mean"]), atol=1e-6)
    assert np.asarray(grp["mean"]).shape[0] == 11


def test_group_map_reduce_range_steps(example, test_files):
    """parallel.rs group_xtc_iter_map_range_steps — range+step composes
    with group reads."""
    s = example.copy()
    s.group_create("Membrane", "@membrane")
    xtc = os.path.join(test_files, "short_trajectory.xtc")

    def body(positions, boxes, mask):
        return {"mean": positions.mean(axis=1)}

    out = traj_iter_map_reduce(s, [xtc], body, group="Membrane",
                               start_time=300.0, end_time=800.0, step=2)
    assert np.asarray(out["mean"]).shape[0] == 3  # 300, 500, 700


def test_gro_map_reduce_basic(test_files):
    """parallel.rs gro_iter_map_reduce_basic — the engine also runs over
    multi-frame GRO sources."""
    s = System.from_file(os.path.join(test_files, "protein.gro"))

    def body(positions, boxes, mask):
        return {"mean": positions.mean(axis=1)}

    gro = os.path.join(test_files, "protein_trajectory.gro")
    out = traj_iter_map_reduce(s, [gro], body, fmt="gro")
    serial = []
    s2 = System.from_file(os.path.join(test_files, "protein.gro"))
    for fr in s2.gro_iter(gro):
        serial.append(np.asarray(fr.positions).mean(axis=0))
    np.testing.assert_allclose(np.asarray(out["mean"]), np.stack(serial),
                               atol=1e-5)
