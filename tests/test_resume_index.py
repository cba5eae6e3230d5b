"""Persistent frame-index cache + resumable pass state (SURVEY §5
checkpoint/resume subsystem)."""

import os
import shutil

import numpy as np
import pytest

from groan_rs_tpu.io.index_cache import PassState, index_path, load_index
from groan_rs_tpu.io.traj import XtcSource
from groan_rs_tpu.system import System


@pytest.fixture()
def local_xtc(test_files, tmp_path):
    dst = tmp_path / "traj.xtc"
    shutil.copy(os.path.join(test_files, "short_trajectory.xtc"), dst)
    return str(dst)


def test_index_cache_roundtrip(local_xtc):
    src1 = XtcSource(local_xtc)
    assert os.path.exists(index_path(local_xtc) + ".npz") or os.path.exists(index_path(local_xtc))
    cached = load_index(local_xtc)
    assert cached is not None
    np.testing.assert_array_equal(cached["offsets"], src1.offsets)
    # second open uses the cache and yields the identical index
    src2 = XtcSource(local_xtc)
    np.testing.assert_array_equal(src2.offsets, src1.offsets)
    np.testing.assert_array_equal(src2.times, src1.times)
    assert src2.natoms == src1.natoms


def test_index_cache_invalidated_on_change(local_xtc):
    XtcSource(local_xtc)
    assert load_index(local_xtc) is not None
    # append garbage -> size changes -> cache must be rejected
    with open(local_xtc, "ab") as fh:
        fh.write(b"x" * 64)
    assert load_index(local_xtc) is None


def test_index_cache_never_pollutes_data_dir(test_files):
    """The cache lives in the user cache dir, NEVER next to the data."""
    src = XtcSource(os.path.join(test_files, "short_trajectory.xtc"))
    assert src.n_frames() == 11
    assert not [f for f in os.listdir(test_files) if "gxidx" in f]
    assert load_index(os.path.join(test_files, "short_trajectory.xtc")) is not None


def test_pass_state_roundtrip(tmp_path):
    carry = {"s": np.arange(3, dtype=np.float32), "n": np.float32(7)}
    st = PassState(5, carry)
    p = tmp_path / "ckpt"
    st.save(p)
    back = PassState.load(p, like=carry)
    assert back.cursor == 5
    np.testing.assert_array_equal(back.carry["s"], carry["s"])
    assert float(back.carry["n"]) == 7.0
    assert PassState.load(tmp_path / "missing") is None


def test_map_reduce_resume(test_files, tmp_path, local_xtc):
    """A pass interrupted mid-way resumes from the checkpoint and produces
    the same reduction as an uninterrupted pass."""
    import jax.numpy as jnp

    from groan_rs_tpu.errors import ParallelError
    from groan_rs_tpu.ops import center as center_ops
    from groan_rs_tpu.parallel import traj_iter_map_reduce

    def make_system():
        s = System.from_file(os.path.join(test_files, "example.gro"))
        s.group_create("Protein", "@protein")
        return s

    s = make_system()
    idx = jnp.asarray(s.group_indices("Protein"))

    def body(positions, boxes, mask):
        return {"center": center_ops.center(
            jnp.take(positions, idx, axis=1), boxes[:, None, :])}

    def fold(carry, out, mask):
        m = mask.astype(jnp.float32)
        return {"s": carry["s"] + jnp.sum(out["center"] * m[:, None], axis=0),
                "n": carry["n"] + jnp.sum(m)}

    init = {"s": jnp.zeros(3, jnp.float32), "n": jnp.float32(0)}
    ckpt = str(tmp_path / "state")

    # full pass, no checkpoint: the ground truth
    full = traj_iter_map_reduce(make_system(), local_xtc, body,
                                init=init, fold=fold, batch_size=4)
    mean_full = np.asarray(full["s"]) / float(full["n"])

    # "interrupted" pass: process only the first 8 frames (0..700 ps),
    # checkpointing after every batch
    partial = traj_iter_map_reduce(make_system(), local_xtc, body,
                                   init=init, fold=fold, batch_size=4,
                                   end_time=700.0, checkpoint=ckpt)
    assert float(partial["n"]) == 8.0
    st = PassState.load(ckpt, like=init)
    assert st is not None and st.cursor == 8

    # resumed pass over the FULL trajectory: only the remaining 3 frames
    # are processed, starting from the checkpointed carry
    res = traj_iter_map_reduce(make_system(), local_xtc, body,
                               init=init, fold=fold, batch_size=4,
                               checkpoint=ckpt)
    mean_res = np.asarray(res["s"]) / float(res["n"])
    assert float(res["n"]) == 11.0
    np.testing.assert_allclose(mean_res, mean_full, atol=1e-6)

    # error surfacing still works with a checkpoint attached
    def bad_body(positions, boxes, mask):
        raise RuntimeError("boom")

    with pytest.raises(Exception):
        traj_iter_map_reduce(make_system(), local_xtc, bad_body,
                             init=init, fold=fold, batch_size=4,
                             checkpoint=str(tmp_path / "state2"))


def test_pipeline_profiler(test_files):
    """PipelineProfiler collects per-stage timings through FrameEngine."""
    import jax.numpy as jnp

    from groan_rs_tpu.ops import center as center_ops
    from groan_rs_tpu.parallel.engine import FrameEngine
    from groan_rs_tpu.io.traj import traj_iter
    from groan_rs_tpu.utils.profiling import PipelineProfiler

    s = System.from_file(os.path.join(test_files, "example.gro"))
    s.group_create("Protein", "@protein")
    idx = jnp.asarray(s.group_indices("Protein"))

    def body(positions, boxes, mask):
        return {"center": center_ops.center(
            jnp.take(positions, idx, axis=1), boxes[:, None, :])}

    prof = PipelineProfiler()
    reader = traj_iter(s, os.path.join(test_files, "short_trajectory.xtc"),
                       batch_size=4)
    engine = FrameEngine(body)
    out = engine.run(reader.batches(), profiler=prof)
    assert out["center"].shape == (11, 3)
    assert len(prof.batches) == 3
    t = prof.totals()
    assert t["n_frames"] == 11
    assert t["compute"] > 0 and t["h2d"] > 0
    assert "ms/frame" in prof.summary()


def test_threaded_decode_race_free(test_files):
    """Concurrent decodes of the same file from many Python threads give
    identical results (SURVEY §5 race-detection axis: the native decoder's
    FileReader uses pread and per-thread scratch; nothing is shared)."""
    import threading

    from groan_rs_tpu.io import native

    path = os.path.join(test_files, "short_trajectory.xtc")
    offs, _, _, na = native.xtc_scan(path)
    ref = native.xtc_read_frames(path, offs, na)[0]
    results = [None] * 6
    errors = []

    def worker(k):
        try:
            results[k] = native.xtc_read_frames(path, offs, na)[0]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for r in results:
        np.testing.assert_array_equal(r, ref)
