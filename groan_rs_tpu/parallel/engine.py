"""Frame-sharded map-reduce engine (see package docstring)."""

from __future__ import annotations

import numpy as np

from ..errors import ParallelError


def make_mesh(n_frames_axis: int | None = None, n_atoms_axis: int = 1, devices=None):
    """Build a `(frames, atoms)` device mesh.

    Default: all devices on the `frames` axis (pure frame data-parallel,
    the reference's decomposition); set `n_atoms_axis > 1` to also shard
    the atom dimension for >HBM systems.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    if n_frames_axis is None:
        n_frames_axis = max(1, len(devices) // n_atoms_axis)
    n = n_frames_axis * n_atoms_axis
    if n > len(devices):
        raise ParallelError(
            f"mesh {n_frames_axis}x{n_atoms_axis} needs {n} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.array(devices[:n]).reshape(n_frames_axis, n_atoms_axis)
    return Mesh(dev_array, ("frames", "atoms"))


class FrameEngine:
    """Runs a per-frame-batch analysis step over a trajectory reader.

    `step_fn(positions[B, K, 3], boxes[B, 3], frame_mask[B]) -> pytree`
    is jitted once; batches are padded to a multiple of the frame-axis
    device count and sharded over the mesh.  Results come back on host,
    concatenated over frames (padded frames dropped).
    """

    def __init__(self, step_fn, mesh=None, donate: bool = False,
                 box: str = "lengths"):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if box not in ("lengths", "matrix"):
            raise ParallelError(f"unknown box mode '{box}'")
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_shards = self.mesh.shape["frames"]
        self._in_shard = NamedSharding(self.mesh, P("frames"))
        self._replicated = NamedSharding(self.mesh, P())
        self._step = jax.jit(step_fn)
        self._box_mode = box

    def _pad(self, arr: np.ndarray, b_target: int) -> np.ndarray:
        b = arr.shape[0]
        if b == b_target:
            return arr
        pad = [(0, b_target - b)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad, mode="edge")

    def run(self, batches, collect: bool = True):
        """Iterate FrameBatches, running the step on each; returns the
        per-frame results concatenated over the whole trajectory."""
        import jax
        import jax.numpy as jnp

        outs = []
        for fb in batches:
            b = fb.positions.shape[0]
            b_pad = -(-b // self.n_shards) * self.n_shards
            pos = jax.device_put(
                self._pad(fb.positions, b_pad), self._in_shard
            )
            box_host = (fb.box_matrices() if self._box_mode == "matrix"
                        else fb.box_lengths())
            boxes = jax.device_put(self._pad(box_host, b_pad), self._in_shard)
            mask = np.zeros(b_pad, dtype=bool)
            mask[:b] = True
            mask_d = jax.device_put(mask, self._in_shard)
            res = self._step(pos, boxes, mask_d)
            if collect:
                host = jax.tree.map(lambda x: np.asarray(x)[:b], res)
                outs.append(host)
        if not collect:
            return None
        if not outs:
            return {}
        return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)


def traj_iter_map_reduce(system, filenames, body, *, init=None, reduce=None,
                         group: str | None = None, fmt: str | None = None,
                         batch_size: int = 64, start_time=None, end_time=None,
                         step=None, progress=None):
    """API-parity analogue of `System::traj_iter_map_reduce`
    (reference: parallel.rs:208) running device-parallel.

    - `body(frame_results_pytree) -> value` is applied to the batched
      per-frame outputs if `body` is a host function; if `body` is a
      jittable step (callable taking (positions, boxes, mask)), it runs
      on-device sharded over frames.
    - `reduce(values) -> result` folds the collected outputs (defaults to
      concatenation, matching `ParallelTrajData::reduce` semantics).
    """
    from ..io.traj import cat_iter, traj_iter

    if isinstance(filenames, (list, tuple)):
        reader = cat_iter(system, filenames, fmt=fmt, group=group,
                          batch_size=batch_size, start_time=start_time,
                          end_time=end_time, step=step)
    else:
        reader = traj_iter(system, filenames, fmt=fmt, group=group,
                           batch_size=batch_size, start_time=start_time,
                           end_time=end_time, step=step)
    if progress is not None:
        reader.print_progress(progress)

    engine = FrameEngine(body)
    out = engine.run(reader.batches())
    if reduce is not None:
        return reduce(out)
    return out
