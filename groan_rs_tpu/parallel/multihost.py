"""Multi-host striping utilities (DCN tier of the parallel design).

The reference's thread pool shares one atomic error flag: a worker that
fails sets it, every other worker checks it between frames and bails out
(`src/system/parallel.rs:298-309`).  Across HOSTS there is no shared
memory, so this module generalizes the contract with a per-round tiny
allgather over the `jax.distributed` cluster:

- every process agrees (one allgather) on the maximum stripe length;
- each batch round, every process contributes an error flag (a second
  tiny allgather per round — the cross-host analogue of the reference's
  atomic load per frame);
- a process whose local work raised signals its peers at the next round
  and re-raises; peers raise `ParallelError` instead of hanging on a
  collective that will never complete.

Processes with shorter stripes keep participating in the flag exchange
until the longest stripe finishes, so the collective schedule is
identical on every host (no deadlock from uneven striping).
"""

from __future__ import annotations

import numpy as np

from ..errors import ParallelError


def striped_batches(batches, n_local: int):
    """Wrap a host-stripe batch iterator with cross-host failure
    propagation.

    `batches`: this host's `TrajReader.with_host_shard(i, n).batches(...)`
    iterator (or any iterable of FrameBatches).
    `n_local`: number of batches this host will produce (its chunk count —
    `len(reader.batches(...))`).

    Yields this host's batches; raises `ParallelError` on EVERY process
    as soon as any process's iteration raises.  The exception on the
    failing host chains the original error; peers get the signal form.
    """
    from jax.experimental import multihost_utils

    total = int(np.max(np.asarray(
        multihost_utils.process_allgather(np.int32(n_local)))))
    it = iter(batches)
    err = None
    for _ in range(total):
        fb = None
        if err is None:
            try:
                fb = next(it, None)
            except Exception as e:  # noqa: BLE001 - must propagate to peers
                err = e
        flags = np.asarray(multihost_utils.process_allgather(
            np.int32(0 if err is None else 1)))
        if err is not None:
            raise ParallelError(
                f"host stripe failed mid-pass: {err}") from err
        if flags.any():
            raise ParallelError(
                "a peer host failed mid-pass (cross-host error flag, "
                "the reference's parallel.rs:298-309 contract)")
        if fb is not None:
            yield fb


def merge_striped(local: np.ndarray, stride: int, host_id: int):
    """Allgather per-host per-frame result stripes and reassemble the
    frame interleaving: host h holds frames h, h+stride, h+2*stride, ...
    (`TrajReader.with_host_shard` layout).  Returns the merged [F, ...]
    array, identical on every host."""
    from jax.experimental import multihost_utils

    local = np.asarray(local)
    meta = np.asarray(multihost_utils.process_allgather(
        np.array([local.shape[0], host_id], np.int32)))
    counts, ids = meta[:, 0], meta[:, 1]
    if sorted(ids.tolist()) != list(range(stride)):
        raise ParallelError(
            f"merge_striped needs exactly one host per stripe 0..{stride - 1}"
            f"; got host_ids {ids.tolist()}")
    pad = int(counts.max())
    padded = np.zeros((pad,) + local.shape[1:], local.dtype)
    padded[: local.shape[0]] = local
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    total = int(counts.sum())
    merged = np.zeros((total,) + local.shape[1:], local.dtype)
    # stripes land by each host's DECLARED stripe index, not by its
    # process index — the two differ whenever with_host_shard was built
    # with a custom assignment
    for p in range(stride):
        h = int(ids[p])
        merged[h::stride] = gathered[p][: counts[p]]
    return merged
