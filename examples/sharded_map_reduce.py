#!/usr/bin/env python
"""Device-sharded map-reduce: mean protein COM over a trajectory with a
device-side fold, resumable checkpointing, and reference-format progress."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from groan_rs_tpu import ProgressPrinter, System, traj_iter_map_reduce
from groan_rs_tpu.ops import center as center_ops

structure = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test_files/example.tpr"
trajectory = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/test_files/short_trajectory.xtc"

system = System.from_file(structure)
system.group_create("Protein", "@protein")
idx = jnp.asarray(system.group_indices("Protein"))


def body(positions, boxes, mask):
    return {"com": center_ops.center(jnp.take(positions, idx, axis=1),
                                     boxes[:, None, :])}


def fold(carry, out, mask):
    m = mask.astype(jnp.float32)
    return {"s": carry["s"] + jnp.sum(out["com"] * m[:, None], axis=0),
            "n": carry["n"] + jnp.sum(m)}


mean_com = traj_iter_map_reduce(
    system, trajectory, body,
    init={"s": jnp.zeros(3, jnp.float32), "n": jnp.float32(0)},
    fold=fold,
    reduce=lambda c: np.asarray(c["s"]) / float(c["n"]),
    progress=ProgressPrinter().with_print_freq(4),
    checkpoint="/tmp/com_pass.ckpt",
)
print(f"\nmean protein COM: {mean_com}")
