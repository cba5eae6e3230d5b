#!/usr/bin/env python
"""RMSD of every frame vs the starting structure, writing the fitted
trajectory (reference workflow: calc_rmsd_and_fit + xtc writer)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groan_rs_tpu import System

structure = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test_files/example.tpr"
trajectory = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/test_files/short_trajectory.xtc"
out_xtc = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fitted.xtc"

system = System.from_file(structure)
system.group_create("Protein", "@protein")
reference = System.from_file(structure)
reference.group_create("Protein", "@protein")

system.traj_writer_init(out_xtc, fmt="xtc")
for frame, rmsd in system.xtc_iter(trajectory).calc_rmsd_and_fit(reference, "Protein"):
    frame.traj_write_frame()
    print(f"t={frame.get_time():8.1f} ps  rmsd={rmsd:.4f} nm")
system.traj_writers_close()
print(f"fitted trajectory written to {out_xtc}")
