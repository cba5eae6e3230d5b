#!/usr/bin/env python
"""Per-frame protein COM + protein-membrane distance over a trajectory.

Usage: python examples/protein_com_distance.py [structure] [trajectory]
Defaults to the reference fixtures.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groan_rs_tpu import Dimension, System, TrajectoryAnalysis

structure = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test_files/example.tpr"
trajectory = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/test_files/short_trajectory.xtc"

system = System.from_file(structure)
system.group_create("Protein", "@protein")
system.group_create("Membrane", "@membrane")

out = (
    TrajectoryAnalysis(system)
    .add_com("Protein")
    .add_distance("Protein", "Membrane", Dimension.XYZ)
    .run(trajectory, batch_size=8)
)

for t, com, d in zip(out["times"], out["com_Protein"], out["distance_Protein_Membrane"]):
    print(f"t={t:8.1f} ps  com=({com[0]:.3f}, {com[1]:.3f}, {com[2]:.3f})  dist={d:.3f} nm")
