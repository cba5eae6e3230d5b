#!/usr/bin/env python
"""Water-water hydrogen bonds per frame (cell-pruned exact kernel)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groan_rs_tpu import HBondChain, System

structure = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test_files/aa_membrane_peptide.tpr"
trajectory = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/test_files/aa_membrane_peptide.xtc"

system = System.from_file(structure)
chains = [HBondChain("resname SOL and name OW",
                     "resname SOL and name OW",
                     "resname SOL and name HW1 HW2")]
for frame, hmap in system.hbonds_analyze(trajectory, chains, [(0, 0)], 0.3, 150.0):
    bonds = hmap[(0, 0)]
    print(f"t={frame.get_time():8.1f} ps  {len(bonds)} hydrogen bonds")
