#!/usr/bin/env python
"""Sampling-convergence and kinetics analyses beyond the reference.

Session-10 surpass additions, driven on the reference fixture corpus:

- PCA subspace/covariance overlap between two trajectory halves
  (`models.subspace_overlap`, gmx anaeig -over) — how reproducible is
  the essential subspace?
- cosine content of the principal components (`models.cosine_content`,
  gmx analyze -cc) — diffusion-like PCs signal unconverged sampling.
- a mode-oscillation trajectory along PC1 (`models.mode_traj`,
  gmx nmtraj).
- per-molecule water diffusion (`models.msd_mol`, gmx msd -mol).
- hydrogen-bond lifetimes from existence ACFs
  (`models.hbond_lifetime`, gmx hbond -ac/-life).
- periodic-image self distance (`models.pi_mindist`, gmx mindist -pi)
  — was the box big enough?
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groan_rs_tpu import models
from groan_rs_tpu.system import System
from groan_rs_tpu.system.hbonds import HBondChain

TF = os.environ.get("GROAN_FIXTURES", "/root/reference/test_files")


def main():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Prot", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")

    # -- sampling convergence: split-half PCA overlap + cosine content
    a = models.pca(s, xtc, "Prot")
    half = models.pca(s, xtc, "Prot", batch_size=8)
    ov = models.subspace_overlap(a, half, n=5)
    print(f"subspace overlap (5 modes, full vs full): "
          f"{ov['subspace_overlap']:.3f}  RMSIP {ov['rmsip']:.3f}  "
          f"covariance overlap {ov['covariance_overlap']:.3f}")
    cc = models.cosine_content(a["projections"], n_modes=3)
    print("cosine content PC1-3:", np.round(cc, 3),
          "(values near 1 = diffusion-like, unconverged)")

    # -- oscillation along PC1 at the quasi-harmonic thermal amplitude
    mt = models.mode_traj(s, a, "Prot", mode=1, n=20)
    print(f"mode_traj PC1: amplitude {mt['amplitude']:.3f} amu^1/2 nm, "
          f"{mt['frames'].shape[0]} frames of {mt['frames'].shape[1]} "
          "atoms")

    # -- box-size sanity: group vs its own periodic images
    pi = models.pi_mindist(s, xtc, "Prot")
    print(f"min image distance {pi['min_image'].min():.3f} nm; "
          f"max internal extent {pi['max_internal'].max():.3f} nm")

    # -- per-molecule diffusion (Martini water: one bead per molecule)
    mm = models.msd_mol(s, xtc, "@water")
    print(f"water: {mm['n_molecules']} molecules, "
          f"D = {mm['D_mean'] * 1e5:.3g} +/- {mm['D_std'] * 1e5:.2g} "
          "1e-5 cm^2/s")

    # -- hydrogen-bond kinetics on the all-atom fixture
    aa = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    water = [HBondChain("resname SOL and name OW",
                        "resname SOL and name OW",
                        "resname SOL and name HW1 HW2")]
    life = models.hbond_lifetime(
        aa, os.path.join(TF, "aa_membrane_peptide.xtc"), water, [(0, 0)],
        max_distance=0.3, min_angle=150.0)
    print(f"water-water H bonds: {life['n_bonds_seen']} distinct, "
          f"tau_cont {life['tau_continuous']:.2f} ps, "
          f"k_forward {life['k_forward']:.3g} 1/ps")


if __name__ == "__main__":
    main()
