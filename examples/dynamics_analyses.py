#!/usr/bin/env python
"""Dynamics analyses beyond the reference: gyration, MSD, VACF.

Runs the three surpass observables on the reference fixture corpus:

- radius of gyration per frame (`add_gyration`, gmx-gyrate semantics)
- mean-squared displacement over all frame lags (`models.msd`)
- velocity autocorrelation from TRR velocities (`models.vacf`)

MSD and VACF evaluate from a device-resident trajectory: the file is
decoded and shipped ONCE, the whole lag curve computes in a single
device dispatch.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groan_rs_tpu import models
from groan_rs_tpu.models import TrajectoryAnalysis
from groan_rs_tpu.system import System

TF = os.environ.get("GROAN_FIXTURES", "/root/reference/test_files")


def main():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")
    trr = os.path.join(TF, "short_trajectory.trr")

    out = (TrajectoryAnalysis(s)
           .add_gyration("Protein", name="rg")
           .run(xtc, batch_size=4))
    print(f"Rg(t) [nm]: {np.round(np.asarray(out['rg']), 4)}")

    lag_t, curve = models.msd(s, xtc, "Protein")
    print(f"MSD(tau) [nm^2] at tau={lag_t[:6]} ps: "
          f"{np.round(curve[:6], 5)}")

    lag_t, c = models.vacf(s, trr, "Protein")
    c0 = c[0] if c[0] else 1.0
    print(f"VACF(tau)/VACF(0) at tau={lag_t[:6]} ps: "
          f"{np.round(c / c0, 4)[:6]}")

    # rotational ACF of backbone-bead axis vectors (gmx rotacf -P 2)
    idx = s.group_indices("Protein")
    pairs = np.stack([idx[:-1], idx[1:]], axis=1)
    lag_t, c2 = models.rotacf(s, xtc, pairs, order=2)
    print(f"rotacf P2 at tau={lag_t[:6]} ps: {np.round(c2[:6], 4)}")

    # water H-bond lifetime ACF (gmx hbond -ac), membrane fixture
    from groan_rs_tpu.system.hbonds import HBondChain

    mem = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    water = [HBondChain("resname SOL and name OW",
                        "resname SOL and name OW",
                        "resname SOL and name HW1 HW2")]
    lag_t, hb = models.hbond_acf(
        mem, os.path.join(TF, "aa_membrane_peptide.xtc"), water, [(0, 0)],
        max_distance=0.3, min_angle=150.0)
    print(f"hbond ACF at tau={lag_t[:5]} ps: {np.round(hb[:5], 4)}")

    # electrostatic potential across the CG membrane (gmx potential)
    s.group_create("All", "all")
    pot = models.potential_profile(s, xtc, "All", n_bins=40)
    i = int(np.argmax(np.abs(pot["psi"])))
    print(f"potential: |psi| peaks at z={pot['centers'][i]:.2f} nm "
          f"({pot['psi'][i]:+.2f} V)")
    print("dynamics_analyses: OK")


if __name__ == "__main__":
    main()
