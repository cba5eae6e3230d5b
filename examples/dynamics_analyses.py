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
    print("dynamics_analyses: OK")


if __name__ == "__main__":
    main()
