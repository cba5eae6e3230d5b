#!/usr/bin/env python
"""Membrane analyses beyond the reference: density profile, order
parameters, dipole, RMSF.

Runs four surpass observables on the atomistic membrane-peptide fixture
(`aa_membrane_peptide.tpr` / `.xtc`):

- mass density profile along z (`add_density_profile`, gmx-density
  semantics: per-frame fractional slabs, kg/m^3)
- deuterium order parameters of the lipid chains (`models.order_parameters`,
  gmx-order / gorder semantics: S_CH per heavy atom over its bonded
  hydrogens)
- peptide dipole moment per frame (`add_dipole`, gmx-dipoles semantics)
- peptide per-residue RMSF (`models.rmsf`, gmx-rmsf semantics: QCP fit of
  every frame onto the structure, fluctuation per atom)

Profile + dipole compose into ONE batched pass (one decode, one device
pipeline); order parameters and RMSF each run one more pass.
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
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    s.group_create("Peptide", "@protein")
    s.group_create("Membrane", "@membrane")

    # one batched pass: membrane mass-density profile + peptide dipole
    pipe = (TrajectoryAnalysis(s)
            .add_density_profile("Membrane", axis="z", n_bins=50,
                                 mode="mass", name="profile")
            .add_dipole("Peptide", name="dipole"))
    out = pipe.run(xtc, batch_size=8)

    prof = np.asarray(out["profile"]).mean(axis=0)         # [n_bins] kg/m^3
    peak = int(prof.argmax())
    print(f"membrane mass-density profile (50 z-slabs, trajectory mean):")
    print(f"  peak {prof[peak]:.0f} kg/m^3 at slab {peak} "
          f"(z/L = {(peak + 0.5) / 50:.2f}); "
          f"center slab {prof[25]:.0f}, edge slab {prof[0]:.0f}")

    mu = np.asarray(out["dipole"])                          # [F, 3] e*nm
    norm = np.linalg.norm(mu, axis=1)
    print(f"peptide dipole |mu|: mean {norm.mean():.2f} e*nm "
          f"({norm.mean() * 48.032047:.1f} D), "
          f"range [{norm.min():.2f}, {norm.max():.2f}]")

    # lipid-chain order parameters (heavy-H bonds found via the topology)
    res = models.order_parameters(s, xtc, "Membrane")
    s_cd = -res["s"]                                        # lipid convention
    print(f"order parameters: {res['pairs'][0].shape[0]} C-H bonds on "
          f"{res['heavy'].shape[0]} heavy atoms; "
          f"-S_CH mean {s_cd.mean():.3f}, "
          f"range [{s_cd.min():.3f}, {s_cd.max():.3f}]")

    # peptide RMSF, reported per residue
    idx, r = models.rmsf(s, xtc, "Peptide")
    resids = s.topology.resnum[idx]
    print("peptide RMSF per residue (nm):")
    for rid in np.unique(resids):
        sel = resids == rid
        print(f"  res {int(rid):3d}: {float(r[sel].mean()):.3f}")


if __name__ == "__main__":
    main()
