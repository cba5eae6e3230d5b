#!/usr/bin/env python
"""Conformational analyses beyond the reference: PCA, clustering,
Ramachandran, SASA, angle/dihedral tables.

Every workload here is a classic gmx analysis the reference
(Ladme/groan_rs) does not provide; each is redesigned as batched device
work (`gmx covar/anaeig`, `gmx cluster -method gromos`, `gmx rama`,
`gmx sasa`, `gmx angle`):

- positional PCA: covariance as ONE [F,3K]^T @ [F,3K] matmul + eigh
- GROMOS clustering over the all-pairs fitted RMSD matrix (batched QCP)
- backbone phi/psi per residue per frame (one fused dihedral pass)
- Shrake-Rupley SASA via dense occlusion tensors
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groan_rs_tpu import models
from groan_rs_tpu.system import System

TF = os.environ.get("GROAN_FIXTURES", "/root/reference/test_files")


def main():
    s = System.from_file(os.path.join(TF, "example.tpr"))
    s.group_create("Protein", "@protein")
    xtc = os.path.join(TF, "short_trajectory.xtc")

    # --- PCA (gmx covar + anaeig) ------------------------------------
    p = models.pca(s, xtc, "Protein", n_components=5)
    explained = p["eigenvalues"] / p["trace"]
    print("PCA: top-5 eigenvalues (amu nm^2):",
          np.array2string(p["eigenvalues"], precision=4))
    print(f"     top-5 explain {100 * explained.sum():.1f}% of the "
          f"total fluctuation (trace {p['trace']:.4f})")
    print("     frame projections on PC1:",
          np.array2string(p["projections"][:, 0], precision=3))

    # --- GROMOS clustering (gmx cluster) -----------------------------
    c = models.cluster(s, xtc, "Protein", cutoff=0.25)
    print(f"cluster: {len(c['sizes'])} clusters at 0.25 nm cutoff; "
          f"sizes {c['sizes'].tolist()}, medoid frames "
          f"{c['centers'].tolist()}")
    # the matrix is reusable: sweep cutoffs without another device pass
    for cut in (0.15, 0.35):
        cc = models.cluster(None, matrix=c["matrix"], cutoff=cut)
        print(f"         {cut:.2f} nm -> {len(cc['sizes'])} clusters")

    # --- Ramachandran (gmx rama), atomistic peptide fixture ----------
    pep = System.from_file(os.path.join(TF, "aa_membrane_peptide.gro"))
    pep.group_create("Peptide", "@protein")
    rama = models.ramachandran(
        pep, os.path.join(TF, "aa_membrane_peptide.xtc"), "Peptide")
    phi, psi = rama["phi"].mean(0), rama["psi"].mean(0)
    print(f"ramachandran: {phi.shape[0]} residues; "
          f"<phi> {phi.mean():.1f} deg, <psi> {psi.mean():.1f} deg "
          "(helical peptide: expect ~-60/-45)")

    # --- SASA (gmx sasa), vdW radii guessed from the topology --------
    pep.guess_elements()
    sa = models.sasa(pep, os.path.join(TF, "aa_membrane_peptide.xtc"),
                     "Peptide", max_neighbors=96)
    print(f"sasa: per-frame total {np.array2string(sa['total'], precision=2)}"
          f" nm^2; most exposed atom index "
          f"{int(sa['indices'][sa['area'].mean(0).argmax()])}")

    # --- DSSP secondary structure (gmx do_dssp) -----------------------
    ss = models.dssp(pep, os.path.join(TF, "aa_membrane_peptide.xtc"),
                     "Peptide")
    print(f"dssp: frame 0: {''.join(ss['ss'][0])}")
    print(f"      helix {100 * ss['frac']['H']:.0f}%  strand "
          f"{100 * ss['frac']['E']:.0f}%  loop {100 * ss['frac']['-']:.0f}%")

    # --- residue contact matrix (gmx mdmat) ---------------------------
    mm = models.mdmat(s, xtc, "Protein")
    r = mm["mean"].shape[0]
    off = np.abs(np.subtract.outer(np.arange(r), np.arange(r))) >= 3
    i, j = np.unravel_index(np.argmin(np.where(off, mm["mean"], np.inf)),
                            mm["mean"].shape)
    print(f"mdmat: {r}x{r} residue matrix; closest long-range pair "
          f"resid {mm['resids'][i]}-{mm['resids'][j]} at "
          f"{mm['mean'][i, j]:.3f} nm")

    # --- angle table (gmx angle) over explicit sites ------------------
    from groan_rs_tpu.models import TrajectoryAnalysis

    nres = rama["resids"].shape[0]
    ca = [i for i in pep.group_indices("Peptide")
          if pep.topology.atomname.get(i) == "CA"]
    trip = np.stack([ca[:-2], ca[1:-1], ca[2:]], axis=1)
    ang = (TrajectoryAnalysis(pep)
           .add_angles(trip, name="ca_bend")
           .run(os.path.join(TF, "aa_membrane_peptide.xtc")))
    print(f"angles: CA-CA-CA bend over {trip.shape[0]} triplets, "
          f"mean {float(ang['ca_bend'].mean()):.1f} deg "
          "(alpha helix: ~90)")


if __name__ == "__main__":
    main()
